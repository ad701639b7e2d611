package graft.mart

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.ingest.Ingest
import graft.pipeline.SyntheticChannels.{Chan, json}

/** P8 cast matrix + U1 union semantics
  * (models/marts/YT_Facts_stg.sql:3-115; SURVEY §1.2, §7.4 cast drift).
  */
class YtFactsSpec extends SparkSpec {

  private val ts = Timestamp.from(Instant.parse("2026-03-01T08:00:00Z"))

  private def raw(chans: Chan*) =
    Ingest.extract(spark, chans.map(json(_, 1)), ts)

  test("castProject produces the authoritative mart schema") {
    val mart = YtFacts.castProject(raw(Chan(1, "A#B", 1, 5.0)))
    val expected = Seq(
      "title" -> StringType, "customUrl" -> StringType,
      "PublishedAt" -> TimestampType, "url_" -> StringType,
      "Country" -> StringType, "view_count" -> LongType,
      "subscriberCount" -> LongType, "videoCount" -> LongType,
      "madeForKids" -> BooleanType, "timestamp" -> TimestampType)
    assert(mart.schema.fields.map(f => f.name -> f.dataType).toSeq === expected)
  }

  test("malformed numeric strings cast to NULL, not error (try_cast)") {
    // channel 5 is the fixture's non-numeric viewCount ("N/A")
    val mart = YtFacts.castProject(raw(Chan(5, "E#F", 2, 7.0)))
    val row = mart.select("view_count", "subscriberCount").head()
    assert(row.isNullAt(0))
    assert(row.getLong(1) === 501L)
  }

  test("ISO-8601 publishedAt string casts to the right instant (UTC)") {
    val mart = YtFacts.castProject(raw(Chan(2, "C#D", 9, 1.0)))
    val got = mart.select("PublishedAt").head().getTimestamp(0)
    assert(got === Timestamp.from(Instant.parse("2010-01-03T00:00:00Z")))
  }

  test("build = N-way positional UNION ALL; row count is the sum") {
    val a = raw(Chan(1, "A#B", 1, 5.0), Chan(2, "C#D", 2, 6.0))
    val b = raw(Chan(3, "E#F", 3, 7.0))
    val mart = YtFacts.build(Seq(a, b))
    assert(mart.count() === 3)
    assert(mart.schema === YtFacts.castProject(a).schema)
  }

  test("typed Dataset[YtFact] roundtrip preserves values") {
    import spark.implicits._
    val ds = YtFacts.typed(spark, YtFacts.build(Seq(raw(Chan(1, "A#B", 4, 5.0)))))
    val f = ds.head()
    assert(f.title === "A B")
    assert(f.Country === Some("C4").orNull)
    assert(f.view_count === Some(1000500L))
    assert(f.madeForKids === Some(true))
  }
}
