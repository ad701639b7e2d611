package graft.pipeline

import graft.SparkSpec

/** SURVEY §5.4: full pipeline replay over reference-shaped fixtures —
  * mart schema equals §1.2's table, row count = channels × batches, and
  * the parquet and header-CSV lake variants agree.
  */
class PipelineSpec extends SparkSpec {

  private val chans = Seq(
    SyntheticChannels.Chan(1, "Pipe#A", 1, 10.0),
    SyntheticChannels.Chan(2, "Pipe#B", 2, -4.0), // negative bal -> madeForKids=false
    SyntheticChannels.Chan(5, "Pipe#C", 3, 8.0))  // k=5 -> malformed viewCount
  private val nBatches = 2

  private def batches =
    (1 to nBatches).map(b =>
      SyntheticChannels.batchTs(b) -> chans.map(SyntheticChannels.json(_, b)))

  private def runWith(name: String, csv: Boolean) =
    Pipeline.run(spark, batches,
      Pipeline.Config(lakePath = scratch(s"pipe_lake_$name"),
        database = s"ytanalytics_$name", csvLake = csv))

  test("pipeline replay: row count = channels x batches, schema = A.3") {
    val mart = runWith("pq", csv = false)
    assert(mart.count() === chans.size * nBatches)
    assert(mart.columns.toSeq === Seq("title", "customUrl", "PublishedAt",
      "url_", "Country", "view_count", "subscriberCount", "videoCount",
      "madeForKids", "timestamp"))
    val rows = mart.collect()
    // keep-first flatten: url_ is always the DEFAULT thumbnail
    assert(rows.forall(_.getAs[String]("url_").endsWith("/default.jpg")))
    // malformed viewCount (k=5 channel) -> NULL in every batch
    assert(rows.count(_.isNullAt(mart.columns.indexOf("view_count"))) === nBatches)
    // negative-balance channel -> madeForKids=false
    assert(rows.count(r => !r.getAs[Boolean]("madeForKids")) === nBatches)
  }

  test("pipeline replay is idempotent (rerun produces identical mart)") {
    val a = runWith("idem", csv = false).collect().map(_.toString).sorted
    val b = runWith("idem", csv = false).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("header-CSV lake variant produces the same mart as parquet") {
    val pq = runWith("pq2", csv = false).collect().map(_.toString).sorted
    val cs = runWith("csv", csv = true).collect().map(_.toString).sorted
    assert(cs === pq)
  }

  test("staging views are registered in the session (W4)") {
    runWith("views", csv = false)
    val views = spark.catalog.listTables().collect().map(_.name)
    assert(views.exists(_.endsWith("_stg")))
  }
}
