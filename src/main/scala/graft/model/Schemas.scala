package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Schemas for the YouTube pipeline parity slice.
  *
  * `channelResponse` is the explicit StructType of the
  * `channels().list(part="id,localizations,snippet,statistics,status,
  * topicDetails")` response consumed at /root/reference/dags/extract.py:77-83.
  * Field DECLARATION ORDER matches the API response key order — the
  * reference's flatten renames columns to their last dotted segment and
  * keeps the FIRST duplicate (extract.py:94-98,112), so column order is
  * semantic: `thumbnails.default.url` must precede `medium.url`/`high.url`
  * for "url" to resolve to the default thumbnail. (pandas preserves JSON
  * key order; `spark.read.json` would sort fields alphabetically, which is
  * why the schema is explicit.)
  *
  * `localizations` is modeled as a struct of known locales rather than a
  * MapType: pd.json_normalize dot-flattens dict values the same way it
  * flattens structs, and a schema-time flatten needs named fields.
  */
object Schemas {

  private def thumb = StructType(Seq(
    StructField("url", StringType),
    StructField("width", LongType),
    StructField("height", LongType)))

  val channelItem: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("etag", StringType),
    StructField("id", StringType),
    StructField("snippet", StructType(Seq(
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("customUrl", StringType),
      StructField("publishedAt", StringType), // ISO-8601 string in the API
      StructField("thumbnails", StructType(Seq(
        StructField("default", thumb),
        StructField("medium", thumb),
        StructField("high", thumb)))),
      StructField("country", StringType)))),
    StructField("statistics", StructType(Seq(
      StructField("viewCount", StringType), // counts arrive as STRINGS
      StructField("subscriberCount", StringType),
      StructField("hiddenSubscriberCount", BooleanType),
      StructField("videoCount", StringType)))),
    StructField("status", StructType(Seq(
      StructField("privacyStatus", StringType),
      StructField("isLinked", BooleanType),
      StructField("longUploadsStatus", StringType),
      StructField("madeForKids", BooleanType)))),
    StructField("topicDetails", StructType(Seq(
      StructField("topicIds", ArrayType(StringType)),
      StructField("topicCategories", ArrayType(StringType))))),
    StructField("localizations", StructType(Seq(
      StructField("en", StructType(Seq(
        StructField("title", StringType),
        StructField("description", StringType)))))))))

  val channelResponse: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("etag", StringType),
    StructField("items", ArrayType(channelItem))))

  /** The mart's authoritative row type — the only declared schema in the
    * reference (YT_Facts_stg.sql:3-12; SURVEY §1.2). Column names match
    * the SQL aliases exactly, including `url_` and mixed case.
    */
  case class YtFact(
      title: String,
      customUrl: String,
      PublishedAt: Timestamp,
      url_ : String,
      Country: String,
      view_count: Option[Long],
      subscriberCount: Option[Long],
      videoCount: Option[Long],
      madeForKids: Option[Boolean],
      timestamp: Timestamp)
}
