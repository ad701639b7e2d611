package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Flatten
import graft.pipeline.{Pipeline, SyntheticChannels}
import graft.util.Tables

/** q35 — the reference's entire program, end to end: JSON extract →
  * flatten (P1/P2/P3/P6 keep-first semantics) → drops (P4) → batch
  * timestamp (P5) → channel-key derivation (P7) → partitioned lake
  * append (W1) → per-channel RAW warehouse load (S2/S3/W2) → staging
  * views in the `ytanalytics` database (S4/S5/P9/W4) → mart cast ×10 +
  * 7-way UNION ALL + CTAS (P8/U1/W5) → readback.
  *
  * Inputs are YouTube-API-shaped JSON derived deterministically from
  * `customer` (SyntheticChannels), so the DuckDB oracle replays the whole
  * pipeline as one SELECT over `customer` — including keep-first flatten
  * (the localized title and medium/high thumbnail urls must NOT appear),
  * missing-country null, and non-numeric viewCount → NULL.
  *
  * Scale note: every stage is a distributed job over the lake/warehouse
  * files; the only driver-side data is the 7 API response strings per
  * batch (identical to the reference's driver-side fetch).
  */
object PipelineQueries {

  private def q35(s: SparkSession, d: String): DataFrame = {
    val conf = Pipeline.Config(
      lakePath = graft.util.TmpDirs.perProcess("graft_q35_lake"))
    Pipeline.run(s, SyntheticChannels.batches(s, d), conf)
      .orderBy("title", "timestamp")
  }

  private val oracle =
    """WITH chan AS (
      |  SELECT c_custkey AS k, c_name, c_nationkey, c_acctbal,
      |    replace(c_name, '#', ' ')
      |      || CASE WHEN c_custkey = 2 THEN '-Kids/HD' ELSE '' END AS title
      |  FROM customer WHERE c_custkey BETWEEN 1 AND 7),
      |b AS (SELECT unnest(generate_series(1, 3)) AS batch)
      |SELECT
      |  title,
      |  '@' || lower(c_name) AS customUrl,
      |  TIMESTAMP '2010-01-01 00:00:00' + INTERVAL (k) DAY AS PublishedAt,
      |  'https://img/' || CAST(k AS VARCHAR) || '/default.jpg' AS url_,
      |  CASE WHEN k = 3 THEN NULL
      |       ELSE 'C' || CAST(c_nationkey AS VARCHAR) END AS Country,
      |  CASE WHEN k = 5 THEN NULL
      |       ELSE CAST(floor(c_acctbal * 100) AS BIGINT) + 1000000 * batch
      |       END AS view_count,
      |  CAST(k * 100 + batch AS BIGINT) AS subscriberCount,
      |  CAST(k * 10 + batch AS BIGINT) AS videoCount,
      |  c_acctbal > 0 AS madeForKids,
      |  TIMESTAMP '2026-01-01 12:00:00' + INTERVAL (batch - 1) DAY AS "timestamp"
      |FROM chan, b
      |ORDER BY title, "timestamp"""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q35_pipeline_end_to_end", q35, Some(oracle),
      "full extract→lake→warehouse→staging→mart pipeline replay (all of SURVEY §2.1-2.7)"),

    // q57 — P6 flattenDictStyle (/root/reference/dags/optimized_extract
    // .py:25-39): structs recurse to BARE leaf names, arrays explode
    // positionally into `{name}_{i}` with NULL past the row's actual
    // length (try_element_at). The nested fixture is built from
    // `documents` on both sides: a two-level struct plus the first 5
    // normalized words as an array pinned to width 3.
    Q("q57_flatten_positional",
      (s, d) => {
        val nested = Tables(s, d, "documents").select(
          col("doc_id"),
          struct(col("lang"),
            struct(col("source"), col("n_chars")).as("inner")).as("meta"),
          slice(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
            " "), 1, 5).as("head_words"))
        Flatten.flattenDictStyle(nested, Map("head_words" -> 3))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, lang, source, n_chars,
        |  list_slice(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    1, 5) AS hw
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars,
        |  hw[1] AS head_words_0, hw[2] AS head_words_1, hw[3] AS head_words_2
        |FROM w ORDER BY doc_id""".stripMargin),
      "positional dict-style flatten: bare struct leaves + {name}_{i} array explode (P6)"))
}
