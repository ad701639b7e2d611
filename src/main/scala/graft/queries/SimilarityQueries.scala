package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.util.Tables

/** ANN / similarity-search pack over `embeddings`. */
object SimilarityQueries {

  /** DuckDB equivalent of VectorFunctions.signBucket over 4 dims (16
    * buckets — sized so a bucket holds tens of vectors at test SFs).
    */
  private val lshBits = 4
  private val bucketSql: String =
    (0 until lshBits).map(i =>
      s"CASE WHEN v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END").mkString(" + ")

  val qs: Seq[Q] = Seq(

    // Brute-force exact top-k: scan all vectors once, query broadcast.
    Q("q27_ann_bruteforce",
      (s, d) => Similarity.bruteForceTopK(Tables(s, d, "embeddings"),
        col("vec_id"), col("embedding"), queryId = 0L, k = 10),
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
      "exact cosine top-k (single scan + broadcast query + TakeOrdered)"),

    // Sign-LSH bucketed ANN: probe only the query's bucket (~1/256 of
    // the data). The approximate scale path.
    Q("q28_ann_sign_lsh",
      (s, d) => Similarity.signLshTopK(Tables(s, d, "embeddings"),
        col("vec_id"), col("embedding"), queryId = 0L, k = 10, bits = lshBits),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM e),
        |q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(v, qv), 4) AS cos_sim
        |FROM b, q WHERE vec_id <> 0 AND bucket = qbucket
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
      "sign-LSH bucketed ANN (IVF-style probe of one bucket)"),

    // Per-label centroids (coarse quantizer build for IVF), long format.
    Q("q29_centroids",
      (s, d) => Similarity.centroids(Tables(s, d, "embeddings"),
          col("label"), col("embedding"))
        .orderBy("label", "dim"),
      Some("""SELECT label, CAST(t.dim AS INTEGER) AS dim,
        |  round(avg(embedding[t.dim]), 6) AS centroid
        |FROM embeddings, generate_series(1, 64) AS t(dim)
        |GROUP BY label, t.dim ORDER BY label, dim""".stripMargin),
      "per-label mean vectors (IVF coarse-quantizer build)")
  )
}
