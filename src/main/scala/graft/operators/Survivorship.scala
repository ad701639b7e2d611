package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GOLDEN-RECORD survivorship: collapse a conflicting per-key feed into
  * one authoritative row per key by per-FIELD rules — the master-data-
  * management merge primitive (the reference's domain would run this to
  * build one profile per channel from conflicting API snapshots):
  *
  *  - `latest`   — value carried by the max (ord, ordTie) row
  *                 ("most recent wins", tie broken by the unique id)
  *  - `largest`  — max of a numeric field across the key's rows
  *  - `majority` — most frequent value; ties go to the LARGEST value
  *                 (a documented contract that keeps the fold
  *                 window-free — the q158 max-struct discipline)
  *
  * Scale shape: latest/largest fold in ONE key-keyed aggregate
  * (max-struct + max — both algebraic, map-side partials); majority
  * needs its own (key, value) count aggregate folded by max-struct,
  * then joins back on the key. Two exchanges total, no windows, no
  * driver state.
  *
  * Reference analogue: none — extension in the warehouse/CDC pack next
  * to upsert (q88) and snapshot diff (q120).
  */
object Survivorship {

  def goldenRecord(df: DataFrame, key: Column, ord: Column, ordTie: Column,
                   latest: Column, largest: Column,
                   majority: Column): DataFrame = {
    val base = df.select(key.as("k"), ord.as("o"), ordTie.as("ot"),
      latest.as("lv"), largest.as("gv"), majority.as("mv"))
    val main = base.groupBy("k").agg(
      count(lit(1)).as("n_rows"),
      max(struct(col("o"), col("ot"), col("lv"))).as("best"),
      max(col("gv")).as("largest"))
    val maj = base.groupBy("k", "mv").agg(count(lit(1)).as("n"))
      .groupBy("k")
      .agg(max(struct(col("n"), col("mv"))).as("m"))
      .select(col("k"), col("m.mv").as("majority"),
        col("m.n").as("majority_n"))
    main.join(maj, "k")
      .select(col("k"), col("n_rows"), col("best.lv").as("latest"),
        col("largest"), col("majority"), col("majority_n"))
  }
}
