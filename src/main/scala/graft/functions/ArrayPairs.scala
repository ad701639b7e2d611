package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The C(n,2) array fan-out shared by the co-occurrence / basket /
  * bucket-pair operators: all pairs (a(i), a(j)) with i < j from one
  * array column, as array<struct<u, v>> ready to explode. Stays inside
  * whole-stage codegen (higher-order transform/slice — no join, no
  * extra shuffle); a group of size m emits m(m−1)/2 structs, so the
  * caller's per-group size cap is the scale contract (the q218 lesson:
  * this beats a basket-keyed self-join by the whole join+dedup stage).
  * Explode of an empty/singleton array's pair list drops the row — no
  * size guard needed at the call site.
  */
object ArrayPairs {
  def pairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr)),
        y => struct(x.as("u"), y.as("v")))))
}
