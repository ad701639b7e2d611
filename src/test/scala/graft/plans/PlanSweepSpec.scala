package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Whole-suite structural sweep: EVERY query's physical plan is checked
  * for the one join shape that must never appear — `CartesianProduct`,
  * Spark's non-broadcast cross join (all-pairs shuffled to every
  * executor). Every deliberate cross join in this repo wraps its small
  * side in `broadcast(...)`, which plans as BroadcastNestedLoopJoin
  * instead; a CartesianProduct sneaking in means someone dropped the
  * hint on a join that will melt at 100 TB. The per-query PlansSpec
  * contracts pin fine-grained shapes for headline queries; this sweep
  * is the coarse tripwire over all of them.
  *
  * Side-effecting queries (pipeline/streaming closures) execute their
  * setup work at DataFrame-construction time — at sf0.001 that costs
  * seconds and doubles as a smoke test that every query can at least
  * BUILD against the smallest dataset.
  */
class PlanSweepSpec extends SparkSpec {

  test("no query in the suite plans a CartesianProduct") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch {
            case e: Throwable =>
              fail(s"$name failed to build/plan at sf0.001: ${e.getMessage}")
          }
          // per-query release (r15): operators no longer self-sweep
          // their caches (the Dataset.unpersist CacheManager cost —
          // see Graph.kHopFrontiers); a 279-query single-session sweep
          // must clear per query like every other harness, or the
          // CacheManager registry grows for the whole sweep.
          finally spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"unhinted cartesian joins in: ${offenders.mkString(", ")}")
  }
}
