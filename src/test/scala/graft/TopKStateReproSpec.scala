package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TopKState

/** Pinned replay of the round-14 TopKStateProperties falsification
  * (seed KsAomgVvSDtGi1mIvcGtpiUv11UjXe1XoNELllywNgM=): a 53-event
  * signed history folded one event per batch. The pure per-group
  * reference simulation of the documented algorithm yields the brute
  * answer; the DataFrame implementation diverged — this spec pins the
  * exact history so the fix is reproducible, and dumps per-batch state
  * when it fails.
  */
class TopKStateReproSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val K = 2
  private val B = 4

  private val hist: Seq[(String, Long, Long, Long)] = Seq(
    ("a",1L,4L,1L),("a",2L,10L,1L),("a",2L,10L,-1L),("a",3L,7L,1L),
    ("a",3L,7L,-1L),("b",4L,12L,1L),("b",5L,12L,1L),("a",6L,11L,1L),
    ("a",7L,4L,1L),("a",6L,11L,-1L),("a",7L,4L,-1L),("a",8L,9L,1L),
    ("b",9L,9L,1L),("b",4L,12L,-1L),("b",10L,2L,1L),("a",11L,10L,1L),
    ("b",12L,0L,1L),("a",13L,8L,1L),("b",12L,0L,-1L),("b",14L,8L,1L),
    ("b",10L,2L,-1L),("a",11L,10L,-1L),("b",15L,12L,1L),("b",9L,9L,-1L),
    ("a",13L,8L,-1L),("b",16L,3L,1L),("a",17L,12L,1L),("b",14L,8L,-1L),
    ("b",18L,4L,1L),("b",18L,4L,-1L),("b",19L,9L,1L),("b",15L,12L,-1L),
    ("b",20L,11L,1L),("a",17L,12L,-1L),("a",21L,0L,1L),("b",16L,3L,-1L),
    ("b",19L,9L,-1L),("b",20L,11L,-1L),("b",22L,11L,1L),("b",23L,1L,1L),
    ("a",24L,0L,1L),("b",22L,11L,-1L),("a",25L,10L,1L),("a",21L,0L,-1L),
    ("b",23L,1L,-1L),("a",26L,11L,1L),("a",24L,0L,-1L),("b",27L,6L,1L),
    ("a",28L,7L,1L),("a",25L,10L,-1L),("a",26L,11L,-1L),("b",27L,6L,-1L),
    ("a",28L,7L,-1L))

  test("seed-KsAomg history, one event per batch: certified top-k == brute") {
    import spark.implicits._
    val all = hist.toDF("g", "id", "v", "sign")
    var (buf, meta) = TopKState.emptyState(all, Seq("g"))
    val stateDir = graft.util.TmpDirs.perProcess("topk_repro_state")
    hist.zipWithIndex.foreach { case (e, i) =>
      val (b2, m2) = TopKState.step(buf, meta,
        Seq(e).toDF("g", "id", "v", "sign"), Seq("g"), B)
      // q273's real state transport: parquet round-trip per batch
      // (versioned dirs — the previous batch's state is still being
      // read by b2/m2's lineage, so never overwrite it in place)
      b2.write.mode("overwrite").parquet(s"$stateDir/buf$i")
      m2.write.mode("overwrite").parquet(s"$stateDir/meta$i")
      buf = spark.read.parquet(s"$stateDir/buf$i")
      meta = spark.read.parquet(s"$stateDir/meta$i")
      if (sys.env.contains("TOPK_REPRO_TRACE")) {
        println(s"--- batch $i ev=$e")
        println("buf:  " + buf.orderBy("g", "id").collect().mkString(" "))
        println("meta: " + meta.orderBy("g").collect().mkString(" "))
      }
    }
    val got = TopKState.topkWithRefill(buf, meta, all, Seq("g"), K)
      .orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val deleted = hist.filter(_._4 == -1L).map(_._2).toSet
    val brute = hist.filter(e => e._4 == 1L && !deleted.contains(e._2))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(e => (-e._3, e._2)).take(K).zipWithIndex
          .map { case (e, i) => (g, (i + 1).toLong, e._2, e._3) }
      }.sortBy(t => (t._1, t._2))
    assert(got == brute)
  }
}
