package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the restart/retry semantics the mergeable-state monitors
  * (q101/q123/q141/q204/q228/q252) rely on: commit = ALL component
  * dirs carry _SUCCESS; a retried batch merges from its STRICT
  * predecessor (never the dir it is about to overwrite); an empty
  * state resolves loudly, not as silent emptiness.
  */
class BatchStateSpec extends AnyFunSuite {

  private def mk(base: String, comp: String, id: Long,
                 success: Boolean): Unit = {
    val d = new java.io.File(BatchState.dir(base, comp, id))
    assert(d.mkdirs() || d.isDirectory)
    if (success) new java.io.File(d, "_SUCCESS").createNewFile()
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bs").toString

  test("commit resolution: only ids with ALL component _SUCCESS markers count") {
    val base = tmp()
    val comps = Seq("cells", "dict")
    mk(base, "cells", 0, success = true)
    mk(base, "dict", 0, success = true)
    mk(base, "cells", 1, success = true) // dict_1 missing entirely
    mk(base, "cells", 2, success = true)
    mk(base, "dict", 2, success = false) // dir exists, write not committed
    // a stray non-numeric dir must not blow up resolution
    new java.io.File(s"$base/cells_tmpjunk").mkdirs()
    assert(BatchState.committedIds(base, comps) === Seq(0L))
    assert(BatchState.lastId(base, comps, "t") === 0L)
  }

  test("retry merges from the strict predecessor, never the batch's own dir") {
    val base = tmp()
    val comps = Seq("state")
    mk(base, "state", 0, success = true)
    mk(base, "state", 1, success = true)
    // batch 1 RETRIED after committing: must re-read 0, not itself —
    // reading state_1 while overwriting state_1 is the parity-dir bug
    assert(BatchState.prevId(base, comps, 1L) === Some(0L))
    // the first batch of a fresh run has no predecessor
    assert(BatchState.prevId(base, comps, 0L) === None)
    // a resumed run's next batch finds the latest committed id
    assert(BatchState.prevId(base, comps, 2L) === Some(1L))
    assert(BatchState.lastId(base, comps, "t") === 1L)
  }

  test("gc retires only unreachable ids and a post-gc retry still resolves") {
    // Simulate the monitors' merge loop twice — once with gc at the
    // end of every batch, once without — including a RETRY of the
    // final batch after gc ran: both runs must resolve the identical
    // merge-from chain, and the gc run's footprint must be exactly
    // two snapshots.
    def runChain(base: String, gcEach: Boolean): Seq[Option[Long]] =
      (0L to 3L).map { id =>
        val from = BatchState.prevId(base, Seq("state"), id)
        mk(base, "state", id, success = true)
        if (gcEach) BatchState.gc(base, Seq("state"), id)
        from
      }
    val withGc = tmp(); val noGc = tmp()
    assert(runChain(withGc, gcEach = true) ===
      runChain(noGc, gcEach = false))
    // steady state: exactly {2, 3} survive
    assert(BatchState.committedIds(withGc, Seq("state")) === Seq(2L, 3L))
    // a retry of batch 3 AFTER its own gc still merges from 2 and
    // idempotently re-gcs without touching 2
    assert(BatchState.prevId(withGc, Seq("state"), 3L) === Some(2L))
    assert(BatchState.gc(withGc, Seq("state"), 3L).isEmpty)
    assert(BatchState.committedIds(withGc, Seq("state")) === Seq(2L, 3L))
    // gc sweeps orphaned partial dirs below the floor too, across all
    // components, and reports what it retired
    val multi = tmp()
    mk(multi, "cells", 0, success = true)
    mk(multi, "dict", 0, success = false) // orphaned partial write
    mk(multi, "cells", 1, success = true)
    mk(multi, "dict", 1, success = true)
    mk(multi, "cells", 2, success = true)
    mk(multi, "dict", 2, success = true)
    assert(BatchState.gc(multi, Seq("cells", "dict"), 2L) === Seq(0L))
    assert(!new java.io.File(BatchState.dir(multi, "dict", 0)).exists)
    assert(BatchState.committedIds(multi, Seq("cells", "dict")) ===
      Seq(1L, 2L))
  }

  test("empty or missing state is loud at read time, empty at scan time") {
    val base = tmp()
    val e = intercept[RuntimeException](
      BatchState.lastId(base, Seq("state"), "q999"))
    assert(e.getMessage.contains("no committed state"))
    assert(BatchState.committedIds(s"$base/nope", Seq("state")).isEmpty)
  }
}
