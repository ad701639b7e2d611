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

  test("empty or missing state is loud at read time, empty at scan time") {
    val base = tmp()
    val e = intercept[RuntimeException](
      BatchState.lastId(base, Seq("state"), "q999"))
    assert(e.getMessage.contains("no committed state"))
    assert(BatchState.committedIds(s"$base/nope", Seq("state")).isEmpty)
  }
}
