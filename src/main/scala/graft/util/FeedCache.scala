package graft.util

/** Per-JVM memoized FEED fixtures for the streaming queries.
  *
  * Every streaming query's input feed is a deterministic function of
  * the sf dir (a filtered/re-chunked copy of a test table written as
  * N parquet files so the file source yields N micro-batches). In
  * production that feed EXISTS — the engine never writes its own
  * input — so re-writing it on every bench pass measured fixture
  * scaffolding, not the streaming operator (round-11 verdict #8: the
  * streaming set carried ~16 s of fixed machinery at sf0.1). `ensure`
  * runs `write` once per (name, sfDir) per JVM; later passes reuse
  * the files and the timed body is the stream + state maintenance +
  * finish, which is what the bench is for.
  *
  * Correctness is unaffected: results are batch-split invariant by
  * the operators' own contracts (abelian state merges, arrival-order
  * independent join match sets), and the feed CONTENT is identical
  * either way. State/checkpoint dirs stay per-run — only the
  * read-only input is shared. Keyed on sfDir so a Verify-then-Bench
  * JVM switching scale factors never crosses feeds; per-process
  * naming (TmpDirs) keeps concurrent JVMs apart as before.
  */
object FeedCache {
  private val ready =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensure(name: String, sfDir: String)(write: String => Unit): String = {
    val key = s"$name-${Integer.toHexString(sfDir.hashCode)}"
    val dir = TmpDirs.perProcess(s"graft_feed_$key")
    if (ready.add(key)) {
      try write(dir)
      catch { case t: Throwable => ready.remove(key); throw t }
    }
    dir
  }
}
