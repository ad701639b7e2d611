package graft.streaming

/** Restart-safe persisted state for foreachBatch monitors (the round-9
  * advisor's q252 finding, factored for the whole mergeable-state
  * family — q101 scalar aggs, q123 CDC upsert, q141 drift, q204
  * checksums, q228 percentiles, q252 CMS): state dirs are keyed BY
  * batchId (`<component>_<id>`), and "committed" means every component
  * dir carries its parquet `_SUCCESS` marker. Each batch merges from
  * the latest committed id STRICTLY below its own — a resumed run
  * re-derives its predecessor from disk (no driver-memory var to
  * lose on recovery), and a RETRIED batchId re-reads the same
  * predecessor and idempotently overwrites its own dirs (never the
  * dir it reads from — the parity-dir scheme this replaces could read
  * and overwrite the same directory on a retry). All ids are
  * retained — a retry of batch N must still find N−1 even after N
  * once committed; the footprint is (#batches × state size), and a
  * long-running production variant would GC ids < N−1 only once the
  * streaming checkpoint marks N durable.
  */
object BatchState {

  def dir(stateBase: String, component: String, id: Long): String =
    s"$stateBase/${component}_$id"

  /** All fully committed batch ids under `stateBase`, ascending. */
  def committedIds(stateBase: String, components: Seq[String]): Seq[Long] = {
    require(components.nonEmpty, "BatchState needs >= 1 component")
    val first = components.head
    Option(new java.io.File(stateBase).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(s"${first}_"))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix(s"${first}_").toLong).toOption)
      .filter(id => components.forall(c =>
        new java.io.File(s"${dir(stateBase, c, id)}/_SUCCESS").exists))
      .sorted.toSeq
  }

  /** The merge-from predecessor for (a possibly retried) `batchId`:
    * the latest committed id strictly below it, None for the first.
    */
  def prevId(stateBase: String, components: Seq[String],
             batchId: Long): Option[Long] =
    committedIds(stateBase, components).filter(_ < batchId).lastOption

  /** Read-time resolution: the latest fully committed id; loud error
    * (never a silent empty state) when nothing committed.
    */
  def lastId(stateBase: String, components: Seq[String],
             what: String): Long =
    committedIds(stateBase, components).lastOption.getOrElse(
      sys.error(s"$what: no committed state under $stateBase"))
}
