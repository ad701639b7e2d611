package graft.util

/** Per-process scratch paths. The lake/warehouse mains and q35 write
  * (and recursively delete) real directories under java.io.tmpdir; a
  * fixed shared name would let two concurrent runs on one host clobber
  * each other's state mid-query, so every path is suffixed with a
  * JVM-unique token.
  *
  * The token is pid + JVM start millis, NOT the pid alone: containers
  * recycle PIDs fast enough that two Verify runs minutes apart can land
  * on the same pid, and a streaming parquet sink APPENDS — a recycled
  * pid would silently merge a stale run's committed files into the new
  * run's read (observed: q128 reading 110k rows from a 10k feed because
  * a dead sf0.1 run had left its sink dir under the same pid suffix).
  */
object TmpDirs {
  private val jvmToken: String = {
    val ph = ProcessHandle.current()
    val start = ph.info().startInstant()
      .map[Long](_.toEpochMilli).orElse(System.currentTimeMillis())
    s"${ph.pid()}-$start"
  }

  def perProcess(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$name-$jvmToken"
}
