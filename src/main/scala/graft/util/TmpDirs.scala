package graft.util

/** Per-process scratch paths. The lake/warehouse mains and q35 write
  * (and recursively delete) real directories under java.io.tmpdir; a
  * fixed shared name would let two concurrent runs on one host clobber
  * each other's state mid-query, so every path is suffixed with the PID.
  */
object TmpDirs {
  def perProcess(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$name-${ProcessHandle.current().pid()}"
}
