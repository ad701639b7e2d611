package graft.lake

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FileStatus, FileSystem, FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** An object-store-SHAPED Hadoop FileSystem for the sandbox: scheme
  * `mocks3`, bucket-qualified URIs (`mocks3://bucket/prefix/key`),
  * chroot-translated onto the local disk under
  * `<java.io.tmpdir>/graft-mocks3/<bucket>/`. Registering it
  * (`fs.mocks3.impl` in hadoopConfiguration) lets every lake/warehouse
  * code path run against object-store URIs UNCHANGED — which is the
  * point: the reference writes s3:// CSV
  * (/root/reference/dags/extract.py:114-129) and the one untested claim
  * in this repo's connector story was that `Lake` works when `path` is
  * a bucket URI instead of a local dir. LakeObjectStoreSpec drives
  * append → partition-pruned read → channel listing through this scheme
  * end to end.
  *
  * Hadoop instantiates one FileSystem per (scheme, authority), so each
  * bucket gets its own chroot — distinct buckets cannot see each
  * other's objects. Paths are translated INTO the chroot on the way
  * down and back OUT on every returned FileStatus (the part a naive
  * RawLocalFileSystem subclass gets wrong: the committer re-lists what
  * it wrote and must see bucket URIs, not local paths).
  *
  * Sandbox stand-in for s3a:// (zero egress here); on a real cluster
  * the same graft code takes `s3a://bucket/...` with hadoop-aws on the
  * classpath — no code changes, exactly like this mock.
  */
class MockObjectStoreFileSystem extends FileSystem {

  private val local = new RawLocalFileSystem
  private var fsUri: URI = URI.create("mocks3:///")
  private var chroot: Path = _
  private var cwd: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
    val bucket = Option(name.getAuthority).getOrElse("_nobucket")
    fsUri = URI.create(s"mocks3://$bucket")
    val root = new File(new File(
      System.getProperty("java.io.tmpdir"), "graft-mocks3"), bucket)
    root.mkdirs() // the bucket exists from first use (S3 semantics)
    chroot = new Path(root.getAbsolutePath)
    cwd = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "mocks3"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = { cwd = dir }

  /** mocks3://bucket/a/b -> file-space <chroot>/a/b */
  private def down(p: Path): Path = {
    val rel = makeQualified(p).toUri.getPath.stripPrefix("/")
    if (rel.isEmpty) chroot else new Path(chroot, rel)
  }

  /** file-space <chroot>/a/b -> mocks3://bucket/a/b */
  private def up(p: Path): Path = {
    val full = p.toUri.getPath
    val base = chroot.toUri.getPath
    val rel = full.stripPrefix(base).stripPrefix("/")
    new Path(s"$fsUri/$rel")
  }

  private def upStatus(st: FileStatus): FileStatus = {
    st.setPath(up(st.getPath))
    st
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(down(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    local.create(down(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    local.append(down(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(down(src), down(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(down(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(down(f)).map(upStatus)

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(down(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    upStatus(local.getFileStatus(down(f)))
}
