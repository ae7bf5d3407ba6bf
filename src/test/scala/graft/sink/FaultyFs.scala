package graft.sink

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fault-injecting local filesystem for chaos-testing the rename-aside
  * and manifest-commit protocols: tests register it under the
  * `faulty://` scheme (`fs.faulty.impl`) and arm a predicate; the
  * FIRST matching rename/delete throws, leaving the on-disk state a
  * real crash at that instant would leave (the code under test stops
  * mid-protocol; nothing downstream runs). Predicates target exact
  * protocol paths (manifest version files, aside dirs, staging dirs)
  * so Spark's own committer renames under `_temporary` never trip
  * them. State is static because Hadoop caches FileSystem instances
  * per scheme and local-mode executors share the JVM. The one-shot
  * arm/disarm design assumes suites run SEQUENTIALLY in the forked
  * test JVM (sbt's forked default, testForkedParallel = false): two
  * suites arming concurrently would clobber each other's trigger.
  */
class FaultyFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultyFs.tripRename(src, dst))
      throw new java.io.IOException(s"INJECTED CRASH: rename $src -> $dst")
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    if (FaultyFs.tripDelete(p))
      throw new java.io.IOException(s"INJECTED CRASH: delete $p")
    super.delete(p, recursive)
  }

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
  // lazily via `new java.io.File(path.toUri)`, which rejects any scheme
  // but file:// — pre-fill default permissions so listFiles/
  // listLocatedStatus (used by ManifestTable.vacuum) never trigger it.
  private def sanitize(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    null, null, st.getPath)

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(sanitize)
  override def getFileStatus(f: Path): FileStatus =
    sanitize(super.getFileStatus(f))
}

object FaultyFs {
  @volatile private var renameTrigger: Option[(Path, Path) => Boolean] = None
  @volatile private var deleteTrigger: Option[Path => Boolean] = None
  @volatile private var skipLeft: Int = 0
  @volatile private var fired: Boolean = false

  /** Arm a one-shot crash on the (skip+1)-th rename matching `p`. */
  def armRename(p: (Path, Path) => Boolean, skip: Int = 0): Unit = synchronized {
    renameTrigger = Some(p); deleteTrigger = None; skipLeft = skip; fired = false
  }

  /** Arm a one-shot crash on the (skip+1)-th delete matching `p` —
    * `skip` distinguishes protocol steps that hit the same path twice
    * (e.g. the pre-swap "superseded aside" delete vs the post-swap
    * cleanup delete).
    */
  def armDelete(p: Path => Boolean, skip: Int = 0): Unit = synchronized {
    deleteTrigger = Some(p); renameTrigger = None; skipLeft = skip; fired = false
  }

  def disarm(): Unit = synchronized { renameTrigger = None; deleteTrigger = None }

  /** Did the armed fault actually fire? (Guards against vacuous tests
    * whose predicate never matched — a chaos test that injected
    * nothing proves nothing.)
    */
  def didFire: Boolean = fired

  private def tripRename(src: Path, dst: Path): Boolean = synchronized {
    renameTrigger.exists(_(src, dst)) && {
      if (skipLeft > 0) { skipLeft -= 1; false }
      else { fired = true; renameTrigger = None; true }
    }
  }
  private def tripDelete(p: Path): Boolean = synchronized {
    deleteTrigger.exists(_(p)) && {
      if (skipLeft > 0) { skipLeft -= 1; false }
      else { fired = true; deleteTrigger = None; true }
    }
  }
}
