package graft.sources

import org.apache.hadoop.fs.Path

/** Commit-lock seam for stores WITHOUT an atomic create-if-absent.
  *
  * The whole table protocol serializes on one primitive —
  * [[GraftTable.MetaIO.putIfAbsent]] (table-create lock and per-version
  * manifest lock). Local `file:` gets kernel O_CREAT|O_EXCL and HDFS
  * gets the NameNode-atomic `create(p, overwrite=false)`, but object
  * stores like vanilla s3a expose neither: a check-then-act emulation
  * would let BOTH racing writers "win" the commit and silently corrupt
  * the version chain. That is exactly the gap Hudi/Delta plug with
  * pluggable lock providers (DynamoDB locks, S3 conditional PUT).
  *
  * This trait is that plug point. On a scheme with no native atomic
  * create and no configured provider, writes now FAIL LOUDLY
  * (UnsupportedOperationException at the first commit attempt) instead
  * of racing unsafely — loud beats lucky.
  *
  * Contract: [[putIfAbsent]] must be linearizable per path — of all
  * concurrent callers for one path, exactly one returns true, and the
  * file content afterwards is that winner's. `exists`/`write` are the
  * table's own metadata IO (routed through the path's Hadoop
  * FileSystem); a provider built on an external lock service acquires
  * its lock, then uses them for the check and the write. A provider
  * built on a store-native conditional PUT may ignore them and perform
  * the conditional write itself.
  */
trait GraftLockProvider {
  /** Lower-case URI schemes this provider arbitrates (e.g. "s3a"). */
  def handles(scheme: String): Boolean

  /** Atomically create `p` with `content` iff absent; true iff THIS
    * caller created it.
    */
  def putIfAbsent(p: Path, content: String,
                  exists: Path => Boolean, write: (Path, String) => Unit): Boolean
}

/** Reference provider: arbitrates each path through one JVM-wide
  * compare-and-set, then double-checks the store (a table committed
  * before this provider existed must still refuse a duplicate commit).
  * The shape a real S3/DynamoDB provider implements against its
  * external store; in tests it proves the routing — racing writers on a
  * non-atomic-create filesystem still serialize, because the race is
  * decided by the CAS, not the filesystem.
  *
  * Scope caveat (why this is the TEST double, not a production
  * provider): the CAS lives in this JVM, so it only serializes writers
  * that share it — i.e. one driver's threads. Cross-driver safety needs
  * a store-backed implementation of the same contract.
  */
class InMemoryLockProvider(schemes: Set[String]) extends GraftLockProvider {
  private val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def handles(scheme: String): Boolean = schemes(scheme)

  override def putIfAbsent(p: Path, content: String,
                           exists: Path => Boolean,
                           write: (Path, String) => Unit): Boolean = {
    val key = p.toUri.toString
    if (!claimed.add(key)) false        // lost the in-flight race
    else if (exists(p)) false           // committed before we ever ran
    else
      // lock held: plain write is safe. But a FAILED write must release
      // the claim — otherwise the key stays claimed forever and every
      // later attempt for this version returns false with nothing
      // committed (a permanently wedged table). If the write partially
      // landed (exists is now true) the claim stands: ambiguous state
      // must not let a second writer in.
      try { write(p, content); true }
      catch { case t: Throwable =>
        if (!exists(p)) claimed.remove(key)
        throw t
      }
  }
}
