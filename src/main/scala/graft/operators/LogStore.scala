package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic commit-claim seam of the table format — the
  * object-store story.
  *
  * [[TableLog.commit]]'s whole optimistic-concurrency protocol
  * reduces to ONE primitive: atomically publish a COMPLETE log entry
  * at the version's path iff nothing exists there. Filesystems differ
  * wildly in what they can promise for that primitive — POSIX gives
  * hard links, HDFS gives an exclusive namenode create, S3-class
  * object stores historically give NOTHING (their Hadoop connectors
  * implement `create(overwrite = false)` as existence-check-then-PUT,
  * a race window in which two writers both claim version N and one
  * silently loses its commit). Delta Lake's pluggable LogStore — and
  * its DynamoDB-coordinated S3 mode — is the public precedent: the
  * claim is a seam, not a hard-coded filesystem call, and a store
  * that cannot honor the contract is REFUSED rather than silently
  * trusted. (The reference gets this for free from DynamoDB's
  * conditional writes — consumer.py's dedup put is a conditional
  * `attribute_not_exists`; this seam is that guarantee generalized
  * to the log.)
  */
trait LogStore {
  /** Publish `body` at `p` iff nothing exists there.
    *
    * Returns true when THIS call created the complete entry — the
    * version is claimed; false when an entry already existed — the
    * caller lost the race and must re-read the log and retry at the
    * next version.
    *
    * CONTRACT (what "atomic" means here):
    *  1. Two concurrent claims of one path never both return true.
    *  2. A true return implies the FULL body is visible to every
    *     subsequent reader — an entry is either absent or complete,
    *     never half-written.
    * An implementation that cannot honor both must not be registered;
    * [[LogStore.forScheme]] refuses known-non-atomic schemes instead
    * of guessing. */
  def putIfAbsent(f: FileSystem, p: Path, body: Array[Byte]): Boolean
}

/** POSIX/local claim: write the full body to a temp file, publish
  * with a hard link — link(2) is atomic create-if-absent WITH
  * content, so the entry is either absent or complete. */
object PosixLinkLogStore extends LogStore {
  override def putIfAbsent(f: FileSystem, p: Path,
                           body: Array[Byte]): Boolean = {
    val dst = java.nio.file.Paths.get(p.toUri.getPath)
    java.nio.file.Files.createDirectories(dst.getParent)
    val tmp = dst.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp, body)
    try {
      try { java.nio.file.Files.createLink(dst, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

/** HDFS-class claim: `create(overwrite = false)` is an exclusive
  * namenode operation; content is visible at close. Only the CREATE
  * doubles as the race signal — a failure AFTER it is a write failure
  * that would leave a partial entry behind (zero-length: every later
  * commit livelocks retrying this version; non-empty: every reader
  * fails on it), so it is best-effort deleted and surfaced, never
  * retried as if the version race were lost. */
object ExclusiveCreateLogStore extends LogStore {
  override def putIfAbsent(f: FileSystem, p: Path,
                           body: Array[Byte]): Boolean = {
    val created =
      try Some(f.create(p, false))
      catch {
        // the explicit already-exists signal IS the lost race
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
        case _: java.nio.file.FileAlreadyExistsException => None
        // any other IOException is ambiguous: re-check existence —
        // the entry being there means a racer won; absent means the
        // STORE failed, and swallowing it would turn a persistent
        // outage into 64 silent "lost the race" retries ending in a
        // misleading version-race error instead of the real failure
        case e: java.io.IOException =>
          val exists = try f.exists(p) catch { case _: Throwable => false }
          if (exists) None
          else throw new java.io.IOException(
            s"LogStore: exclusive create of $p failed and the path " +
              "does not exist — a store I/O failure, not a version race",
            e)
      }
    created match {
      case None => false
      case Some(out) =>
        try { out.write(body); out.close(); true }
        catch { case e: java.io.IOException =>
          try out.close() catch { case _: Throwable => () }
          try f.delete(p, false) catch { case _: Throwable => () }
          throw new java.io.IOException(
            s"LogStore: entry write failed after exclusive create of " +
              s"$p (partial entry removed)", e)
        }
    }
  }
}

/** Single-DRIVER claim for stores with only last-writer-wins
  * overwrite semantics: a JVM-wide mutex serializes the
  * existence-check-then-write, so claims from THIS driver can never
  * double-claim — Delta's historical S3SingleDriverLogStore answer.
  * The guarantee is exactly as wide as the mutex: ONE driver JVM.
  * Two drivers writing one table still race; that deployment needs a
  * coordinated store (conditional-put / lock-service backed).
  * Register explicitly — opting into the single-writer caveat must be
  * a deployment decision, never a default. */
object SingleDriverLogStore extends LogStore {
  private val lock = new Object
  override def putIfAbsent(f: FileSystem, p: Path,
                           body: Array[Byte]): Boolean = lock.synchronized {
    if (f.exists(p)) false
    else {
      // a write failure AFTER create would leave a partial entry that
      // claims the version forever (every later putIfAbsent sees it
      // exists, every reader fails on it) — best-effort delete and
      // surface, exactly like ExclusiveCreateLogStore
      val out = f.create(p, true)
      try { out.write(body); out.close(); true }
      catch { case e: java.io.IOException =>
        try out.close() catch { case _: Throwable => () }
        try f.delete(p, false) catch { case _: Throwable => () }
        throw new java.io.IOException(
          s"LogStore: entry write failed after single-driver claim of " +
            s"$p (partial entry removed)", e)
      }
    }
  }
}

object LogStore {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** Schemes whose stock Hadoop connectors provide NO atomic
    * create-if-absent: `create(overwrite = false)` is
    * existence-check-then-PUT, so two writers can both claim a
    * version and one silently loses. Refused unless the deployment
    * registers a store that brings its own coordination. */
  private val KnownNonAtomic =
    Set("s3", "s3a", "s3n", "oss", "cos", "swift", "gs")

  /** Install (or replace) the claim store for a scheme — the
    * deployment hook for object stores: an S3 installation registers
    * a conditional-put or lock-service backed store here, exactly as
    * Delta configures its LogStore class per scheme. */
  def register(scheme: String, store: LogStore): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), store)

  /** The claim store for a path's scheme: an explicit registration
    * wins; `file`/no-scheme claims via hard links; a known-non-atomic
    * object-store scheme REFUSES loudly (a silently lost commit is
    * the one failure a table format must never risk); everything else
    * (hdfs, viewfs, custom test schemes) claims via exclusive create,
    * the documented assumption being that the filesystem's
    * `create(overwrite = false)` is genuinely exclusive. */
  def forScheme(scheme: String): LogStore = {
    val key = Option(scheme).map(_.toLowerCase(java.util.Locale.ROOT))
    key.flatMap(k => Option(registry.get(k))) match {
      case Some(store) => store
      case None =>
        if (key.isEmpty || key.contains("file")) PosixLinkLogStore
        else if (KnownNonAtomic(key.get)) sys.error(
          s"TableLog: scheme '${key.get}' has no atomic create-if-absent " +
            "— two writers could both claim one version and one would " +
            "silently lose its commit. Register a coordinated LogStore " +
            "for this scheme (LogStore.register) — conditional-put or " +
            "lock-service backed — or SingleDriverLogStore if exactly " +
            "one driver JVM ever writes this table.")
        else ExclusiveCreateLogStore
    }
  }
}
