package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The snapshot commit protocol's ATOMIC PRIMITIVES, extracted behind a
  * trait so the protocol itself ([[Snapshots]]) is deployment-portable.
  * Everything else the protocol touches — data files, manifests — is plain
  * write-once immutable-file I/O through Spark's own writers (already
  * store-agnostic); only the version POINTER, the commit LOCK, and the
  * consumer CURSORS need conditional/atomic semantics, and those differ
  * per store:
  *
  *  - **local POSIX** ([[LocalCommitStore]]): ATOMIC_MOVE rename for the
  *    pointer, O_CREAT|O_EXCL for the lock.
  *  - **HDFS-class** ([[HadoopCommitStore]]): `FileContext.rename(
  *    OVERWRITE)` (atomic in HDFS) for the pointer, `create(overwrite =
  *    false)` for the lock — the impl an `hdfs://` table path dispatches
  *    to, where `java.nio` would misparse the URI outright.
  *  - **S3-class object stores**: no atomic rename exists — a deployment
  *    implements this trait with conditional PUTs (If-None-Match /
  *    If-Match on the pointer object) or a coordination service (the
  *    DynamoDB discipline of Delta's S3 LogStore). [[MemoryCommitStore]]
  *    is exactly that shape — a compare-and-set pointer map — and the law
  *    suite runs the full snapshot protocol against it, proving the
  *    protocol relies on NOTHING stronger than conditional-PUT.
  *
  * Contract:
  *  - `swapPointer` is CONDITIONAL: verify the pointer still reads
  *    `expectedParent` (−1 = absent) and move it to `v` as one decision,
  *    else throw `ConcurrentModificationException`. (The filesystem impls
  *    check-then-rename; every [[Snapshots]] call site already serializes
  *    swaps under the commit lock, so the check cannot go stale between
  *    read and rename — the conditional contract is what an
  *    object-store impl must provide NATIVELY, since its lock can only be
  *    advisory.)
  *  - `tryLock` is atomic create-if-absent; `unlock` removes only the
  *    caller's own token; `lockAgeMs` drives stale-lock breaking.
  *  - `readCursor`/`writeCursor` are the checkpointed consumers' pointer
  *    twins (atomic replace; torn reads impossible).
  */
trait CommitStore {

  /** The committed version, or None for a not-yet-created table. */
  def readPointer(table: String): Option[Long]

  /** Conditionally move the pointer `expectedParent` → `v`; throws
    * `ConcurrentModificationException` when the pointer is elsewhere.
    */
  def swapPointer(table: String, expectedParent: Long, v: Long): Unit

  /** Ensure the table root exists (no-op where the store has no dirs). */
  def prepareTable(table: String): Unit

  /** Atomically create the commit lock holding `token`; false if held. */
  def tryLock(table: String, token: String): Boolean

  /** The token currently in the lock, or None when unheld. */
  def lockToken(table: String): Option[String]

  /** Milliseconds since the lock was created, or None when unheld. */
  def lockAgeMs(table: String): Option[Long]

  /** Force-remove the lock (stale-owner breaking only). */
  def breakLock(table: String): Unit

  /** Remove the lock iff it still holds `token`. */
  def unlock(table: String, token: String): Unit =
    if (lockToken(table).contains(token)) breakLock(table)

  /** A checkpointed consumer's last-processed version, or None. */
  def readCursor(path: String): Option[Long]

  /** Atomically advance a consumer cursor to `v`. */
  def writeCursor(path: String, v: Long): Unit
}

/** POSIX-local impl: the `java.nio` primitives (ATOMIC_MOVE pointer swap,
  * CREATE_NEW lock) the protocol originally hard-coded.
  */
object LocalCommitStore extends CommitStore {
  private def cur(table: String) = JPaths.get(s"$table/_current")
  private def lockP(table: String) = JPaths.get(s"$table/_commit_lock")

  def readPointer(table: String): Option[Long] = {
    val p = cur(table)
    if (JFiles.exists(p))
      Some(new String(JFiles.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def swapPointer(table: String, expectedParent: Long, v: Long): Unit = {
    val seen = readPointer(table).getOrElse(-1L)
    if (seen != expectedParent)
      throw new java.util.ConcurrentModificationException(
        s"snapshot commit conflict at $table: expected parent $expectedParent, found $seen")
    val tmp = JPaths.get(s"$table/_current.swap-$v")
    JFiles.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    JFiles.move(tmp, cur(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def prepareTable(table: String): Unit =
    JFiles.createDirectories(JPaths.get(table)): Unit

  def tryLock(table: String, token: String): Boolean =
    try {
      // POSIX O_CREAT|O_EXCL (CREATE_NEW) arbitrates atomically
      JFiles.write(lockP(table), token.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      true
    } catch { case _: java.io.IOException => false }

  def lockToken(table: String): Option[String] =
    try Some(new String(JFiles.readAllBytes(lockP(table)), StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => None }

  def lockAgeMs(table: String): Option[Long] =
    try Some(System.currentTimeMillis() -
      JFiles.getLastModifiedTime(lockP(table)).toMillis)
    catch { case _: java.io.IOException => None }

  def breakLock(table: String): Unit =
    try JFiles.deleteIfExists(lockP(table)): Unit
    catch { case _: java.io.IOException => () }

  def readCursor(path: String): Option[Long] = {
    val p = JPaths.get(path)
    if (JFiles.exists(p))
      Some(new String(JFiles.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def writeCursor(path: String, v: Long): Unit = {
    val p = JPaths.get(path)
    Option(p.getParent).foreach(JFiles.createDirectories(_))
    val tmp = JPaths.get(s"$path.swap")
    JFiles.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    JFiles.move(tmp, p,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }
}

/** Hadoop-FileSystem impl for `hdfs://`-class stores: pointer swap via
  * `FileContext.rename(OVERWRITE)` (atomic in HDFS; the `FileSystem` API
  * cannot overwrite-rename), lock via `create(overwrite = false)` (atomic
  * create-if-absent in HDFS). This is what a table path with a non-local
  * scheme dispatches to — `java.nio` would misparse the URI entirely.
  * NOT for S3-class stores, whose rename is copy+delete and whose create
  * is last-writer-wins: those need a conditional-PUT impl of the trait.
  */
final class HadoopCommitStore(conf: Configuration) extends CommitStore {
  private def fs(p: String): FileSystem = new Path(p).getFileSystem(conf)
  private def cur(table: String) = new Path(s"$table/_current")
  private def lockP(table: String) = new Path(s"$table/_commit_lock")

  private def readLong(f: FileSystem, p: Path): Option[Long] =
    try {
      val in = f.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  private def writeAtomic(f: FileSystem, tmp: Path, dst: Path, v: Long): Unit = {
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val q = f.makeQualified(tmp)
    val fc = FileContext.getFileContext(q.toUri, conf)
    fc.rename(q, f.makeQualified(dst), Options.Rename.OVERWRITE)
  }

  def readPointer(table: String): Option[Long] = readLong(fs(table), cur(table))

  def swapPointer(table: String, expectedParent: Long, v: Long): Unit = {
    val seen = readPointer(table).getOrElse(-1L)
    if (seen != expectedParent)
      throw new java.util.ConcurrentModificationException(
        s"snapshot commit conflict at $table: expected parent $expectedParent, found $seen")
    writeAtomic(fs(table), new Path(s"$table/_current.swap-$v"), cur(table), v)
  }

  def prepareTable(table: String): Unit =
    fs(table).mkdirs(new Path(table)): Unit

  def tryLock(table: String, token: String): Boolean =
    try {
      val out = fs(table).create(lockP(table), /* overwrite = */ false)
      try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  def lockToken(table: String): Option[String] =
    try {
      val f = fs(table)
      val in = f.open(lockP(table))
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  def lockAgeMs(table: String): Option[Long] =
    try Some(System.currentTimeMillis() -
      fs(table).getFileStatus(lockP(table)).getModificationTime)
    catch { case _: java.io.IOException => None }

  def breakLock(table: String): Unit =
    try fs(table).delete(lockP(table), false): Unit
    catch { case _: java.io.IOException => () }

  def readCursor(path: String): Option[Long] = readLong(fs(path), new Path(path))

  def writeCursor(path: String, v: Long): Unit = {
    val f = fs(path)
    val p = new Path(path)
    Option(p.getParent).foreach(f.mkdirs(_))
    writeAtomic(f, new Path(s"$path.swap"), p, v)
  }
}

/** In-memory conditional-PUT fake — the S3-shaped impl: the pointer is a
  * compare-and-set map entry (exactly a conditional PUT on the pointer
  * object), the lock a putIfAbsent with a creation stamp. Data files and
  * manifests still land on the real (local) filesystem — only the atomic
  * primitives are virtualized, which is precisely the object-store
  * deployment split. Test-facing: [[plantLock]] injects a foreign/stale
  * lock, [[forcePointer]] injects a lost pointer race.
  */
final class MemoryCommitStore extends CommitStore {
  private val pointers = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val cursors = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, (String, Long)]
  /** Count of conditional-PUT pointer swaps that hit the compare-and-set. */
  val swaps = new java.util.concurrent.atomic.AtomicLong(0L)

  def readPointer(table: String): Option[Long] = pointers.get(table)

  def swapPointer(table: String, expectedParent: Long, v: Long): Unit =
    synchronized { // the conditional PUT: compare and set as one decision
      val seen = pointers.getOrElse(table, -1L)
      if (seen != expectedParent)
        throw new java.util.ConcurrentModificationException(
          s"snapshot commit conflict at $table: expected parent $expectedParent, found $seen")
      pointers(table) = v
      swaps.incrementAndGet(): Unit
    }

  def prepareTable(table: String): Unit =
    JFiles.createDirectories(JPaths.get(table)): Unit // data/manifests are real files

  def tryLock(table: String, token: String): Boolean =
    locks.putIfAbsent(table, (token, System.currentTimeMillis())).isEmpty

  def lockToken(table: String): Option[String] = locks.get(table).map(_._1)

  def lockAgeMs(table: String): Option[Long] =
    locks.get(table).map(l => System.currentTimeMillis() - l._2)

  def breakLock(table: String): Unit = locks.remove(table): Unit

  def readCursor(path: String): Option[Long] = cursors.get(path)

  def writeCursor(path: String, v: Long): Unit = cursors(path) = v

  /** Inject a foreign lock, backdated by `ageMs` (0 = fresh). */
  def plantLock(table: String, token: String, ageMs: Long = 0L): Unit =
    locks(table) = (token, System.currentTimeMillis() - ageMs)

  /** Inject a lost pointer race (another writer won). */
  def forcePointer(table: String, v: Long): Unit = pointers(table) = v
}
