package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** The ONE storage primitive [[AtomicCommit]]'s optimistic-concurrency
  * protocol actually needs: atomic whole-object create-if-absent of the
  * manifest. Everything else the protocol does to manifests (read the
  * current one, list versions, drop superseded ones) is ordinary
  * last-write-irrelevant metadata I/O — only the PUBLISH must be a
  * compare-and-swap, and "create version N+1 iff it does not exist" IS
  * that CAS (version numbers are the compared value).
  *
  * Factoring the primitive out makes the scope-honesty note in
  * [[AtomicCommit]] ("hard-link CAS is POSIX-only; object stores need a
  * conditional put") an implementation choice instead of a boundary:
  *
  *  - [[PosixManifestStore]] — write the full body to a temp file, then
  *    `Files.createLink` it into place. Hard-link creation is POSIX-atomic
  *    and fails EEXIST on an occupied name, and because the linked file is
  *    already fully written, no reader can observe a torn body. This is
  *    the HDFS-family implementation (HDFS `create` without overwrite
  *    gives the same contract).
  *  - [[InMemoryObjectStore]] — a flat key→bytes map whose `putIfAbsent`
  *    is the conditional put every major object store now exposes
  *    (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, Azure Blob
  *    `If-None-Match: *`): the object becomes visible atomically and
  *    wholly or not at all, there is no rename, and the keyspace is flat.
  *    The spec runs the ENTIRE commit protocol (racing writers, read-set
  *    conflicts, time travel) against it, proving the protocol's
  *    correctness depends on nothing POSIX — a real S3 store is this
  *    class with the map calls replaced by conditional-PUT/GET/LIST
  *    requests, no protocol change.
  *
  * Data files do NOT go through this interface in either deployment:
  * generation directories are written once by Spark tasks and never
  * mutated, which is exactly the write pattern object stores are good at.
  * Only the snapshot POINTER needs the CAS — the same split Iceberg makes
  * between data/manifest files and the catalog swap.
  */
trait ManifestStore {

  /** Atomically create `name` with the FULL `body` iff absent. Returns
    * true on the win; false if the name already exists (the CAS failure
    * signal — the caller re-reads and retries at the next version).
    * Readers must never observe a partially written body.
    */
  def putIfAbsent(name: String, body: Array[Byte]): Boolean

  /** Full body of `name`, or None if absent. */
  def get(name: String): Option[Array[Byte]]

  /** All object names currently in the store (manifests only — data
    * directories are not objects of this interface).
    */
  def list(): Seq[String]

  /** Remove `name` if present ([[AtomicCommit.vacuum]]'s manifest
    * pruning; idempotent).
    */
  def delete(name: String): Unit

  /** Drop implementation-private debris older than `cutoffMillis` (epoch
    * ms) — e.g. a crashed writer's temp file. No-op where the CAS leaves
    * none (object stores: an aborted conditional put leaves no object).
    */
  def vacuumTemps(cutoffMillis: Long): Unit = ()
}

/** POSIX/HDFS-family manifest store rooted at the table directory: the
  * hard-link create-if-absent [[AtomicCommit]] has always used, behind
  * the [[ManifestStore]] interface.
  */
final class PosixManifestStore(root: String) extends ManifestStore {
  private val TmpPrefix = "_graft_manifest.tmp_"

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root,
      TmpPrefix + java.util.UUID.randomUUID.toString.take(8))
    Files.write(tmp, body)
    try {
      // hard-link = atomic create-if-absent of a FULLY-WRITTEN manifest:
      // readers can never observe a partial body, and EEXIST is the CAS
      // failure signal
      Files.createLink(Paths.get(root, name), tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: FileAlreadyExistsException =>
        Files.delete(tmp)
        false
    }
  }

  override def get(name: String): Option[Array[Byte]] = {
    val p = Paths.get(root, name)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  override def list(): Seq[String] =
    Option(Paths.get(root).toFile.listFiles).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getName).toSeq

  override def delete(name: String): Unit =
    Files.deleteIfExists(Paths.get(root, name))

  /** A crash between tmp-write and link strands a temp file; age it out
    * like any other orphan.
    */
  override def vacuumTemps(cutoffMillis: Long): Unit =
    Option(Paths.get(root).toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(TmpPrefix) &&
        f.lastModified() < cutoffMillis)
      .foreach(f => Files.deleteIfExists(f.toPath))
}

/** A BRANCH of a manifest table as a pure NAME-TRANSLATING view of its
  * store: external manifest names (`_graft_manifest.vN.json`) map to a
  * branch-private namespace (`_graft_branch.<name>.vN.json`), so EVERY
  * existing commit/read/time-travel API runs against a branch unchanged —
  * a branch IS the table, seen through this view. Data generations are
  * shared (branches fork metadata, not bytes — the Iceberg/Nessie branch
  * model), which is why branched deployments must reclaim space through
  * [[AtomicCommit.vacuumBranched]]: a single-view vacuum cannot see the
  * generations other branches still reference.
  */
final class BranchStore(val underlying: ManifestStore,
                        val branch: String) extends ManifestStore {
  require(BranchStore.validName(branch), s"bad branch name: $branch")
  private val ext = "_graft_manifest."
  private val int = s"_graft_branch.$branch."
  private def toInternal(name: String): String =
    if (name.startsWith(ext)) int + name.stripPrefix(ext) else name
  private def toExternal(name: String): String =
    if (name.startsWith(int)) ext + name.stripPrefix(int) else name

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean =
    underlying.putIfAbsent(toInternal(name), body)
  override def get(name: String): Option[Array[Byte]] =
    underlying.get(toInternal(name))
  override def list(): Seq[String] =
    underlying.list().filter(_.startsWith(int)).map(toExternal)
  override def delete(name: String): Unit =
    underlying.delete(toInternal(name))
  override def vacuumTemps(cutoffMillis: Long): Unit =
    underlying.vacuumTemps(cutoffMillis)
}

object BranchStore {
  private[sources] val Prefix = "_graft_branch."

  def validName(name: String): Boolean =
    name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_')

  /** Branch names present in `store` (from their manifest namespaces). */
  def branches(store: ManifestStore): Seq[String] =
    store.list().filter(_.startsWith(Prefix))
      .map(_.stripPrefix(Prefix).takeWhile(_ != '.'))
      .distinct.sorted
}

/** Conditional-put object store, in memory: the exact visibility contract
  * of S3 `If-None-Match: *` (atomic whole-object create-if-absent, flat
  * keys, no rename, no partial reads). Used by the spec to prove the
  * commit protocol runs unchanged on object-store primitives; a cloud
  * deployment implements these four calls with the store's REST API.
  */
final class InMemoryObjectStore extends ManifestStore {
  private val objects = new ConcurrentHashMap[String, Array[Byte]]()

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean =
    objects.putIfAbsent(name, body.clone()) == null

  override def get(name: String): Option[Array[Byte]] =
    Option(objects.get(name)).map(_.clone())

  override def list(): Seq[String] = {
    val it = objects.keys()
    Iterator.continually(it).takeWhile(_.hasMoreElements)
      .map(_.nextElement()).toSeq
  }

  override def delete(name: String): Unit = objects.remove(name)
}
