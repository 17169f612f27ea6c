package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based two-phase commit over plain parquet — the atomic
  * multi-partition publish [[IncrementalUpsert]] and [[Compaction]]
  * document as their open crash window. Their dynamic-partition-overwrite
  * commit replaces touched partitions one rename at a time, so a crash
  * mid-commit exposes a half-refreshed snapshot. Here the snapshot IS the
  * manifest, and the manifest flips in ONE atomic rename:
  *
  *   - Data layout: every commit writes its rows (partitioned by the
  *     table's partition column) under a fresh generation directory
  *     `root/g<version>_<uuid>/<col>=<value>/…`. Existing generations are
  *     IMMUTABLE — a writer never touches a directory a reader could hold.
  *   - The manifest `root/_graft_manifest.json` maps each live partition
  *     VALUE to the generation directory that owns it. Readers resolve the
  *     manifest once (driver-side, O(#partitions) — the same metadata
  *     scale as a table format's snapshot file) and scan only owned dirs.
  *   - Publish = write `_graft_manifest.tmp_<uuid>`, fsync, then
  *     `Files.move(..., ATOMIC_MOVE)` onto the manifest path. A crash
  *     BEFORE the move leaves the old snapshot fully intact (staged data
  *     is invisible — no reader follows unreferenced directories); a crash
  *     AFTER the move is a completed commit. There is no in-between, which
  *     is exactly the property the per-partition rename commit lacks.
  *   - Superseded generations stay on disk (snapshot-isolated readers may
  *     still be scanning them) until [[vacuum]] drops directories the
  *     current manifest no longer references.
  *
  * Scope honesty: ATOMIC_MOVE is a POSIX/HDFS primitive; object stores
  * need a catalog/conditional-put swap instead (Iceberg's metadata
  * pointer). Concurrency is single-writer (last rename wins) — optimistic
  * version-check-and-retry needs a compare-and-swap the plain filesystem
  * API doesn't offer. Both are the standard table-format trade, stated
  * rather than hidden.
  */
object AtomicCommit {

  private val ManifestName = "_graft_manifest.json"

  final case class Manifest(version: Long, partitionCol: String,
                            entries: Map[String, String])

  /** Two-phase commit: stage `df` as a new generation, then atomically
    * publish a manifest where the partitions PRESENT IN `df` point at the
    * new generation and all others keep their current owner (the
    * replace-partitions semantic of dynamic overwrite, made atomic).
    * Returns the published version.
    */
  def commitReplacePartitions(spark: SparkSession, root: String,
                              df: DataFrame, partitionCol: String): Long = {
    val staged = stage(spark, root, df, partitionCol)
    publish(root, staged)
  }

  /** Phase 1 (exposed for the crash-window spec): write the generation
    * directory and return the manifest that WOULD be published. No reader
    * can observe anything until [[publish]] renames the manifest.
    */
  def stage(spark: SparkSession, root: String, df: DataFrame,
            partitionCol: String): Manifest = {
    val prev = readManifest(root)
    require(prev.forall(_.partitionCol == partitionCol),
      s"table at $root is partitioned by ${prev.get.partitionCol}, not $partitionCol")
    val version = prev.map(_.version + 1).getOrElse(1L)
    val gen = f"g$version%05d_${java.util.UUID.randomUUID.toString.take(8)}"
    df.repartition(col(partitionCol)) // one writing task per partition dir
      .write.mode("error").partitionBy(partitionCol)
      .parquet(s"$root/$gen")
    // partition values actually written = the gen dir's <col>=<v> children
    val written = partitionDirs(Paths.get(root, gen), partitionCol)
    val merged = prev.map(_.entries).getOrElse(Map.empty) ++
      written.map(_ -> gen).toMap
    Manifest(version, partitionCol, merged)
  }

  /** Phase 2: one atomic rename makes `m` the snapshot. */
  def publish(root: String, m: Manifest): Long = {
    val tmp = Paths.get(root,
      s"_graft_manifest.tmp_${java.util.UUID.randomUUID.toString.take(8)}")
    Files.write(tmp, renderJson(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    m.version
  }

  /** Snapshot read: resolve the manifest once, scan only owned partition
    * directories. Each generation is read with its own basePath so the
    * partition column survives; per-partition DataFrames union by name
    * (all generations share the table schema).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val m = readManifest(root).getOrElse(
      sys.error(s"no $ManifestName at $root — not an AtomicCommit table"))
    // group by generation: one multi-path read per generation, not per
    // partition (driver work and file-listing stay O(#generations))
    val byGen = m.entries.groupBy(_._2).toSeq.sortBy(_._1)
    byGen.map { case (gen, parts) =>
      val base = s"$root/$gen"
      val paths = parts.keys.toSeq.sorted.map(v => s"$base/${m.partitionCol}=$v")
      spark.read.option("basePath", base).parquet(paths: _*)
    }.reduce(_.unionByName(_))
  }

  /** Drop generation directories the current manifest no longer
    * references. Returns the deleted directory names. Safe against
    * readers only after their snapshots age out — the caller picks the
    * retention moment, exactly as table-format vacuums do.
    */
  def vacuum(root: String): Seq[String] = {
    val m = readManifest(root).getOrElse(return Nil)
    val live = m.entries.values.toSet
    val rootPath = Paths.get(root)
    val doomed = Option(rootPath.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("g") && !live(f.getName))
      .map(_.getName).toSeq.sorted
    doomed.foreach(d => deleteRecursively(rootPath.resolve(d)))
    doomed
  }

  def readManifest(root: String): Option[Manifest] = {
    val p = Paths.get(root, ManifestName)
    if (!Files.exists(p)) None
    else Some(parseJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  private def partitionDirs(gen: Path, partitionCol: String): Seq[String] = {
    val prefix = s"$partitionCol="
    Option(gen.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix)).toSeq.sorted
  }

  // hand-rolled JSON (build.sbt pins the dependency set): keys are
  // partition values and generation names — escape the two JSON-breaking
  // characters; control chars can't appear in either by construction
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def renderJson(m: Manifest): String = {
    val entries = m.entries.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"version":${m.version},"partitionCol":"${esc(m.partitionCol)}","entries":{$entries}}"""
  }
  private def parseJson(s: String): Manifest = {
    val version = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong).getOrElse(sys.error(s"bad manifest: $s"))
    val partitionCol = """"partitionCol"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(s).map(m => unesc(m.group(1)))
      .getOrElse(sys.error(s"bad manifest: $s"))
    val entriesBlob = """"entries"\s*:\s*\{(.*)\}""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse(sys.error(s"bad manifest: $s"))
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val entries = entry.findAllMatchIn(entriesBlob)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    Manifest(version, partitionCol, entries)
  }
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
