package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for a Hive-partitioned parquet dataset — the
  * maintenance operation every long-lived partitioned corpus needs: each
  * ingestion batch writes its own file into every `col=value` directory, so
  * after N batches a 100 TB lake holds N× more files than partitions and
  * every scan pays N× the open/footer/list cost (the classic small-file
  * problem table formats solve with OPTIMIZE; plain parquet solves it by
  * rewriting).
  *
  * Shape: read the dataset → `repartition` on the partition columns (plus
  * a content-hash salt when `filesPerDir > 1`, [[graft.ops.Salting]]'s
  * deterministic trick) so each output directory is written by exactly
  * `filesPerDir` tasks → write Hive-partitioned to a STAGING sibling →
  * atomically swap directories. The staging/swap is load-bearing: Spark
  * (correctly) refuses to overwrite a path that is also being read, and a
  * failed rewrite must leave the original dataset untouched — the swap
  * happens only after the staged write commits, so readers see the old
  * layout or the new one, never a partial one.
  *
  * Content fidelity (rows, schema, values) is checksum-graded in
  * CompactionSpec; file counts per directory are asserted before/after.
  *
  * Storage caveat: the swap relies on atomic directory rename — true on
  * POSIX filesystems and HDFS, NOT on object stores (S3 "rename" is
  * copy+delete). An object-store deployment runs the same staged rewrite
  * but commits by metastore partition-location swap or a table format's
  * transaction log (Iceberg/Delta OPTIMIZE), not by rename.
  */
object Compaction {

  /** Rewrite `path` (Hive-partitioned parquet) so every partition
    * directory holds `filesPerDir` files. Returns (filesBefore,
    * filesAfter) parquet data-file counts.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCols: Seq[String],
                         filesPerDir: Int = 1): (Long, Long) = {
    require(partitionCols.nonEmpty, "compactPartitioned needs partition columns")
    require(filesPerDir >= 1, s"filesPerDir=$filesPerDir")
    val before = countDataFiles(path)
    val df = spark.read.parquet(path)
    val parts = partitionCols.map(col)
    val keyed =
      if (filesPerDir == 1) df.repartition(parts: _*)
      else df.repartition(parts :+
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(filesPerDir)): _*)
    val staging = path.stripSuffix("/") + ".graft_compact_staging"
    deleteRecursively(Paths.get(staging))
    keyed.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(staging)
    // commit point: the staged dataset is complete — swap directories
    val target = Paths.get(path)
    val old = Paths.get(path.stripSuffix("/") + ".graft_compact_old")
    deleteRecursively(old)
    Files.move(target, old)
    try Files.move(Paths.get(staging), target)
    catch {
      case e: Throwable => // restore the original on a failed swap
        Files.move(old, target); throw e
    }
    deleteRecursively(old)
    (before, countDataFiles(path))
  }

  /** Parquet data files under `root` (excludes _SUCCESS/metadata). */
  def countDataFiles(root: String): Long = {
    val s = Files.walk(Paths.get(root))
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
