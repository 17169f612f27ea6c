package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] served from the generation FILE INDEX sidecar
  * (`_graft_files.jsonl` — [[DataSkipping.writeFileIndex]]): the commit
  * already cataloged every (partition, file, bytes) it wrote, so a V1
  * scan plans with ZERO directory listings — `spark.read.parquet` on the
  * same paths re-lists every directory per cold query (measured 5.8 s of
  * genuine listing at 16M rows / 50k partitions, TableBench `meta`; on
  * an object store that is 50k LIST requests per query). This completes
  * the catalog-don't-list discipline for the V1 composition; the batch
  * face ([[GraftBatchScan]]) already planned its splits from the index.
  *
  * Semantics are IDENTICAL to the listed read on an intact table (spec:
  * FileIndexSpec row/pruning parity). On a generation whose directory
  * was tampered with, the index is AUTHORITATIVE — files outside it are
  * outside the table, Iceberg's rule, now uniform across V1 and face
  * reads. Callers gate on index presence ([[GraftFileIndex.frameFor]]
  * returns None when any owned partition lacks index coverage) so an
  * absent or corrupt sidecar degrades to the live-listing path with
  * identical results.
  *
  * Partition values decode exactly as Spark's own discovery would:
  * hive-unescaped, with the default-partition sentinel as null, typed
  * [[StringType]] verbatim — [[AtomicCommit.readVerbatim]]'s contract.
  * File lengths come from the index (recorded from the stage-time walk;
  * generations are immutable, so they are exact — parquet footer reads
  * seek `length - 8`). [[sizeInBytes]] is the exact byte total, so plan
  * statistics (broadcast decisions) match the listed path's.
  */
private[graft] class GraftFileIndex(
    basePath: String,
    pc: String,
    layout: Seq[(String, Seq[(String, Long, Long)])],
    hadoopConf: org.apache.hadoop.conf.Configuration)
  extends FileIndex {

  override val partitionSchema: StructType =
    StructType(Seq(StructField(pc, StringType)))

  // QUALIFIED like InMemoryFileIndex's statuses (file:/... on local fs):
  // Dataset.inputFiles consumers and `_metadata.file_path` must see the
  // same rendering the listed path produces
  private val qualifiedBase: Path = {
    val p = new Path(basePath)
    p.getFileSystem(hadoopConf).makeQualified(p)
  }

  override def rootPaths: Seq[Path] = Seq(qualifiedBase)

  // one PartitionDirectory per partition, built once from driver
  // metadata: raw dir names decode through the same escape Spark's
  // discovery applies, so `day=a%2Fb` rows carry "a/b" and the default
  // partition carries null
  private val dirs: Seq[PartitionDirectory] = layout.map { case (raw, fs) =>
    val v: Any =
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else UTF8String.fromString(ExternalCatalogUtils.unescapePathName(raw))
    // mtime rides from the index so _metadata.file_modification_time
    // matches the listed read's answer — files are immutable once
    // published, so the stage-time reading is the true one
    PartitionDirectory(InternalRow(v), fs.map { case (name, bytes, mtime) =>
      new FileStatus(bytes, false, 0, GraftFileIndex.BlockSize, mtime,
        new Path(new Path(qualifiedBase, s"$pc=$raw"), name))
    }.toArray)
  }

  /** Partition pruning exactly as [[org.apache.spark.sql.execution
    * .datasources.PartitioningAwareFileIndex]] applies it: bind the
    * pushed partition filters to the one-column partition row and keep
    * the directories the predicate admits.
    */
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) dirs
    else {
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        })
      bound.initialize(0)
      dirs.filter(d => bound.eval(d.values))
    }

  override def inputFiles: Array[String] =
    dirs.iterator.flatMap(_.files.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // generations are immutable

  override val sizeInBytes: Long =
    layout.iterator.flatMap(_._2.iterator.map(_._2)).sum
}

private[graft] object GraftFileIndex {

  /** Advertised block size for index-backed statuses: never read back as
    * bytes (splits derive from file length and maxPartitionBytes), only
    * surfaced where a FileStatus is displayed.
    */
  private val BlockSize: Long = 128L * 1024 * 1024

  /** Footer schema per (root, generation): a generation's files share
    * one schema (written by one job — the [[AtomicCommit.probeParquet]]
    * invariant) and the generation is immutable, so the first indexed
    * file's footer is probed ONCE per generation per session, not per
    * scan construction.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), StructType]()

  /** None when no candidate file exists on disk — a physically-emptied
    * partition directory (a spec-style prune proof, or tampering) must
    * not break schema derivation any more than it broke
    * [[AtomicCommit.probeParquet]]'s walk; the caller then falls back to
    * the listing path, which owns the no-data error semantics.
    */
  private def footerSchema(spark: SparkSession, root: String, gen: String,
                           candidates: Iterator[String])
      : Option[StructType] = {
    val key = (root, gen)
    val hit = schemaMemo.get(key)
    if (hit != null) return Some(hit)
    candidates.find(p => java.nio.file.Files.exists(
        java.nio.file.Paths.get(p))).map { probe =>
      val fresh = spark.read.parquet(probe).schema
      if (schemaMemo.size > 1024) schemaMemo.clear()
      schemaMemo.put(key, fresh)
      fresh
    }
  }

  /** The index-backed replacement for one generation's
    * [[AtomicCommit.readVerbatim]] leg: Some(frame) when the generation
    * carries a file index covering EVERY requested partition (each with
    * at least one file), None to fall back to the listing path — absent
    * sidecar, corrupt sidecar (negative-cached by
    * [[DataSkipping.readFileIndex]]), or an owned partition the index
    * does not know (an inconsistency the live listing resolves, e.g. a
    * hand-built generation).
    *
    * `wanted`: raw partition dir value → file basenames to read, None =
    * all indexed files of that partition (the dir-granular plan);
    * Some(names) = exactly those (file-granular pruning —
    * [[DataSkipping.prunedScanPaths]] output, whose names come from this
    * same index, so membership holds by construction).
    */
  def frameFor(spark: SparkSession, root: String, gen: String, pc: String,
               wanted: Seq[(String, Option[Seq[String]])])
      : Option[DataFrame] = {
    if (wanted.isEmpty) return None
    DataSkipping.readFileIndex(root, gen).flatMap { ix =>
      val layout = wanted.map { case (raw, names) =>
        val all = ix.getOrElse(raw, Nil)
        raw -> (names match {
          case None => all
          case Some(ns) =>
            val want = ns.toSet
            all.filter { case (n, _, _) => want(n) }
        })
      }
      // every requested partition must be covered, file-granular
      // requests must resolve every name, and every selected file must
      // carry a real mtime (a pre-mtime index would answer
      // _metadata.file_modification_time with epoch-0 where the listed
      // read reports the true stamp) — else the index cannot serve this
      // read faithfully and the listing path decides
      val complete = layout.forall(_._2.nonEmpty) &&
        layout.forall(_._2.forall(_._3 > 0L)) &&
        wanted.forall { case (raw, names) =>
          names.forall(_.toSet.subsetOf(
            ix.getOrElse(raw, Nil).map(_._1).toSet))
        }
      if (!complete) None
      else {
        val base = s"$root/$gen"
        footerSchema(spark, root, gen, layout.iterator.map { case (raw, fs) =>
          s"$base/$pc=$raw/${fs.head._1}"
        }).map { footer =>
          val dataSchema = StructType(footer.fields.filterNot(_.name == pc))
          val rel = HadoopFsRelation(
            new GraftFileIndex(base, pc, layout,
              spark.sparkContext.hadoopConfiguration),
            StructType(Seq(StructField(pc, StringType))),
            dataSchema, None, new ParquetFileFormat, Map.empty)(spark)
          org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
            LogicalRelation(rel, isStreaming = false))
        }
      }
    }
  }
}
