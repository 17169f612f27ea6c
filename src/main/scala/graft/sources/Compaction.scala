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
  * swap directories. The staging is load-bearing: Spark (correctly)
  * refuses to overwrite a path that is also being read, and a failed
  * REWRITE leaves the original dataset untouched — the swap runs only
  * after the staged write commits. The swap itself is TWO renames
  * (`path`→`.old`, staging→`path`): plain filesystems expose no atomic
  * directory exchange from Java, so there is a crash window in which
  * `path` is briefly absent while both complete copies exist on disk.
  * [[compactPartitioned]] self-heals that window on its next invocation
  * (restores `.old` when `path` is missing), and a concurrent READER
  * during the swap must tolerate one listing retry. Run it as the
  * dataset's exclusive writer, like any maintenance rewrite.
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
    * directory holds AT MOST `filesPerDir` files — the salt values that
    * spread a directory across writers are themselves hash-assigned to
    * tasks, so two salts can land in one task and produce fewer, larger
    * files (the compaction goal is an upper bound on file count, which
    * hash collisions only help). Returns (filesBefore, filesAfter)
    * parquet data-file counts.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCols: Seq[String],
                         filesPerDir: Int = 1): (Long, Long) = {
    require(partitionCols.nonEmpty, "compactPartitioned needs partition columns")
    require(filesPerDir >= 1, s"filesPerDir=$filesPerDir")
    // self-heal a prior run that crashed inside the two-rename swap
    // window: the data then lives only at `.graft_compact_old`
    val oldPath = Paths.get(path.stripSuffix("/") + ".graft_compact_old")
    if (!Files.exists(Paths.get(path)) && Files.exists(oldPath))
      Files.move(oldPath, Paths.get(path))
    val before = countDataFiles(path)
    // verbatim-partition read for the rewrite (user-specified schema, the
    // [[AtomicCommit.readVerbatim]] discipline generalized to multiple
    // partition columns): inference would canonicalize partition VALUES
    // (month=01 would be read as int 1 and rewritten as month=1 — renamed
    // directories, broken string filters). Declared as strings, values
    // round-trip verbatim; the compacted dataset's next reader infers
    // exactly what it inferred before.
    val dataSchema =
      spark.read.parquet(AtomicCommit.probeParquet(Seq(path))).schema
    val full = org.apache.spark.sql.types.StructType(
      dataSchema.fields.filterNot(f => partitionCols.contains(f.name)) ++
        partitionCols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(full).parquet(path)
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

  /** Compaction for an [[AtomicCommit]] table — the windowless form of
    * [[compactPartitioned]]: the compacted rows stage as ONE new
    * generation owning every partition (the `filesPerDir` split happens
    * INSIDE [[AtomicCommit.stage]], so the keyed write that lands on disk
    * is the one that honors it), and the manifest flips via the hard-link
    * CAS — a crash anywhere leaves the previous fragmented-but-complete
    * snapshot current, and a concurrent upsert committed between this
    * rewrite's read and its publish aborts it with
    * [[AtomicCommit.PartitionConflictException]] instead of being silently
    * un-written (the read-set check; re-run the compaction). No rename
    * window, no self-heal path. The superseded fragments are NOT deleted
    * here by default — snapshot-isolated readers may still be scanning
    * them, and retention timing is [[AtomicCommit.vacuum]]'s contract with
    * the caller; pass `vacuumNow = true` only when no concurrent reader
    * can hold a pre-compaction snapshot. Returns (filesBefore, filesAfter)
    * data files reachable through the respective manifests.
    */
  def compactAtomicTable(spark: SparkSession, root: String,
                         filesPerDir: Int = 1,
                         vacuumNow: Boolean = false,
                         statsCols: Seq[String] = Nil): (Long, Long) =
    compactAtomicTable(spark, root, new PosixManifestStore(root),
      filesPerDir, vacuumNow, statsCols)

  /** [[compactAtomicTable]] against an explicit [[ManifestStore]]
    * (object-store deployments — the same split every other commit path
    * offers). `vacuumNow` still drives the POSIX-side directory cleanup.
    */
  def compactAtomicTable(spark: SparkSession, root: String,
                         store: ManifestStore, filesPerDir: Int,
                         vacuumNow: Boolean,
                         statsCols: Seq[String]): (Long, Long) = {
    require(filesPerDir >= 1, s"filesPerDir=$filesPerDir")
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"$root is not an AtomicCommit table"))
    val before = countAtomicDataFiles(root, store)
    // the scan AND the staged read-set both resolve through `m`: a commit
    // landing mid-rewrite is guaranteed to conflict the publish (its rows
    // are not in this rewrite), never to be silently folded away
    val df = AtomicCommit.scanManifest(spark, root, m)
    // the rewrite's generation replaces every old one, so any skipping
    // evidence dies with them — statsCols re-annotates the compacted
    // generation (a compaction should never LOSE read performance)
    val staged = dropEmptied(AtomicCommit.stage(spark, root, store, df,
      m.partitionCol, filesPerDir, Some(m)), m, m.entries.keySet)
    if (statsCols.nonEmpty)
      DataSkipping.annotateStaged(spark, root, staged, statsCols)
    AtomicCommit.publish(root, store, staged)
    if (vacuumNow) AtomicCommit.vacuum(root, store, AtomicCommit.OrphanRetentionMillis, 1)
    (before, countAtomicDataFiles(root, store))
  }

  /** Fold FULLY-EMPTIED partitions out of a rewrite: a partition the
    * anchor names (within `scope`) but the live scan staged no rows for
    * has every row deleted — a zero-scan equality delete cannot know
    * that at delete time, so without this a "full" rewrite would leave
    * the dead entry (old bytes + deletion vector) behind forever. The
    * drop rides the same commit and joins the read set (`baseOwners`),
    * so a concurrent write to the emptied partition still conflicts the
    * publish instead of being silently dropped.
    */
  private def dropEmptied(staged: AtomicCommit.Staged,
                          anchor: AtomicCommit.Manifest,
                          scope: Set[String]): AtomicCommit.Staged = {
    val emptied = (scope -- staged.partitions).toSeq.sorted
    if (emptied.isEmpty) staged
    else staged.copy(
      drops = (staged.drops ++ emptied).distinct,
      baseOwners = staged.baseOwners ++
        emptied.flatMap(p => anchor.entries.get(p).map(p -> _)))
  }

  /** Targeted deletion-vector purge — the MAINTENANCE half of the
    * merge-on-read bargain: [[Deletes.deleteWhereMoR]] keeps point
    * deletes O(deleted rows), and every vectored partition pays one
    * broadcast anti-join per read until something rewrites it. A full
    * [[compactAtomicTable]] purges every vector but costs O(table);
    * this rewrites ONLY partitions whose vector marks at least
    * `threshold` of their rows (marked / (marked + live), per
    * partition) — the Delta PURGE / Iceberg rewrite-position-deletes
    * policy, at O(dirty partitions). Vectors below the threshold stay
    * (their read-side cost is proportionally small); rewritten
    * partitions come back as clean single-owner entries with fresh
    * `statsCols` evidence. Read set anchored at the scanned manifest —
    * concurrent commits to a selected partition abort the purge (re-run
    * it). Returns the partition values rewritten.
    */
  def purgeVectors(spark: SparkSession, root: String,
                   threshold: Double = 0.1,
                   statsCols: Seq[String] = Nil): Seq[String] =
    purgeVectors(spark, root, new PosixManifestStore(root), threshold,
      statsCols)

  def purgeVectors(spark: SparkSession, root: String, store: ManifestStore,
                   threshold: Double, statsCols: Seq[String]): Seq[String] = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold=$threshold")
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"$root is not an AtomicCommit table"))
    val pc = m.partitionCol
    val vectored = m.entries.filter { case (_, e) => AtomicCommit.dvOf(e).nonEmpty }
    if (vectored.isEmpty) return Nil
    // Hive-layout key mapping: entry keys are RAW dir names, while
    // `__dv_partition` and row values are DECODED (the null partition's
    // rows decode to null) — every probe and every collected key maps
    // through the escape, or escaped/null partitions silently never purge
    def rawOf(decoded: String): String =
      if (decoded == null) GraftRelation.NullPartitionName
      else GraftRelation.dirNameOf(decoded)
    // live rows per partition, one merged scan of the vectored slice
    val live: Map[String, Long] = AtomicCommit.scanManifest(spark, root,
        m.copy(entries = vectored))
      .groupBy(col(pc).cast("string").as("__p")).count().collect()
      .map(r => rawOf(r.getString(0)) -> r.getLong(1)).toMap
    // DELETED rows per partition. Exact whenever the stats sidecars carry
    // complete physical counts (physical − live covers position AND
    // equality vectors, zero extra I/O); else counted from the position
    // parquet — each entry's CURRENT vector, addresses into current
    // owners only (stale rows screened). On that fallback an
    // equality-only vector generation carries no parquet (the zero-scan
    // delete writes only `_graft_eq.jsonl`) and contributes zero marks —
    // under-selection, never a crash.
    val marked: Map[String, Long] = TableStats.partitionRows(root, m) match {
      case Some(physical) =>
        vectored.keys.map(p => p -> math.max(0L,
          physical.getOrElse(p, 0L) - live.getOrElse(p, 0L))).toMap
      case None => vectored.toSeq
        .flatMap { case (p, e) =>
          AtomicCommit.dvOf(e).map(d => (d, p, AtomicCommit.ownersOf(e))) }
        .groupBy(_._1).toSeq.flatMap { case (dvGen, group) =>
          if (!AtomicCommit.hasParquetFiles(s"$root/$dvGen")) Nil
          else {
            val byRaw = group.map(g => g._2 -> g._3).toMap
            spark.read.parquet(s"$root/$dvGen")
              .filter(GraftRelation.rawKeyProbe(col("__dv_partition"),
                group.map(_._2)))
              .groupBy("__dv_partition", "__dv_owner").count().collect().toSeq
              .filter(r => byRaw.get(rawOf(r.getString(0)))
                .exists(_.contains(r.getString(1))))
              .groupBy(r => rawOf(r.getString(0)))
              .map { case (p, rs) => p -> rs.map(_.getLong(2)).sum }
          }
        }.toMap
    }
    val selected = vectored.keys.toSeq.sorted.filter { p =>
      val mk = marked.getOrElse(p, 0L).toDouble
      mk > 0 && mk / (mk + live.getOrElse(p, 0L)) >= threshold
    }
    if (selected.isEmpty) return Nil
    val allDead = selected.forall(p => live.getOrElse(p, 0L) == 0L)
    val staged = dropEmptied(
      if (allDead)
        // every selected partition is fully deleted — the drop-only
        // commit shape (no generation staged; casLoop sanctions it)
        AtomicCommit.Staged("", pc, Nil, m.version, Map.empty)
      else AtomicCommit.stage(spark, root, store,
        AtomicCommit.scanManifest(spark, root, m.copy(entries =
          m.entries.filter { case (p, _) => selected.contains(p) })),
        pc, 1, Some(m)),
      m, selected.toSet)
    if (statsCols.nonEmpty)
      DataSkipping.annotateStaged(spark, root, staged, statsCols)
    AtomicCommit.publish(root, store, staged)
    selected
  }

  /** Sort-order maintenance rewrite for an [[AtomicCommit]] table — the
    * OPTIMIZE-with-sort-order of the table formats, and the repair
    * [[compactAtomicTable]] cannot perform: compaction folds generations
    * but PRESERVES row placement, so a table ingested in arrival order
    * keeps every partition's files spanning the full value range and
    * [[DataSkipping]]'s min/max prove nothing (TableBench measures that
    * layout at 2.5× slower range reads and 27× slower deletes than a
    * clustered one at 16M rows).
    *
    * What reclustering CAN and CANNOT buy: partition VALUES are data — a
    * row's `lang=de` is a fact, not a layout choice — so no rewrite moves
    * rows between partition directories or invents a partitioning the
    * data doesn't carry. The repairable axis is WITHIN each partition:
    * rows are globally range-distributed and sorted on
    * (partitionCol, sortCols), so each partition directory lands as
    * `filesPerDir` files each owning a narrow `sortCols` range, and the
    * regenerated FILE-granular stats sidecar ([[DataSkipping]]'s r13
    * `file` records) lets `readWhere` scan ~1 of `filesPerDir` files per
    * partition instead of all of them — the partition-skipping story,
    * repeated one level down. Where the partition column CORRELATES with
    * `sortCols`, partition-envelope pruning tightens too (each
    * partition's envelope shrinks to its true range).
    *
    * Mechanics: one `repartitionByRange(P × filesPerDir)` shuffle +
    * in-task sort, staged through [[AtomicCommit.stageKeyed]] (which
    * preserves the layout instead of re-keying it), fresh min/max
    * sidecar, manifest flip anchored at the pre-rewrite snapshot — a
    * commit landing mid-recluster aborts THIS rewrite with
    * [[AtomicCommit.PartitionConflictException]] (re-run it), never the
    * other way around, and time travel to the pre-recluster version keeps
    * working until vacuum. Returns (filesBefore, filesAfter).
    */
  def recluster(spark: SparkSession, root: String, sortCols: Seq[String],
                filesPerDir: Int = 1,
                statsCols: Seq[String] = Nil,
                bloomCols: Seq[String] = Nil): (Long, Long) = {
    require(sortCols.nonEmpty, "recluster needs at least one sort column")
    rewriteOrdered(spark, root, sortCols.map(col), filesPerDir,
      if (statsCols.nonEmpty) statsCols else sortCols, bloomCols,
      // record provenance only while the prop format can carry the names
      // (a later col is only ordered WITHIN ties of the earlier ones, so
      // the recordable set is a prefix, never a filtered subset)
      recordSort = sortCols.takeWhile(c => !c.contains(',') && !c.contains(':')))
  }

  /** Z-ORDER recluster — [[recluster]] for MULTI-dimensional predicates.
    * A lexicographic sort order prunes its leading column superbly and
    * its trailing columns not at all; interleaving the bits of 2–4
    * numeric columns orders rows along a Z-curve, so each output file
    * covers a small HYPER-RECTANGLE of the value space and a range
    * predicate on ANY of the z-columns prunes to ~the files its slab
    * intersects (the Delta/Iceberg OPTIMIZE ZORDER BY idea; see Morton
    * codes). Cost model identical to [[recluster]]: one range shuffle,
    * one in-task sort, fresh file-granular stats on the z-columns,
    * CAS-published.
    *
    * Each column is linearly scaled to 16 bits between its OBSERVED
    * min/max (one tiny agg job, O(#cols) driver rows; nulls order first
    * as 0). Linear scaling degrades toward lexicographic behavior on
    * heavily skewed columns — where a dimension is pathologically skewed,
    * pre-transform it (log, bucket id) before z-ordering, as the
    * table-format OPTIMIZE docs advise.
    */
  def reclusterZorder(spark: SparkSession, root: String, zCols: Seq[String],
                      filesPerDir: Int = 1,
                      statsCols: Seq[String] = Nil,
                      rankBased: Boolean = false,
                      bloomCols: Seq[String] = Nil): (Long, Long) = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"z-order wants 2-4 columns, got ${zCols.size} (one column = plain recluster)")
    val store = new PosixManifestStore(root)
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"$root is not an AtomicCommit table"))
    val df = AtomicCommit.scanManifest(spark, root, m)
    val key =
      if (rankBased) zorderKeyRanked(df, zCols) else zorderKey(df, zCols)
    rewriteOrdered(spark, root, Seq(key), filesPerDir,
      if (statsCols.nonEmpty) statsCols else zCols, bloomCols)
  }

  /** The shared rewrite: range-distribute and sort on
    * (partitionCol, orderCols), stage layout-preserving, annotate, flip.
    * P × filesPerDir contiguous (partition, key) ranges: each partition's
    * rows span ~filesPerDir consecutive tasks, each task writes one file
    * per partition value it holds, so a directory gets ~filesPerDir files
    * each owning a narrow, disjoint key range (boundary tasks can
    * straddle two partitions — the bound is approximate, which is all a
    * maintenance target needs).
    */
  private def rewriteOrdered(spark: SparkSession, root: String,
                             orderCols: Seq[org.apache.spark.sql.Column],
                             filesPerDir: Int,
                             statsCols: Seq[String],
                             bloomCols: Seq[String] = Nil,
                             recordSort: Seq[String] = Nil): (Long, Long) = {
    require(filesPerDir >= 1, s"filesPerDir=$filesPerDir")
    val store = new PosixManifestStore(root)
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"$root is not an AtomicCommit table"))
    val before = countAtomicDataFiles(root, store)
    val df = AtomicCommit.scanManifest(spark, root, m)
    // validate annotation targets BEFORE the rewrite job runs — a typo
    // in BLOOM FOR must not waste a full-table range shuffle
    (statsCols ++ bloomCols).foreach(c =>
      require(df.columns.contains(c),
        s"annotation column $c is not a table column " +
          s"(columns: ${df.columns.mkString(", ")})"))
    val numTasks = math.max(1, m.entries.size * filesPerDir)
    val keys = col(m.partitionCol) +: orderCols
    val keyed = df.repartitionByRange(numTasks, keys: _*)
      .sortWithinPartitions(keys: _*)
    val staged = dropEmptied(AtomicCommit.stageKeyed(spark, root, store,
      keyed, m.partitionCol, Some(m)), m, m.entries.keySet)
    DataSkipping.annotateStaged(spark, root, staged, statsCols)
    // point-lookup columns the SORT can't serve (a non-sort key is
    // interleaved across every output file) get per-file blooms, so a
    // runtime join filter or readWhereEq still prunes WITHIN the
    // reclustered layout
    if (bloomCols.nonEmpty)
      DataSkipping.annotateStagedBloom(spark, root, staged, bloomCols)
    // sort-order provenance: this generation's files are each internally
    // sorted by `recordSort` and range-consecutive within a partition —
    // the batch face turns that into a reported ordering (sort-free
    // windows/merge-joins) for as long as the generation solely owns
    // every entry ([[AtomicCommit.SortedByProp]])
    val stamped =
      if (recordSort.nonEmpty) staged.copy(props = staged.props +
        (AtomicCommit.SortedByProp -> s"${staged.gen}:${recordSort.mkString(",")}"))
      else staged
    AtomicCommit.publish(root, store, stamped)
    (before, countAtomicDataFiles(root, store))
  }

  /** The interleaved-bit sort key: each z-column scaled to [0, 2^16) by
    * its observed bounds, bits interleaved LSB-first so bit i of column j
    * lands at position i·k + j — one codegen-friendly integer expression,
    * no UDF.
    */
  private def zorderKey(df: org.apache.spark.sql.DataFrame,
                        zCols: Seq[String]): org.apache.spark.sql.Column = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val k = zCols.size
    val scaled = zCols.zipWithIndex.map { case (c, j) =>
      val mn = Option(bounds.getAs[Any](s"__mn_$c")).map(_.toString.toDouble)
      val mx = Option(bounds.getAs[Any](s"__mx_$c")).map(_.toString.toDouble)
      (mn, mx) match {
        case (Some(lo), Some(hi)) if hi > lo =>
          coalesce(least(greatest(
            (((col(c).cast("double") - lit(lo)) / lit(hi - lo)) * lit(65535.0))
              .cast("long"), lit(0L)), lit(65535L)), lit(0L))
        case _ => lit(0L) // constant or all-null column adds no order
      }
    }
    (for { i <- 0 until 16; j <- 0 until k } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_.bitwiseOR(_))
  }

  /** RANK-BASED z-key ([[reclusterZorder]]'s `rankBased = true`): each
    * column maps through ~255 sampled quantile boundaries to its 8-bit
    * RANK bucket before interleaving — the fix for skew, where linear
    * min/max scaling collapses a heavy-tailed column into one bucket and
    * the z-curve degenerates to ordering by the other columns alone.
    * Boundary sampling is one `approxQuantile` pass (driver state
    * O(cols × 256)); the per-row bucket is a small fold over the literal
    * boundary array. 8 bits of rank resolution per column is the
    * standard trade (Delta's Z-cube range ids are similarly coarse):
    * file-level clustering needs file-count resolution, not value
    * resolution.
    */
  private def zorderKeyRanked(df: org.apache.spark.sql.DataFrame,
                              zCols: Seq[String]): org.apache.spark.sql.Column = {
    val k = zCols.size
    val probs = (1 until 256).map(_ / 256.0).toArray
    val scaled = zCols.map { c =>
      val bounds = df.stat.approxQuantile(c, probs, 0.01)
        .distinct.sorted
      if (bounds.isEmpty) lit(0L)
      else {
        val bLit = typedLit(bounds.toSeq)
        // bucket = #boundaries ≤ v (nulls fold to 0, ordering first);
        // ≤ 255 by construction since at most 255 distinct boundaries
        coalesce(aggregate(bLit, lit(0L),
          (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L)),
          lit(0L))
      }
    }
    (for { i <- 0 until 8; j <- 0 until k } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Parquet data files reachable through the CURRENT manifest of an
    * [[AtomicCommit]] table (per owned partition directory).
    */
  def countAtomicDataFiles(root: String): Long =
    countAtomicDataFiles(root, new PosixManifestStore(root))

  def countAtomicDataFiles(root: String, store: ManifestStore): Long = {
    val m = AtomicCommit.readManifest(store).getOrElse(return 0L)
    m.entries.map { case (v, entry) =>
      AtomicCommit.ownersOf(entry)
        .map(gen => countDataFiles(s"$root/$gen/${m.partitionCol}=$v")).sum
    }.sum
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
