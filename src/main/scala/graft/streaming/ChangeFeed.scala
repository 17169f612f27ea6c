package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, ManifestStore, PosixManifestStore, Transactions}

/** The READ half of the change-feed loop over [[graft.sources
  * .AtomicCommit]] tables — [[AtomicStreamSink]] writes a table's commits;
  * this subscribes to them. A downstream consumer (an index builder, a
  * replica, a derived-feature table) polls the manifest, and every version
  * committed since its watermark becomes one micro-batch — the Delta
  * change-data-feed / Iceberg incremental-read idea, driven entirely by
  * the module's two structural facts:
  *
  *  - Versions are a dense, immutable history: the batch for version N is
  *    DETERMINISTIC (re-deriving it after a crash yields byte-identical
  *    rows), which is exactly the replay-the-same-offsets property
  *    Structured Streaming's source contract requires — manifest versions
  *    ARE offsets.
  *  - Manifest diffs locate changes without scanning data:
  *    [[AtomicCommit.changedPartitions]] is O(#partitions) driver
  *    metadata, and the batch read touches only changed directories — a
  *    consumer's per-tick cost is O(what changed), never O(table).
  *
  * Two feed shapes, matched to the two commit disciplines:
  *
  *  - APPEND feed ([[appendsAt]] / [[replicateAppends]]): for ingest-only
  *    tables. The generations version N added to owner lists hold exactly
  *    its new rows, so the batch is a direct read of the appended
  *    directories — O(batch) bytes, no diff join at all. Non-append
  *    history (a replace, delete, or rollback) fails loudly: those
  *    commits' semantics are not expressible as insert-only rows.
  *  - CDC feed ([[cdcBatchAt]] / [[replicateCdc]]): fully general. Version
  *    N's batch is [[AtomicCommit.diff]](N-1, N) reshaped into row
  *    versions + tombstones — the shape [[AtomicStreamSink
  *    .exactlyOnceUpsert]] consumes, so feeding table A's changes into
  *    table B is one closed loop.
  *
  * Exactly-once delivery is DELEGATED to the sink's commit-time watermark:
  * `replicate*` applies version N with `batchId = N` through
  * [[AtomicStreamSink]], whose monotonic-props guard makes a replayed
  * version a no-op atomically with the destination's commit. A consumer
  * that crashes mid-tick and restarts re-derives the same batches and
  * skips the ones that already landed — no consumer-side state file, the
  * destination table IS the checkpoint (its props carry the source
  * version watermark).
  *
  * Retention contract: a consumer can only read history still on disk —
  * the source's [[AtomicCommit.vacuum]] `keepVersions` must cover the
  * maximum consumer lag, exactly Delta/Iceberg's CDF-vs-VACUUM rule; a
  * consumer that fell behind the horizon fails with the readable-versions
  * list rather than silently skipping changes.
  */
object ChangeFeed {

  /** The rows version `version` APPENDED, read directly from the
    * generation directories that version added to owner lists (no diff
    * join — O(batch) bytes). Version 1 is the initial snapshot. Returns
    * None when the version changed no entries (a props-only commit).
    * Throws when the version is not a pure append — a changed partition
    * whose old owner list is not a strict prefix of its new one (replace,
    * delete, compaction, rollback): use the CDC feed for such history.
    */
  /** Multi-table-transaction versions in the feed ([[graft.sources
    * .Transactions]]): an ABORTED pending manifest and the revert that
    * caps it are both no-op batches (their diffs are inverses — skipping
    * the pair nets zero), a COMMITTED pending manifest is an ordinary
    * change, and an UNDECIDED one is unreachable below a resolved head
    * (feeds bound their ticks by [[AtomicCommit.readManifest]], which
    * stops under in-flight transactions) — defensively, it fails loudly
    * rather than leaking uncommitted rows.
    */
  private def txnSkip(store: ManifestStore, root: String,
                      m: AtomicCommit.Manifest): Boolean =
    if (m.props.contains(Transactions.RevertedKey)) true
    else if (!Transactions.isPending(m)) false
    else Transactions.decisionOf(m) match {
      case Transactions.Committed => false
      case Transactions.Aborted => true
      case Transactions.Undecided => sys.error(
        s"version ${m.version} of $root is an UNDECIDED in-flight " +
          "transaction — feeds must bound ticks by the resolved head " +
          "(AtomicCommit.readManifest), not raw versions")
    }

  def appendsAt(spark: SparkSession, root: String, store: ManifestStore,
                version: Long): Option[DataFrame] = {
    val cur = AtomicCommit.manifestAt(store, root, version)
    if (txnSkip(store, root, cur)) return None
    val prevEntries: Map[String, String] =
      if (version <= 1L) Map.empty
      else AtomicCommit.manifestAt(store, root, version - 1).entries
    val dropped = prevEntries.keySet -- cur.entries.keySet
    if (dropped.nonEmpty)
      sys.error(s"version $version of $root dropped partitions " +
        s"${dropped.toSeq.sorted.mkString(", ")} — not an append; use the CDC feed")
    // per changed partition: the suffix of generations this version added
    val added: Seq[(String, String)] = cur.entries.toSeq.flatMap {
      case (p, entry) =>
        val beforeE = prevEntries.getOrElse(p, "")
        if (entry == beforeE) Nil
        else if (AtomicCommit.dvOf(entry) != AtomicCommit.dvOf(beforeE))
          sys.error(s"version $version of $root row-deleted in partition " +
            s"$p (deletion vector changed) — not an append; use the CDC feed")
        else {
          val now = AtomicCommit.ownersOf(entry)
          val before = AtomicCommit.ownersOf(beforeE)
          if (now == before) Nil
          else if (now.startsWith(before)) now.drop(before.size).map(p -> _)
          else sys.error(s"version $version of $root replaced partition $p " +
            s"(owners ${before.mkString(",")} -> ${now.mkString(",")}) — " +
            "not an append; use the CDC feed")
        }
    }
    if (added.isEmpty) None
    else {
      // one multi-path read per added generation, like scanManifest
      val byGen = added.map { case (p, g) => (g, p) }
        .groupBy(_._1).toSeq.sortBy(_._1)
      Some(byGen.map { case (gen, parts) =>
        val base = s"$root/$gen"
        val paths = parts.map(_._2).distinct.sorted
          .map(v => s"$base/${cur.partitionCol}=$v")
        // logical view per generation: feed rows speak the CURRENT
        // snapshot's column names whatever names the generation carries
        AtomicCommit.logicalView(
          AtomicCommit.readVerbatim(spark, base, cur.partitionCol, paths),
          cur)
      }.reduce(_.unionByName(_, allowMissingColumns = true)))
    }
  }

  private val TombstoneCol = "__cf_tombstone"

  /** Version `version`'s row-level changes as ROW VERSIONS + tombstones —
    * the [[AtomicStreamSink.exactlyOnceUpsert]] batch shape: the table's
    * own columns, plus boolean `__cf_tombstone` marking deleted keys
    * (their last-known row). Version 1 is the initial snapshot, all
    * inserts. Cost O(changed partitions) via the manifest diff. Returns
    * None when nothing changed.
    */
  def cdcBatchAt(spark: SparkSession, root: String, store: ManifestStore,
                 version: Long, keyCol: String): Option[DataFrame] = {
    if (txnSkip(store, root, AtomicCommit.manifestAt(store, root, version)))
      return None
    if (version <= 1L)
      return Some(AtomicCommit.readAt(spark, root, store, version)
        .withColumn(TombstoneCol, lit(false)))
    val d = AtomicCommit.diff(spark, root, store, version - 1, version, keyCol)
    val dataCols = d.columns.filter(_.endsWith("_from"))
      .map(_.stripSuffix("_from")).toSeq
    val isDel = col("change_type") === "delete"
    val batch = d.select(
      (col(keyCol) +:
        dataCols.map(c =>
          when(isDel, col(s"${c}_from")).otherwise(col(s"${c}_to")).as(c))) :+
        isDel.as(TombstoneCol): _*)
    Some(batch)
  }

  /** The source version `feedKey` has applied to the destination, if any
    * tick has ever landed (the consumer's watermark — stored in the
    * DESTINATION table's props, so the destination is its own checkpoint).
    */
  def lastSourceVersion(dstStore: ManifestStore, feedKey: String): Option[Long] =
    AtomicStreamSink.lastBatchId(dstStore, feedKey)

  /** Advance the feed watermark past trailing NO-OP source versions
    * (props-only commits — tags, constraints, other feeds' watermarks —
    * produce no batch, so no sink commit records their version). Without
    * this, a consumer's recorded lag extends past history it has in fact
    * fully applied, and once those no-op versions age past the source's
    * vacuum horizon a later tick dies on `manifestAt` even though no data
    * was ever missed. Props-only commit on the DESTINATION, riding the
    * same monotonic guard as data batches; skipped when the destination
    * has no manifest yet (nothing applied, nothing to record it on).
    */
  private def bumpWatermark(dstRoot: String, dstStore: ManifestStore,
                            feedKey: String, version: Long): Unit = {
    val wmKey = AtomicStreamSink.watermarkKey(feedKey)
    AtomicCommit.readManifest(dstStore).foreach { dm =>
      if (!dm.props.get(wmKey).exists(_.toLong >= version)) {
        AtomicCommit.publishIfNew(dstRoot, dstStore,
          AtomicCommit.Staged("", dm.partitionCol, Nil, dm.version, Map.empty,
            props = Map(wmKey -> version.toString)),
          Set(wmKey))
        ()
      }
    }
  }

  /** One polling tick of an APPEND replica: apply every source version
    * past the feed's watermark to `dstRoot` as an exactly-once append
    * batch (batchId = source version). Returns the source version the
    * destination now covers. Idempotent: a tick with nothing new applies
    * nothing; a crashed tick's completed versions are skipped by the
    * sink's commit-time guard on the retry.
    */
  def replicateAppends(spark: SparkSession, srcRoot: String,
                       srcStore: ManifestStore, dstRoot: String,
                       dstStore: ManifestStore, feedKey: String,
                       statsCols: Seq[String] = Nil): Long = {
    // resolved head, not raw: versions above it belong to an in-flight
    // transaction and must not be consumed (or watermarked past) yet
    val srcM = AtomicCommit.readManifest(srcStore).getOrElse(
      sys.error(s"no manifest at $srcRoot — not an AtomicCommit table"))
    val cur = srcM.version
    val from = lastSourceVersion(dstStore, feedKey).getOrElse(0L)
    ((from + 1) to cur).foreach { v =>
      appendsAt(spark, srcRoot, srcStore, v).foreach { batch =>
        AtomicStreamSink.commitBatch(dstRoot, dstStore, srcM.partitionCol,
          feedKey, batch, v, statsCols)
      }
    }
    bumpWatermark(dstRoot, dstStore, feedKey, cur)
    cur
  }

  /** One polling tick of a CDC replica: apply every source version past
    * the feed's watermark as an exactly-once upsert-with-tombstones batch.
    * Handles ANY source history (replaces, deletes, rollbacks, compaction
    * is a no-op diff). Same idempotence contract as [[replicateAppends]];
    * keys must be partition-stable (the [[AtomicStreamSink
    * .exactlyOnceUpsert]] contract).
    */
  def replicateCdc(spark: SparkSession, srcRoot: String,
                   srcStore: ManifestStore, dstRoot: String,
                   dstStore: ManifestStore, feedKey: String,
                   keyCol: String): Long = {
    val srcM = AtomicCommit.readManifest(srcStore).getOrElse(
      sys.error(s"no manifest at $srcRoot — not an AtomicCommit table"))
    val cur = srcM.version
    val from = lastSourceVersion(dstStore, feedKey).getOrElse(0L)
    ((from + 1) to cur).foreach { v =>
      cdcBatchAt(spark, srcRoot, srcStore, v, keyCol).foreach { batch =>
        AtomicStreamSink.upsertBatch(dstRoot, dstStore, srcM.partitionCol,
          keyCol, feedKey, batch, v, seqCol = None,
          deleteCol = Some(TombstoneCol))
      }
    }
    bumpWatermark(dstRoot, dstStore, feedKey, cur)
    cur
  }

  /** INCREMENTAL MATERIALIZED AGGREGATE — a derived rollup table
    * maintained from the change feed: `agg` turns a slice of source rows
    * into result rows (both carrying the source's partition column), and
    * each tick recomputes it ONLY for partitions that changed since the
    * last applied source version, replacing exactly those partitions of
    * the destination in one exactly-once commit. The materialized-view
    * maintenance loop of an incremental ETL pipeline, with the module's
    * usual cost shape: a tick costs O(changed partitions), never
    * O(source) and never O(view).
    *
    *  - `agg` must GROUP WITHIN partitions (its output's partition-column
    *    values must be a subset of its input's) — per-partition rollups,
    *    top-k per partition, profiles. Cross-partition aggregates have no
    *    incremental form at this granularity.
    *  - A source partition that disappears (or for which `agg` emits no
    *    rows) is dropped from the view in the same commit.
    *  - Exactly-once: watermark = source version in the view's props,
    *    enforced in the publish CAS loop; replays and restarts are no-ops;
    *    the view is its own checkpoint.
    *
    * Returns the source version the view now reflects.
    */
  def syncAggregate(spark: SparkSession, srcRoot: String,
                    srcStore: ManifestStore, dstRoot: String,
                    dstStore: ManifestStore, feedKey: String)
                   (agg: DataFrame => DataFrame): Long = {
    val srcM = AtomicCommit.readManifest(srcStore).getOrElse(
      sys.error(s"no manifest at $srcRoot — not an AtomicCommit table"))
    val cur = srcM.version
    val from = lastSourceVersion(dstStore, feedKey).getOrElse(0L)
    if (cur <= from) return from
    val changed: Seq[String] =
      if (from == 0L) srcM.entries.keys.toSeq.sorted
      else AtomicCommit.changedPartitions(srcStore, srcRoot, from, cur)
    if (changed.isEmpty) { // props-only source commits: nothing to apply,
      // but the watermark still advances so the lag never outlives them
      bumpWatermark(dstRoot, dstStore, feedKey, cur)
      return lastSourceVersion(dstStore, feedKey).getOrElse(from)
    }
    val pc = srcM.partitionCol
    val live = changed.filter(srcM.entries.contains)
    val sliceOpt =
      if (live.isEmpty) None
      else {
        val sliceM = srcM.copy(entries =
          srcM.entries.filter { case (p, _) => live.contains(p) })
        // the recurring maintenance tick re-aggregates BY PARTITION KEY,
        // which is exactly what the storage-partitioned batch face
        // serves exchange-free: when the session opted in
        // ([[graft.sources.GraftBatchScan.EnabledConf]]), read the
        // changed slice through the DSv2 face PINNED to this tick's
        // snapshot (so a concurrent commit cannot shift the slice
        // mid-tick) — a partition-grouped `agg` then plans with no
        // exchange below the aggregate. Qualification is the face's own
        // gate: an unqualifying snapshot falls back to the identical V1
        // composition inside the same table, and the pin keeps
        // auto-materialization out of the tick (maintenance commits
        // belong to the table's owner, not its subscribers).
        val useFace = spark.sessionState.conf.getConfString(
          graft.sources.GraftBatchScan.EnabledConf, "false") == "true"
        // the relation rides with a registered graft catalog when the
        // session has one: Spark resolves a TRANSFORM-reported key
        // grouping (days/bucket/… on a hidden-partitioned source)
        // through the relation's FunctionCatalog — with catalog=None
        // only the identity report is resolvable. The tick itself
        // re-aggregates BY THE PARTITION COLUMN, which projects it and
        // keeps the scan on the identity face (exchange-free without a
        // catalog); the catalog matters when the subscriber's agg also
        // joins the slice on the raw source column
        def graftCatalog: Option[
            org.apache.spark.sql.connector.catalog.CatalogPlugin] = {
          val prefix = "spark.sql.catalog."
          val cls = classOf[graft.sources.GraftCatalog].getName
          spark.conf.getAll.collectFirst {
            case (k, v) if k.startsWith(prefix) && v == cls &&
              !k.stripPrefix(prefix).contains(".") => k.stripPrefix(prefix)
          }.flatMap(n => scala.util.Try(
            spark.sessionState.catalogManager.catalog(n)).toOption)
        }
        Some(
          if (useFace)
            org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
              org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2Relation.create(
                  new graft.sources.GraftTable(s"graft.feed($srcRoot)",
                    new graft.sources.GraftRelation(spark, srcRoot,
                      srcStore, Some(sliceM))),
                  graftCatalog, None))
          else AtomicCommit.scanManifest(spark, srcRoot, sliceM))
      }
    val resultOpt = sliceOpt.map(agg)
    resultOpt.foreach { r =>
      require(r.columns.contains(pc),
        s"agg dropped the partition column $pc — the view cannot be " +
          "incrementally maintained without it")
    }
    // partitions the tick REMOVES from the view: vanished from the
    // source, or aggregated to nothing
    val emitted = resultOpt.map(
      _.select(col(pc).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet).getOrElse(Set.empty)
    val changedSet = changed.toSet
    require(emitted.subsetOf(changedSet),
      s"agg emitted partitions outside its input slice " +
        s"(${(emitted -- changedSet).toSeq.sorted.mkString(", ")}) — it " +
        "must group WITHIN partitions or the view cannot be maintained " +
        "incrementally")
    val dstM = AtomicCommit.readManifest(dstStore)
    val drops = changed.filterNot(emitted)
      .filter(p => dstM.exists(_.entries.contains(p)))
    val dropOwners = dstM
      .map(m => drops.flatMap(p => m.entries.get(p).map(p -> _)).toMap)
      .getOrElse(Map.empty)
    val wmKey = AtomicStreamSink.watermarkKey(feedKey)
    val wmProps = Map(wmKey -> cur.toString)
    val staged =
      if (emitted.nonEmpty) {
        val s = AtomicCommit.stage(spark, dstRoot, dstStore, resultOpt.get,
          pc, 1, dstM)
        s.copy(props = wmProps, drops = drops,
          baseOwners = s.baseOwners ++ dropOwners)
      } else if (drops.nonEmpty)
        AtomicCommit.Staged("", pc, Nil, dstM.map(_.version).getOrElse(0L),
          dropOwners, props = wmProps, drops = drops)
      else { // nothing to emit and nothing to drop — watermark-only
        bumpWatermark(dstRoot, dstStore, feedKey, cur)
        return lastSourceVersion(dstStore, feedKey).getOrElse(from)
      }
    AtomicCommit.publishIfNew(dstRoot, dstStore, staged, Set(wmKey))
    cur
  }

  /** Root-only convenience forms (POSIX deployments). */
  def replicateAppends(spark: SparkSession, srcRoot: String, dstRoot: String,
                       feedKey: String): Long =
    replicateAppends(spark, srcRoot, new PosixManifestStore(srcRoot),
      dstRoot, new PosixManifestStore(dstRoot), feedKey)

  def replicateCdc(spark: SparkSession, srcRoot: String, dstRoot: String,
                   feedKey: String, keyCol: String): Long =
    replicateCdc(spark, srcRoot, new PosixManifestStore(srcRoot),
      dstRoot, new PosixManifestStore(dstRoot), feedKey, keyCol)

  def syncAggregate(spark: SparkSession, srcRoot: String, dstRoot: String,
                    feedKey: String)(agg: DataFrame => DataFrame): Long =
    syncAggregate(spark, srcRoot, new PosixManifestStore(srcRoot),
      dstRoot, new PosixManifestStore(dstRoot), feedKey)(agg)
}
