package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, ManifestStore, PosixManifestStore}

/** Exactly-once streaming ingest into an [[graft.sources.AtomicCommit]]
  * table — the transactional `foreachBatch` sink a continuously-fed
  * 100 TB corpus needs. Structured Streaming's `foreachBatch` contract is
  * at-least-once: after a crash between the sink's write and the
  * checkpoint advance, the engine REPLAYS the last micro-batch with the
  * same `batchId`, and a plain append would duplicate it. The fix is
  * Delta's `txn` idea on manifest props: each batch's commit carries
  * `graft.stream.<queryKey>.lastBatchId = <batchId>` in the SAME atomic
  * manifest swap as its rows, so "data landed" and "batch recorded" are
  * one indivisible fact. A replayed batch sees its own id already at or
  * below the watermark and becomes a no-op. Combined with the engine's
  * replay-the-same-offsets guarantee (the batch CONTENT of a given id is
  * deterministic from the checkpointed offset range), ingestion is
  * exactly-once end to end.
  *
  * Semantics per batch: APPEND, as a true O(batch) operation — the batch
  * commits as its own generation appended to each touched partition's
  * owner list; existing rows are never read back or rewritten, however
  * large the table has grown. Appends commute, so a concurrent
  * maintenance writer (compaction, upsert) cannot conflict an append
  * away — the maintenance REPLACE is what aborts if it raced the append
  * (its read-set sees the owner list change), never losing batch rows.
  * The CDC-apply mode below does merge (it must read the keys it
  * replaces) and inherits the replace path's conflict behavior:
  * a conflicted batch fails, Structured Streaming replays it against the
  * refreshed snapshot, and the watermark makes that retry exactly-once.
  *
  * Multiple independent streams may feed one table: give each a distinct
  * `queryKey` and their watermarks ride separate props keys (Delta's
  * `txn.appId`), while their commits serialize through the manifest CAS.
  */
object AtomicStreamSink {

  private[streaming] def watermarkKey(queryKey: String): String =
    s"graft.stream.$queryKey.lastBatchId"

  /** The committed batch watermark for `queryKey`, if any batch has ever
    * committed (monitoring/tests).
    */
  def lastBatchId(store: ManifestStore, queryKey: String): Option[Long] =
    AtomicCommit.readManifest(store)
      .flatMap(_.props.get(watermarkKey(queryKey))).map(_.toLong)

  /** The `foreachBatch` handler:
    * {{{
    * df.writeStream.option("checkpointLocation", cp)
    *   .foreachBatch(AtomicStreamSink.exactlyOnce(root, "lang", "ingest"))
    *   .start()
    * }}}
    */
  def exactlyOnce(root: String, partitionCol: String, queryKey: String,
                  statsCols: Seq[String] = Nil): (DataFrame, Long) => Unit =
    exactlyOnce(root, new PosixManifestStore(root), partitionCol, queryKey,
      statsCols)

  def exactlyOnce(root: String, store: ManifestStore, partitionCol: String,
                  queryKey: String, statsCols: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch, batchId) => commitBatch(root, store, partitionCol, queryKey,
      batch, batchId, statsCols)

  /** One micro-batch's transactional append (the handler's body, exposed
    * so replay semantics are testable without a streaming runtime).
    * The batch commits as its OWN generation appended to each touched
    * partition's owner list ([[graft.sources.AtomicCommit
    * .commitAppendPartitions]]): O(batch) bytes written per batch however
    * large the table has grown — existing rows are never read back or
    * rewritten — with [[graft.sources.Compaction.compactAtomicTable]] as
    * the owner-list folding maintenance. `statsCols` non-empty
    * additionally writes each committed generation's
    * [[graft.sources.DataSkipping]] min/max sidecar — streaming ingest is
    * exactly where generations accumulate, so skipping evidence should
    * accumulate with them.
    */
  def commitBatch(root: String, store: ManifestStore, partitionCol: String,
                  queryKey: String, batch: DataFrame, batchId: Long,
                  statsCols: Seq[String] = Nil): Unit = {
    require(batchId >= 0, s"batchId=$batchId")
    // replay FAST PATH only: at-least-once delivery means this batch may
    // already be durable — its id at or below the watermark proves it.
    // The GUARANTEE is the monotonic-props guard inside the publish CAS
    // loop below: two writers replaying one batchId (zombie driver racing
    // its failover replacement) can both pass this pre-check, but the CAS
    // loser re-reads a manifest whose watermark the winner advanced and
    // becomes a no-op atomically with the swap — Delta's commit-time `txn`
    // check, not just a write-time one.
    if (lastBatchId(store, queryKey).exists(_ >= batchId)) return
    val spark = batch.sparkSession
    // an empty batch commits nothing and advances nothing: replaying an
    // empty batch is vacuously idempotent, and stage() rejects empties
    if (batch.isEmpty) return
    val wmKey = watermarkKey(queryKey)
    val staged = AtomicCommit.stage(spark, root, store, batch, partitionCol, 1)
      .copy(props = Map(wmKey -> batchId.toString))
    if (statsCols.nonEmpty)
      graft.sources.DataSkipping.annotateStaged(spark, root, staged, statsCols)
    AtomicCommit.publishAppendIfNew(root, store, staged, Set(wmKey))
    ()
  }

  /** CDC-APPLY mode: the batch is a stream of row VERSIONS keyed by
    * `keyCol` — last version per key wins, not append. This is the
    * consumer side of [[graft.sources.AtomicCommit.diff]] / a Debezium-
    * style feed, with the same exactly-once watermark as [[exactlyOnce]]:
    *
    *  - `seqCol` orders versions WITHIN a batch (an offset/LSN column);
    *    without it, duplicate keys in one batch pick an arbitrary row —
    *    fine for idempotent snapshots, wrong for real CDC, so pass it.
    *  - `deleteCol` (boolean) marks tombstones: the key's row is removed
    *    from the table. A partition the tombstones empty entirely is
    *    DROPPED from the manifest in the same commit ([[graft.sources
    *    .AtomicCommit.Staged.drops]]) — without that, the partition's old
    *    generation would stay current and the "deleted" rows would
    *    resurface.
    *  - Keys must be PARTITION-STABLE (a key's partition value never
    *    changes across versions): the merge only reads partitions the
    *    batch touches, so a key that moved would leave its old row behind
    *    in an untouched partition. The same contract as
    *    [[graft.sources.IncrementalUpsert.mergeIntoAtomicSnapshot]].
    */
  def exactlyOnceUpsert(root: String, store: ManifestStore,
                        partitionCol: String, keyCol: String,
                        queryKey: String, seqCol: Option[String] = None,
                        deleteCol: Option[String] = None,
                        statsCols: Seq[String] = Nil)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => upsertBatch(root, store, partitionCol, keyCol,
      queryKey, batch, batchId, seqCol, deleteCol, statsCols)

  def upsertBatch(root: String, store: ManifestStore, partitionCol: String,
                  keyCol: String, queryKey: String, batch: DataFrame,
                  batchId: Long, seqCol: Option[String] = None,
                  deleteCol: Option[String] = None,
                  statsCols: Seq[String] = Nil): Unit = {
    require(batchId >= 0, s"batchId=$batchId")
    if (lastBatchId(store, queryKey).exists(_ >= batchId)) return
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // last version per key within the batch (seqCol descending; ties and
    // the no-seqCol case take an arbitrary-but-single row)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(seqCol.map(s => col(s).desc).getOrElse(monotonically_increasing_id().desc))
    val latest = batch.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1).drop("__graft_rn")
    val isTombstone = deleteCol
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    val touched = latest.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    // ONE manifest observation anchors the whole merge: the base rows, the
    // drop owners, and the staged read-set all resolve through `mOpt` — a
    // concurrent commit landing on a touched partition after this point
    // aborts the publish (PartitionConflictException → the engine replays
    // the batch against the refreshed snapshot, exactly-once via the
    // watermark) instead of being silently overwritten.
    val mOpt = AtomicCommit.readManifest(store)
    val changes = latest.withColumn("__graft_del", isTombstone)
      .drop(deleteCol.toSeq ++ seqCol.toSeq: _*)
    val baseOpt = mOpt.flatMap(m =>
      AtomicCommit.readPartitions(spark, root, m, touched))
    val merged = baseOpt match {
      case None => changes.filter(!col("__graft_del")).drop("__graft_del")
      case Some(base) =>
        val dataCols = base.columns.filterNot(_ == keyCol).toSeq
        val isChange = col(s"c.$keyCol").isNotNull
        base.alias("b")
          .join(changes.alias("c"),
            col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
          .filter(!(isChange && col(s"c.__graft_del")))
          .select((keyCol +: dataCols).map(c =>
            when(isChange, col(s"c.$c")).otherwise(col(s"b.$c")).as(c)): _*)
    }
    val survivingParts = merged.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    // tombstones with no table (or none matching) leave nothing to commit
    if (mOpt.isEmpty && survivingParts.isEmpty) return
    val drops = touched.filterNot(survivingParts)
    val dropOwners = mOpt
      .map(m => drops.flatMap(p => m.entries.get(p).map(p -> _)).toMap)
      .getOrElse(Map.empty)
    val wmKey = watermarkKey(queryKey)
    val wmProps = Map(wmKey -> batchId.toString)
    val staged =
      if (survivingParts.nonEmpty) {
        val s = AtomicCommit.stage(spark, root, store, merged, partitionCol,
          1, mOpt)
        if (statsCols.nonEmpty)
          graft.sources.DataSkipping.annotateStaged(spark, root, s, statsCols)
        s.copy(props = wmProps, drops = drops,
          baseOwners = s.baseOwners ++ dropOwners)
      } else // tombstone-only batch that empties every touched partition
        AtomicCommit.Staged("", partitionCol, Nil,
          mOpt.map(_.version).getOrElse(0L), dropOwners,
          props = wmProps, drops = drops)
    AtomicCommit.publishIfNew(root, store, staged, Set(wmKey))
    ()
  }
}
