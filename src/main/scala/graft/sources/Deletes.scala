package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level delete for [[AtomicCommit]] tables — the takedown/GDPR/
  * retention operation a long-lived corpus cannot avoid. The layout has
  * no row-group tombstones, so a delete is a copy-on-write REWRITE of the
  * partitions that hold matching rows — the Delta/Iceberg copy-on-write
  * strategy — and everything rides the existing commit machinery:
  *
  *   - Only partitions that actually CONTAIN matches are rewritten; a
  *     partition the delete empties entirely is DROPPED from the manifest
  *     (a `Staged.drops` entry), and both rewrites and drops land in ONE
  *     atomic manifest swap — no reader ever sees a half-deleted state,
  *     and the pre-delete snapshot remains time-travelable until vacuum.
  *   - [[deleteRange]] narrows the candidate set through
  *     [[DataSkipping]]'s stats BEFORE scanning anything: partitions whose
  *     recorded `[min, max]` cannot intersect the deleted interval are
  *     never read, never rewritten, never listed — at 100 TB a retention
  *     delete (`ts < cutoff`) touches the old partitions only.
  *   - Concurrency: the rewrite inherits the read-set check, so a
  *     concurrent commit to a touched partition aborts the delete with
  *     [[AtomicCommit.PartitionConflictException]] instead of silently
  *     resurrecting deleted rows (or losing the concurrent write).
  *
  * Null semantics are SQL DELETE's: a row is deleted iff the predicate is
  * TRUE; UNKNOWN (null) keeps the row.
  */
object Deletes {

  /** Delete rows matching `cond`. Returns the new snapshot version, or
    * None when nothing matched (no commit — the version does not burn).
    * `statsCols` re-annotates rewritten partitions so skipping evidence
    * survives the rewrite (a rewritten partition's old stats die with its
    * old generation).
    */
  def deleteWhere(spark: SparkSession, root: String, cond: Column,
                  statsCols: Seq[String] = Nil): Option[Long] =
    deleteWhere(spark, root, new PosixManifestStore(root), cond, statsCols)

  def deleteWhere(spark: SparkSession, root: String, store: ManifestStore,
                  cond: Column, statsCols: Seq[String]): Option[Long] = {
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"no manifest at $root — not an AtomicCommit table"))
    commitDelete(spark, root, store, m, m.entries, cond, statsCols)
  }

  /** Delete rows with `colName` in `[lower, upper]` (inclusive), stats-
    * pruning the candidate partitions first: provably-disjoint partitions
    * are not even scanned for matches.
    */
  def deleteRange(spark: SparkSession, root: String, colName: String,
                  lower: Any, upper: Any,
                  statsCols: Seq[String] = Nil): Option[Long] =
    deleteRange(spark, root, new PosixManifestStore(root), colName,
      lower, upper, statsCols)

  def deleteRange(spark: SparkSession, root: String, store: ManifestStore,
                  colName: String, lower: Any, upper: Any,
                  statsCols: Seq[String]): Option[Long] = {
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"no manifest at $root — not an AtomicCommit table"))
    val candidates = DataSkipping.prunedEntries(root, m, colName, lower, upper)
    if (candidates.isEmpty) return None // stats prove nothing matches
    commitDelete(spark, root, store, m, candidates,
      col(colName) >= lit(lower) && col(colName) <= lit(upper), statsCols)
  }

  /** Scan `candidates` for matches, rewrite the partitions that hold any
    * (minus their matching rows), drop the ones the delete empties, and
    * publish it all as one commit.
    */
  private def commitDelete(spark: SparkSession, root: String,
                           store: ManifestStore, m: AtomicCommit.Manifest,
                           candidates: Map[String, String], cond: Column,
                           statsCols: Seq[String]): Option[Long] = {
    val scan = AtomicCommit.scanManifest(spark, root, m.copy(entries = candidates))
    // SQL DELETE semantics: deleted iff TRUE — null-cond rows survive
    val deletes = coalesce(cond, lit(false))
    val touched = scan.filter(deletes)
      .select(col(m.partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (touched.isEmpty) return None
    val touchedSet = touched.toSet
    val base = AtomicCommit.scanManifest(spark, root,
      m.copy(entries = m.entries.filter { case (p, _) => touchedSet(p) }))
    val survivors = base.filter(!deletes)
    val surviving = survivors
      .select(col(m.partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val drops = touched.filterNot(surviving)
    val dropOwners = drops.flatMap(p => m.entries.get(p).map(p -> _)).toMap
    val staged =
      if (surviving.nonEmpty) {
        // read-set anchored at `m` — the snapshot the survivors were
        // computed FROM. Anchoring at a fresh manifest instead would let a
        // commit that landed during the matching scan be recorded as the
        // base owner, and publish would silently overwrite its rows.
        val s = AtomicCommit.stage(spark, root, store, survivors,
          m.partitionCol, 1, Some(m))
        if (statsCols.nonEmpty)
          DataSkipping.annotateStaged(spark, root, s, statsCols)
        s.copy(drops = drops, baseOwners = s.baseOwners ++ dropOwners)
      } else // every touched partition emptied: a drop-only commit
        AtomicCommit.Staged("", m.partitionCol, Nil, m.version, dropOwners,
          drops = drops)
    Some(AtomicCommit.publish(root, store, staged))
  }
}
