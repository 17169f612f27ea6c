package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` semantics over [[AtomicCommit]] tables — the full
  * multi-clause form (Delta's merge builder, re-derived on the manifest
  * model):
  *
  * {{{
  * Merge.into(spark, root)
  *   .using(updatesDf)
  *   .onKeys("k")
  *   .whenMatchedDelete(col("s.op") === "del")
  *   .whenMatchedUpdateAll()
  *   .whenNotMatchedInsertAll()
  *   .whenNotMatchedBySourceUpdate(
  *     col("t.status") === "open", Map("status" -> lit("stale")))
  *   .run()
  * }}}
  *
  * Conditions and update/insert expressions reference the two sides as
  * `t.<col>` (target) and `s.<col>` (source). Clause semantics are ANSI
  * MERGE: each target/source row takes the FIRST clause of its group
  * whose condition holds (matched / not-matched / not-matched-by-source);
  * no clause applying leaves a target row unchanged and drops a source
  * row. Source keys must be unique when any matched or by-source-update
  * clause exists (one cheap aggregation check — the ambiguous-merge error
  * ANSI requires at row level, enforced up front).
  *
  * Execution is partition-cow at manifest scale:
  *  1. ONE column-pruned pass (keys + partition column) discovers the
  *     partitions holding matches, unioned with the partitions the
  *     inserts land in — nothing else is read or rewritten. Clauses
  *     against rows NOT matched by source put every partition in play
  *     (their semantics touch the whole table), so only that form pays a
  *     full rewrite.
  *  2. The touched slice full-outer-joins the source, the clause
  *     cascades fold into ONE keep-flag plus per-column CASE expressions
  *     (codegen'd — no row-at-a-time callback), and the result stages as
  *     one generation.
  *  3. The commit publishes with its read set ANCHORED at the scanned
  *     snapshot ([[AtomicCommit.stage]]'s `base`) — a concurrent commit
  *     on a touched partition aborts this merge (re-run) instead of
  *     being silently overwritten; emptied partitions drop in the same
  *     commit; CHECK constraints bind as on every write path.
  *
  * Updates may not modify the partition column (a row-moving update is a
  * delete+insert under this model — rejected loudly rather than guessed);
  * `updateAll` accordingly keeps each matched row's OWN partition value
  * and takes every other column from the source.
  */
object Merge {

  def into(spark: SparkSession, root: String): Builder =
    into(spark, root, new PosixManifestStore(root))

  def into(spark: SparkSession, root: String, store: ManifestStore): Builder =
    Builder(spark, root, store, None, Nil, Nil, Nil, Nil)

  private[sources] sealed trait Clause { def cond: Option[Column] }
  private[sources] final case class Update(cond: Option[Column],
                                           set: Map[String, Column]) extends Clause
  private[sources] final case class Delete(cond: Option[Column]) extends Clause
  private[sources] final case class Insert(cond: Option[Column],
                                           values: Map[String, Column]) extends Clause

  final case class Builder(spark: SparkSession, root: String,
                           store: ManifestStore,
                           source: Option[DataFrame], keys: Seq[String],
                           matched: Seq[Clause], notMatched: Seq[Clause],
                           bySource: Seq[Clause],
                           schemaEvolution: Boolean = false) {

    def using(src: DataFrame): Builder = copy(source = Some(src))

    /** Source-column presence under the session's name resolution
      * (case-insensitive by default) — the same rule the analyzer uses
      * to resolve `s.col` references, so a source spelled `V` satisfies
      * a target column `v` everywhere instead of silently keeping the
      * target's old value.
      */
    private def srcHas(src: DataFrame, c: String): Boolean = {
      val resolver = spark.sessionState.conf.resolver
      src.columns.exists(resolver(_, c))
    }

    /** SCHEMA EVOLUTION: columns the source carries that the target
      * lacks are ADDED (one atomic props commit, [[AtomicCommit
      * .addColumnsAtomic]] — NULL-backfilled on every existing row)
      * before the merge runs, instead of being silently dropped from
      * the merged output — the CDC pattern "upsert a batch that carries
      * one new column" without a manual ALTER first. Also enabled
      * session-wide by `spark.graft.merge.schemaEvolution=true` (the
      * SQL face's `MERGE INTO ... WITH SCHEMA EVOLUTION` evolves
      * through Spark's own analyzer → catalog ALTER path instead and
      * needs neither). Off (default): extra source columns are ignored,
      * as before.
      */
    def withSchemaEvolution(): Builder = copy(schemaEvolution = true)

    /** Equi-join keys (plain equality: null keys never match, as in SQL
      * MERGE ON).
      */
    def onKeys(ks: String*): Builder = copy(keys = ks.toSeq)

    def whenMatchedUpdate(set: Map[String, Column]): Builder =
      copy(matched = matched :+ Update(None, set))
    def whenMatchedUpdate(condition: Column, set: Map[String, Column]): Builder =
      copy(matched = matched :+ Update(Some(condition), set))
    /** Update every target column from the same-named source column. */
    def whenMatchedUpdateAll(): Builder =
      copy(matched = matched :+ Update(None, Map.empty))
    def whenMatchedUpdateAll(condition: Column): Builder =
      copy(matched = matched :+ Update(Some(condition), Map.empty))
    def whenMatchedDelete(): Builder =
      copy(matched = matched :+ Delete(None))
    def whenMatchedDelete(condition: Column): Builder =
      copy(matched = matched :+ Delete(Some(condition)))

    def whenNotMatchedInsert(values: Map[String, Column]): Builder =
      copy(notMatched = notMatched :+ Insert(None, values))
    def whenNotMatchedInsert(condition: Column, values: Map[String, Column]): Builder =
      copy(notMatched = notMatched :+ Insert(Some(condition), values))
    /** Insert every target column from the same-named source column. */
    def whenNotMatchedInsertAll(): Builder =
      copy(notMatched = notMatched :+ Insert(None, Map.empty))
    def whenNotMatchedInsertAll(condition: Column): Builder =
      copy(notMatched = notMatched :+ Insert(Some(condition), Map.empty))

    def whenNotMatchedBySourceUpdate(set: Map[String, Column]): Builder =
      copy(bySource = bySource :+ Update(None, set))
    def whenNotMatchedBySourceUpdate(condition: Column,
                                     set: Map[String, Column]): Builder =
      copy(bySource = bySource :+ Update(Some(condition), set))
    def whenNotMatchedBySourceDelete(): Builder =
      copy(bySource = bySource :+ Delete(None))
    def whenNotMatchedBySourceDelete(condition: Column): Builder =
      copy(bySource = bySource :+ Delete(Some(condition)))

    /** Execute: one atomic commit. Returns the published version, or the
      * CURRENT version untouched when the merge changes nothing (a
      * no-op merge burns no version, like a no-match delete).
      */
    def run(): Long = {
      val src = source.getOrElse(sys.error("Merge: .using(source) not set"))
      require(keys.nonEmpty, "Merge: .onKeys(...) not set")
      require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
        "Merge: no WHEN clause given")
      val m0 = AtomicCommit.readManifest(store).getOrElse(
        sys.error(s"no manifest at $root — not an AtomicCommit table"))
      val evolve = schemaEvolution || spark.conf
        .getOption("spark.graft.merge.schemaEvolution").exists(_.toBoolean)
      val m = if (!evolve) m0 else {
        val tgtNow = AtomicCommit.scanManifest(spark, root, m0).schema
        // new-column detection follows the session's name resolution
        // (case-insensitive by default): a CDC batch carrying `ID`
        // against target `id` matches the existing column rather than
        // auto-ADDing a duplicate-modulo-case one
        val resolver = spark.sessionState.conf.resolver
        val fresh = src.schema.fields
          .filterNot(f => tgtNow.exists(t => resolver(t.name, f.name)))
        if (fresh.isEmpty) m0
        else {
          AtomicCommit.addColumnsAtomic(spark, root, store,
            org.apache.spark.sql.types.StructType(
              fresh.map(_.copy(nullable = true))))
          AtomicCommit.readManifest(store).get
        }
      }
      val pc = m.partitionCol
      val tgtSchema = AtomicCommit.scanManifest(spark, root, m).schema
      val tgtCols = tgtSchema.fieldNames.toSeq
      keys.foreach { k =>
        require(tgtCols.contains(k), s"Merge key $k is not a target column")
        require(srcHas(src, k), s"Merge key $k is not a source column")
      }
      matched.collect { case Update(_, set) => set }
        .filter(_.contains(pc)).foreach(_ =>
          sys.error(s"Merge: updating the partition column $pc would move " +
            "rows across partitions — delete and re-insert instead"))
      bySource.collect { case Update(_, set) => set }
        .filter(_.contains(pc)).foreach(_ =>
          sys.error(s"Merge: updating the partition column $pc would move " +
            "rows across partitions — delete and re-insert instead"))
      // hidden partitioning: the transform's SOURCE column is as
      // off-limits as the derived partition column itself — updating it
      // (explicitly, or implicitly through updateAll, which copies every
      // same-named source column) would leave the derived value stale and
      // make every later source-predicate read prune to the wrong
      // partitions
      HiddenPartitioning.specOf(m).foreach { spec =>
        val updates = (matched ++ bySource).collect { case u: Update => u }
        if (updates.exists(u => u.set.contains(spec.source) || u.set.isEmpty))
          sys.error(s"Merge: updating ${spec.source}, the source column of " +
            s"the recorded partition transform ${spec.render}, would leave " +
            s"the derived partition column $pc stale — use explicit update " +
            s"sets without ${spec.source}, or delete and re-insert")
      }
      if ((matched.nonEmpty || bySource.nonEmpty) && sourceKeysAmbiguous(src))
        sys.error("Merge: source carries duplicate key rows — a matched " +
          "target row would take two updates (the ANSI ambiguous-merge " +
          "error). Deduplicate the source first.")

      // ---- insert-only fast path: no matched or by-source clause means
      // no target row changes, so there is nothing to rewrite AT ALL —
      // anti-join the source against one column-pruned key scan and
      // commit the surviving rows as a pure APPEND (owner-list growth,
      // O(batch), commuting with concurrent appends). The general path
      // below would read and rewrite every insert-destination partition
      // for byte-identical target rows.
      if (matched.isEmpty && bySource.isEmpty)
        return insertOnly(src, m, pc, tgtSchema, tgtCols, evolve)

      // ---- phase 1: which partitions are in play?
      val touched: Seq[String] =
        if (bySource.nonEmpty) m.entries.keys.toSeq.sorted
        else {
          val tgtKeys = AtomicCommit.scanManifest(spark, root, m)
            .select((pc +: keys).map(col): _*)
          val joinOn = keys.map(k => tgtKeys(k) === src(k)).reduce(_ && _)
          val matchParts = tgtKeys.join(src.select(keys.map(col): _*), joinOn,
            "left_semi").select(col(pc).cast("string")).distinct()
            .collect().map(_.getString(0)).toSeq
          val insertParts =
            if (notMatched.isEmpty) Nil
            else { // superset is fine: an untouched-in-the-end partition
              // rewrites to identical rows — correct, just unnecessary IO.
              // CRITICAL: evaluate each insert clause's ACTUAL partition
              // value expression — an explicit `values` map can assign the
              // partition from any expression, and pricing raw src(pc)
              // here would let an insert land in a partition phase 2 never
              // read, which stage() would then REPLACE with just the new
              // rows (clause conditions are skipped: a superset prunes
              // nothing away that matters, never adds a wrong partition)
              val anti = src.alias("s").join(
                tgtKeys.select(keys.map(col): _*),
                keys.map(k => col(s"s.$k") === tgtKeys(k)).reduce(_ && _),
                "left_anti")
              notMatched.flatMap { case Insert(_, values) =>
                val pcExpr =
                  if (values.isEmpty) { // insertAll
                    require(srcHas(src, pc),
                      s"Merge insertAll: source must carry the partition column $pc")
                    col(s"s.$pc")
                  } else values.getOrElse(pc, lit(null))
                anti.select(pcExpr.cast("string").as("__p")).distinct()
                  .collect().map(_.getString(0)).toSeq
              }.distinct
            }
          require(!insertParts.contains(null),
            "Merge: an insert clause produces rows with a NULL partition " +
              s"value for $pc — route them to an explicit value")
          (matchParts ++ insertParts).distinct.sorted
        }
      if (touched.isEmpty) return m.version // nothing matches, nothing inserts

      // ---- phase 2: the merged rows of the touched slice
      val tgt = AtomicCommit.readPartitions(spark, root, m, touched)
        .getOrElse(AtomicCommit.scanManifest(spark, root, m).limit(0))
        .withColumn("__t_present", lit(true)).alias("t")
      val srcP = src.withColumn("__s_present", lit(true)).alias("s")
      val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
      val joined = tgt.join(srcP, joinCond, "full_outer")
      val isMatched = col("t.__t_present").isNotNull && col("s.__s_present").isNotNull
      val isTOnly = col("t.__t_present").isNotNull && col("s.__s_present").isNull
      // the remaining case (source-only row) is each cascade's otherwise

      def firstMatch(clauses: Seq[Clause], onKeep: Clause => Column,
                     default: Column): Column =
        clauses.foldRight(default) { (c, acc) =>
          when(c.cond.getOrElse(lit(true)), onKeep(c)).otherwise(acc)
        }

      val keep =
        when(isMatched, firstMatch(matched, {
          case _: Delete => lit(false)
          case _ => lit(true)
        }, lit(true)))
          .when(isTOnly, firstMatch(bySource, {
            case _: Delete => lit(false)
            case _ => lit(true)
          }, lit(true)))
          .otherwise(firstMatch(notMatched, _ => lit(true), lit(false)))

      def valueOf(c: String): Column = {
        val keepT = col(s"t.$c")
        val fromS = col(s"s.$c")
        def updVal(set: Map[String, Column]): Column =
          if (set.isEmpty) { // updateAll: same-named source column — EXCEPT
            // the partition column, which always keeps the target's value:
            // a matched row taking the source's partition would MOVE, and a
            // moved row stages as a whole-partition replace of its
            // destination — clobbering rows this merge never read. Explicit
            // SET of the partition column is rejected up front for the same
            // reason; updateAll keeps the row where it lives (documented).
            if (c == pc) keepT
            else if (!srcHas(src, c)) {
              // under schema evolution the target may carry columns an
              // individual CDC batch lacks: the row keeps its own value
              require(evolve,
                s"Merge updateAll/insertAll: source lacks target column $c")
              keepT
            } else fromS
          } else set.getOrElse(c, keepT)
        def insVal(values: Map[String, Column]): Column =
          if (values.isEmpty) {
            if (!srcHas(src, c)) {
              require(evolve,
                s"Merge updateAll/insertAll: source lacks target column $c")
              lit(null).cast(tgtSchema(c).dataType)
            } else fromS
          } else values.getOrElse(c,
            lit(null).cast(tgtSchema(c).dataType))
        when(isMatched, firstMatch(matched, {
          case Update(_, set) => updVal(set)
          case _ => keepT
        }, keepT))
          .when(isTOnly, firstMatch(bySource, {
            case Update(_, set) => updVal(set)
            case _ => keepT
          }, keepT))
          .otherwise(firstMatch(notMatched, {
            case Insert(_, values) => insVal(values)
            case _ => keepT
          }, keepT))
          .as(c)
      }

      val merged = joined.where(keep).select(tgtCols.map(valueOf): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // ---- phase 3: one anchored commit; emptied partitions drop
      try {
        val survivors = merged.select(col(pc).cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        val priorTouched = touched.filter(m.entries.contains)
        val drops = priorTouched.filterNot(survivors)
        val dropOwners = drops.flatMap(p => m.entries.get(p).map(p -> _)).toMap
        val staged =
          if (survivors.isEmpty) { // all touched rows deleted: drop-only
            require(drops.nonEmpty, "empty merge result with nothing to drop")
            AtomicCommit.Staged("", pc, Nil, m.version, dropOwners, drops = drops)
          } else { // stage reads back from the cache, not a second join
            val s = AtomicCommit.stage(spark, root, store, merged, pc, 1, Some(m))
            s.copy(drops = drops, baseOwners = s.baseOwners ++ dropOwners)
          }
        AtomicCommit.publish(root, store, staged)
      } finally merged.unpersist()
    }

    /** The insert-only lowering: anti-join against one column-pruned key
      * scan, clause cascade on the survivors, ONE APPEND commit. Types
      * cast to the target schema so the appended generation's footers
      * agree with the table's. Returns the current version untouched
      * when nothing inserts.
      */
    private def insertOnly(src: DataFrame, m: AtomicCommit.Manifest,
                           pc: String,
                           tgtSchema: org.apache.spark.sql.types.StructType,
                           tgtCols: Seq[String],
                           evolve: Boolean = false): Long = {
      val tgtKeys = AtomicCommit.scanManifest(spark, root, m)
        .select(keys.map(col): _*)
      val anti = src.alias("s").join(tgtKeys,
        keys.map(k => col(s"s.$k") === tgtKeys(k)).reduce(_ && _), "left_anti")
      val keep = notMatched.foldRight(lit(false)) { (c, acc) =>
        when(c.cond.getOrElse(lit(true)), lit(true)).otherwise(acc)
      }
      def valueOf(c: String): Column = {
        val dt = tgtSchema(c).dataType
        def insVal(values: Map[String, Column]): Column =
          if (values.isEmpty) {
            if (!srcHas(src, c)) {
              require(evolve,
                s"Merge insertAll: source lacks target column $c")
              lit(null).cast(dt)
            } else col(s"s.$c")
          } else values.getOrElse(c, lit(null))
        notMatched.foldRight(lit(null).cast(dt)) { (cl, acc) =>
          cl match {
            case Insert(cond, values) =>
              when(cond.getOrElse(lit(true)), insVal(values).cast(dt))
                .otherwise(acc)
            case _ => acc
          }
        }.as(c)
      }
      val rows = anti.where(keep).select(tgtCols.map(valueOf): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (rows.where(col(pc).isNull).limit(1).count() > 0)
          sys.error("Merge: an insert clause produces rows with a NULL " +
            s"partition value for $pc — route them to an explicit value")
        if (rows.isEmpty) m.version // nothing new: no version burned
        else AtomicCommit.commitAppendPartitions(spark, root, store, rows, pc, 1)
      } finally rows.unpersist()
    }

    private def sourceKeysAmbiguous(src: DataFrame): Boolean =
      src.groupBy(keys.map(col): _*).count()
        .where(col("count") > 1).limit(1).count() > 0
  }
}
