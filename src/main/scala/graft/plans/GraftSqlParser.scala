package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}

import graft.sources.{AtomicCommit, BranchStore, Compaction, DataSkipping, Deletes, ManifestStore, PosixManifestStore, TableStats}

/** SQL MAINTENANCE STATEMENTS for graft tables — the operational verbs
  * Delta/Iceberg expose in SQL, grafted onto the session parser:
  *
  * {{{
  * OPTIMIZE graft.docs                       -- small-file compaction
  * OPTIMIZE graft.docs ZORDER BY (a, b)     -- multi-dim recluster
  * OPTIMIZE graft.docs ZORDER BY (a)        -- 1 col = plain recluster
  * OPTIMIZE graft.docs ZORDER BY (a) BLOOM FOR (id) -- + per-file blooms
  * VACUUM graft.docs                         -- default retention
  * VACUUM graft.docs RETAIN 5 VERSIONS      -- time-travel horizon
  * VACUUM graft.docs RETAIN 72 HOURS        -- wall-clock window
  * DESCRIBE HISTORY graft.docs               -- the commit log, newest first
  * DESCRIBE DETAIL graft.docs                -- one-row operational metadata
  * }}}
  *
  * Injected by [[GraftExtensions]] via `injectParser`: statements whose
  * FIRST TOKEN is OPTIMIZE or VACUUM and whose target is `graft.<name>`
  * (the same `spark.graft.table.<name>` registry as the catalog;
  * `` graft.`name@branch` `` addresses a branch where the operation
  * supports one) parse into runnable commands; everything else — every
  * query, every standard statement — passes VERBATIM to Spark's own
  * parser, so the extension can never change the meaning of SQL it
  * doesn't own. Statements that LOOK like maintenance but don't parse
  * (bad retention unit, missing registry entry) fail loudly at execution
  * rather than falling through to Spark's parser's confusing `OPTIMIZE
  * is not a keyword` error.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {

  // graft.name | graft.`name@branch`; statements tolerate a trailing
  // semicolon — every regex ends with $Tail
  private val Target = raw"graft\.(?:`([^`]+)`|(\w+))"
  private val Tail = raw"\s*;?\s*"
  private val OptimizeRe =
    raw"(?is)\s*OPTIMIZE\s+$Target$Tail".r
  // MATERIALIZE DELETES: resolve outstanding equality-delete records
  // into position bitmaps reading only the marked partitions —
  // O(touched), no data rewrite
  private val OptimizeMatRe =
    raw"(?is)\s*OPTIMIZE\s+$Target\s+MATERIALIZE\s+DELETES$Tail".r
  private val OptimizeZRe =
    raw"(?is)\s*OPTIMIZE\s+$Target\s+ZORDER\s+BY\s*\(([^)]+)\)$Tail".r
  // BLOOM FOR: per-file bloom sidecars on point-lookup columns the sort
  // order can't serve (their values interleave across the sorted files)
  private val OptimizeZBloomRe =
    raw"(?is)\s*OPTIMIZE\s+$Target\s+ZORDER\s+BY\s*\(([^)]+)\)\s+BLOOM\s+FOR\s*\(([^)]+)\)$Tail".r
  private val VacuumRe =
    raw"(?is)\s*VACUUM\s+$Target$Tail".r
  private val VacuumRetainRe =
    raw"(?is)\s*VACUUM\s+$Target\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS)$Tail".r
  private val DescHistRe =
    raw"(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+$Target$Tail".r
  private val DescDetailRe =
    raw"(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+$Target$Tail".r
  private val AnalyzeRe =
    raw"(?is)\s*ANALYZE\s+TABLE\s+$Target\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+(?:ALL\s+(COLUMNS)|COLUMNS\s+([^;]+?)))?$Tail".r
  // ANALYZE TABLE is Spark grammar (and analysis-rejected for v2 tables),
  // so claim it only when the target is catalog-qualified ours — every
  // other ANALYZE passes through untouched
  private val AnalyzeLeadRe =
    raw"(?is)\s*ANALYZE\s+TABLE\s+graft\..*".r
  // leading-keyword claim, scoped to OUR targets: a statement starting
  // with OPTIMIZE/VACUUM/DESCRIBE HISTORY whose target is graft-qualified
  // is ours even when malformed — a near-miss (unsupported retention
  // unit, malformed ZORDER list) fails HERE with the supported grammar
  // instead of falling through to Spark's parser and dying with an
  // unrelated PARSE_SYNTAX_ERROR (the fail-loudly contract). The same
  // keywords over OTHER targets (Delta's `OPTIMIZE delta_tbl`, another
  // extension's VACUUM) are NOT ours and pass to the delegate chain —
  // the claim requires `graft.` after the keyword, exactly like
  // AnalyzeLeadRe above.
  private val MaintLeadRe =
    raw"(?is)\s*(OPTIMIZE|VACUUM|DESC(?:RIBE)?\s+(?:HISTORY|DETAIL))\s+graft\..*".r

  private def colList(cols: String): Seq[String] =
    cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq

  private[plans] def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeMatRe(bq, plain) =>
        Some(MaterializeDeletesGraftTable(Option(bq).getOrElse(plain)))
      case OptimizeZBloomRe(bq, plain, cols, blooms) =>
        Some(OptimizeGraftTable(Option(bq).getOrElse(plain),
          colList(cols), colList(blooms)))
      case OptimizeZRe(bq, plain, cols) =>
        Some(OptimizeGraftTable(Option(bq).getOrElse(plain),
          colList(cols)))
      case OptimizeRe(bq, plain) =>
        Some(OptimizeGraftTable(Option(bq).getOrElse(plain), Nil))
      case VacuumRetainRe(bq, plain, n, unit) =>
        Some(VacuumGraftTable(Option(bq).getOrElse(plain),
          if (unit.equalsIgnoreCase("VERSIONS")) Some(n.toInt) else None,
          if (unit.equalsIgnoreCase("HOURS")) Some(n.toLong * 3600 * 1000) else None))
      case VacuumRe(bq, plain) =>
        Some(VacuumGraftTable(Option(bq).getOrElse(plain), None, None))
      case DescHistRe(bq, plain) =>
        Some(DescribeHistoryGraftTable(Option(bq).getOrElse(plain)))
      case DescDetailRe(bq, plain) =>
        Some(DescribeDetailGraftTable(Option(bq).getOrElse(plain)))
      case AnalyzeRe(bq, plain, all, colList) =>
        Some(AnalyzeGraftTable(Option(bq).getOrElse(plain),
          if (all != null || colList == null) None
          else Some(colList.split(',')
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq)))
      case AnalyzeLeadRe() => sys.error(
        s"graft: cannot parse ANALYZE statement: ${sqlText.trim}\n" +
          "supported forms:\n" +
          "  ANALYZE TABLE graft.<table> COMPUTE STATISTICS" +
          " [FOR COLUMNS c1, c2, ... | FOR ALL COLUMNS]")
      case MaintLeadRe(kw) => sys.error(
        s"graft: cannot parse ${kw.toUpperCase} statement: ${sqlText.trim}\n" +
          "supported forms:\n" +
          "  OPTIMIZE graft.<table> [ZORDER BY (col1, col2, ...)" +
          " [BLOOM FOR (cols)]]\n" +
          "  OPTIMIZE graft.<table> MATERIALIZE DELETES\n" +
          "  VACUUM graft.<table> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]\n" +
          "  DESCRIBE HISTORY graft.<table>\n" +
          "  DESCRIBE DETAIL graft.<table>")
      case _ => None
    }

  /** `name` or `name@branch` → (root, store). */
  private[plans] def resolve(spark: SparkSession,
                             ident: String): (String, ManifestStore, Option[String]) = {
    val (table, branch) = ident.split('@') match {
      case Array(t, b) => (t, Some(b))
      case _ => (ident, None)
    }
    val root = spark.conf.getOption(s"spark.graft.table.$table").getOrElse(
      sys.error(s"graft: no table named '$table' — register it with " +
        s"SET spark.graft.table.$table=<root>"))
    val store = branch match {
      case Some(b) => new BranchStore(new PosixManifestStore(root), b)
      case None => new PosixManifestStore(root)
    }
    (root, store, branch)
  }
}

/** `OPTIMIZE graft.t [ZORDER BY (cols)]`: zero cols = small-file
  * compaction; one col = sort-order recluster; 2–4 = z-order recluster.
  * Returns one row `(files_before, files_after)`.
  */
final case class OptimizeGraftTable(ident: String, zCols: Seq[String],
                                    bloomCols: Seq[String] = Nil)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, store, branch) = GraftSqlParser.resolve(spark, ident)
    val (before, after) = zCols match {
      case Nil =>
        Compaction.compactAtomicTable(spark, root, store,
          filesPerDir = 1, vacuumNow = false, statsCols = Nil)
      case cols =>
        require(branch.isEmpty,
          s"OPTIMIZE ... ZORDER BY on branch '$ident' is unsupported — " +
            "recluster the main lineage, or use the Scala API after merge")
        if (cols.size == 1)
          Compaction.recluster(spark, root, cols, bloomCols = bloomCols)
        else
          Compaction.reclusterZorder(spark, root, cols, bloomCols = bloomCols)
    }
    Seq(Row(before, after))
  }
}

/** `OPTIMIZE graft.t MATERIALIZE DELETES` — resolve the table's
  * outstanding equality-delete records into position bitmaps
  * ([[graft.sources.Deletes.materializeEqDeletes]]): reads only the
  * marked partitions, a delete-set-sized vector commit, no data
  * rewrite — after it every position-evidence fast path (the
  * storage-partitioned batch face, the bitmap-served scan) serves the
  * table again and the per-scan NOT-IN residual is gone. Returns one
  * row `(materialized, version)`; `(false, null)` when no records are
  * outstanding (no version burned).
  */
final case class MaterializeDeletesGraftTable(ident: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("materialized", BooleanType, nullable = false)(),
    AttributeReference("version", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, store, _) = GraftSqlParser.resolve(spark, ident)
    val v = Deletes.materializeEqDeletes(spark, root, store)
    Seq(Row(v.isDefined, v.map(Long.box).orNull))
  }
}

/** `DESCRIBE HISTORY graft.t` (branch-addressable via
  * `` graft.`t@dev` ``) — the readable commit log as a result set,
  * NEWEST first, resolved entirely from retained on-disk manifests
  * ([[AtomicCommit.history]]: driver metadata, no data I/O). Depth is
  * whatever vacuum retention (and tags) kept.
  */
final case class DescribeHistoryGraftTable(ident: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", StringType, nullable = true)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("num_partitions", LongType, nullable = false)(),
    AttributeReference("changed_partitions", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, store, _) = GraftSqlParser.resolve(spark, ident)
    AtomicCommit.history(store, root).reverse.map { ci =>
      val when = ci.props.get(AtomicCommit.CommitWhenProp)
        .flatMap(_.toLongOption)
        .map(ms => java.time.Instant.ofEpochMilli(ms).toString).orNull
      Row(ci.version, when, ci.kind, ci.numPartitions.toLong,
        ci.changedPartitions.map(_.mkString(",")).orNull)
    }
  }
}

/** `DESCRIBE DETAIL graft.t` (branch-addressable via `` graft.`t@dev` ``)
  * — one row of operational table metadata, Delta's DESCRIBE DETAIL
  * shape re-expressed for this format: location, partition column,
  * current version + commit stamp, partition/file/byte/generation
  * counts (all from [[TableStats]]' manifest walk — no data I/O), the
  * CHECK constraints, and the schema-mapping state (rename chain,
  * dropped set, widening targets, ALTER-added columns) that explains
  * why old generations read differently than their footers.
  */
final case class DescribeDetailGraftTable(ident: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("partition_col", StringType, nullable = false)(),
    AttributeReference("partition_spec", StringType, nullable = true)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", StringType, nullable = true)(),
    AttributeReference("num_partitions", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_generations", LongType, nullable = false)(),
    AttributeReference("constraints", StringType, nullable = true)(),
    AttributeReference("renamed_columns", StringType, nullable = true)(),
    AttributeReference("dropped_columns", StringType, nullable = true)(),
    AttributeReference("widened_columns", StringType, nullable = true)(),
    AttributeReference("added_columns", StringType, nullable = true)(),
    AttributeReference("sort_order", StringType, nullable = true)(),
    AttributeReference("num_delete_vectors", LongType, nullable = false)(),
    AttributeReference("num_equality_deletes", LongType, nullable = false)(),
    AttributeReference("auto_materialize", StringType, nullable = false)(),
    AttributeReference("last_heal_version", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, store, _) = GraftSqlParser.resolve(spark, ident)
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"graft: no committed table at $root"))
    val when = m.props.get(AtomicCommit.CommitWhenProp)
      .flatMap(_.toLongOption)
      .map(ms => java.time.Instant.ofEpochMilli(ms).toString).orNull
    val gens = m.ownerGens
    // LIVE files only — the generation's file index when present (the
    // same catalog the scan plans from, so num_files matches the
    // planned file set), else the shared one-walk-per-generation
    // fallback; only (gen, partition) pairs the manifest owns count,
    // so superseded partition dirs a prior REPLACE left behind in a
    // shared generation never inflate num_files vs size_bytes
    val files = m.entries.toSeq.flatMap { case (pv, entry) =>
      AtomicCommit.ownersOf(entry).map(_ -> pv)
    }.groupBy(_._1).toSeq.map { case (g, ps) =>
      val owned = ps.iterator.map(_._2).toSet
      // fully-owned generation: the stage-time digest answers in O(1)
      // (owned ⊆ on-disk, so equal cardinality + set signature is whole
      // ownership)
      graft.sources.DataSkipping.readDigest(root, g) match {
        case Some((parts, nFiles, _, psig)) if parts == owned.size &&
            psig == graft.sources.DataSkipping.partSig(owned) => nFiles
        case _ =>
          graft.sources.DataSkipping.readFileIndex(root, g) match {
            case Some(ix) =>
              owned.iterator.map(pv => ix.getOrElse(pv, Nil).size.toLong).sum
            case None =>
              var n = 0L
              TableStats.walkGenFiles(root, g, m.partitionCol) { (pv, _) =>
                if (owned(pv)) n += 1
              }
              n
          }
      }
    }.sum
    def orNull(s: String): String = if (s.isEmpty) null else s
    val cons = AtomicCommit.constraints(store).toSeq.sorted
      .map { case (n, sql) => s"$n CHECK ($sql)" }.mkString("; ")
    val renamed = AtomicCommit.renamesOf(m)
      .map { case (o, nn) => s"$o>$nn" }.mkString(";")
    val dropped = AtomicCommit.droppedOf(m).toSeq.sorted.mkString(";")
    val widened = AtomicCommit.widenedOf(m)
      .map { case (c, t) => s"$c>${t.sql}" }.mkString(";")
    val added = m.props.getOrElse(AtomicCommit.SchemaAddedProp, "")
    // the sort order IN EFFECT: the SAME scan-verified claim the batch
    // face serves ([[GraftBatchScan.provenSortOrder]] — sole ownership
    // plus the sidecar evidence: null-freedom and non-interleaved
    // cross-file bounds), so DESCRIBE DETAIL never reports an order
    // (e.g. on a nullable column) that no scan will actually serve
    // sort-free. Computed over the full entry set with every recorded
    // column "projected" — the verified prefix is what prints.
    val sortOrder = {
      val cols = graft.sources.GraftBatchScan.provenSortOrder(
        root, m, m.entries, _ => true)
      if (cols.isEmpty) null else cols.mkString(",")
    }
    val dvEntries = m.entries.values.flatMap(AtomicCommit.dvOf).toSeq
    // outstanding equality records scoped to live entries — the count
    // that gates the batch face out (OPTIMIZE ... MATERIALIZE DELETES
    // resolves them)
    // grouped by vector generation so each _graft_eq.jsonl is read and
    // parsed ONCE, however many partitions share it — O(generations)
    // driver I/O, not O(partitions × file)
    val eqCount = m.entries.toSeq
      .flatMap { case (p, e) => AtomicCommit.dvOf(e).map(_ -> p) }
      .groupBy(_._1).toSeq.map { case (g, pairs) =>
        val parts = pairs.map(_._2).toSet
        AtomicCommit.readEqs(root, g).count(e => parts(e.partition)).toLong
      }.sum
    // the hidden-partitioning transform behind the derived partition
    // column (days(ts), bucket(16,k), …) — what the batch face reports
    // as its key grouping; null for identity-partitioned tables
    val spec = graft.sources.HiddenPartitioning.specOf(m)
      .map(_.render).orNull
    // the read path's self-heal policy surface: what THIS session's
    // next face read would apply (conf caps, or "off"), and the last
    // read-triggered maintenance commit the table carries — together
    // the operator's answer to "can/did a SELECT commit here"
    val healPolicy = graft.sources.GraftBatchScan.autoMaterializePolicy(spark)
    val lastHeal = m.props.get(AtomicCommit.HealVersionProp)
      .flatMap(_.toLongOption).map(java.lang.Long.valueOf).orNull
    Seq(Row("graft", root, m.partitionCol, spec, m.version, when,
      m.entries.size.toLong, files, TableStats.sizeInBytes(root, m),
      gens.length.toLong, orNull(cons), orNull(renamed), orNull(dropped),
      orNull(widened), orNull(added), sortOrder,
      dvEntries.length.toLong, eqCount, healPolicy, lastHeal))
  }
}

/** `ANALYZE TABLE graft.t COMPUTE STATISTICS [FOR COLUMNS ... | FOR ALL
  * COLUMNS]` — retrofit/refresh the skipping + NDV sidecars over the
  * current snapshot's generations ([[DataSkipping.analyze]]: only
  * generations with missing evidence are touched, so re-running is
  * free), then one metadata commit so the planner's snapshot-keyed
  * statistics caches pick the new evidence up. No FOR clause (or FOR
  * ALL COLUMNS) analyzes every supported (numeric/string) non-partition
  * column. Returns the table-level statistics per analyzed column —
  * rows/non-null/NDV and numeric bounds — the same numbers
  * [[TableStats.columnStats]] now feeds selectivity from.
  */
final case class AnalyzeGraftTable(ident: String,
                                   colsOpt: Option[Seq[String]])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)(),
    AttributeReference("non_null", LongType, nullable = false)(),
    AttributeReference("ndv", LongType, nullable = false)(),
    AttributeReference("min", StringType, nullable = true)(),
    AttributeReference("max", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    val (root, store, _) = GraftSqlParser.resolve(spark, ident)
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"graft: ANALYZE needs a committed table at $root"))
    val schema = AtomicCommit.scanManifest(spark, root, m).schema
    def supported(n: String): Boolean = schema.find(_.name == n).exists(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType == TimestampType || f.dataType == DateType)
    val cols = colsOpt match {
      case Some(cs) =>
        cs.foreach { c =>
          if (c == m.partitionCol) sys.error(
            s"graft: $c is the partition column — its statistics ARE the " +
              "manifest (every partition holds exactly its value)")
          if (!schema.exists(_.name == c)) sys.error(
            s"graft: no column $c in $ident (columns: " +
              s"${schema.fieldNames.mkString(", ")})")
          if (!supported(c)) sys.error(
            s"graft: column $c has an unsupported type for statistics " +
              "(numeric and string columns only)")
        }
        cs
      case None => schema.fields.toSeq
        .filter(f => f.name != m.partitionCol && supported(f.name))
        .map(_.name)
    }
    if (cols.isEmpty) sys.error(
      s"graft: $ident has no numeric/string column to analyze")
    val written = DataSkipping.analyze(spark, root, m, cols)
    val m2 =
      if (written == 0) m // evidence complete: burn no version
      else {
        AtomicCommit.recordAnalyzed(root, store, cols)
        AtomicCommit.readManifest(store).get
      }
    val parts = m2.entries.keySet
    cols.sorted.map { c =>
      TableStats.columnStats(root, m2, c, parts) match {
        case Some(cs) => Row(c, cs.rows, cs.nonNull, cs.ndv,
          cs.numMin.map(_.toString).orNull, cs.numMax.map(_.toString).orNull)
        case None => Row(c, 0L, 0L, 0L, null, null) // column has no data
      }
    }
  }
}

/** `VACUUM graft.t [RETAIN n VERSIONS | RETAIN n HOURS]`. Returns the
  * removed paths, one row each (empty result = nothing eligible).
  */
final case class VacuumGraftTable(ident: String, keepVersions: Option[Int],
                                  retainMillis: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, store, _) = GraftSqlParser.resolve(spark, ident)
    val removed = AtomicCommit.vacuum(root, store,
      AtomicCommit.OrphanRetentionMillis,
      keepVersions.getOrElse(1), retainMillis.getOrElse(0L))
    removed.map(Row(_))
  }
}
