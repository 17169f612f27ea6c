package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL-surface addressing for [[AtomicCommit]] manifest tables — the thin
  * registration that lets the SQL layer name a table and inherit the
  * whole stack (manifest resolution, owner lists, deletion-vector merge,
  * partition/stats skipping, time travel, branches) without the caller
  * touching the Scala API:
  *
  * {{{
  * CREATE TEMPORARY VIEW corpus
  * USING graft OPTIONS (path '/data/corpus')
  * -- then: SELECT lang, count(*) FROM corpus WHERE lang = 'de' GROUP BY 1
  * }}}
  *
  * or `spark.read.format("graft").option("path", root).load()`. Options:
  *
  *  - `path` (required) — the table root.
  *  - `versionAsOf` — time travel to a still-retained snapshot version
  *    (the option-form of `VERSION AS OF`; the DSv2 SQL syntax needs a
  *    catalog-registered connector, out of this relation's scope).
  *  - `tagAsOf` — time travel by tag name.
  *  - `timestampAsOf` — time travel by wall clock (epoch millis or a
  *    `yyyy-mm-dd hh:mm:ss` literal): the latest version committed at or
  *    before it, resolved from the commit stamps every published
  *    manifest carries ([[AtomicCommit.CommitWhenProp]]).
  *  - `branch` — read a branch lineage instead of main.
  *
  * Architecture: the V1 relation API is the deliberate choice here —
  * `PrunedFilteredScan.buildScan` hands back an RDD, which lets this
  * relation DELEGATE the actual reading to [[AtomicCommit.scanManifest]]
  * (the same DataFrame plan every Scala-API read uses: parquet vectorized
  * scan, DV anti-join, schema evolution) instead of re-implementing a
  * parquet reader behind the DSv2 `PartitionReaderFactory` contract.
  * Pushed filters drive MANIFEST-level pruning before that plan is even
  * built — partition-column equality/IN prunes entries directly, and
  * range/equality bounds on stats-annotated columns prune through
  * [[DataSkipping]]'s evidence — so directories a filter excludes are
  * never listed, the same stronger-than-PartitionFilters guarantee the
  * Scala API gives. All filters are reported unhandled: Spark re-applies
  * them on top, so pruning is pure optimization and the residual
  * evaluation runs in codegen.
  */
final class GraftDataSource extends RelationProvider with StreamSourceProvider
  with StreamSinkProvider with CreatableRelationProvider
  with DataSourceRegister {
  override def shortName(): String = "graft"

  // ---- streaming face: `spark.readStream.format("graft")` — manifest
  // versions are the offsets; see [[graft.streaming.GraftStreamSource]]
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val root = parameters.getOrElse("path",
      sys.error("graft stream source: the 'path' option is required"))
    val store = graft.streaming.GraftStreamSource.storeFor(root, parameters)
    val feed = graft.streaming.GraftStreamSource.feedFor(parameters)
    (shortName(), schema.getOrElse(graft.streaming.GraftStreamSource
      .schemaFor(sqlContext.sparkSession, root, store, feed)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val root = parameters.getOrElse("path",
      sys.error("graft stream source: the 'path' option is required"))
    val store = graft.streaming.GraftStreamSource.storeFor(root, parameters)
    val feed = graft.streaming.GraftStreamSource.feedFor(parameters)
    new graft.streaming.GraftStreamSource(sqlContext, root, store, feed,
      parameters.get("keyCol"),
      schema.getOrElse(graft.streaming.GraftStreamSource
        .schemaFor(sqlContext.sparkSession, root, store, feed)),
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      metadataPath,
      {
        if (parameters.contains("startingVersion") &&
          parameters.contains("startingTimestamp"))
          sys.error("graft stream source: startingVersion and " +
            "startingTimestamp are mutually exclusive")
        parameters.get("startingVersion").map {
          case "latest" => graft.sources.AtomicCommit.readManifest(store)
            .map(_.version + 1).getOrElse(1L) // resolved head: an undecided
            // in-flight transaction's versions still stream once decided
          case v => v.toLong
        }.orElse(parameters.get("startingTimestamp").map { ts =>
          // start at the first version committed AFTER the instant: the
          // as-of resolution names the version current AT it (already
          // consumed by whoever was reading then), so streaming resumes
          // one past it — epoch millis or a `yyyy-mm-dd hh:mm:ss`
          // literal. An instant predating every retained commit streams
          // the table from its earliest retained version.
          val millis = ts.toLongOption.getOrElse(
            java.sql.Timestamp.valueOf(ts).getTime)
          try graft.sources.AtomicCommit
            .versionAsOfTimestamp(store, root, millis) + 1L
          catch {
            case e: RuntimeException if e.getMessage.contains("predates") =>
              graft.sources.AtomicCommit.versions(store).headOption
                .getOrElse(1L)
          }
        })
      })
  }

  // ---- streaming sink face: `df.writeStream.format("graft")` — see
  // [[graft.streaming.GraftStreamSink]]
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val rawPath = parameters.getOrElse("path",
      sys.error("graft stream sink: the 'path' option is required"))
    val root =
      if (rawPath.contains('/')) rawPath
      else sqlContext.sparkSession.conf
        .getOption(s"spark.graft.table.$rawPath").getOrElse(
          sys.error(s"graft: no table named '$rawPath' — register it with " +
            s"SET spark.graft.table.$rawPath=<table root> (or pass a path)"))
    val store = graft.streaming.GraftStreamSource.storeFor(root, parameters)
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "upsert",
      s"graft stream sink: mode must be 'append' or 'upsert', got $mode")
    new graft.streaming.GraftStreamSink(root, store,
      parameters.get("partitionCol").orElse(partitionColumns.headOption),
      parameters.getOrElse("queryKey", "stream"), mode,
      parameters.get("keyCol"), parameters.get("seqCol"),
      parameters.get("deleteCol"),
      parameters.get("statsCols").toSeq.flatMap(_.split(','))
        .map(_.trim).filter(_.nonEmpty))
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val rawPath = parameters.getOrElse("path",
      sys.error("graft data source: the 'path' option is required"))
    // CATALOG-STYLE names: `SELECT ... FROM graft.docs` arrives here via
    // Spark's datasource-on-path resolution with path = "docs" — a bare
    // name (no separator) resolves through the session registry
    // `spark.graft.table.<name> = <root>`, with `name@branch` selecting
    // a branch lineage. Real paths pass through untouched.
    val (root, nameBranch) =
      if (rawPath.contains('/')) (rawPath, None)
      else {
        val (t, b) = rawPath.split('@') match {
          case Array(t0, b0) => (t0, Some(b0))
          case _ => (rawPath, None)
        }
        (spark.conf.getOption(s"spark.graft.table.$t").getOrElse(
          sys.error(s"graft: no table named '$t' — register it with " +
            s"SET spark.graft.table.$t=<table root> (or pass a path)")),
          b)
      }
    val store: ManifestStore = parameters.get("branch").orElse(nameBranch) match {
      case Some(b) => new BranchStore(new PosixManifestStore(root), b)
      case None => new PosixManifestStore(root)
    }
    // versionAsOf/tagAsOf/timestampAsOf PIN a snapshot; without them the
    // relation re-resolves the manifest per scan, so a long-lived view
    // tracks the table across commits instead of freezing at registration
    // time. timestampAsOf accepts epoch millis or a `Timestamp.valueOf`
    // literal (`yyyy-mm-dd hh:mm:ss[.f…]`), session-timezone-free.
    val asOfKeys = Seq("versionAsOf", "tagAsOf", "timestampAsOf")
      .filter(parameters.contains)
    if (asOfKeys.size > 1)
      sys.error(s"graft data source: ${asOfKeys.mkString(" and ")} are " +
        "mutually exclusive")
    val pinned = (parameters.get("versionAsOf"), parameters.get("tagAsOf"),
        parameters.get("timestampAsOf")) match {
      case (Some(v), _, _) =>
        Some(AtomicCommit.manifestAt(store, root, v.toLong))
      case (_, Some(t), _) =>
        Some(AtomicCommit.manifestAt(store, root, AtomicCommit.tags(store)
          .getOrElse(t, sys.error(s"no tag $t at $root (tags: " +
            s"${AtomicCommit.tags(store).keys.toSeq.sorted.mkString(", ")})"))))
      case (_, _, Some(ts)) =>
        val millis = ts.toLongOption.getOrElse(
          java.sql.Timestamp.valueOf(ts).getTime)
        Some(AtomicCommit.manifestAt(store, root,
          AtomicCommit.versionAsOfTimestamp(store, root, millis)))
      case _ =>
        AtomicCommit.readManifest(store).getOrElse(
          sys.error(s"no manifest at $root — not an AtomicCommit table"))
        None
    }
    new GraftRelation(spark, root, store, pinned)
  }

  // ---- write face: `df.write.format("graft").mode(...)` and, through
  // [[GraftRelation]]'s InsertableRelation, `INSERT INTO view ...`.
  // Append commits the batch as appended generations (O(batch), existing
  // rows untouched); Overwrite replaces the WHOLE table in one commit
  // (staged partitions replace, vanished ones drop — partition-level
  // replace is the Scala API's commitReplacePartitions). A new table
  // needs the `partitionCol` option; an existing one rejects a
  // conflicting value. `statsCols`/`bloomCols` (comma-separated)
  // annotate the staged generation so SQL-written data skips like
  // API-written data.
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path",
      sys.error("graft data source: the 'path' option is required"))
    val store: ManifestStore = parameters.get("branch") match {
      case Some(b) => new BranchStore(new PosixManifestStore(root), b)
      case None => new PosixManifestStore(root)
    }
    val existing = AtomicCommit.readManifest(store)
    mode match {
      case SaveMode.ErrorIfExists if existing.nonEmpty =>
        sys.error(s"graft table at $root already exists (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if existing.nonEmpty => // no-op by contract
      case _ =>
        val pc = existing.map(_.partitionCol)
          .orElse(parameters.get("partitionCol")).getOrElse(
            sys.error("graft data source: a new table needs the " +
              "partitionCol option"))
        existing.foreach(m => parameters.get("partitionCol").foreach(p =>
          require(p == m.partitionCol,
            s"table at $root is partitioned by ${m.partitionCol}, not $p")))
        GraftDataSource.write(data, root, store, pc,
          overwrite = mode == SaveMode.Overwrite,
          statsCols = splitCols(parameters, "statsCols"),
          bloomCols = splitCols(parameters, "bloomCols"))
    }
    new GraftRelation(sqlContext.sparkSession, root, store, None)
  }

  private def splitCols(parameters: Map[String, String], key: String): Seq[String] =
    parameters.get(key).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
}

/** V1 `Filter` → `Column` translation for the SQL DELETE face — total
  * over the filter grammar Spark pushes for row-level deletes; `None`
  * marks the untranslatable rest, which [[GraftTable.canDeleteWhere]]
  * turns into an up-front rejection instead of a half-applied delete.
  */
private[sources] object FilterColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(x) => toColumn(x).map(not)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

object GraftRelation extends org.apache.spark.internal.Logging {
  private val DiscoveryParallelismKey =
    "spark.sql.sources.parallelPartitionDiscovery.parallelism"

  /** Bound the file-listing job's task count, once, unless the user
    * chose one: Spark's default (10000) makes the partition-discovery
    * job schedule ONE TASK PER DIRECTORY, so a 50k-partition table pays
    * ~2 ms of scheduler overhead per directory on every unpruned scan —
    * measured 9.8 s → 0.9 s at 16M rows / 5,000 dirs (TableBench
    * `meta`) by bounding tasks so each lists a batch of prefixes. The
    * bound scales with the cluster (2× default parallelism, floored at
    * 64 so small drivers still fan out against high-latency stores,
    * capped at 1024). Set-once and monotonic — never toggled around a
    * read (the r13 inference-conf race lesson). "Explicitly set" is
    * tested with [[org.apache.spark.sql.internal.SQLConf.contains]]
    * (the set-entries map), NOT getOption — getOption returns the
    * registered DEFAULT for unset keys, which both clobbered a
    * deliberate user 10000 and re-clobbered any later user change back
    * to it; contains also makes our own set sticky, so this really is
    * one write per session.
    *
    * DELIBERATE SESSION-WIDE SIDE EFFECT: the conf governs EVERY
    * file-source listing in the session, so instantiating any graft
    * relation also bounds the discovery task count for non-graft parquet
    * scans from then on. Scoping it to graft's own reads (a set/restore
    * around relation construction) would race concurrent planning
    * threads — the r13 inference-conf lesson — so the set is one-shot
    * and monotone instead, announced at INFO once. The bound is a
    * strict improvement for any directory count where it matters (it
    * caps scheduler overhead, never listing parallelism below 64), a
    * user-set value always wins, and index-backed graft tables skip the
    * listing entirely ([[graft.sources.GraftFileIndex]]).
    */
  private[sources] def tunePartitionDiscovery(spark: SparkSession): Unit =
    if (!spark.sessionState.conf.contains(DiscoveryParallelismKey)) {
      val n = math.min(1024,
        math.max(64, spark.sparkContext.defaultParallelism * 2))
      spark.conf.set(DiscoveryParallelismKey, n.toString)
      logInfo(s"graft: bounded $DiscoveryParallelismKey=$n for this " +
        "session (session-wide — affects all file-source listings; " +
        "set it yourself to override)")
    }

  /** Equality-set pruning cap: above this many IN values, per-value
    * evidence testing stops being driver-affordable even with local
    * hashing and the scan stays correct but unpruned. Large sets under
    * the cap test cheaply: bloom probes hash locally
    * ([[DataSkipping.localPositions]]) and interval evidence degrades
    * to the set's overall bounds past [[DataSkipping.EqIntervalCap]].
    * The runtime-filter rule applies its own key budgets before a
    * filter ever reaches here (`bloomMaxKeys` must stay under this
    * cap, or the delivered set is ignored). 2^18 bounds the worst-case
    * driver hashing at ~1M expression evals — low seconds, paid only
    * when bloom evidence exists to probe.
    */
  private[sources] val EqSetPruneCap = 1 << 18

  /** Hive-layout name mapping: manifest entry keys are the RAW
    * directory names `partitionBy` wrote — special characters escaped,
    * a null value as the default-partition sentinel — while row values
    * (and probe values) are the DECODED forms Spark's partition
    * discovery yields. Every partition-key comparison maps the PROBE
    * through the same escape, or it silently misses the partition.
    */
  private[sources] def dirNameOf(v: Any): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(String.valueOf(v))

  /** The directory name a NULL partition value writes to. Rows under it
    * decode back to null — so no equality probe ever matches them, and
    * a decoded value equal to this literal cannot exist.
    */
  private[sources] val NullPartitionName: String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .DEFAULT_PARTITION_NAME

  /** The directory name holding rows whose partition value DECODES to
    * `v` (null → the sentinel) — the inverse of Spark's partition-value
    * parse, for mapping COLLECTED row values back into manifest space.
    * Every collect that feeds entry lookups, drops, or overrides must
    * pass through this, or escaped/null partitions silently miss.
    */
  private[sources] def rawPartitionName(v: String): String =
    if (v == null) NullPartitionName else dirNameOf(v)

  /** Row-space probe for the partitions named by RAW dir keys `raws`:
    * equality over the decoded forms, IS NULL for the sentinel (whose
    * rows decode to null — `isin` can never match them).
    */
  private[sources] def rawKeyProbe(c: org.apache.spark.sql.Column,
                                   raws: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    val decoded = raws.filterNot(_ == NullPartitionName)
      .map(org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName)
    val eq = if (decoded.isEmpty) lit(false) else c.isin(decoded: _*)
    if (raws.contains(NullPartitionName)) eq || c.isNull else eq
  }

  /** A probe value that names exactly its directory: escaping is the
    * identity and it is not the null sentinel. Only these may be
    * DECLARED handled — for anything else the residual re-evaluation
    * stays above the scan.
    */
  private[sources] def dirFaithful(v: Any): Boolean = {
    val s = String.valueOf(v)
    s != NullPartitionName && dirNameOf(v) == s
  }

  /** A filter FULLY DECIDED by partition-entry pruning: after
    * [[GraftRelation.prunedEntriesFor]] runs, EVERY row of every
    * surviving partition satisfies it — which is exactly the condition
    * under which the sidecars' per-partition row counts describe the
    * filtered result, so a pushed LIMIT can still take the provable
    * partition-prefix path (`WHERE lang='de' LIMIT 10` reads one
    * partition's prefix). Only exact partition-column shapes on
    * dir-faithful values qualify: a hidden-transform SOURCE equality
    * (`ts = x` on a days(ts) table) prunes to the right day but the
    * day holds non-matching rows, and an escape-needing value's rows
    * decode differently than its directory name. IS NOT NULL is
    * decided because pruning drops the null-sentinel entry.
    */
  private[sources] def partitionDecided(pc: String, f: Filter): Boolean =
    f match {
      case EqualTo(`pc`, v) => v != null && dirFaithful(v)
      case EqualNullSafe(`pc`, v) => v != null && dirFaithful(v)
      case In(`pc`, vs) => vs.nonEmpty && !vs.contains(null) &&
        vs.forall(dirFaithful)
      case IsNotNull(`pc`) => true
      case _ => false
    }

  /** Hidden-partitioning transform pruning is per-value DRIVER work
    * (each value maps through the transform and unions the surviving
    * partition sets) — affordable for modest IN lists, not for a
    * 10^5-key runtime filter. Beyond this cap the transform path
    * skips; the set's [min, max] bounds (pushed alongside large
    * runtime sets) still prune through [[HiddenPartitioning
    * .pruneBySource]].
    */
  private[sources] val TransformPruneCap = 4096

  /** The aggregate shapes [[GraftRelation.metadataAggregate]] answers
    * from sidecars: COUNT(*), COUNT(col) (non-distinct), MIN/MAX(col),
    * and SUM(col) over exact-summable (integral/decimal) columns.
    */
  private[sources] sealed trait AggSpec
  private[sources] case object CountStarSpec extends AggSpec
  private[sources] final case class CountColSpec(col: String) extends AggSpec
  private[sources] final case class MinSpec(col: String) extends AggSpec
  private[sources] final case class MaxSpec(col: String) extends AggSpec
  private[sources] final case class SumSpec(col: String) extends AggSpec
}

/** Scan observability for specs and benches: the manifest-entry count
  * of every built scan, per table root, in BUILD ORDER — how a test
  * proves a runtime filter pruned the EXECUTED read (under AQE the scan
  * builds twice: unfiltered at initial planning, re-pruned at the
  * replan). One driver-side map append per scan build; no data-path
  * cost.
  */
object GraftScanProbe {
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, List[Int]]()
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, List[Int]]()
  // a long-lived session builds thousands of scans: keep the newest
  // window per root (observability, not accounting)
  private def push(m: java.util.concurrent.ConcurrentHashMap[String, List[Int]],
                   root: String, n: Int): Unit = {
    m.merge(root, List(n), (a, b) => (a ++ b).takeRight(64))
    if (m.size > 256) m.clear()
  }
  private[sources] def record(root: String, n: Int): Unit =
    push(counts, root, n)
  private[sources] def recordFiles(root: String, n: Int): Unit =
    push(files, root, n)
  def entriesSeen(root: String): Seq[Int] =
    Option(counts.get(root)).getOrElse(Nil)
  /** Individual FILE paths listed per file-pruned scan build (empty when
    * every build took the dir-granular plan).
    */
  def filesSeen(root: String): Seq[Int] =
    Option(files.get(root)).getOrElse(Nil)
  def reset(root: String): Unit = { counts.remove(root); files.remove(root); () }
}

object GraftDataSource {
  /** The shared write body (writer face above, `INSERT INTO` below):
    * stage once, annotate if asked, publish as append or whole-table
    * replace. Overwrite's read set is every current partition (the staged
    * ones replace, the rest drop), anchored at the observed manifest —
    * a concurrent commit aborts it like any other conflicting rewrite.
    */
  private[sources] def write(data: org.apache.spark.sql.DataFrame,
                             root: String, store: ManifestStore, pc: String,
                             overwrite: Boolean,
                             statsCols: Seq[String] = Nil,
                             bloomCols: Seq[String] = Nil): Unit = {
    val spark = data.sparkSession
    val prev = AtomicCommit.readManifest(store)
    val staged0 = AtomicCommit.stage(spark, root, store, data, pc, 1,
      if (overwrite) prev else None)
    if (statsCols.nonEmpty)
      DataSkipping.annotateStaged(spark, root, staged0, statsCols)
    if (bloomCols.nonEmpty)
      DataSkipping.annotateStagedBloom(spark, root, staged0, bloomCols)
    if (overwrite) {
      val stale = prev.map(_.entries).getOrElse(Map.empty) --
        staged0.partitions
      AtomicCommit.publish(root, store, staged0.copy(
        drops = stale.keys.toSeq.sorted,
        baseOwners = staged0.baseOwners ++ stale))
    } else AtomicCommit.publishAppend(root, store, staged0)
    ()
  }
}

/** The snapshot relation: schema and rows come from the SAME
  * [[AtomicCommit.scanManifest]] plan as the Scala API (so SQL reads are
  * never a second, divergent implementation), with pushed-filter manifest
  * pruning in front of it.
  *
  * `declared` is the catalog-DDL declaration ([[GraftCatalog
  * .createTable]]'s `_graft_declared.json`): `(partitionCol, schema)`.
  * Before the first commit it IS the table — declared schema, empty
  * scans, inserts keyed by the declared partition column; after, the
  * footers are the type truth and the declaration only pins the
  * SQL-facing COLUMN ORDER (so `SELECT *` and positional `INSERT` stay
  * stable across the first commit instead of jumping to the
  * partition-column-last physical order).
  */
final class GraftRelation(spark: SparkSession, val root: String,
                          val store: ManifestStore,
                          val pinned: Option[AtomicCommit.Manifest],
                          val declared: Option[(String, StructType)] = None)
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  GraftRelation.tunePartitionDiscovery(spark)

  override def sqlContext: SQLContext = spark.sqlContext

  /** The snapshot this scan reads: the pinned one (versionAsOf/tagAsOf),
    * or the CURRENT manifest re-resolved per call so views track the
    * table across commits; None = a declared table before its first
    * commit.
    */
  private[sources] def snapshotOpt(): Option[AtomicCommit.Manifest] =
    pinned.orElse(AtomicCommit.readManifest(store))

  /** The owning session — the batch-scan face builds its parquet read
    * function against it ([[GraftBatchScan]]).
    */
  private[sources] def session: SparkSession = spark

  private def snapshot(): AtomicCommit.Manifest =
    snapshotOpt().getOrElse(
      sys.error(s"no manifest at $root — not an AtomicCommit table"))

  /** The table's partition column — committed manifest first, the
    * catalog declaration before the first commit.
    */
  private[sources] def partitionColOpt: Option[String] =
    snapshotOpt().map(_.partitionCol).orElse(declared.map(_._1))

  /** `ALTER TABLE ADD COLUMN` columns not yet carried by any footer
    * ([[AtomicCommit.SchemaAddedProp]]): part of the SQL schema, NULL at
    * scan. A name the footers DO carry (post-ALTER data landed) defers
    * to the footer's type — ownership moved with the first write.
    */
  private def addedOf(m: AtomicCommit.Manifest): Seq[org.apache.spark.sql.types.StructField] =
    m.props.get(AtomicCommit.SchemaAddedProp)
      .map(StructType.fromDDL(_).fields.toSeq).getOrElse(Nil)

  override val schema: StructType = {
    // scanSchema, not scanManifest(...).schema: identical logical
    // schema, but O(generations) instead of O(partitions) to construct
    // — a relation (and so a schema) is instantiated several times per
    // query's planning, which at high partition counts made THIS val
    // the dominant planning cost (TableBench `meta`)
    val base = (snapshotOpt(), declared) match {
      case (Some(m), None) => AtomicCommit.scanSchema(spark, root, m)
      case (None, Some((_, ds))) => ds
      case (None, None) =>
        sys.error(s"no manifest at $root — not an AtomicCommit table")
      case (Some(m), Some((_, ds))) =>
        // declared ORDER, footer TYPES; schema-evolution columns the
        // declaration never named append after it
        val scan = AtomicCommit.scanSchema(spark, root, m)
        val byName = scan.map(f => f.name -> f).toMap
        StructType(ds.flatMap(f => byName.get(f.name)) ++
          scan.filterNot(f => ds.exists(_.name == f.name)))
    }
    snapshotOpt() match {
      case Some(m) => StructType(base.fields ++
        addedOf(m).filterNot(f => base.exists(_.name == f.name)))
      case None => base
    }
  }

  /** `INSERT INTO view ...` / `INSERT OVERWRITE` land on the same commit
    * paths as the writer face — append generations or a whole-table
    * replace, constraints and conflicts included. The FIRST insert into
    * a declared table creates it (its commit is the manifest's version 1).
    */
  override def insert(data: org.apache.spark.sql.DataFrame,
                      overwrite: Boolean): Unit = {
    require(pinned.isEmpty,
      s"cannot insert into a time-travel/tag view of $root — it names an " +
        "immutable snapshot")
    val pc = snapshotOpt().map(_.partitionCol)
      .orElse(declared.map(_._1)).getOrElse(
        sys.error(s"no manifest at $root — not an AtomicCommit table"))
    GraftDataSource.write(data, root, store, pc, overwrite)
  }

  /** SQL `DELETE FROM graft.<name> WHERE ...` ([[GraftTable]]'s
    * SupportsDelete face lands here): pushed filters translate onto the
    * engine's MERGE-ON-READ delete paths. A lone `col IN (...)` /
    * `col = v` on a string/integral column routes to the ZERO-SCAN
    * equality delete ([[Deletes.deleteKeysMoR]] — bloom-narrowed, no
    * data I/O); anything else conjoins into [[Deletes.deleteWhereMoR]]
    * (positions recorded by one matching scan, no rewrite either way).
    * SQL DELETE null semantics hold on both paths, and a no-match delete
    * burns no version. Compaction folds the evidence back into clean
    * files on the maintenance schedule, as with the Scala API.
    */
  private[sources] def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinned.isEmpty,
      s"cannot delete from a time-travel/tag view of $root — it names an " +
        "immutable snapshot")
    if (snapshotOpt().isEmpty) return // declared, never written: no rows
    // `k = 2` implies k IS NOT NULL: a redundant null guard pushed
    // alongside a null-free equality must not mask the zero-scan route
    val significant = filters.filterNot {
      case IsNotNull(c) => filters.exists {
        case EqualTo(`c`, v) => v != null
        case In(`c`, vs) => vs.nonEmpty && !vs.contains(null)
        case _ => false
      }
      case _ => false
    }
    significant match {
      case Array(In(c, vs)) if equalityKey(c) && vs.nonEmpty &&
          !vs.contains(null) =>
        Deletes.deleteKeysMoR(spark, root, store, c, vs.toIndexedSeq)
      case Array(EqualTo(c, v)) if equalityKey(c) && v != null =>
        Deletes.deleteKeysMoR(spark, root, store, c, Seq(v))
      case fs =>
        val cond = fs.flatMap(FilterColumns.toColumn)
        require(cond.length == fs.length, // canDeleteWhere vets first
          s"untranslatable DELETE predicate: ${fs.mkString(", ")}")
        Deletes.deleteWhereMoR(spark, root, store,
          cond.reduceOption(_ && _)
            .getOrElse(org.apache.spark.sql.functions.lit(true)))
    }
    ()
  }

  /** Equality-delete-eligible column: rendered-string comparison is
    * exact (the [[Deletes.deleteKeysMoR]] contract).
    */
  private def equalityKey(c: String): Boolean =
    schema.find(_.name == c).exists(_.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    })

  /** Filter-aware statistics for the DSv2 scan ([[GraftTable]]'s
    * SupportsReportStatistics face): bytes and logical rows of ONLY the
    * partitions surviving pushed-filter pruning, so the planner prices
    * what the scan will actually read — a pruned slice of a huge table
    * broadcasts when the slice is small. Row count is absent when the
    * sidecars can't prove it ([[TableStats.rowCount]]).
    */
  private[sources] def estimateStats(filters: Array[Filter]): (Long, Option[Long]) =
    snapshotOpt() match {
      case None => (0L, Some(0L)) // declared, never written
      case Some(m) =>
        val parts = prunedEntriesFor(m, filters).keySet
        val bytes = TableStats.sizeInBytes(root, m, parts)
        val physical = TableStats.rowCount(root, m, parts)
        val estimated = physical.map(estimateFilteredRows(m, filters, parts, _))
        // scale bytes by the predicate's row selectivity (Iceberg/Delta
        // price filtered scans the same way) so a selectively-filtered
        // big table broadcasts when its surviving slice is small.
        // FLOORED at 1% — the NDV behind equality selectivity is a
        // summed-HLL UPPER bound, so the row estimate can run low, and
        // a floor keeps a bad estimate from broadcasting something huge
        val scaled = (physical, estimated) match {
          case (Some(p), Some(e)) if p > 0 =>
            math.max(1L, (bytes * math.max(e.toDouble / p, 0.01)).toLong)
          case _ => bytes
        }
        (scaled, estimated)
    }

  /** [[estimateStats]] scaled by projected width — shared by both DSv2
    * scan faces (the planner prices the in-memory relation AFTER column
    * pruning, the same move as Spark's own fsRelation sizing).
    */
  private[sources] def projectedStats(filters: Array[Filter],
                                      required: StructType): (Long, Option[Long]) = {
    val (bytes, rowsOpt) = estimateStats(filters)
    val full = schema.fields.map(_.dataType.defaultSize).sum.max(1)
    val kept = required.fields.map(_.dataType.defaultSize).sum.max(1)
    val scaled =
      if (kept >= full) bytes
      else math.ceil(bytes.toDouble * kept / full).toLong
    (scaled, rowsOpt)
  }

  /** Per-partition surviving FILE layout under `filters`: raw partition
    * value → (absolute file path, byte length) pairs, after the SAME
    * entry pruning and file-granular evidence pruning [[buildScan]]
    * applies — so the storage-partitioned batch face ([[GraftBatchScan]])
    * reads exactly the bytes the V1 composition would. Partitions pruned
    * to zero files are dropped (an absent key is an empty partition;
    * Spark's push-part-values handling fills the other join side).
    * Scan-probe observability records match buildScan's, so the same
    * spec assertions prove pruning on either face.
    */
  private[sources] def partitionFileLayout(filters: Array[Filter])
      : Seq[(String, Seq[(String, Long)])] = {
    val m = snapshot()
    val entries = prunedEntriesFor(m, filters)
    GraftScanProbe.record(root, entries.size)
    if (entries.isEmpty) return Nil
    val pc = m.partitionCol
    val (lows, highs) = foldBounds(filters, pc)
    val rangePreds = (lows.keySet & highs.keySet).toSeq.sorted
      .map(c => (c, lows(c), highs(c)))
    val pruned = m.copy(entries = entries)
    // file-granular evidence (min/max + bloom sidecars): None = no file
    // evidence anywhere, every listed file of a surviving dir is read
    val allowed: Option[Set[String]] =
      DataSkipping.prunedScanPaths(spark, root, pruned, rangePreds,
        eqSetsMerged(filters, pc)).map(_.flatMap(_._2).toSet)
    val out = entries.toSeq.sortBy(_._1).map { case (pv, entry) =>
      val files = AtomicCommit.ownersOf(entry).flatMap { gen =>
        val dir = s"$root/$gen/$pc=$pv"
        // (name, bytes) from the generation's file index when present —
        // no per-query directory listing; live listing otherwise
        DataSkipping.partitionFilesSized(root, gen, pv, dir)
          .map { case (f, len) => (s"$dir/$f", len) }
          .filter { case (p, _) => allowed.forall(s => s(p) || s(dir)) }
      }
      pv -> files
    }.filter(_._2.nonEmpty)
    allowed.foreach(_ => GraftScanProbe.recordFiles(root,
      out.iterator.map(_._2.size).sum))
    out
  }

  /** NDV of a column over the pruned partition set — the join-order
    * rule's output-cardinality evidence ([[TableStats.columnStats]]).
    */
  private[sources] def estimateNdv(filters: Array[Filter],
                                   colName: String): Option[Long] =
    snapshotOpt().flatMap { m =>
      val parts = prunedEntriesFor(m, filters).keySet
      TableStats.columnStats(root, m, colName, parts).map(_.ndv)
    }

  /** Sub-partition SELECTIVITY from the sidecars' column statistics
    * ([[TableStats.columnStats]]): partition pruning bounds WHICH slices
    * the scan reads, this bounds how many rows survive the predicate —
    * the CBO cardinality a join above needs. Equality prices at
    * rows/NDV (the textbook uniform-frequency estimate, conservative
    * here because the NDV is an upper bound); a closed numeric interval
    * prices at its fractional overlap of the column's [min, max].
    * Columns without ndv-annotated evidence contribute nothing — the
    * estimate degrades to the partition-level count, never guesses.
    */
  private def estimateFilteredRows(m: AtomicCommit.Manifest,
                                   filters: Array[Filter],
                                   parts: Set[String], total: Long): Long = {
    if (total == 0L || filters.isEmpty) return total
    val pc = m.partitionCol
    var est = total.toDouble
    var applied = false
    // equality and IN: each matching value keeps ~nonNull/NDV rows —
    // FLOORED by the histogram's heavy-hitter evidence, so a probe for
    // a value 90% of the column holds prices at its true mass instead
    // of 1/ndv (the q133 lesson: real keys skew)
    val eqVals: Seq[(String, Seq[Any])] = filters.collect {
      case EqualTo(c, v) if c != pc && v != null => c -> Seq(v)
      case In(c, vs) if c != pc && vs.nonEmpty =>
        c -> vs.filter(_ != null).distinct.toSeq
    }
    val eqCols = eqVals.map(_._1).distinct
    eqVals.foreach { case (c, vs) =>
      TableStats.columnStats(root, m, c, parts).foreach { cs =>
        if (cs.ndv > 0) {
          val uniformPer = cs.nonNull.toDouble / cs.ndv
          // bound the per-value heavy-hitter lookups: past the cap the
          // uniform aggregate k/ndv estimate is already fine-grained
          val matching =
            if (vs.length > 64) cs.nonNull.toDouble *
              math.min(1.0, vs.length.toDouble / cs.ndv)
            else vs.map { v =>
              // probes normalize into the record's unit under the
              // column's sidecar kind, exactly like the range path
              // below — a raw BigDecimal parse fails for Timestamp/
              // Date probes, which silently priced every time-column
              // point predicate at uniform 1/ndv
              val heavy = DataSkipping.numericProbe(cs.kind, v)
                .flatMap(b =>
                  TableStats.histogramPointRows(root, m, c, parts, b))
                .getOrElse(0.0)
              math.max(heavy, uniformPer)
            }.sum
          est *= math.min(1.0, math.min(cs.nonNull.toDouble, matching) / total)
          applied = true
        }
      }
    }
    val (lows, highs) = foldBounds(filters, pc)
    (lows.keySet & highs.keySet)
      .filterNot(c => eqCols.contains(c) || c == pc).foreach { c =>
        // probes normalize into the RECORD's unit under the column's
        // sidecar kind (epoch micros/days for time columns) — so a
        // retention-window predicate prices like any numeric range and
        // a small window broadcasts its slice. No evidence ⇒ "num",
        // which reproduces the plain-decimal behavior exactly
        val kind = TableStats.columnStats(root, m, c, parts)
          .map(_.kind).getOrElse("num")
        def nbd(v: Any): Option[java.math.BigDecimal] =
          DataSkipping.numericProbe(kind, v)
        for (lo <- nbd(lows(c)); hi <- nbd(highs(c))) {
          // equi-depth histogram first (per-slice, skew-honest); only
          // evidence-less tables fall back to uniform interpolation of
          // the column's [min, max] envelope
          TableStats.histogramRows(root, m, c, parts, lo, hi) match {
            case Some(hr) =>
              est *= math.min(1.0, hr / total)
              applied = true
            case None =>
              TableStats.columnStats(root, m, c, parts).foreach { cs =>
                for (mn <- cs.numMin; mx <- cs.numMax) {
                  val span = mx.subtract(mn)
                  if (span.signum > 0) {
                    val overlap = hi.min(mx).subtract(lo.max(mn))
                    val frac = if (overlap.signum <= 0) 0.0
                      else math.min(1.0, overlap.doubleValue / span.doubleValue)
                    est *= (cs.nonNull.toDouble / total) * frac
                    applied = true
                  }
                }
              }
          }
        }
      }
    if (!applied) total else math.max(1L, math.round(est))
  }

  /** METADATA-ANSWERED AGGREGATES ([[GraftTable]]'s
    * SupportsPushDownAggregates face): per-partition rows of
    * `(count*, count(c), min(c), max(c), sum(c))` values computed
    * entirely from the manifest and the stats sidecars — `SELECT
    * count(*) FROM graft.t` never scans a data file, at 100 rows or
    * 100 TB (the same move Iceberg's metadata tables and JDBC's pushed
    * aggregates make). SUM is exact by construction: the sidecar
    * records DECIMAL-rendered exact sums for integral/decimal columns
    * only ([[DataSkipping.ColStats.sum]]).
    * Returns one value row per partition (PARTIAL results — Spark's
    * final aggregate folds them: sum of counts, min of mins), or None
    * when the evidence cannot answer EXACTLY:
    *
    *  - any entry carries delete evidence (DV positions or equality
    *    records make physical counts/extrema overstate the logical
    *    table);
    *  - rename/drop mapping state exists (sidecars are keyed by
    *    write-time physical names — translating them is [[AtomicCommit
    *    .deleteEvidence]]-grade work a scan-free answer shouldn't risk);
    *  - any owner generation of any partition lacks the envelope record
    *    a requested column needs (no evidence = no answer, never a
    *    guess).
    *
    * The partition column itself needs no sidecars: its per-partition
    * "values" ARE the entry keys (never null).
    */
  private[sources] def metadataAggregate(specs: Seq[GraftRelation.AggSpec],
                                         filters: Array[Filter] = Array.empty)
      : Option[Seq[(String, Seq[Any])]] = {
    import GraftRelation._
    val m0 = snapshotOpt().getOrElse(return None)
    if (AtomicCommit.renamesOf(m0).nonEmpty ||
      AtomicCommit.droppedOf(m0).nonEmpty) return None
    if (m0.entries.values.exists(e => AtomicCommit.dvOf(e).isDefined))
      return None
    // pruning-DECIDED filters (the push site's gate) restrict the
    // answer to the surviving partitions — their evidence describes
    // the filtered result exactly
    if (!filters.forall(GraftRelation.partitionDecided(m0.partitionCol, _)))
      return None
    val m = m0.copy(entries = prunedEntriesFor(m0, filters))
    val pc = m.partitionCol
    val rowsByPart = TableStats.partitionRows(root, m).getOrElse(return None)
    // per (gen, partition, col) envelope records, loaded once
    val gens = m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct
    val byGen: Map[String, Map[(String, String), DataSkipping.ColStats]] =
      gens.map(g => g -> DataSkipping.readStats(root, g)
        .filter(_.file.isEmpty).map(s => (s.partition, s.col) -> s).toMap)
        .toMap
    def kindCompare(kind: String, a: String, b: String): Int =
      if (DataSkipping.numericKind(kind)) // num + epoch-unit time kinds
        new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
      else DataSkipping.cpCompare(a, b)
    // evidence per (partition, col): Some((nulls, minOpt, maxOpt, kind))
    // combined across owners; None when any owner lacks the record
    def colEvidence(pv: String, c: String)
        : Option[(Long, Option[String], Option[String], String)] = {
      val recs = AtomicCommit.ownersOf(m.entries(pv))
        .map(g => byGen(g).get((pv, c)))
      if (recs.exists(_.isEmpty)) return None
      val rs = recs.flatten
      val kind = rs.head.kind
      val mins = rs.flatMap(_.min)
      val maxs = rs.flatMap(_.max)
      Some((rs.map(_.nulls).sum,
        if (mins.isEmpty) None else Some(mins.min(Ordering.fromLessThan[String](
          (a, b) => kindCompare(kind, a, b) < 0))),
        if (maxs.isEmpty) None else Some(maxs.max(Ordering.fromLessThan[String](
          (a, b) => kindCompare(kind, a, b) < 0))),
        kind))
    }
    def parse(v: String, dt: org.apache.spark.sql.types.DataType): Any = {
      import org.apache.spark.sql.types._
      dt match {
        case ByteType => v.toByte
        case ShortType => v.toShort
        case IntegerType => new java.math.BigDecimal(v).intValueExact()
        case LongType => new java.math.BigDecimal(v).longValueExact()
        case FloatType => v.toFloat
        case DoubleType => v.toDouble
        case d: DecimalType => new java.math.BigDecimal(v)
          .setScale(d.scale): java.math.BigDecimal
        case StringType => v
        // time kinds recorded in their epoch units ("tsn" micros /
        // "dtn" days): `SELECT min(ts), max(ts)` answers scan-free
        case TimestampType => org.apache.spark.sql.catalyst.util
          .DateTimeUtils.toJavaTimestamp(v.toLong)
        case DateType => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.toLong))
        case other => sys.error(s"unsupported aggregate type $other")
      }
    }
    val schemaTypes = schema.map(f => f.name -> f.dataType).toMap
    // SUM evidence per (partition, col): outer None = an owner lacks
    // evidence (reject → scan); inner None = the slice's true sum is
    // EMPTY (all owners all-null — a record whose `sum` is absent
    // carries that exactly when nulls == rows)
    def sumEvidence(pv: String, c: String)
        : Option[Option[java.math.BigDecimal]] = {
      val recs = AtomicCommit.ownersOf(m.entries(pv))
        .map(g => byGen(g).get((pv, c)))
      if (recs.exists(_.isEmpty)) return None
      var acc: java.math.BigDecimal = null
      recs.flatten.foreach { r =>
        r.sum match {
          case Some(s) =>
            val v = scala.util.Try(new java.math.BigDecimal(s))
              .getOrElse(return None)
            acc = if (acc == null) v else acc.add(v)
          case None =>
            if (r.nulls != r.rows) return None // evidence gap, not all-null
        }
      }
      Some(Option(acc))
    }
    // the value Spark's FINAL Sum aggregate folds: its partial column
    // type is sum's RESULT type (long for integrals, widened decimal
    // for decimals) — a value the exact decimal cannot render in that
    // type (overflow) throws, which the push site catches → real scan
    def sumValue(v: java.math.BigDecimal, c: String): Any = {
      import org.apache.spark.sql.types._
      schemaTypes(c) match {
        case ByteType | ShortType | IntegerType | LongType =>
          v.longValueExact()
        case d: DecimalType =>
          val out = v.setScale(d.scale)
          val cap = math.min(38, d.precision + 10)
          if (out.precision > cap)
            sys.error(s"sum($c) overflows decimal($cap,${d.scale})")
          out
        case other => sys.error(s"unexpected sum type $other")
      }
    }
    // the partition column's per-partition "value" is its DECODED entry
    // key: the null-sentinel directory holds rows whose pc reads back
    // NULL (counted by *, excluded by count(pc)/min/max), and an
    // escaped directory's rows read the unescaped form
    def pcValue(pv: String): String =
      if (pv == GraftRelation.NullPartitionName) null
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(pv)
    val out = m.entries.keySet.toSeq.sorted.map { pv =>
      val values = specs.map {
        case CountStarSpec => rowsByPart(pv)
        case CountColSpec(c) =>
          if (c == pc) {
            if (pv == GraftRelation.NullPartitionName) 0L else rowsByPart(pv)
          } else rowsByPart(pv) - colEvidence(pv, c).getOrElse(return None)._1
        case MinSpec(c) =>
          if (c == pc) pcValue(pv)
          else colEvidence(pv, c).getOrElse(return None) match {
            case (_, mn, _, _) => mn.map(parse(_, schemaTypes(c))).orNull
          }
        case MaxSpec(c) =>
          if (c == pc) pcValue(pv)
          else colEvidence(pv, c).getOrElse(return None) match {
            case (_, _, mx, _) => mx.map(parse(_, schemaTypes(c))).orNull
          }
        case SumSpec(c) =>
          if (c == pc) return None // string-typed; SUM of it is the scan's
          else sumEvidence(pv, c).getOrElse(return None)
            .map(sumValue(_, c)).orNull
      }
      pv -> values
    }
    Some(out)
  }

  /** Snapshot bytes from the manifest's own file set ([[TableStats]]),
    * so the SQL planner prices this table like Delta/Iceberg price
    * theirs — without it, `defaultSizeInBytes` (effectively infinite)
    * makes a join against a 10-row graft dimension table shuffle instead
    * of broadcast. A declared-but-never-written table is 0 bytes.
    */
  override def sizeInBytes: Long =
    snapshotOpt().map(m => TableStats.sizeInBytes(root, m)).getOrElse(0L)

  // buildScan hands back the delegate plan's InternalRow RDD directly —
  // no external-row conversion pass on the hot path
  override def needConversion: Boolean = false

  // every filter re-applies on top (pruning here is best-effort evidence,
  // not evaluation)
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** The manifest entries surviving pushed-filter pruning — shared by
    * [[buildScan]] (what to read) and the DSv2 scan's statistics face
    * (what to price): partition-key pruning off the manifest, then
    * min/max-sidecar pruning for every column holding a closed interval.
    */
  private[sources] def prunedEntriesFor(m: AtomicCommit.Manifest,
                                        filters: Array[Filter]): Map[String, String] = {
    val pc = m.partitionCol
    // 1. partition-column pruning straight off the manifest keys — with
    // the probe mapped through the DIRECTORY escape (entry keys are raw
    // dir names; row and probe values are decoded), and the null
    // sentinel excluded from every equality (its rows decode to null,
    // which no non-null probe equals) but kept/selected by the null
    // tests
    var entries = m.entries
    val np = GraftRelation.NullPartitionName
    filters.foreach {
      case EqualTo(`pc`, v) if v != null =>
        val want = GraftRelation.dirNameOf(v)
        entries = entries.filter(e => e._1 == want && e._1 != np)
      case EqualNullSafe(`pc`, v) if v != null =>
        val want = GraftRelation.dirNameOf(v)
        entries = entries.filter(e => e._1 == want && e._1 != np)
      case In(`pc`, vs) =>
        val want = vs.filter(_ != null).map(GraftRelation.dirNameOf).toSet
        entries = entries.filter(e => want(e._1) && e._1 != np)
      case IsNotNull(`pc`) =>
        entries = entries.filter(_._1 != np)
      case org.apache.spark.sql.sources.IsNull(`pc`) =>
        entries = entries.filter(_._1 == np)
      case _ => ()
    }
    // 2. stats pruning: fold pushed comparisons into per-column closed
    // intervals (a BETWEEN arrives as two one-sided filters); columns
    // with both bounds consult the min/max sidecars. One-sided bounds
    // prune nothing (no closed interval to test) — kept, still correct.
    val (lows, highs) = foldBounds(filters, pc)
    (lows.keySet & highs.keySet).foreach { c =>
      entries = DataSkipping.prunedEntries(root, m.copy(entries = entries),
        c, lows(c), highs(c))
    }
    // 2b. equality-SET pruning — the shape RUNTIME join filters arrive
    // in (`fact.key IN (broadcast side's built keys)`): the min/max
    // envelopes admit an entry when ANY value lands inside, then the
    // per-partition blooms refute what intervals can't (a key set
    // scattered across a wide [min, max] still prunes when the blooms
    // say no member is present). Also upgrades plain pushed IN/= on
    // stats/bloom-annotated non-partition columns, which step 2's
    // interval fold alone under-prunes. Guarded by a value-count cap:
    // evidence testing is per-value work, and a huge IN list stops
    // paying for itself long before it stops being correct.
    val eqSets = eqSetsOf(filters, pc)
    eqSets.groupBy(_._1).foreach { case (c, sets) =>
      // conjunction: every IN/= on the column must admit the entry
      sets.map(_._2).foreach { vs =>
        if (entries.nonEmpty)
          entries = DataSkipping.entriesAdmittingAnyEq(
            root, m.copy(entries = entries), c, vs)
        if (entries.nonEmpty)
          entries = {
            val ok = DataSkipping.partitionsAdmittingAny(spark, root,
              m.copy(entries = entries), c, vs).toSet
            entries.filter { case (pv, _) => ok(pv) }
          }
      }
    }
    // 3. hidden-partitioning transform mapping: predicates on the SOURCE
    // column of a recorded partition spec prune through the transform
    // (`WHERE ts BETWEEN …` on a days(ts) table reads only those days)
    HiddenPartitioning.specOf(m).foreach { spec =>
      val src = spec.source
      val srcType = schema.find(_.name == src).map(_.dataType)
      filters.foreach {
        case EqualTo(`src`, v) if v != null =>
          entries = HiddenPartitioning.pruneBySourceEq(
            m.copy(entries = entries), v, srcType)
        case EqualNullSafe(`src`, v) if v != null =>
          entries = HiddenPartitioning.pruneBySourceEq(
            m.copy(entries = entries), v, srcType)
        case In(`src`, vs) if vs.nonEmpty && !vs.contains(null) &&
            vs.length <= GraftRelation.TransformPruneCap =>
          // union of the per-value transform prunes: a partition
          // survives when ANY member value maps into it
          val keep = vs.map(v => HiddenPartitioning.pruneBySourceEq(
            m.copy(entries = entries), v, srcType).keySet)
            .foldLeft(Set.empty[String])(_ | _)
          entries = entries.filter { case (pv, _) => keep(pv) }
        case _ => ()
      }
      if (lows.contains(src) && highs.contains(src))
        entries = HiddenPartitioning.pruneBySource(
          m.copy(entries = entries), lows(src), highs(src))
    }
    entries
  }

  /** The equality-SET predicates among pushed/runtime filters, for
    * evidence-based pruning (partition entries AND per-file records):
    * `IN` lists under the cap and single equalities, never on the
    * partition column (step 1 prunes that off the manifest directly).
    */
  private def eqSetsOf(filters: Array[Filter], pc: String): Seq[(String, Seq[Any])] =
    filters.toSeq.collect {
      case In(c, vs) if c != pc && vs.nonEmpty && !vs.contains(null) &&
          vs.length <= GraftRelation.EqSetPruneCap => c -> vs.toSeq
      case EqualTo(c, v) if c != pc && v != null => c -> Seq(v)
    }

  /** One eq-set per column: a conjunction of sets keeps only values in
    * EVERY set ([[DataSkipping.looseCompare]]-matched, so an int probe
    * of a long column's list still intersects). Large×large pairs
    * (pushed IN conjoined with a runtime join filter) intersect through
    * a normalized hash set instead of the quadratic scan — same
    * equivalence (numerics by BigDecimal value, everything else by
    * rendered string, exactly looseCompare's classes).
    */
  private def eqSetsMerged(filters: Array[Filter], pc: String): Seq[(String, Seq[Any])] = {
    def normKey(v: Any): String = v match {
      case n: java.lang.Number =>
        new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
      case x => String.valueOf(x)
    }
    eqSetsOf(filters, pc).groupBy(_._1).toSeq.map { case (c, sets) =>
      c -> sets.map(_._2).reduce { (a, b) =>
        if (a.length.toLong * b.length <= 1000000L)
          a.filter(v => b.exists(w => DataSkipping.looseCompare(v, w) == 0))
        else {
          val keys = b.iterator.map(normKey).toSet
          a.filter(v => keys(normKey(v)))
        }
      }
    }
  }

  /** The columns a RUNTIME filter (broadcast-join key set, [[graft.plans
    * .RuntimeFilterRule]]) can actually prune this snapshot on: the
    * partition column (entries prune directly), a hidden-partitioning
    * source (prunes through the transform), and every column carrying
    * min/max or bloom sidecar evidence in at least one owner generation
    * (others degrade to "no evidence = keep" everywhere — a filter on
    * them would test evidence per value and remove nothing). Driver
    * metadata only; memoized per snapshot's entry map.
    */
  private[graft] def runtimeFilterable: Seq[String] = snapshotOpt() match {
    case None => Nil
    case Some(m) =>
      val cached = filterableCache
      // CONTENT equality via the manifest's own entry fingerprint —
      // value-stable across manifest re-reads (the old Map == compare
      // was too, but cost an O(partitions) element walk per call). The
      // ANALYZE marker joins the key exactly as in [[TableStats.keyOf]]:
      // analyze retrofits sidecar evidence WITHOUT changing any entry,
      // and its marker commit is what must move this cache off a stale
      // "no evidence" answer
      val ck = (m.entriesDigest,
        m.props.getOrElse(AtomicCommit.StatsAnalyzedProp, ""))
      if (cached != null && cached._1 == ck) return cached._2
      val gens = m.ownerGens
      val evidenced = (gens.flatMap(g =>
        DataSkipping.readStats(root, g).filter(_.file.isEmpty).map(_.col)) ++
        gens.flatMap(g =>
          DataSkipping.readBlooms(root, g).filter(_.file.isEmpty).map(_.col)))
        .distinct
      val out = (Seq(m.partitionCol) ++
        HiddenPartitioning.specOf(m).map(_.source) ++ evidenced).distinct
      filterableCache = (ck, out)
      out
  }
  @volatile private var filterableCache: ((String, String), Seq[String]) = null

  /** Fold pushed comparison filters into the tightest per-column bounds
    * (shared by sidecar pruning and selectivity pricing): `lows` holds
    * the greatest lower bound seen per column, `highs` the least upper
    * bound; only columns present in BOTH form a closed interval.
    */
  private def foldBounds(filters: Array[Filter], pc: String)
      : (Map[String, Any], Map[String, Any]) = {
    val lows = scala.collection.mutable.Map.empty[String, Any]
    val highs = scala.collection.mutable.Map.empty[String, Any]
    def tighten(mm: scala.collection.mutable.Map[String, Any], c: String,
                v: Any, takeMax: Boolean): Unit =
      if (v != null && c != pc) mm.updateWith(c) {
        case None => Some(v)
        case Some(old) =>
          val cmp = DataSkipping.looseCompare(v, old)
          Some(if (cmp == 0) old else if ((cmp > 0) == takeMax) v else old)
      }
    filters.foreach {
      case EqualTo(c, v) => tighten(lows, c, v, takeMax = true)
        tighten(highs, c, v, takeMax = false)
      case GreaterThan(c, v) => tighten(lows, c, v, takeMax = true)
      case GreaterThanOrEqual(c, v) => tighten(lows, c, v, takeMax = true)
      case LessThan(c, v) => tighten(highs, c, v, takeMax = false)
      case LessThanOrEqual(c, v) => tighten(highs, c, v, takeMax = false)
      case _ => ()
    }
    (lows.toMap, highs.toMap)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] =
    buildScan(requiredColumns, filters, None, filters)

  /** [[buildScan]] with a PUSHED LIMIT hint (partial semantics — Spark
    * re-applies the exact limit above): when the sidecars can PROVE a
    * prefix of partitions holds at least `n` rows (complete row counts,
    * no delete evidence that would make physical counts overstate the
    * logical table, no filters whose survivors the counts don't
    * describe), the scan reads only that prefix — `SELECT * FROM t
    * LIMIT 10` touches one partition of a thousand. Unprovable = read
    * everything, still correct.
    */
  /** `filters` drive pruning (manifest, stats, limit proofs) and may
    * include RUNTIME-delivered sets; `inline` is the subset Spark itself
    * pushed, which also enters the inner plan as row predicates. Runtime
    * filters stay PRUNE-ONLY by contract (RuntimeFilteringSpec pins the
    * full-partition row counts): the join above re-applies them exactly,
    * so inlining would only move its work into a potentially huge IN
    * evaluated per row at the scan.
    */
  private[sources] def buildScan(requiredColumns: Array[String],
                                 filters: Array[Filter],
                                 limitHint: Option[Int],
                                 inline: Array[Filter]): RDD[Row] = {
    val mOpt = snapshotOpt()
    if (mOpt.isEmpty) // declared, never written — zero rows, any projection
      return spark.sparkContext.emptyRDD[Row]
    val m = mOpt.get
    var entries = prunedEntriesFor(m, filters)
    limitHint.filter(_ > 0)
      .filter(_ => filters.forall(GraftRelation.partitionDecided(m.partitionCol, _)))
      .foreach { n =>
      val hasDv = entries.values.exists(e => AtomicCommit.dvOf(e).isDefined)
      if (!hasDv) TableStats.partitionRows(root, m).foreach { rows =>
        var acc = 0L
        val keep = scala.collection.mutable.LinkedHashSet.empty[String]
        for (pv <- entries.keys.toSeq.sorted if acc < n) {
          keep += pv
          acc += rows.getOrElse(pv, 0L)
        }
        if (acc >= n) entries = entries.filter { case (pv, _) => keep(pv) }
        // acc < n: the whole table is smaller than the limit — keep all
      }
    }
    GraftScanProbe.record(root, entries.size)
    if (entries.isEmpty)
      return spark.sparkContext.emptyRDD[Row]
    val pruned = m.copy(entries = entries)
    // FILE-granular pruning inside surviving partitions: closed ranges
    // and equality sets (runtime join keys included) test the per-file
    // min/max + bloom records a recluster/z-order or stats-annotated
    // commit wrote — a sorted layout reads only the files whose
    // envelopes admit the predicate, not whole partition directories.
    // None = no file evidence anywhere: the dir-granular plan unchanged.
    val pc = m.partitionCol
    val (lows, highs) = foldBounds(filters, pc)
    val rangePreds = (lows.keySet & highs.keySet).toSeq.sorted
      .map(c => (c, lows(c), highs(c)))
    val base = DataSkipping.prunedScanPaths(spark, root, pruned,
        rangePreds, eqSetsMerged(filters, pc)) match {
      case Some(byGen) =>
        GraftScanProbe.recordFiles(root,
          byGen.flatMap(_._2).count(_.endsWith(".parquet")))
        AtomicCommit.scanPaths(spark, root, pruned, byGen) match {
          case Some(df) => df
          case None => return spark.sparkContext.emptyRDD[Row]
        }
      case None => AtomicCommit.scanManifest(spark, root, pruned)
    }
    // ALTER-added columns no footer carries yet: NULL-backfill so the
    // projection below (and Spark's residual filters above) resolve
    val df = addedOf(m).filterNot(f => base.columns.contains(f.name))
      .foldLeft(base)((d, f) => d.withColumn(f.name,
        org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
    // push the translated predicates INTO the inner plan too: Spark
    // re-applies every filter above the returned RDD (the
    // PrunedFilteredScan contract), but only an in-plan filter reaches
    // the parquet reader (PushedFilters — row-group/page skipping) and
    // the file source's own partition pruning (listFiles partition
    // filters — the index-backed scan prunes partitions there even for
    // shapes manifest pruning can't decide, e.g. `pc <> v`).
    // Untranslatable filters stay outside-only, exactly as before.
    val constrained = inline.toIndexedSeq.flatMap(FilterColumns.toColumn)
      .reduceOption(_ && _).map(df.filter).getOrElse(df)
    val projected =
      if (requiredColumns.isEmpty) // 0-width rows, counts intact
        constrained.select()
      else constrained.select(requiredColumns
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
