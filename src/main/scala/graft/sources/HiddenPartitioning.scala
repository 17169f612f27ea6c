package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.AtomicCommit.Manifest

/** HIDDEN PARTITIONING (the Iceberg partition-transform / Delta
  * generated-partition-column idea): the table is physically partitioned
  * by a DERIVED value — `days(ts)`, `bucket(16, k)`, `truncate(3, code)`
  * — and queries written against the SOURCE column still prune, because
  * the engine knows the transform and maps source predicates to
  * partition-value predicates itself. Without this, a 100 TB event table
  * partitioned by day forces every user to know and repeat the
  * `ts → day` derivation in every WHERE clause; one forgotten mapping is
  * a full-table scan.
  *
  * Mechanics on the manifest model:
  *  - WRITE: the derived column (named `<source>_day` / `<source>_bucket`
  *    / … — visible in reads, as with Delta generated columns) is
  *    computed by a codegen'd expression and becomes the table's
  *    partition column; the transform is recorded in the manifest props
  *    (`graft.partition.spec`) ATOMICALLY with the data commit
  *    ([[AtomicCommit.Staged.props]] merges at publish), and every later
  *    transformed write verifies it matches — two writers with different
  *    ideas of the layout fail loudly instead of interleaving.
  *  - READ: [[readWhereSource]] / [[readWhereSourceEq]] map source-column
  *    bounds to partition-value bounds (chronological = lexicographic for
  *    the fixed-width ISO renderings; bucket maps equality through the
  *    same Murmur3 the write side used), prune the manifest, then
  *    re-apply the EXACT source predicate above the pruned scan — pruning
  *    stays advisory evidence, never evaluation. The SQL/catalog face
  *    gets the same mapping through [[GraftRelation]]'s pushed-filter
  *    pruning, so `WHERE ts BETWEEN …` on `graft.events` prunes too.
  *
  * Time derivations require an UTC session (`spark.sql.session.timeZone`
  * = UTC, the engine harness default): `date_format` renders in session
  * time, and the driver-side bound mapping must agree with the executor-
  * side derivation byte-for-byte. Enforced loudly at write time.
  */
object HiddenPartitioning {

  val SpecProp = "graft.partition.spec"

  sealed trait Spec {
    def source: String
    /** The generated column's name (visible in reads). */
    def derivedName: String
    /** The write-side derivation (codegen'd, no UDF). */
    def column: Column
    /** Render for the manifest prop. */
    def render: String
    /** Source equality value → partition value (None: cannot map). */
    def mapEq(v: Any): Option[String]
    /** [[mapEq]] with the source column's Catalyst type when the caller
      * has a schema in hand — [[Bucket]] MUST hash the value at the
      * column's own type (Murmur3 of Int 17 ≠ Long 17; hashing the
      * caller's boxed runtime type would prune to the wrong bucket and
      * silently return empty). The other transforms render values, not
      * hash them, so the type adds nothing.
      */
    def mapEq(v: Any, srcType: Option[org.apache.spark.sql.types.DataType])
        : Option[String] = mapEq(v)
    /** Inclusive source range → inclusive partition-value range under
      * LEXICOGRAPHIC string order (None: transform cannot map ranges —
      * bucket scrambles order).
      */
    def mapRange(lo: Any, hi: Any): Option[(String, String)]
  }

  private def tsUtc(v: Any): Instant = v match {
    case i: Instant => i
    // java.sql.Date BEFORE Timestamp-free util.Date handling: a DATE
    // column's pushed bound arrives as java.sql.Date, whose toInstant
    // throws — midnight UTC of its local date is the value the
    // date_format derivation rendered
    case d: java.sql.Date => d.toLocalDate.atStartOfDay(ZoneOffset.UTC).toInstant
    case t: java.sql.Timestamp => t.toInstant
    case d: LocalDate => d.atStartOfDay(ZoneOffset.UTC).toInstant
    case d: java.time.LocalDateTime => d.toInstant(ZoneOffset.UTC)
    case s: String => // ISO instant, or "yyyy-MM-dd[ HH:mm:ss]"
      try Instant.parse(s)
      catch {
        case _: Exception =>
          val norm = if (s.contains(" ")) s.replace(' ', 'T') else s + "T00:00:00"
          java.time.LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC)
      }
    case other => sys.error(s"cannot interpret $other as a timestamp bound")
  }

  /** [[tsUtc]], advisory-flavored: an unrecognized or unparseable bound
    * maps to None — the caller prunes NOTHING instead of failing a
    * legitimate query inside scan pruning (the exact predicate still
    * evaluates above the scan either way).
    */
  private def tsUtcOpt(v: Any): Option[Instant] =
    try Some(tsUtc(v)) catch { case _: Exception => None }

  private def fmt(pattern: String, i: Instant): String =
    DateTimeFormatter.ofPattern(pattern).withZone(ZoneOffset.UTC).format(i)

  final case class Days(source: String) extends Spec {
    val derivedName = s"${source}_day"
    def column: Column = date_format(col(source), "yyyy-MM-dd")
    def render = s"days($source)"
    def mapEq(v: Any): Option[String] = tsUtcOpt(v).map(fmt("yyyy-MM-dd", _))
    def mapRange(lo: Any, hi: Any): Option[(String, String)] =
      for { l <- tsUtcOpt(lo); h <- tsUtcOpt(hi) }
        yield (fmt("yyyy-MM-dd", l), fmt("yyyy-MM-dd", h))
  }

  final case class Hours(source: String) extends Spec {
    val derivedName = s"${source}_hour"
    def column: Column = date_format(col(source), "yyyy-MM-dd-HH")
    def render = s"hours($source)"
    def mapEq(v: Any): Option[String] = tsUtcOpt(v).map(fmt("yyyy-MM-dd-HH", _))
    def mapRange(lo: Any, hi: Any): Option[(String, String)] =
      for { l <- tsUtcOpt(lo); h <- tsUtcOpt(hi) }
        yield (fmt("yyyy-MM-dd-HH", l), fmt("yyyy-MM-dd-HH", h))
  }

  final case class Months(source: String) extends Spec {
    val derivedName = s"${source}_month"
    def column: Column = date_format(col(source), "yyyy-MM")
    def render = s"months($source)"
    def mapEq(v: Any): Option[String] = tsUtcOpt(v).map(fmt("yyyy-MM", _))
    def mapRange(lo: Any, hi: Any): Option[(String, String)] =
      for { l <- tsUtcOpt(lo); h <- tsUtcOpt(hi) }
        yield (fmt("yyyy-MM", l), fmt("yyyy-MM", h))
  }

  /** `pmod(hash(col), n)` — Spark's Murmur3 (seed 42), the same function
    * the driver-side [[mapEq]] evaluates through Catalyst so the two can
    * never drift. Order-scrambling: equality prunes to ONE partition,
    * ranges cannot prune.
    */
  final case class Bucket(n: Int, source: String) extends Spec {
    require(n > 0, s"bucket($n, $source): n must be positive")
    val derivedName = s"${source}_bucket"
    def column: Column = pmod(hash(col(source)), lit(n)).cast("string")
    def render = s"bucket($n,$source)"
    def mapEq(v: Any): Option[String] = mapEq(v, None)
    override def mapEq(v: Any,
        srcType: Option[org.apache.spark.sql.types.DataType]): Option[String] = {
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash}
      val raw = Literal.create(v)
      // hash at the COLUMN's type, not the caller value's boxed type:
      // Murmur3(Int 17) ≠ Murmur3(Long 17), and the executor-side
      // derivation hashed the column at its own type. No type in hand and
      // no cast possible → None (advisory: prune nothing, stay correct).
      val lit = srcType match {
        case Some(dt) if dt != raw.dataType =>
          try {
            val c = Cast(raw, dt, Some("UTC")).eval(null)
            if (c == null) return None
            Literal.create(c, dt)
          } catch { case _: Exception => return None }
        case _ => raw
      }
      val h = Murmur3Hash(Seq(lit), 42).eval(null).asInstanceOf[Int]
      Some((((h % n) + n) % n).toString)
    }
    def mapRange(lo: Any, hi: Any): Option[(String, String)] = None
  }

  /** Leading `w` characters of a string column — prefix layout, so both
    * equality and lexicographic ranges map.
    */
  final case class Truncate(w: Int, source: String) extends Spec {
    require(w > 0, s"truncate($w, $source): width must be positive")
    val derivedName = s"${source}_trunc"
    def column: Column = substring(col(source), 1, w)
    def render = s"truncate($w,$source)"
    def mapEq(v: Any): Option[String] = Some(String.valueOf(v).take(w))
    def mapRange(lo: Any, hi: Any): Option[(String, String)] =
      Some((String.valueOf(lo).take(w), String.valueOf(hi).take(w)))
  }

  private val DaysRe = raw"days\((\w+)\)".r
  private val HoursRe = raw"hours\((\w+)\)".r
  private val MonthsRe = raw"months\((\w+)\)".r
  private val BucketRe = raw"bucket\((\d+),(\w+)\)".r
  private val TruncRe = raw"truncate\((\d+),(\w+)\)".r

  def parse(s: String): Spec = s match {
    case DaysRe(c) => Days(c)
    case HoursRe(c) => Hours(c)
    case MonthsRe(c) => Months(c)
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Truncate(w.toInt, c)
    case other => sys.error(s"unparseable partition spec: $other")
  }

  /** The table's recorded transform, if it was written through this
    * module. The read-side mapping keys off this.
    */
  def specOf(m: Manifest): Option[Spec] = m.props.get(SpecProp).map(parse)

  private def requireUtc(spark: SparkSession, spec: Spec): Unit = spec match {
    case _: Days | _: Hours | _: Months =>
      val tz = spark.conf.get("spark.sql.session.timeZone", "")
      require(tz == "UTC",
        s"hidden time partitioning requires spark.sql.session.timeZone=UTC " +
          s"(got '$tz'): date_format derives in session time and the " +
          "driver-side pruning bounds are computed in UTC — a mismatch " +
          "would prune WRONG partitions")
    case _ => ()
  }

  private def derive(df: DataFrame, spec: Spec): DataFrame = {
    require(df.columns.contains(spec.source),
      s"partition spec ${spec.render}: no column ${spec.source} in " +
        df.columns.mkString("(", ", ", ")"))
    require(!df.columns.contains(spec.derivedName),
      s"column ${spec.derivedName} already exists — it is the name of " +
        s"the generated partition column for ${spec.render}")
    df.withColumn(spec.derivedName, spec.column)
  }

  private def verifySpecUnchanged(store: ManifestStore, spec: Spec): Unit =
    AtomicCommit.readManifest(store).foreach { m =>
      m.props.get(SpecProp).foreach { existing =>
        require(existing == spec.render,
          s"table is partitioned by $existing; writing with ${spec.render} " +
            "would interleave two layouts — use the recorded spec")
      }
    }

  def commitReplace(spark: SparkSession, root: String, df: DataFrame,
                    spec: Spec, filesPerDir: Int = 1): Long =
    commitReplace(spark, root, new PosixManifestStore(root), df, spec, filesPerDir)

  def commitReplace(spark: SparkSession, root: String, store: ManifestStore,
                    df: DataFrame, spec: Spec, filesPerDir: Int): Long = {
    requireUtc(spark, spec)
    verifySpecUnchanged(store, spec)
    val staged = AtomicCommit.stage(spark, root, store, derive(df, spec),
      spec.derivedName, filesPerDir)
    AtomicCommit.publish(root, store,
      staged.copy(props = staged.props + (SpecProp -> spec.render)))
  }

  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
                   spec: Spec, filesPerDir: Int = 1): Long =
    commitAppend(spark, root, new PosixManifestStore(root), df, spec, filesPerDir)

  def commitAppend(spark: SparkSession, root: String, store: ManifestStore,
                   df: DataFrame, spec: Spec, filesPerDir: Int): Long = {
    requireUtc(spark, spec)
    verifySpecUnchanged(store, spec)
    AtomicCommit.commitAppendPartitions(spark, root, store,
      derive(df, spec), spec.derivedName, filesPerDir)
  }

  /** Entries surviving a SOURCE-column bound under the recorded
    * transform: `[lo, hi]` maps through [[Spec.mapRange]] (fixed-width
    * renderings make lexicographic = chronological), equality through
    * [[Spec.mapEq]]. Unmappable → all entries (advisory pruning).
    */
  private[sources] def pruneBySource(m: Manifest, lo: Any, hi: Any): Map[String, String] =
    specOf(m) match {
      case Some(spec) => spec.mapRange(lo, hi) match {
        case Some((pLo, pHi)) =>
          m.entries.filter { case (p, _) => p >= pLo && p <= pHi }
        case None => m.entries
      }
      case None => m.entries
    }

  private[sources] def pruneBySourceEq(m: Manifest, v: Any): Map[String, String] =
    pruneBySourceEq(m, v, None)

  private[sources] def pruneBySourceEq(m: Manifest, v: Any,
      srcType: Option[org.apache.spark.sql.types.DataType]): Map[String, String] =
    specOf(m) match {
      case Some(spec) => spec.mapEq(v, srcType) match {
        case Some(p) => m.entries.filter(_._1 == p)
        case None => m.entries
      }
      case None => m.entries
    }

  /** Snapshot rows with `source ∈ [lo, hi]` — manifest pruned through the
    * transform, exact predicate re-applied above.
    */
  def readWhereSource(spark: SparkSession, root: String,
                      lo: Any, hi: Any): DataFrame =
    readWhereSource(spark, root, new PosixManifestStore(root), lo, hi)

  def readWhereSource(spark: SparkSession, root: String, store: ManifestStore,
                      lo: Any, hi: Any): DataFrame = {
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"no manifest at $root — not an AtomicCommit table"))
    val spec = specOf(m).getOrElse(
      sys.error(s"$root carries no $SpecProp — not a hidden-partitioned table"))
    val pruned = pruneBySource(m, lo, hi)
    val base = emptyIfNone(spark, root, m, pruned)
    base.where(col(spec.source) >= lit(lo) && col(spec.source) <= lit(hi))
  }

  /** Snapshot rows with `source = v` — under `bucket`, ONE partition. */
  def readWhereSourceEq(spark: SparkSession, root: String, v: Any): DataFrame =
    readWhereSourceEq(spark, root, new PosixManifestStore(root), v)

  def readWhereSourceEq(spark: SparkSession, root: String, store: ManifestStore,
                        v: Any): DataFrame = {
    val m = AtomicCommit.readManifest(store).getOrElse(
      sys.error(s"no manifest at $root — not an AtomicCommit table"))
    val spec = specOf(m).getOrElse(
      sys.error(s"$root carries no $SpecProp — not a hidden-partitioned table"))
    // the source column's Catalyst type (one footer-schema probe off the
    // scan plan) rides into the mapping so Bucket hashes the value at the
    // COLUMN's type — readWhereSourceEq(…, 17) on a Long column must
    // prune the bucket of 17L, not of Int 17
    val srcType = AtomicCommit.scanManifest(spark, root, m).schema
      .find(_.name == spec.source).map(_.dataType)
    val pruned = pruneBySourceEq(m, v, srcType)
    emptyIfNone(spark, root, m, pruned).where(col(spec.source) === lit(v))
  }

  private def emptyIfNone(spark: SparkSession, root: String, m: Manifest,
                          pruned: Map[String, String]): DataFrame =
    if (pruned.isEmpty) // schema-true empty (store-agnostic: schema off m)
      AtomicCommit.scanManifest(spark, root, m).limit(0)
    else AtomicCommit.scanManifest(spark, root, m.copy(entries = pruned))
}
