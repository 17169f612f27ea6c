package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 FUNCTION behind graft's hidden `bucket(n, col)` partition
  * transform ([[HiddenPartitioning.Bucket]]) — the piece that lets
  * Spark's storage-partitioned-join machinery reason about BUCKETED
  * graft tables at the JOIN-KEY level (the Iceberg SystemFunctions
  * design): when two tables are bucket(n, k)-partitioned and a query
  * joins them ON k, both batch-face scans report
  * `KeyGroupedPartitioning(bucket(n, k))`, Spark resolves `bucket`
  * through the catalog's [[org.apache.spark.sql.connector.catalog
  * .FunctionCatalog]] face to this function, proves the two sides'
  * transforms identical (via [[BoundFunction.canonicalName]]), and
  * plans the join with ZERO shuffles — co-hashed layout recognized as
  * co-partitioned, the classic bucketed-join win without a bucket
  * metastore.
  *
  * The bound semantics MUST equal the write-side derivation
  * byte-for-byte (`pmod(hash(col), n)` — Spark's Murmur3, seed 42,
  * hashed at the COLUMN's type): [[produceResult]] calls the same
  * [[Murmur3HashFunction]] the `hash()` column function evaluates, so
  * if Spark ever materializes the function (the shuffle-one-side SPJ
  * mode), the computed ids agree with the directory layout. The
  * canonical name carries the input type — Murmur3(Int 17) ≠
  * Murmur3(Long 17), so bucket(16, int_col) must never unify with
  * bucket(16, long_col).
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(murmur3_hash(col), n) — graft's hidden bucket transform"

  /** Bind `(int n, <source col>)`. Any atomic source type binds — the
    * hash function is total — but the canonical name pins the type.
    */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (int nBuckets, source col), got $inputType")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

final class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // null hashes to the seed unchanged — the same rule hash() applies,
    // so a null source value lands in pmod(42, n), never a null bucket
    val v = if (input.isNullAt(1)) null else input.get(1, dt)
    val h = Murmur3HashFunction.hash(v, dt, 42L).toInt
    ((h % n) + n) % n
  }
}

/** The V2 functions behind graft's hidden TIME partition transforms
  * ([[HiddenPartitioning.Days]]/[[HiddenPartitioning.Hours]]/
  * [[HiddenPartitioning.Months]]) — the same storage-partitioned-join
  * contract [[GraftBucketFunction]] carries for bucket layouts, for the
  * most common event/log layout of all: two tables hidden-partitioned
  * by `days(ts)` join ON the raw timestamp with zero shuffles, because
  * both batch faces report `KeyGroupedPartitioning(days(ts))` and Spark
  * unifies the transforms through these functions' canonical names.
  *
  * Bound semantics MUST equal the write-side derivation byte-for-byte:
  * the writer renders `date_format(col, <pattern>)` under the REQUIRED
  * UTC session ([[HiddenPartitioning]] enforces it loudly at write
  * time), so [[produceResult]] formats the same pattern at UTC — if
  * Spark ever materializes the function (shuffle-one-side SPJ mode),
  * the computed day strings agree with the directory layout. Timestamp
  * input arrives as MICROSECONDS since the epoch, date input as days
  * since the epoch (the Catalyst physical encodings).
  */
private[sources] abstract class GraftTimeTransformFunction(
    fnName: String, pattern: String) extends UnboundFunction {
  override def name(): String = fnName
  override def description(): String =
    s"$fnName(col): date_format(col, '$pattern') at UTC — graft's hidden " +
      "time transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      (inputType.fields(0).dataType == TimestampType ||
        inputType.fields(0).dataType == DateType),
      s"$fnName expects one timestamp/date column, got $inputType")
    new GraftTimeTransformBound(fnName, pattern,
      inputType.fields(0).dataType)
  }
}

object GraftDaysFunction
  extends GraftTimeTransformFunction("days", "yyyy-MM-dd")
object GraftHoursFunction
  extends GraftTimeTransformFunction("hours", "yyyy-MM-dd-HH")
object GraftMonthsFunction
  extends GraftTimeTransformFunction("months", "yyyy-MM")

final class GraftTimeTransformBound(fnName: String, pattern: String,
                                    dt: DataType)
  extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = StringType
  override def name(): String = fnName
  override def canonicalName(): String =
    s"graft.$fnName(${dt.catalogString})"
  override def isResultNullable: Boolean = true // null ts → null day

  // transient: DateTimeFormatter is not serializable and the bound
  // function ships to executors inside the plan (BoundFunction extends
  // Serializable); each JVM re-derives it from the pattern on first use
  @transient private lazy val fmt =
    java.time.format.DateTimeFormatter.ofPattern(pattern)
      .withZone(java.time.ZoneOffset.UTC)

  override def produceResult(input: InternalRow)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (input.isNullAt(0)) return null
    val instant = dt match {
      case TimestampType => // catalyst micros since epoch
        java.time.Instant.EPOCH.plus(input.getLong(0),
          java.time.temporal.ChronoUnit.MICROS)
      case _ => // DateType: catalyst days since epoch
        java.time.LocalDate.ofEpochDay(input.getInt(0).toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(fmt.format(instant))
  }
}

/** The V2 function behind graft's hidden `truncate(w, col)` transform
  * ([[HiddenPartitioning.Truncate]]): the leading `w` characters of the
  * source string, exactly the writer's `substring(col, 1, w)` —
  * [[org.apache.spark.unsafe.types.UTF8String.substringSQL]], so
  * multi-byte and supplementary characters count as the SQL substring
  * counts them, never as Java code units.
  *
  * The width is BAKED INTO THE NAME (`truncate_3`) rather than passed
  * as a literal argument: Spark's `KeyGroupedPartitioning.satisfies0`
  * accepts a partition transform for a clustered distribution only when
  * the expression has exactly ONE leaf, and a literal width would be a
  * second one (bucket dodges this because Spark special-cases
  * `BucketTransform`, lifting numBuckets out of the children — no such
  * carve-out exists for other transforms). A one-argument width-pinned
  * function keeps the leaf count at 1 and carries the width through the
  * canonical name, so `truncate_3` layouts unify with each other and
  * never with `truncate_4`.
  */
final class GraftTruncateFunction(w: Int) extends UnboundFunction {
  require(w > 0, s"truncate width must be positive, got $w")
  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): substring(col, 1, $w) — graft's hidden prefix transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"truncate_$w expects one string column, got $inputType")
    new GraftTruncateBound(w)
  }
}

final class GraftTruncateBound(w: Int)
  extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = StringType
  override def name(): String = s"truncate_$w"
  override def canonicalName(): String = s"graft.truncate($w,string)"
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (input.isNullAt(0)) return null
    input.getUTF8String(0).substringSQL(1, w)
  }
}
