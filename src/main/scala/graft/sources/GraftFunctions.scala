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
