package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0d, _+_)`) evaluates its lambda interpreted — one closure dispatch per
  * element, outside whole-stage codegen — measured ~4× slower on the sf0.1
  * cosine workloads. This expression compiles to a tight Java loop over the
  * two ArrayData buffers inside the generated stage: the preference order
  * from the project brief (built-in > native Expression with doGenCode >
  * anything opaque).
  *
  * Accumulation is sequential in element order — bit-identical to the HOF
  * fold it replaces and to the oracle's evaluation, so similarity outputs
  * stay hash-stable.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  // HOF-equivalent semantics, so the optimizer rewrite is sound: zip_with
  // pads a length mismatch with null and aggregate's `acc + null` poisons
  // the fold, so unequal lengths or any null element yield NULL — never a
  // silently-truncated partial dot product.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private val name = "graft_dot"

  /** `graft_cosine(a, b)` expression tree: pure composition of the codegen'd
    * [[DotProduct]] with Spark's Sqrt/Divide — no new kernel, whole-stage
    * codegen throughout. One call gives raw-SQL users the full cosine
    * (`graft_dot(a,b) / (sqrt(graft_dot(a,a)) · sqrt(graft_dot(b,b)))`).
    */
  private[graft] def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  /** Idempotent session registration — `call_function` resolves the name
    * through the session's function registry at analysis time. Also makes
    * `graft_dot(a, b)` / `graft_cosine(a, b)` available to raw-SQL users of
    * the library.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => cosineExpr(exprs.head, exprs(1)), "built-in")
  }

  /** Column-level dot product; caller must have run [[register]] on the
    * executing session (every graft vector operator does).
    */
  def dot(a: Column, b: Column): Column = call_function(name, a, b)

  /** Euclidean norm via the same codegen'd loop. */
  def norm(v: Column): Column = sqrt(dot(v, v))
}
