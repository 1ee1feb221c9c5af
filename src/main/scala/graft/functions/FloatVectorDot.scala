package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in float64, sequential element order.
  *
  * This is the one hot spot where built-ins genuinely underperform: the
  * higher-order-function formulation (`transform` → `zip_with` →
  * `aggregate`) is evaluated INTERPRETED (HOFs have no codegen) and
  * materializes two intermediate arrays per row-pair. This expression
  * participates in whole-stage codegen — a tight primitive loop, zero
  * allocation — and computes the BIT-IDENTICAL result: each step is
  * `s += (double) a[i] * (double) b[i]`, the same IEEE op sequence as the
  * HOF fold and as the DuckDB oracle's `list_transform`+`list_sum`, so
  * swapping it in changes nothing the correctness gate can see.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graft_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graft_s = 0.0;
         |for (int graft_i = 0; graft_i < graft_n; graft_i++) {
         |  graft_s += ((double) $a.getFloat(graft_i)) * ((double) $b.getFloat(graft_i));
         |}
         |${ev.value} = graft_s;
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_f"
}

object FloatVectorDot {
  private val name = "vec_dot_f"

  /** Idempotently register in the session's function registry, then build
    * calls with the public `call_function` — no private Column plumbing. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => FloatVectorDot(exprs.head, exprs(1)), "scala_udf")

  /** Dot product of two array<float> columns as float64. */
  def dotF(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    call_function(name, a, b)
  }
}
