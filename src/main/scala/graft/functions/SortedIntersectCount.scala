package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |a ∩ b| for two ASCENDING-SORTED, distinct,
  * null-free `array<long>` columns, by two-pointer merge — O(n+m), zero
  * allocation, whole-stage-codegen'd.
  *
  * This is the verify kernel of the set-similarity operators
  * ([[graft.operators.LlmPipeline.qDedupNgram]]): candidate pairs carry both
  * docs' sorted shingle-hash arrays, and the exact Jaccard needs only the
  * intersection size. Spark's built-in `array_intersect` materializes the
  * intersection ARRAY via a per-row hash set (boxing on the generic path) —
  * ~10x slower when only the COUNT is needed and sortedness is known.
  * Inputs MUST be sorted ascending (`array_sort`) — unsorted input silently
  * undercounts, which the call sites guarantee by construction.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graft_n = $a.numElements();
         |int graft_m = $b.numElements();
         |int graft_i = 0, graft_j = 0;
         |long graft_c = 0L;
         |while (graft_i < graft_n && graft_j < graft_m) {
         |  long graft_x = $a.getLong(graft_i);
         |  long graft_y = $b.getLong(graft_j);
         |  if (graft_x == graft_y) { graft_c++; graft_i++; graft_j++; }
         |  else if (graft_x < graft_y) { graft_i++; }
         |  else { graft_j++; }
         |}
         |${ev.value} = graft_c;
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  private val name = "sorted_intersect_count"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SortedIntersectCount(exprs.head, exprs(1)), "scala_udf")

  /** Intersection size of two sorted distinct array<long> columns. */
  def interCount(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    call_function(name, a, b)
  }
}
