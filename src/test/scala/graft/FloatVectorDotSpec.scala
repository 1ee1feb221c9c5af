package graft

import org.apache.spark.sql.functions._

import graft.functions.FloatVectorDot
import graft.functions.VectorFunctions._

/** The codegen'd dot product must be BIT-IDENTICAL to the HOF fold it
  * replaces (same IEEE op sequence) — checked exhaustively on the fixture
  * embeddings, self- and cross-products. */
class FloatVectorDotSpec extends SparkSpec {

  test("vec_dot_f == HOF fold, bit for bit, on all fixture self-products") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val n = e.select(
        FloatVectorDot.dotF(spark)(col("embedding"), col("embedding")).as("native"),
        dot(toDouble(col("embedding")), toDouble(col("embedding"))).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(n == 0)
  }

  test("vec_dot_f == HOF fold on cross-products (label-blocked pairs)") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.toDF("a_id", "label", "va")
    val b = e.toDF("b_id", "label", "vb")
    val n = a.join(b, Seq("label"))
      .where(col("a_id") < col("b_id"))
      .select(
        FloatVectorDot.dotF(spark)(col("va"), col("vb")).as("native"),
        dot(toDouble(col("va")), toDouble(col("vb"))).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(n == 0)
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val plan = e.select(
        FloatVectorDot.dotF(spark)(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString()
    // the "*(n)" stage prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [vec_dot_f"), plan.take(500))
  }
}
