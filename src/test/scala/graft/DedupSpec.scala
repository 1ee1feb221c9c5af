package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LlmPipeline, TrainingData}

/** The candidate-pruned dedup operators must return EXACTLY what their naive
  * quadratic formulations return — pruning (prefix filter, pigeonhole bands,
  * deletion signatures) is a cost optimization, never a semantic one.
  * Each test recomputes the naive answer inline with a different algorithm
  * than the operator under test. */
class DedupSpec extends SparkSpec {

  private val d = sfDir("sf0.001")

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q_dedup_ngram equals the naive quadratic shingle join") {
    val sh = Tables.documents(spark, d)
      .where(length(col("text")) >= 5)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("text")) - 4),
          i => col("text").substr(i, lit(5))))).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val naive = sh.toDF("a_id", "lang", "sh")
      .join(sh.toDF("b_id", "lang", "sh"), Seq("lang", "sh"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("lang"), col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("jac", col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double"))
      .where(col("jac") >= 0.8)
      .select(col("a_id"), col("b_id"), col("lang"), Cols.r6(col("jac")).as("jac"))
    val got = LlmPipeline.qDedupNgram(spark, d)
    assert(got.count() > 0)
    assert(asSet(got) == asSet(naive))
  }

  private def docToks = Tables.documents(spark, d).select(col("doc_id"),
    col("lang"), explode(array_distinct(split(col("text"), " "))).as("tok"))

  test("q_dedup_near equals the naive quadratic token join") {
    val t = docToks
    val sizes = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val naive = t.toDF("a_id", "lang", "tok")
      .join(t.toDF("b_id", "lang", "tok"), Seq("lang", "tok"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("lang"), col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("jac", col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double"))
      .where(col("jac") >= 0.95)
      .select(col("a_id"), col("b_id"), col("lang"), Cols.r6(col("jac")).as("jac"))
    val got = LlmPipeline.qDedupNear(spark, d)
    assert(got.count() > 0)
    assert(asSet(got) == asSet(naive))
  }

  test("q_dedup_simhash banding equals the naive quadratic pair join") {
    val banded = TrainingData.qDedupSimhash(spark, d)
    val naive = {
      val vocab = docToks.select(col("tok")).distinct()
        .withColumn("tok_id", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("tok"))).cast("long"))
      val tv = docToks.join(vocab, "tok")
      val sig = tv
        .withColumn("j", explode(sequence(lit(0), lit(15))))
        .withColumn("w", (col("tok_id") * (lit(2) * col("j") + lit(3))) % 7 - 3)
        .groupBy(col("doc_id"), col("lang"), col("j"))
        .agg(sum(col("w")).as("sc"))
        .withColumn("bit", (col("sc") > 0).cast("long"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("bit") * pow(lit(2.0), col("j")).cast("long")).as("simhash"))
      sig.toDF("a_id", "lang", "ha")
        .join(sig.toDF("b_id", "lang", "hb"), Seq("lang"))
        .where(col("a_id") < col("b_id"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .where(col("hamming") <= 2)
        .select(col("a_id"), col("b_id"), col("lang"), col("hamming"))
    }
    assert(banded.count() > 0)
    assert(asSet(banded) == asSet(naive))
  }

  test("q_dedup_embed pairs are same-band and exactly the cos>=0.4 candidates") {
    val e = Tables.embeddings(spark, d)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val withBands = e.select(col("vec_id"), col("embedding"),
      array((0 until 8).map { t =>
        (0 until 8).map(i =>
          when(element_at(col("embedding"), 8 * t + i + 1) > 0f, lit(1L << i))
            .otherwise(lit(0L))).reduce(_ + _)
      }: _*).as("bands"))
    val naive = withBands.toDF("a_id", "ea", "ba")
      .crossJoin(withBands.toDF("b_id", "eb", "bb"))
      .where(col("a_id") < col("b_id"))
      .where(exists(zip_with(col("ba"), col("bb"), (x, y) => x === y), b => b))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) /
        (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))))
      .where(col("cos_sim") >= 0.4)
      .select(col("a_id"), col("b_id"), Cols.r6(col("cos_sim")).as("cos_sim"))
    val got = LlmPipeline.qDedupEmbed(spark, d)
    assert(got.count() > 0)
    assert(asSet(got) == asSet(naive))
  }
}
