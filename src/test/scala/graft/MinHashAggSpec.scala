package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg

class MinHashAggSpec extends SparkSpec {

  import MinHashAgg.{A, B, P}

  private def toks = {
    val docs = Tables.documents(spark, sfDir("sf0.001"))
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val vocab = dt.select(col("tok")).distinct()
      .withColumn("tok_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("tok"))).cast("long"))
    dt.join(vocab, "tok").select(col("doc_id"), col("tok_id"))
  }

  test("one-pass aggregate equals the k-min-columns formulation") {
    val sig = MinHashAgg.minhashSig(spark) _
    val agg = toks.groupBy(col("doc_id")).agg(sig(col("tok_id")).as("sig"))
    val mins = A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("tok_id") + lit(b)) % lit(P)).as(s"h$i")
    }
    val cols = toks.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
    val got = agg.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = cols.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("signature is partition-count invariant (merge path exercised)") {
    val sig = MinHashAgg.minhashSig(spark) _
    def sigs(parts: Int) = toks.repartition(parts)
      .groupBy(col("doc_id")).agg(sig(col("tok_id")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) === sigs(17))
  }

  test("null inputs are ignored; all-null group yields null signature") {
    import spark.implicits._
    val sig = MinHashAgg.minhashSig(spark) _
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("g", "x")
    val out = df.groupBy(col("g")).agg(sig(col("x")).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty)
    val lanes = out(1L).get.asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(lanes === A.zip(B).map { case (a, b) => (a * 5L + b) % P }.toSeq)
  }
}
