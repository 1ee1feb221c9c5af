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
    // Mirror the kernel/oracle formulation EXACTLY: tok_id is reduced
    // mod P BEFORE the multiply (the unreduced form only agrees while
    // vocab ids are small enough not to overflow past a*P).
    val mins = A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * (col("tok_id") % lit(P)) + lit(b)) % lit(P)).as(s"h$i")
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

  test("affine family is wrap-rich; lanes rank ids independently (degeneracy regression)") {
    // The original a <= 8291 multipliers never wrapped P over a fixture-sized
    // vocab (a·x < P for all x < 259 013), so every lane was MONOTONE in
    // tok_id: all 8 argmins collapsed to the doc's minimum (lexicographically
    // first) token, est_jac degenerated to {0,1}, and q_dedup_minhash
    // silently clustered docs by their first vocab token (caught by the
    // round-6 skew octave: 38.6 M all-est=1.0 pairs on the ×8 shard corpus).
    // Pin the two properties that make the family a real Jaccard estimator:
    // every lane wraps within 1000 consecutive ids, and the 8 lanes pick
    // genuinely different argmins over a contiguous id range.
    A.foreach(a => assert(a > P / 1000L,
      s"multiplier $a is monotone over a 1000-id vocab — degenerate lane"))
    val ids = (1L to 1000L)
    val argmins = A.zip(B).map { case (a, b) =>
      ids.minBy(x => (a * (x % P) + b) % P) }
    assert(argmins.distinct.size >= 4,
      s"lanes share argmins over 1..1000: $argmins")
    // and the estimate of a J=0.5 pair is strictly interior — not the
    // all-or-nothing {0,1} the monotone family produced
    def sig(s: Seq[Long]): Seq[Long] =
      A.zip(B).map { case (a, b) => s.map(x => (a * (x % P) + b) % P).min }
    val shared = (1L to 20L); val ua = (1001L to 1010L); val ub = (2001L to 2010L)
    val agree = sig(shared ++ ua).zip(sig(shared ++ ub))
      .count { case (x, y) => x == y }
    assert(agree > 0 && agree < 8, s"est_jac degenerate: $agree/8 lanes")
  }

  test("family(k): published 8-lane prefix pinned; generated lanes wrap-rich") {
    val (a8, b8) = MinHashAgg.family(8)
    assert(a8.toSeq === A.toSeq && b8.toSeq === B.toSeq,
      "family(8) must be exactly the published constants")
    val (a64, b64) = MinHashAgg.family(64)
    assert(a64.take(8).toSeq === A.toSeq && b64.take(8).toSeq === B.toSeq,
      "lanes <8 of any family must be the published prefix")
    // every generated multiplier stays inside the wrap-richness envelope
    // (>= 2.1e8 from 0 and P) — the round-6 degeneracy class is structurally
    // excluded at every lane count
    a64.foreach(a => assert(a >= 210000000L && a <= P - 210000000L,
      s"generated multiplier $a escapes the wrap envelope"))
    assert(a64.distinct.length == 64, "duplicate multipliers in family(64)")
  }

  test("k=64 one-pass signature: 8-lane prefix equals the k=8 signature") {
    val sig8 = MinHashAgg.minhashSig(spark) _
    val sig64 = MinHashAgg.minhashSigK(spark, 64) _
    val s8 = toks.groupBy(col("doc_id")).agg(sig8(col("tok_id")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s64 = toks.repartition(13).groupBy(col("doc_id"))
      .agg(sig64(col("tok_id")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s64.nonEmpty && s64.keySet == s8.keySet)
    s64.foreach { case (id, sig) =>
      assert(sig.length == 64)
      assert(sig.take(8) == s8(id),
        s"doc $id: k=64 prefix diverges from the k=8 signature")
    }
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
