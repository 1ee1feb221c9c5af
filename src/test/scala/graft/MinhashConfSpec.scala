package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Pins the round-7 conf-knob generalization of q_dedup_minhash
  * (`spark.graft.minhash.{k,r,threshold}`): the DEFAULT path must stay
  * bit-identical to the declared K=8 / b=2×r=4 / θ=0.75 construction the
  * DuckDB oracle replays, and a production-lane conf flip (k=64, r=8)
  * must run through the identical join shape with the tighter-estimate
  * invariants that motivate it. */
class MinhashConfSpec extends SparkSpec {

  private val d = sfDir("sf0.001")

  private def withConf[A](kv: (String, String)*)(f: => A): A = {
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** The pre-generalization hardcoded two-band construction, verbatim —
    * the reference the conf defaults are pinned against. */
  private def reference8: DataFrame = {
    import graft.operators.TrainingData.{docToks, vocab}
    val tv = docToks(spark, d).join(broadcast(vocab(spark, d)), "tok")
    val sig = graft.functions.MinHashAgg.minhashSig(spark) _
    val mh = tv.groupBy(col("doc_id"), col("lang"))
      .agg(sig(col("tok_id")).as("sig"))
    val bands = mh.select(col("doc_id"), col("lang"),
      explode(array(
        struct(lit(0).as("band"), col("sig")(0).as("x0"), col("sig")(1).as("x1"),
          col("sig")(2).as("x2"), col("sig")(3).as("x3")),
        struct(lit(1).as("band"), col("sig")(4).as("x0"), col("sig")(5).as("x1"),
          col("sig")(6).as("x2"), col("sig")(7).as("x3")))).as("b"),
      col("sig"))
      .select((Seq(col("doc_id"), col("lang"), col("b.band").as("band")) ++
        (0 until 4).map(i => col(s"b.x$i").as(s"x$i")) :+ col("sig")): _*)
    val nMatch = (0 until 8)
      .map(i => when(col("siga")(i) === col("sigb")(i), 1).otherwise(0))
      .reduce(_ + _)
    val band0Match = (0 until 4)
      .map(i => col("siga")(i) === col("sigb")(i)).reduce(_ && _)
    bands.toDF("a_id", "lang", "band", "x0", "x1", "x2", "x3", "siga")
      .join(bands.toDF("b_id", "lang", "band", "x0", "x1", "x2", "x3", "sigb"),
        Seq("lang", "band", "x0", "x1", "x2", "x3"))
      .where(col("a_id") < col("b_id"))
      .where(col("band") === 0 || !band0Match)
      .withColumn("est_jac", nMatch.cast("double") / 8.0)
      .where(col("est_jac") >= 0.75)
      .select(col("a_id"), col("b_id"), col("lang"), col("est_jac"))
      .orderBy("a_id", "b_id")
  }

  test("default confs reproduce the declared 8-lane construction bit-identically") {
    val got = SparkEntry.queries("q_dedup_minhash")(spark, d)
    val ref = reference8
    assert(got.schema.fieldNames.toSeq ===
      Seq("a_id", "b_id", "lang", "est_jac"))
    assert(got.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(got).count() === 0L)
    assert(got.count() > 0L, "sf0.001 corpus must yield at least one near-dup pair")
  }

  test("production conf flip k=64 r=8 runs the same shape with tighter estimates") {
    // θ=0 exposes the full CANDIDATE tier, where the cross-k law lives.
    val cand = withConf(
      "spark.graft.minhash.k" -> "64",
      "spark.graft.minhash.r" -> "8",
      "spark.graft.minhash.threshold" -> "0.0") {
      SparkEntry.queries("q_dedup_minhash")(spark, d).collect()
    }
    // Same output contract: distinct ordered pairs, est on a 1/64 grid.
    val keys = cand.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.nonEmpty)
    assert(keys.distinct.length === keys.length,
      "lowest-matching-band dedup must hold at 8 bands")
    cand.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val est = r.getDouble(3)
      assert(est >= 0.0 && est <= 1.0)
      val grid = est * 64.0
      assert(math.abs(grid - math.round(grid)) < 1e-9,
        s"est_jac $est must be a multiple of 1/64")
    }
    // Cross-k candidate law: band 0 of (k=64, r=8) is EXACTLY the 8
    // published lanes, so any pair whose 8-lane signatures fully agree
    // (est_jac = 1.0 at the default surface) must be a (64,8) candidate.
    // (The thresholded OUTPUT may drop it — 56 extra lanes sharpen the
    // estimate — which is the point of the production flip.)
    val exactTwins = SparkEntry.queries("q_dedup_minhash")(spark, d)
      .where(col("est_jac") === 1.0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactTwins.nonEmpty, "sf0.001 must contain full-prefix-agreement pairs")
    assert(exactTwins.subsetOf(keys.toSet),
      "8-lane full-agreement pairs are band-0 candidates at (64, r=8)")
    // A tighter θ at the same (k, r) must select exactly its est-filter
    // subset of the candidate tier.
    val tight = withConf(
      "spark.graft.minhash.k" -> "64",
      "spark.graft.minhash.r" -> "8",
      "spark.graft.minhash.threshold" -> "0.9") {
      SparkEntry.queries("q_dedup_minhash")(spark, d).collect()
    }.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = cand.filter(_.getDouble(3) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === expect, "θ is a pure est_jac filter over the candidate tier")
  }

  test("invalid lane/band split is rejected") {
    withConf("spark.graft.minhash.k" -> "10", "spark.graft.minhash.r" -> "4") {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q_dedup_minhash")(spark, d)
      }
      assert(e.getMessage.contains("multiple"))
    }
  }
}
