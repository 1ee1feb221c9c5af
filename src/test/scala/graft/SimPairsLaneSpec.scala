package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmPipeline

/** Laws of the r11 q_sim_pairs lanes (BASELINE round 11 "q_sim_pairs
  * lanes" holds the measured basis):
  *
  *  - SUBSET: the lsh lane can only ever lose pairs vs the exact block
  *    lane (extra = 0), at any theta and geometry.
  *  - GAP EQUALITY: on a boundary-desert corpus (planted twins, random
  *    background, nothing between theta and the capture bound) the lsh
  *    lane equals block EXACTLY — deterministic under the fixed
  *    SignProjBands seed, so this pin is stable, not flaky.
  *  - AUTO SAFETY: on the real fixture at the declared theta = 0.25 the
  *    boundary is heavily populated, so auto must refuse the lsh lane
  *    regardless of mass; on the gap corpus it must report a desert and
  *    engage lsh exactly when block mass clears the crossover.
  *  - DEFAULT PARITY: the declared (conf-free) query is the block lane
  *    at theta 0.25 — the oracle-replayed result.
  */
class SimPairsLaneSpec extends SparkSpec {

  private val gapDir = "/tmp/simpairs_spec_gap"
  private lazy val mkGapOnce: Unit =
    tools.SimPairsProbe.mkGap(spark, 800, 4, 20, gapDir)

  test("lsh lane is a subset of block at the declared theta (fixture)") {
    val d = sfDir("sf0.001")
    val block = LlmPipeline.simPairsBlock(spark, d, 0.25)
    val lsh = LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16)
    assert(lsh.exceptAll(block).isEmpty, "lsh produced a pair block lacks")
  }

  test("gap corpus: lsh == block exactly, with far fewer candidates") {
    mkGapOnce
    val block = LlmPipeline.simPairsBlock(spark, gapDir, 0.7)
    val lsh = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16)
    assert(block.exceptAll(lsh).isEmpty && lsh.exceptAll(block).isEmpty)
    assert(block.count() > 0, "gap corpus must actually contain twins")
    // candidate mass (theta = -1 keeps every candidate): sub-quadratic
    val cands = LlmPipeline.simPairsLsh(spark, gapDir, -1.0, 32, 16).count()
    val mass = LlmPipeline.simPairsAutoChoice(spark, gapDir, 0.7, 32, 16)._3
    assert(cands * 20 < mass,
      s"band candidates ($cands) not sub-quadratic vs block mass ($mass)")
  }

  test("auto refuses lsh on the fixture: the theta boundary is populated") {
    val d = sfDir("sf0.001")
    // even with the crossover forced to zero, a populated boundary must
    // veto the sketch lane — match-set safety over speed
    spark.conf.set("spark.graft.simpairs.crossover", "0")
    try {
      val (choice, boundary, _) =
        LlmPipeline.simPairsAutoChoice(spark, d, 0.25, 32, 16)
      assert(boundary > 0, "fixture must populate [theta, captureBound)")
      assert(choice == "block")
    } finally spark.conf.unset("spark.graft.simpairs.crossover")
  }

  test("auto on the gap corpus: desert reported; crossover gates the lane") {
    mkGapOnce
    val (c1, b1, mass) =
      LlmPipeline.simPairsAutoChoice(spark, gapDir, 0.7, 32, 16)
    assert(b1 == 0, "gap corpus must have an empty boundary band")
    // default crossover (40M) far exceeds this corpus's mass: block
    assert(c1 == "block" && mass < LlmPipeline.SimPairsCrossover)
    spark.conf.set("spark.graft.simpairs.crossover", "1000")
    try {
      val (c2, b2, _) =
        LlmPipeline.simPairsAutoChoice(spark, gapDir, 0.7, 32, 16)
      assert(b2 == 0 && c2 == "lsh")
    } finally spark.conf.unset("spark.graft.simpairs.crossover")
  }

  test("declared default == block lane at theta 0.25; dials validated") {
    val d = sfDir("sf0.001")
    val declared = LlmPipeline.qSimPairs(spark, d)
    val block = LlmPipeline.simPairsBlock(spark, d, 0.25)
    assert(declared.exceptAll(block).isEmpty && block.exceptAll(declared).isEmpty)
    spark.conf.set("spark.graft.simpairs.strategy", "bogus")
    try intercept[IllegalArgumentException] {
      LlmPipeline.qSimPairs(spark, d)
    } finally spark.conf.unset("spark.graft.simpairs.strategy")
    spark.conf.set("spark.graft.simpairs.threshold", "1.5")
    try intercept[IllegalArgumentException] {
      LlmPipeline.qSimPairs(spark, d)
    } finally spark.conf.unset("spark.graft.simpairs.threshold")
  }

  test("auto sampler's rank filter gets the group-limit pushdown") {
    // simPairsAutoChoice samples ≤256 rows/label via row_number over a
    // hash order; Spark's InferWindowGroupLimit turns the rank-filter
    // shape into WindowGroupLimit (per-group bounded heap BELOW the
    // window), so the decision pass never full-sorts a label partition —
    // the cost concern the r11 ADVICE flags is bounded to one shuffle
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(sfDir("sf0.001") + "/embeddings.parquet")
    val wS = Window.partitionBy(col("label"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val plan = e.withColumn("rn", row_number().over(wS))
      .where(col("rn") <= 256).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("post-hoc boundary check fires on a boundary-populated corpus") {
    // r12 verdict item 3: the fixture at theta = 0.25 populates
    // [theta, captureBound) densely (the auto-safety cell above), and
    // the fixed SignProjBands seed catches some of those pairs, so the
    // candidate-set audit must detect the wrong desert premise —
    // deterministically, not flakily.
    val d = sfDir("sf0.001")
    spark.conf.set("spark.graft.simpairs.onBoundaryHit", "fail")
    try intercept[IllegalStateException] {
      LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16, boundaryCheck = true)
    } finally spark.conf.unset("spark.graft.simpairs.onBoundaryHit")
    // r14 hit-response defaults split by engaging path (r13 ADVICE):
    // AUTO engaged the check → block fallback (auto's premise was wrong,
    // auto re-decides to the exact lane): result == block
    val fellBack = LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16,
      boundaryCheck = true, engagedByAuto = true)
    val block = LlmPipeline.simPairsBlock(spark, d, 0.25)
    assert(fellBack.exceptAll(block).isEmpty
      && block.exceptAll(fellBack).isEmpty)
    // USER-chosen lsh (engagedByAuto = false, the default) → warn: the
    // sketch-tier lsh result is KEPT, not silently rerouted to the
    // quadratic block lane
    val kept =
      LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16, boundaryCheck = true)
    val lane = LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16)
    assert(kept.exceptAll(lane).isEmpty && lane.exceptAll(kept).isEmpty)
    assert(block.exceptAll(lane).count() > 0,
      "cell vacuous: lsh == block here, warn vs block indistinguishable")
    // and an unknown response dial is a loud error, not a silent default
    spark.conf.set("spark.graft.simpairs.onBoundaryHit", "bogus")
    try intercept[IllegalArgumentException] {
      LlmPipeline.simPairsLsh(spark, d, 0.25, 32, 16, boundaryCheck = true)
    } finally spark.conf.unset("spark.graft.simpairs.onBoundaryHit")
  }

  test("checked lane verifies the MATERIALIZED candidate set (one join)") {
    // r13 verdict item 2, structural proof: with the boundary check on,
    // the candidate join is checkpointed before the audit count and the
    // returned verify plan reads those blocks — an RDD scan with ZERO
    // joins. Before r14 the plan rebuilt the banded self-join, so the
    // audit doubled the lane's dominant cost.
    mkGapOnce
    val checked = LlmPipeline
      .simPairsLsh(spark, gapDir, 0.7, 32, 16, boundaryCheck = true)
    val plan = checked.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("Join"), s"candidate join rebuilt:\n$plan")
    // negative control: the unchecked lane's plan DOES contain the join
    // (it stays lazy/transparent — eagerness is the check's cost alone)
    val plain = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16)
      .queryExecution.executedPlan.toString
    assert(plain.contains("Join"), plain)
  }

  test("boundary check is silent on a true desert; auto engages it") {
    mkGapOnce
    // negative control: the gap corpus's desert is real, so the checked
    // lane must return the identical lsh result (no fallback, no throw)
    spark.conf.set("spark.graft.simpairs.onBoundaryHit", "fail")
    try {
      val checked = LlmPipeline
        .simPairsLsh(spark, gapDir, 0.7, 32, 16, boundaryCheck = true)
      val plain = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16)
      assert(checked.exceptAll(plain).isEmpty
        && plain.exceptAll(checked).isEmpty)
    } finally spark.conf.unset("spark.graft.simpairs.onBoundaryHit")
    // auto→lsh runs the check by default (boundaryCheck dflt = true on
    // the auto path): force auto to pick lsh on the gap corpus with
    // onBoundaryHit=fail — a false positive would throw here
    spark.conf.set("spark.graft.simpairs.strategy", "auto")
    spark.conf.set("spark.graft.simpairs.threshold", "0.7")
    spark.conf.set("spark.graft.simpairs.crossover", "1000")
    spark.conf.set("spark.graft.simpairs.onBoundaryHit", "fail")
    try {
      val viaAuto = LlmPipeline.qSimPairs(spark, gapDir)
      val lane = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16)
      assert(viaAuto.exceptAll(lane).isEmpty
        && lane.exceptAll(viaAuto).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.simpairs.strategy")
      spark.conf.unset("spark.graft.simpairs.threshold")
      spark.conf.unset("spark.graft.simpairs.crossover")
      spark.conf.unset("spark.graft.simpairs.onBoundaryHit")
    }
  }

  test("strategy=lsh through the declared entry matches the lane directly") {
    mkGapOnce
    spark.conf.set("spark.graft.simpairs.strategy", "lsh")
    spark.conf.set("spark.graft.simpairs.threshold", "0.7")
    try {
      val viaEntry = LlmPipeline.qSimPairs(spark, gapDir)
      val lane = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16)
      assert(viaEntry.exceptAll(lane).isEmpty && lane.exceptAll(viaEntry).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.simpairs.strategy")
      spark.conf.unset("spark.graft.simpairs.threshold")
    }
  }
}
