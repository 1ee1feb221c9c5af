package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LlmPipeline

/** Measurement basis for the r11 q_sim_pairs lanes (BASELINE round 11).
  * Three cells:
  *
  *  1. FIXTURE RECALL — on the real sf embeddings at the declared
  *     theta = 0.25, per geometry: the lsh lane's found-pair count vs
  *     the block lane's (recall), and the band-join candidate mass vs
  *     block's Σ label-block². This is the cell that CORRECTS the r10
  *     verdict's premise: no geometry is simultaneously exact and
  *     sub-quadratic, because qualifying pairs sit flush at the
  *     threshold (no cosine gap) and the output itself is ~2% of all
  *     within-label pairs.
  *
  *  2. GAP EQUALITY — a dedup-shaped corpus (random unit background,
  *     planted near-identical twins at cos ≈ 0.99, nothing in between)
  *     at theta = 0.7: lsh must equal block EXACTLY (both directions of
  *     exceptAll empty — deterministic under the fixed SignProjBands
  *     seed), with sub-quadratic candidates; and simPairsAutoChoice must
  *     report a boundary desert and pick lsh once block mass clears the
  *     crossover.
  *
  *  3. CROSSOVER — block vs lsh wall-clock, interleaved same-JVM, on
  *     gap corpora of growing size; the Σ block² where the walls cross
  *     calibrates `spark.graft.simpairs.crossover`.
  *
  * Usage: runMain graft.tools.SimPairsProbe [reps] [sfDir] [n,n,...]
  * A third argument (comma-separated corpus sizes) runs ONLY the
  * crossover cell at those sizes — for extending the growth table
  * without re-paying cells 1–2.
  */
object SimPairsProbe {
  /** Deterministic dedup-shaped corpus: random background, planted
    * near-identical twins (cos ≈ 0.9998), nothing in between — the
    * boundary-desert shape. Public: SimPairsLaneSpec builds its fixtures
    * with the same generator the measurements used.
    *
    * EXACT SHAPE (r11 ADVICE correction — the generator, not the old
    * comment, is what every recorded measurement ran on): all `twins`
    * twin rows in a label perturb the SAME base row (base row id =
    * label index, because the twin seed is `id % labels`), so each
    * label's twins form one mutual cos-1.0 CLIQUE around that base row
    * — C(twins/labels + 1, 2) qualifying pairs per label, more than the
    * matched-twin shape the comment used to describe. The gap-equality
    * and crossover cells measure block-vs-lsh on qualifying-pair mass
    * and candidate mass, which this shape provides exactly as claimed;
    * the clique just concentrates the qualifying pairs on one hub per
    * label. Kept as-is so the BASELINE r11 crossover/gap numbers remain
    * reproductions of this exact generator.
    *
    * Background-tail bound (r11 verdict item 7): the background vectors
    * are pseudo-random in [-1, 1]^64, so background-pair cosines
    * concentrate near 0 with an O(1/√dim) tail; as rows-per-label grows
    * the C(n/labels, 2) background pair count eventually populates
    * [theta, captureBound) by sheer mass — measured around ~50k
    * rows/label at theta = 0.7 — and simPairsAutoChoice then (correctly)
    * reports a populated boundary and flips auto to block. Crossover
    * cells past that size must measure the lanes directly (the probe's
    * crossover mode calls the lanes, not auto, so the recorded table is
    * unaffected). */
  def mkGap(spark: SparkSession, n: Int, labels: Int,
      twins: Int, dir: String): Unit = {
    // deterministic base vectors; twin j duplicates base row (j % labels)
    // — the per-label clique shape documented above — with a tiny
    // deterministic perturbation on one coordinate (cos ≈ 0.999)
    val base = spark.range(n).selectExpr(
      "id as vec_id",
      s"cast(id % $labels as int) as label",
      // xxhash64-seeded pseudo-gaussian-ish components in [-1, 1]
      """transform(sequence(0, 63), i ->
         cast((cast(xxhash64(id * 64 + i) % 1000 as double) / 1000.0) as float))
         as embedding""")
    val twinRows = spark.range(twins).selectExpr(
      s"id + ${n}L as vec_id",
      s"cast(id % $labels as int) as label",
      s"""transform(sequence(0, 63), i ->
         cast((cast(xxhash64((id % $labels) * 64 + i) % 1000 as double) / 1000.0)
              * (case when i = 0 then 1.02 else 1.0 end) as float))
         as embedding""")
    base.unionByName(twinRows)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def withConf(spark: SparkSession, kvs: (String, String)*)(
      body: => Unit): Unit = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val crossoverOnly = args.drop(2).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
    if (crossoverOnly.isDefined) {
      runCrossover(spark, reps, crossoverOnly.get)
      graft.operators.TrainingData.unpersistAll()
      spark.stop()
      return
    }

    // ---- cell 1: fixture recall at the declared theta ----
    val blockRes = LlmPipeline.simPairsBlock(spark, sfDir, 0.25).persist()
    val nBlock = blockRes.count()
    val blockMass = LlmPipeline
      .simPairsAutoChoice(spark, sfDir, 0.25, 32, 16)._3
    for ((bands, bits) <- Seq((16, 16), (32, 16), (32, 8), (64, 8))) {
      val lsh = LlmPipeline.simPairsLsh(spark, sfDir, 0.25, bands, bits)
      val nLsh = lsh.count()
      val missed = blockRes.exceptAll(lsh).count()
      val extra = lsh.exceptAll(blockRes).count()
      val cands = LlmPipeline.simPairsLsh(spark, sfDir, -1.0, bands, bits)
        .count() // theta = -1: every candidate passes the verify
      val cHi = LlmPipeline.lshCaptureBound(bands, bits, 1e-6)
      println(f"""{"metric":"simpairs_fixture","sf":"$sfDir","geometry":"${bands}x$bits","capture_bound":$cHi%.4f,"block_pairs":$nBlock,"lsh_pairs":$nLsh,"missed":$missed,"extra":$extra,"candidates":$cands,"block_candidates":$blockMass}""")
    }
    blockRes.unpersist()

    // ---- cell 2: gap-corpus equality + auto desert ----
    val gapDir = "/tmp/simpairs_gap"
    mkGap(spark, 4000, 4, 40, gapDir)
    withConf(spark) {
      val block = LlmPipeline.simPairsBlock(spark, gapDir, 0.7).persist()
      val lsh = LlmPipeline.simPairsLsh(spark, gapDir, 0.7, 32, 16).persist()
      val equal = block.exceptAll(lsh).isEmpty && lsh.exceptAll(block).isEmpty
      val cands = LlmPipeline.simPairsLsh(spark, gapDir, -1.0, 32, 16).count()
      val (choice, boundary, mass) =
        LlmPipeline.simPairsAutoChoice(spark, gapDir, 0.7, 32, 16)
      println(s"""{"metric":"simpairs_gap","n":4040,"theta":0.7,"geometry":"32x16","equal":$equal,"pairs":${block.count()},"candidates":$cands,"block_candidates":$mass,"auto":{"choice":"$choice","boundary_pairs":$boundary,"block_pairs":$mass}}""")
      block.unpersist(); lsh.unpersist()
    }

    // ---- cell 3: crossover on growing gap corpora ----
    runCrossover(spark, reps, Seq(2000, 8000, 24000))
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }

  private def runCrossover(spark: SparkSession, reps: Int,
      ns: Seq[Int]): Unit = {
    for (n <- ns) {
      val dir = s"/tmp/simpairs_gap_$n"
      mkGap(spark, n, 4, 40, dir)
      val arms = Seq(
        "block" -> (() => LlmPipeline.simPairsBlock(spark, dir, 0.7)),
        "lsh" -> (() => LlmPipeline.simPairsLsh(spark, dir, 0.7, 32, 16)))
      for ((_, fn) <- arms) fn().count() // warm
      val times = scala.collection.mutable.Map(
        arms.map { case (a, _) => a -> List.empty[Double] }: _*)
      for (_ <- 1 to reps; (arm, fn) <- arms) {
        val t0 = System.nanoTime()
        fn().count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      val mass = LlmPipeline.simPairsAutoChoice(spark, dir, 0.7, 32, 16)._3
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"""{"metric":"simpairs_crossover","n":$n,"block_pairs":$mass,"block_med":${med(times("block"))}%.3f,"lsh_med":${med(times("lsh"))}%.3f}""")
    }
  }
}
