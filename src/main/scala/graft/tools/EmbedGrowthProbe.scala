package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth ladder for q_dedup_embed's band-join economics (round 9):
  * LSH candidate mass is inherently ~N²·P(band collision), so the
  * geometry dials (`spark.graft.embed.bandBits` for axis banding,
  * `spark.graft.embed.lsh=proj` + projBands/projBits for hyperplane
  * banding) move the CONSTANT and the recall profile, never the
  * exponent. This measures mass, wall, banding-pass cost and recall
  * per geometry across a ×50 corpus ladder so the tradeoff is data,
  * not theory.
  *
  * Corpus growth: the sf0.1 embeddings (2 000 vectors, 64-dim, sign
  * bits measured near-uniform: Σcnt² within 1.12× of N²/256 per band)
  * are unioned with (g−1)×2 000 synthetic vectors whose dims come from
  * xxhash64(vec_id, dim) mapped to [−1, 1] — uniform signs, matching
  * the family's measured bucket statistics, and using the non-linear
  * hash the round-9 growth-generator lesson requires (a linear hash
  * correlates residue classes with the metric under study). Synthetic
  * ids live at k·1 000 000 + i so they never collide with fixture ids.
  *
  * Per (g, arm ∈ {axis8 = the declared geometry, axis16 = widened axis
  * bands, proj16x16 = the hyperplane SimHash lane}): the analytic join
  * mass Σ_band Σ_bucket cnt² (the exact pre-dedup band-join row
  * count), the full-query wall (median of reps), the result-row count,
  * and — at the rungs where the quadratic brute force is affordable
  * (g ≤ 2) — RECALL against ground truth (all pairs at cosine ≥ 0.4)
  * bucketed by cosine decile, so the mass-vs-recall tradeoff of each
  * geometry is measured, not asserted.
  *
  * Usage: runMain graft.tools.EmbedGrowthProbe [workDir] [g ...]
  */
object EmbedGrowthProbe {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_embed_growth")
    val gs = { val t = args.drop(1).map(_.toInt); if (t.nonEmpty) t.toSeq
      else Seq(1, 2, 5, 10, 25, 50) }
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def grownDir(g: Int): String = {
      val dir = s"$workDir/g$g"
      val done = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
      if (!fs.exists(done)) {
        val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        val grown = if (g <= 1) base else {
          val synth = spark.range(2000L * (g - 1))
            .select((lit(1000000L) + (col("id") / 2000).cast("long") * 1000000L
              + col("id") % 2000).as("vec_id"))
            .select(col("vec_id"),
              expr("transform(sequence(0, 63), j -> cast(" +
                "pmod(xxhash64(vec_id, j), 1000001) / 500000.5 - 1 " +
                "as float))").as("embedding"),
              lit(0).as("label"))
          base.unionByName(synth)
        }
        grown.coalesce(math.max(1, g / 4)).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      }
      dir
    }

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    // arms: the declared axis-8 geometry, the widened axis-16 (the
    // measured recall cliff), and the hyperplane lane at 16 bands x 16
    // bits (256 independent projections; collision odds 2^-16 per band,
    // recall restored by band count instead of axis budget)
    case class Arm(name: String, confs: Map[String, String],
        nBands: Int, bits: Int, proj: Boolean)
    val arms = Seq(
      Arm("axis8", Map("spark.graft.embed.lsh" -> "axis",
        "spark.graft.embed.bandBits" -> "8"), 8, 8, proj = false),
      Arm("axis16", Map("spark.graft.embed.lsh" -> "axis",
        "spark.graft.embed.bandBits" -> "16"), 4, 16, proj = false),
      Arm("proj16x16", Map("spark.graft.embed.lsh" -> "proj",
        "spark.graft.embed.projBands" -> "16",
        "spark.graft.embed.projBits" -> "16"), 16, 16, proj = true),
      // same per-band width as axis8 (so same per-pair band-match odds)
      // but twice the bands: recall should ~double at ~double the mass —
      // the knob axis banding does NOT have (its band count is 64/width)
      Arm("proj16x8", Map("spark.graft.embed.lsh" -> "proj",
        "spark.graft.embed.projBands" -> "16",
        "spark.graft.embed.projBits" -> "8"), 16, 8, proj = true),
      // frontier point: double the 16-bit bands -> recall back near the
      // narrow arms at ~2x proj16x16's mass (still ~23x under axis8)
      Arm("proj32x16", Map("spark.graft.embed.lsh" -> "proj",
        "spark.graft.embed.projBands" -> "32",
        "spark.graft.embed.projBits" -> "16"), 32, 16, proj = true))

    for (g <- gs) {
      val dir = grownDir(g)
      // ground truth for recall: ALL pairs at cosine >= 0.4, brute force
      // (quadratic -- only at the small rungs)
      val truth = if (g > 2) null else {
        val fdot = graft.functions.FloatVectorDot.dotF(spark) _
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"),
            sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"))
          .where(!isnan(col("nrm")) && col("nrm") > 0)
        e.toDF("a_id", "ea", "na")
          .hint("shuffle_merge").join(e.toDF("b_id", "eb", "nb"),
            col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            (fdot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
          .where(col("cos") >= 0.4)
          .persist()
      }
      if (truth != null) {
        val byBucket = truth.groupBy(
          floor(col("cos") * 10).cast("int").as("b")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        println(s"""{"metric":"embed_truth","g":$g,"pairs":${truth.count()},"by_cos_decile":${byBucket.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")}}""")
      }
      for (arm <- arms) {
        arm.confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val bandsOf = (c: org.apache.spark.sql.Column) =>
          if (arm.proj) graft.functions.SignProjBands
            .bands(spark)(c, 0x67726166L, arm.nBands, arm.bits)
          else graft.functions.SignBands.bands(spark)(c, arm.nBands, arm.bits)
        val massQ = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(posexplode(bandsOf(col("embedding"))).as(Seq("bi", "bv")))
          .groupBy(col("bi"), col("bv")).count()
          .agg(sum(col("count") * col("count")).as("ss"),
            sum(expr("count * (count - 1) DIV 2")).as("pairs"))
        // bands-pass cost in isolation (one evaluation per row), and how
        // many times the kernel appears in the full query's plan — a
        // collapse that inlines it into both the generator and the
        // carried column would double the dominant cost
        val bandSecs = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); massQ.head(); (System.nanoTime() - t0) / 1e9
        }
        val kernelCount = {
          val p = graft.operators.LlmPipeline.qDedupEmbed(spark, dir)
            .queryExecution.executedPlan.toString
          val needle = if (arm.proj) "sign_proj_bands" else "sign_bands"
          needle.r.findAllMatchIn(p).size
        }
        val mass = massQ.head()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.operators.LlmPipeline.qDedupEmbed(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val res = graft.operators.LlmPipeline.qDedupEmbed(spark, dir)
        val rows = res.count()
        val recall = if (truth == null) "null" else {
          val hit = res.select(col("a_id"), col("b_id"))
            .join(truth, Seq("a_id", "b_id"))
          val byBucket = hit.groupBy(
            floor(col("cos") * 10).cast("int").as("b")).count()
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          byBucket.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
            .mkString("{", ",", "}")
        }
        println(f"""{"metric":"embed_growth","g":$g,"arm":"${arm.name}","n":${2000L * g},"join_mass":${mass.getLong(0)},"band_pairs":${mass.getLong(1)},"rows":$rows,"median_sec":${med(times)}%.2f,"min_sec":${times.min}%.2f,"band_sec":${med(bandSecs)}%.2f,"kernel_in_plan":$kernelCount,"recall_hits_by_cos_decile":$recall}""")
      }
      if (truth != null) truth.unpersist()
      Seq("spark.graft.embed.lsh", "spark.graft.embed.bandBits",
        "spark.graft.embed.projBands", "spark.graft.embed.projBits")
        .foreach(spark.conf.unset)
    }
    spark.stop()
  }
}
