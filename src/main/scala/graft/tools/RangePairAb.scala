package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the r11 q_join_range rewrite (r10
  * verdict item 5): the FLAT arm is the pre-r11 formulation verbatim —
  * self-join on user_id alone, |Δt| ≤ 1h as a post-join residual — and
  * the BINNED arm is [[graft.plans.BinnedRangeJoin.selfPairsWithin]]'s
  * ownership-bin shape the query now uses. Both arms run the identical
  * downstream aggregate; equality is exceptAll-gated both ways.
  *
  * Beyond wall-clock, the line reports each arm's analytic CANDIDATE
  * MASS (the join-output row count before the range residual), computed
  * by aggregation without running the join: flat = Σ_user C(n,2);
  * binned = Σ_(user,bin) [C(c,2) + c·c_nextbin]. The skew cell plants a
  * hot user carrying `hotShare` of all events uniformly over the time
  * span — the r6 skew-octave shape where the flat arm's one key goes
  * quadratic while the binned arm stays bounded by per-hour density.
  *
  * Usage: runMain graft.tools.RangePairAb [reps] [sfDir] [hotMult]
  */
object RangePairAb {
  private val W = 3600000000L // 1h in micros

  private def flatArm(e: DataFrame): DataFrame = {
    val a = e.toDF("user_id", "a_id", "a_us")
    val b = e.toDF("user_id", "b_id", "b_us")
    a.join(b, Seq("user_id"))
      .where(col("a_id") < col("b_id")
        && abs(col("b_us") - col("a_us")) <= lit(W))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.Cols.r6(avg(abs(col("b_us") - col("a_us")).cast("double")))
          .as("avg_gap_us"))
      .orderBy("user_id")
  }

  private def binnedArm(e: DataFrame): DataFrame =
    graft.plans.BinnedRangeJoin
      .selfPairsWithin(e, Seq("user_id"), "event_id", "us", W)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.Cols.r6(avg(abs(col("b_us") - col("a_us")).cast("double")))
          .as("avg_gap_us"))
      .orderBy("user_id")

  /** (flat candidates, binned candidates) by aggregation. */
  private def candidateMasses(e: DataFrame): (Long, Long) = {
    val flat = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0)
    val perBin = e.select(col("user_id"), expr(s"us div ${W}L").as("bin"))
      .groupBy(col("user_id"), col("bin")).agg(count(lit(1)).as("c"))
    val nxt = perBin.select(col("user_id"), (col("bin") - 1L).as("bin"),
      col("c").as("cn"))
    val binned = perBin.join(nxt, Seq("user_id", "bin"), "left")
      .agg(sum(col("c") * (col("c") - 1) / 2
        + col("c") * coalesce(col("cn"), lit(0L)))).collect()(0)
    (if (flat.isNullAt(0)) 0L else flat.getDouble(0).toLong,
      if (binned.isNullAt(0)) 0L else binned.getDouble(0).toLong)
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val hotMult = args.drop(2).headOption.map(_.toInt).getOrElse(8)
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

    val real = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        graft.Cols.epochUs(col("ts")).as("us"))
      .persist()
    // hot-user cell: plant one user holding hotMult× the busiest real
    // user's events, uniform over the whole observed span (the shape
    // where flat-arm candidates grow quadratically in the multiplier
    // but per-hour density — the binned arm's driver — stays flat)
    val span = real.agg(min(col("us")), max(col("us"))).collect()(0)
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    val maxPerUser = real.groupBy(col("user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    val nHot = maxPerUser * hotMult
    val hot = spark.range(nHot).select(
      lit(-1L).as("user_id"),
      (col("id") + 10000000L).as("event_id"),
      (lit(lo) + (col("id") * ((hi - lo) / nHot))).as("us"))
    val skew = real.unionByName(hot).persist()
    skew.count()

    val cells = Seq("real" -> real, "skew" -> skew)
    for ((cell, e) <- cells) {
      val (fc, bc) = candidateMasses(e)
      val arms = Seq("flat" -> (() => flatArm(e)), "binned" -> (() => binnedArm(e)))
      for ((_, fn) <- arms) fn().count() // warm both
      val times = scala.collection.mutable.Map(
        arms.map { case (n, _) => n -> List.empty[Double] }: _*)
      for (_ <- 1 to reps; (arm, fn) <- arms) {
        val t0 = System.nanoTime()
        fn().count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      val same = {
        val a = flatArm(e)
        val b = binnedArm(e)
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val armJson = arms.map { case (n, _) =>
        f""""$n":{"median_sec":${med(times(n))}%.3f,"min_sec":${times(n).min}%.3f}"""
      }.mkString(",")
      println(s"""{"metric":"range_pair_ab","cell":"$cell","sf":"$sfDir","reps":$reps,"hot_mult":$hotMult,"same_rows":$same,"candidates":{"flat":$fc,"binned":$bc},"arms":{$armJson}}""")
    }
    real.unpersist(); skew.unpersist()
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
