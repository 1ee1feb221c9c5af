package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-partition skew ladder for the user-partitioned WINDOW heads
  * (r12 verdict item 5, extending TopkSkewAb's discipline): the volume
  * octaves (HeadsOctave/GrowCorpus) grow the user count at constant
  * per-user mass, where a `Window.partitionBy(user_id)` plan
  * parallelizes perfectly — but the 100 TB hazard is one GIANT user (a
  * bot, a load-test account, a service identity) whose whole stream
  * sorts inside ONE task. TopkSkewAb measured that cell for grouped
  * top-k and the native TopKPerKey fix; this ladder measures the three
  * remaining window-shaped heads that have volume evidence but no
  * hot-partition curve:
  *
  *  - q_transition_matrix — lead(event_type) over (user_id | ts,
  *    event_id), then a vocabulary-sized aggregate;
  *  - q_scd2 — lag + lead over (user_id | ts_us, event_id), change-run
  *    compaction;
  *  - q_win_range — count/sum over a RANGE frame (user_id | us,
  *    trailing 30 min), the sliding two-pointer evaluator.
  *
  * Unlike grouped top-k these have NO bounded-state reformulation: lag/
  * lead and a range frame need the full ordered stream per key, so the
  * honest expected curve is single-task O(m log m) sort + O(m) frame
  * evaluation on the hot key — wall grows ~linearly in hot mass with no
  * parallelism past the sort, and the ladder exists to MEASURE that
  * bound and catch anything super-linear (an accidental quadratic frame
  * re-scan, a spill collapse) before a deployment does. The per-head
  * verdicts and any written bounds live in BASELINE.md (r13).
  *
  * Corpus: copy c > 0 of events folds EVERY row into ONE hot user
  * (user_id = [[HotUser]]) — hot-partition mass (f−1)·|events| while
  * copy 0 keeps the normal 1,500-user profile. event_id is remapped to
  * orig·64 + c BEFORE the user swap (the TopkSkewAb r12 lesson:
  * withColumn resolves against the current frame), unique across copies
  * for any base id < 2⁵⁷ and any f ≤ 64, so every window's
  * (ts, event_id) order stays total and all three heads remain
  * deterministic despite cross-copy ts ties.
  *
  * Protocol: per factor, `reps` interleaved passes over the three heads
  * (pass-major, the jitter doctrine), median + min per cell, factors
  * smallest-first so a degraded window inflates the larger cells —
  * conservative for a super-linear read. The timed action is a
  * noop-sink WRITE, not count(): this very tool's first run exposed the
  * count-action artifact (q_win_range flat at 0.15 s across ×1→×32
  * because Catalyst prunes a Window whose columns count() never reads —
  * ZERO Window nodes in the optimized count plan), which r13 fixed
  * bench-wide as protocol v2 (graft.Bench scaladoc).
  *
  * Usage: runMain graft.tools.WindowSkewAb [sfDir] [workDir] [factors] [reps]
  */
object WindowSkewAb {

  val HotUser = 4242424242L

  /** Arms beyond the declared heads: q_win_range's lanes run via the
    * conf dial pinned EXPLICITLY (since r14 the declared entry defaults
    * to `auto`, so `q_win_range` here pins `plain` to keep the r13
    * ladder comparable; `q_win_range_auto` measures the dispatch —
    * decision pass + whichever lane it picks — on each hot cell).
    *
    * r14 heads (r13 verdict item 5): q_asof and q_attribution are the
    * remaining per-user running-last window shapes (union + running
    * ignore-nulls `last` over the user partition) — the same
    * single-task-sort hazard class the r13 ladder graded for
    * transition_matrix/scd2; expected curve is LINEAR in hot mass
    * (ROWS frame, one running value, no re-aggregation — the RANGE
    * re-aggregation that bent q_win_range does not apply), and the
    * ladder exists to verify that and catch anything super-linear.
    * q_asof additionally reads orders (the as-of dim side), which
    * [[buildHotShards]] passes through unmodified. */
  val Heads = Seq("q_transition_matrix", "q_scd2", "q_win_range",
    "q_win_range_bucketed")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-window-skew"
    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4, 8, 16, 32)
    val reps = if (args.length > 3) args(3).toInt else 3
    val heads = if (args.length > 4) args.drop(4).toSeq else Heads
    require(factors.forall(f => f >= 1 && f <= 64), "factors must be in [1, 64]")
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

    def build(q: String, dir: String): org.apache.spark.sql.DataFrame = {
      val lane = q match {
        case "q_win_range" => Some("plain") // r13-ladder-comparable arm
        case "q_win_range_bucketed" => Some("bucketed")
        case "q_win_range_auto" => Some("auto")
        case _ => None
      }
      lane match {
        case Some(strategy) =>
          spark.conf.set("spark.graft.winrange.strategy", strategy)
          try graft.SparkEntry.queries("q_win_range")(spark, dir)
          finally spark.conf.unset("spark.graft.winrange.strategy")
        case None => graft.SparkEntry.queries(q)(spark, dir)
      }
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    factors.foreach(f => buildHotShards(spark, sfDir, s"$work/x$f", f))
    spark.range(1000).selectExpr("sum(id)").collect()
    // warm codegen + parquet readers on the smallest corpus
    val d0 = s"$work/x${factors.head}"
    heads.foreach(q => run(build(q, d0)))

    val baseRows = graft.Tables.events(spark, sfDir).count()
    factors.foreach { f =>
      val dir = s"$work/x$f"
      val times = scala.collection.mutable.Map(
        heads.map(_ -> List.empty[Double]): _*)
      val rows = scala.collection.mutable.Map(heads.map(_ -> 0L): _*)
      for (_ <- 1 to reps; q <- heads) {
        val t0 = System.nanoTime()
        run(build(q, dir))
        times(q) = (System.nanoTime() - t0) / 1e9 :: times(q)
      }
      // out_rows separately (not timed): the ladder's sanity column
      heads.foreach(q => rows(q) = build(q, dir).count())
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val body = heads.map { q =>
        f""""$q":{"med":${med(times(q))}%.3f,"min":${times(q).min}%.3f,"out_rows":${rows(q)}}"""
      }.mkString(",")
      println(s"""{"factor":$f,"hot_rows":${(f - 1) * baseRows},$body}""")
    }
    spark.stop()
  }

  /** events with copies 1..f−1 folded into the single hot user; the
    * pre-swap event_id remap keeps every (ts, event_id) order total.
    * orders passes through unmodified (r14: q_asof's dim side — the hot
    * user has no orders, so its running-last carries null okey, which
    * still exercises the hot partition's sort + frame). */
  private[tools] def buildHotShards(
      spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    val ev = graft.Tables.events(spark, sfDir)
    val copies = (0 until factor).map { c =>
      val remapped = ev.withColumn("event_id",
        col("event_id") * 64L + lit(c.toLong))
      if (c == 0) remapped
      else remapped.withColumn("user_id", lit(HotUser))
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    graft.Tables.orders(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }
}
