package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Octave-scale measurement for the standing NON-DEDUP bench heads (r11
  * verdict item 1): the dedup family has measured ×1/×2/×4/×8 volume and
  * skew curves (ScalingProbe); the other five queries that sit ≥ 1.7 s in
  * the driver bench — q_overlap_join, q_supplier, q_topk_group (+ its
  * native twin), q_recursive, q_partition_overwrite — had only fixture-SF
  * evidence. This probe closes the gap: per-head ×1/×2/×4/×8 shard
  * corpora, cold + median-of-reps warm wall times, and output rows, one
  * JSON line per cell; the table and the per-head verdicts are recorded
  * in BASELINE.md.
  *
  * GROWTH MODEL — one table per head, grown the way that head's input
  * grows in production, with the expected curve stated up front so a
  * super-linear cell is detectable as such:
  *
  *  - events (q_overlap_join, q_partition_overwrite): copy c keeps the
  *    SAME users but shifts `ts` by c·(span+1 day) — a service
  *    accumulating history. Sessions multiply ×f while cross-copy
  *    sessions can never overlap (time-disjoint), so q_overlap_join's
  *    candidate bins grow ×f at constant per-bin mass — expected ~×f.
  *    The alternative growth axis (more users, same window) makes the
  *    OUTPUT itself quadratic (every concurrent user pair is a result
  *    row — the q_sim_pairs argument), so it measures output mass, not
  *    plan quality; this probe deliberately scales the axis where the
  *    right plan IS linear. q_partition_overwrite gets ×f date
  *    partitions at constant per-partition mass: initial lake write ~×f,
  *    single-day rewrite + compaction ~constant.
  *  - lineitem (q_topk_group, q_topk_group_native, q_supplier): copy c
  *    shifts l_orderkey by c·10⁹ — more orders, same catalog. Window
  *    groups multiply ×f at constant group size (expected ~×f for both
  *    top-k forms, native ≤ window); q_supplier's (l_partkey, l_suppkey)
  *    aggregate keeps a CONSTANT group count over an ×f scan, so its
  *    shuffle is flat and growth should be scan-bound ~×f with the join
  *    tail constant.
  *  - customer (q_recursive): every copy (including c = 0) maps
  *    c_custkey → key·16 + c — ×f rows with a magnitude profile that is
  *    IDENTICAL across factors (+4 bits vs the fixture), because the
  *    halving walk's depth is log₂(key): shifting only the new copies
  *    would mix depth profiles and the curve would measure key magnitude,
  *    not volume. Expected ~×f rows per iteration at constant (+4)
  *    iteration count.
  *
  * Non-scaled dims (supplier/part/nation/region) copy through unchanged —
  * "more transactions, same catalog" — so q_supplier's join tail stays
  * honest to its at-scale shape (SF-scaled sides shuffle, bounded dims
  * broadcast).
  *
  * Protocol: per (factor, query) — unpersist shared assets, one COLD run
  * (includes that corpus's cached-asset build), then `reps` warm runs
  * with per-query median and min (the jitter doctrine's unit of truth;
  * a single warm shot was how r5 mis-read a host window as a
  * regression). Factors run smallest-first so a degraded host window
  * inflates the LATER, larger cells — making a super-linear artifact
  * conservative (it over-reports growth, never hides it).
  *
  * Usage: runMain graft.tools.HeadsOctave [sfDir] [workDir] [factors] [reps]
  *   factors default "1,2,4,8"; `build` as 4th arg writes shards and exits.
  */
object HeadsOctave {

  /** head query -> the shard tables it actually reads (for the build). */
  private val Heads = Seq(
    "q_overlap_join", "q_partition_overwrite",
    "q_topk_group", "q_topk_group_native", "q_supplier",
    "q_recursive")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-heads"
    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4, 8)
    val buildOnly = args.length > 3 && args(3) == "build"
    val reps =
      if (args.length > 3 && args(3) != "build") args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Scale finding from this probe's first run (recorded in BASELINE
      // r12): q_recursive's total row production across iterations is
      // n_customers × avg walk depth, and Spark guards recursive CTEs
      // with a ROW-COUNT limit (default 1e6) — the ×4 octave (60k
      // customers × ~18 levels) trips RECURSION_ROW_LIMIT_EXCEEDED. The
      // guardrail is a foot-gun fence, not a memory bound (each
      // iteration is one bounded frontier); a deployment scales it with
      // corpus size exactly like this.
      .config("spark.sql.cteRecursionRowLimit", "2000000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    factors.foreach(f => buildShards(spark, sfDir, s"$work/x$f", f))
    if (buildOnly) { spark.stop(); return }

    // session/codegen/parquet warm-up, never charged to a cell
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q_topk")(spark, s"$work/x${factors.head}").count()

    factors.foreach { f =>
      val dir = s"$work/x$f"
      Heads.foreach { q =>
        graft.operators.TrainingData.unpersistAll()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        val cold = (System.nanoTime() - t0) / 1e9
        val warms = (1 to reps).map { _ =>
          val t1 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          (System.nanoTime() - t1) / 1e9
        }.sorted
        val med = warms(warms.length / 2)
        println(f"""{"factor":$f,"query":"$q","cold_sec":$cold%.3f,"warm_med":$med%.3f,"warm_min":${warms.head}%.3f,"rows":$rows}""")
      }
    }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }

  /** Writes the ×`factor` shard corpus for every head (see class note). */
  private[tools] def buildShards(
      spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    // events: same users, history extended by whole span-sized epochs
    val ev = graft.Tables.events(spark, sfDir)
    val Array(spanDays) = ev
      .agg((datediff(max(col("ts")), min(col("ts"))) + 2).cast("int"))
      .collect().map(_.getInt(0))
    val evCopies = (0 until factor).map { c =>
      if (c == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(c * 10000000000L))
        .withColumn("ts",
          col("ts") + expr(s"make_dt_interval(${c.toLong * spanDays}, 0, 0, 0)"))
    }
    evCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // lineitem: more orders, same part/supplier catalog
    val li = graft.Tables.lineitem(spark, sfDir)
    val liCopies = (0 until factor).map { c =>
      if (c == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(c * 1000000000L))
    }
    liCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // customer: uniform key-magnitude profile across factors (+4 bits)
    val cust = graft.Tables.customer(spark, sfDir)
    val custCopies = (0 until factor).map { c =>
      cust.withColumn("c_custkey", col("c_custkey") * 16L + lit(c.toLong))
    }
    custCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    // constant catalog/dimension tables, copied through unchanged
    Seq("supplier", "part", "nation", "region", "orders").foreach { t =>
      graft.Tables.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }
}
