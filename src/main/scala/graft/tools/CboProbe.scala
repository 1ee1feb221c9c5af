package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-statistics / CBO probe (VERDICT r6 "what's missing" item 4):
  * measures what `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` buys
  * at PLAN TIME over Spark's default size-only estimation. Not part of
  * the declared contract — the operators hint broadcasts explicitly and
  * AQE re-plans at runtime — but a 100 TB user running ad-hoc SQL against
  * a catalog gets these decisions from stats, and this records where that
  * path engages on this engine.
  *
  * Two measured claims, each with plan evidence:
  *
  * 1. **Filter-selectivity broadcast.** Without CBO, `Filter` preserves
  *    its child's sizeInBytes (SizeOnly visitor), so a selective dim scan
  *    "looks" as big as its file and a lowered broadcast threshold plans
  *    a SortMergeJoin. With cbo.enabled + column stats, FilterEstimation
  *    shrinks the estimate (rowCount from equi-height histogram-less
  *    min/max/ndv) below the threshold → plan-time BroadcastHashJoin.
  *    AQE can rescue this at RUNTIME from actual shuffle sizes, but only
  *    after the map side is already shuffle-written; CBO avoids the
  *    exchange at plan time. Both arms run AQE-off to isolate plan-time
  *    behavior; the AQE interplay is noted in BASELINE.md.
  *
  * 2. **Join reorder.** A 4-table star query written fact-first
  *    (lineitem ⋈ orders ⋈ customer(filtered) ⋈ nation) should, under
  *    cbo.joinReorder, move the selective dimension inward. Evidence:
  *    the optimized-plan join tree differs from the no-stats arm, and
  *    wall time over 3 interleaved reps.
  *
  * Tables are registered as managed catalog tables (in-memory catalog,
  * local warehouse under workDir) because path-based parquet relations
  * have no catalog slot to hold stats.
  *
  * Usage: runMain graft.tools.CboProbe [sfDir] [workDir]
  */
object CboProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-cbo"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // The in-memory catalog dies with the session but its warehouse files
    // don't; a stale location fails the next saveAsTable.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(work))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Register the fixture tables as managed tables once per run.
    Seq("lineitem", "orders", "customer", "nation").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").saveAsTable(t)
    }

    def filteredDimJoin: DataFrame = spark.sql(
      """SELECT o.o_orderpriority, count(*) AS n, sum(o.o_totalprice) AS rev
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9900
        |GROUP BY o.o_orderpriority""".stripMargin)

    def starQuery: DataFrame = spark.sql(
      """SELECT n.n_name, count(*) AS orders, sum(l.l_extendedprice) AS rev
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
        |GROUP BY n.n_name""".stripMargin)

    def dimStats(): String = {
      val rel = spark.table("customer")
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9900)
      val st = rel.queryExecution.optimizedPlan.stats
      s""""est_bytes":${st.sizeInBytes},"est_rows":${st.rowCount.map(_.toString).getOrElse("null")}"""
    }

    def joinKinds(df: DataFrame): String =
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
        .findAllIn(df.queryExecution.executedPlan.toString).toSeq
        .groupBy(identity).map { case (k, v) => s""""$k":${v.size}""" }
        .toSeq.sorted.mkString("{", ",", "}")

    // Join order read off the optimized logical plan: leaf relation names
    // in tree order — differs iff joinReorder moved something.
    def joinOrder(df: DataFrame): String =
      "spark_catalog\\.default\\.(\\w+)".r
        .findAllMatchIn(df.queryExecution.optimizedPlan.toString)
        .map(_.group(1)).mkString("[", ",", "]")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Raw customer parquet (~236 KB at sf0.1) is bigger than this
    // threshold; the BUILDING + acctbal>9900 slice (~0.2% of rows) is far
    // under it. Only stats can see that at plan time.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 128 * 1024)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def arm(label: String): Unit = {
      println(s"""{"arm":"$label",${dimStats()},"dim_join":${joinKinds(filteredDimJoin)},"star_join":${joinKinds(starQuery)},"star_order":"${joinOrder(starQuery)}"}""")
      (1 to 3).foreach { rep =>
        val t1 = time(filteredDimJoin.count()); val t2 = time(starQuery.count())
        println(f"""{"arm":"$label","rep":$rep,"dim_sec":$t1%.2f,"star_sec":$t2%.2f}""")
      }
    }

    arm("no_stats")
    Seq("lineitem", "orders", "customer", "nation").foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
    }
    spark.sql("ANALYZE TABLE customer COMPUTE STATISTICS FOR COLUMNS c_mktsegment, c_acctbal, c_custkey, c_nationkey")
    spark.sql("ANALYZE TABLE orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
    spark.sql("ANALYZE TABLE lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.sql("ANALYZE TABLE nation COMPUTE STATISTICS FOR COLUMNS n_nationkey")
    arm("stats_cbo")

    // AQE interplay, stats-off: does runtime re-planning rescue the
    // no-stats SMJ into a broadcast AFTER the shuffle write?
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    Seq("lineitem", "orders", "customer", "nation")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq("lineitem", "orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").saveAsTable(t)
    }
    val df = filteredDimJoin
    df.count()
    val aqePlan = df.queryExecution.executedPlan.toString
    println(s"""{"arm":"aqe_no_stats","aqe_broadcast_rescue":${aqePlan.contains("BroadcastHashJoin")}}""")
    spark.stop()
  }
}
