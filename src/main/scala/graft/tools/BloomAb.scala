package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for [[graft.plans.AutoBloomJoinRule]] (r5 verdict
  * item 5): a selective-dim ⋈ fact join on a grown corpus, timed with the
  * rule off vs on in one JVM. The corpus is sized so Spark's OWN
  * runtime-filter rewrite skips the shape (its application-side heuristic
  * wants a multi-GB scan) and broadcast is disabled in both arms (the
  * 100 TB regime where the join shuffles both sides) — exactly the gap
  * the rule exists to cover: the Bloom probe drops non-matching fact
  * rows BEFORE the exchange.
  *
  * Prints per-rep times, a result-identity check, and plan evidence that
  * (a) the rule injected its probe in the ON arm and (b) Spark's own
  * runtime filter did NOT rewrite the OFF arm.
  *
  * Usage: runMain graft.tools.BloomAb [sfDir] [workDir] [factor] [reps]
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-bloom-ab"
    val factor = if (args.length > 2) args(2).toInt else 4
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$work/x$factor"
    val base = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    (0 until factor).map { c =>
      if (c == 0) base
      else base.withColumn("o_orderkey", col("o_orderkey") + lit(c * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def dim = graft.Tables.customer(spark, sfDir)
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000)
        .select(col("c_custkey"), col("c_name"))
      def fact = spark.read.parquet(s"$dir/orders.parquet")
      def joined = fact
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("rev"))

      def withRule[T](on: Boolean)(body: => T): T = {
        spark.conf.set(graft.plans.AutoBloomJoinRule.EnabledKey, on.toString)
        try body
        finally spark.conf.unset(graft.plans.AutoBloomJoinRule.EnabledKey)
      }

      // plan evidence
      val onPlan = withRule(on = true)(joined.queryExecution.optimizedPlan.toString)
      val offPlan = withRule(on = false)(joined.queryExecution.optimizedPlan.toString)
      println(s"""{"bloom_ab":"plan","factor":$factor,"rule_injected":${onPlan.contains("graft_auto_bloom")},"spark_runtime_filter_in_off_arm":${offPlan.toLowerCase.contains("bloomfilter")}}""")

      // identity — materialize each arm under its own conf (the conf is
      // read at optimization time, so a lazy cross-arm exceptAll would
      // compare two same-conf plans)
      val onRows = withRule(on = true)(joined.collect())
        .map(_.toString).sorted.toSeq
      val offRows = withRule(on = false)(joined.collect())
        .map(_.toString).sorted.toSeq
      println(s"""{"bloom_ab":"identity","factor":$factor,"rows_on":${onRows.size},"rows_off":${offRows.size},"identical":${onRows == offRows}}""")

      // warm both shapes (parquet footers, codegen), charged to neither arm
      withRule(on = true)(joined.count()); withRule(on = false)(joined.count())
      (1 to reps).foreach { rep =>
        Seq(false, true).foreach { on =>
          val t0 = System.nanoTime()
          val rows = withRule(on)(joined.count())
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"""{"bloom_ab_rep":$rep,"factor":$factor,"rule_on":$on,"sec":$dt%.2f,"rows":$rows}""")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.stop()
  }
}
