package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B for the native grouped top-k operator vs the window
  * `row_number()` formulation (r5 verdict item 4): grows the sf0.1
  * lineitem corpus ×factor (copies shift l_orderkey so the key count
  * grows with volume — the 100 TB shape where the window's full
  * per-group sort is the bound), then times the two formulations
  * interleaved in one JVM, same reps discipline as NgramAb — on this
  * host only interleaved same-JVM numbers are trustworthy.
  *
  * The two arms produce the same logical result (PropertySpec pins
  * identity under nulls/floats/spill); identity is re-asserted here on
  * the grown corpus once per factor. What the A/B quantifies is the
  * SHUFFLE bound: the window arm shuffles every input row and sorts
  * whole groups; the native arm's partial heaps ship ≤ k rows per
  * (key, partition) into the exchange.
  *
  * Usage: runMain graft.tools.TopkAb [sfDir] [workDir] [factors] [reps]
  */
object TopkAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-topk-ab"
    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(4, 8)
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    factors.foreach { f =>
      val dir = s"$work/x$f"
      val base = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      (0 until f).map { c =>
        if (c == 0) base
        else base
          .withColumn("l_orderkey", col("l_orderkey") + lit(c * 100000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(c * 100000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

      // Two key regimes: l_orderkey (~4 rows/key — top-2 keeps half the
      // corpus, the near-worst case for the heap reduction) and l_partkey
      // (~30 rows/key — the regime grouped top-k exists for: the native
      // exchange carries ~k/30 of the window arm's rows).
      def input = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val regimes = Seq(
        ("orderkey", Seq("l_orderkey"),
          Seq("rev" -> false, "l_linenumber" -> true),
          Seq(col("rev").desc, col("l_linenumber").asc)),
        ("partkey", Seq("l_partkey"),
          Seq("rev" -> false, "l_orderkey" -> true, "l_linenumber" -> true),
          Seq(col("rev").desc, col("l_orderkey").asc, col("l_linenumber").asc)))
      regimes.foreach { case (regime, keys, natOrd, winOrd) =>
        def native = graft.plans.TopKPerKey.of(spark, input, keys, natOrd, 2)
        def window = {
          val w = Window.partitionBy(keys.map(col): _*).orderBy(winOrd: _*)
          input.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
            .drop("rn")
        }
        // identity on the grown corpus (count of the symmetric difference)
        val diff = native.exceptAll(window).count() + window.exceptAll(native).count()
        val n = input.count()
        println(s"""{"topk_ab":"identity","factor":$f,"regime":"$regime","rows_in":$n,"sym_diff":$diff}""")
        // JVM/codegen warm-up, charged to neither arm
        native.count(); window.count()
        (1 to reps).foreach { rep =>
          Seq("window" -> (() => window), "native" -> (() => native)).foreach {
            case (arm, mk) =>
              val t0 = System.nanoTime()
              val rows = mk().count()
              val dt = (System.nanoTime() - t0) / 1e9
              println(f"""{"topk_ab_rep":$rep,"factor":$f,"regime":"$regime","arm":"$arm","sec":$dt%.2f,"rows":$rows}""")
          }
        }
      }
    }
    spark.stop()
  }
}
