package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-octave A/B for grouped top-k (r12, completing HeadsOctave): the
  * volume octaves grow GROUP COUNT at constant group size, where window
  * and native top-k are measured equal — but the 100 TB hazard for a
  * per-group window is one GIANT group (a single order/user/session with
  * 10⁶+ rows), because `row_number().over(partitionBy(key))` sorts each
  * group inside one task. The native [[graft.plans.TopKPerKey]] exists
  * for exactly this shape: per-partition bounded heaps reduce map-side,
  * so the hot key ships ≤ k rows per input partition into the exchange
  * no matter how hot it gets.
  *
  * Corpus: copy c > 0 of lineitem folds EVERY row into ONE hot order
  * (l_orderkey = [[HotKey]]) — hot-group mass (f−1)·|lineitem| while the
  * base copy keeps the normal group profile. l_linenumber is remapped to
  * (l_orderkey·10 + l_linenumber)·16 + c, unique across copies and
  * sources, so the (rev desc, linenumber asc) order stays total and both
  * forms must return IDENTICAL rows (asserted at the top factor, both
  * exceptAll directions).
  *
  * Per factor: `reps` interleaved (window, native) timed pairs — same
  * JVM, alternating arms, the jitter-doctrine A/B discipline. Expected:
  * roughly-flat native vs super-linear window as the hot group grows;
  * the crossover and curve are recorded in BASELINE r12.
  *
  * Usage: runMain graft.tools.TopkSkewAb [sfDir] [workDir] [factors] [reps]
  */
object TopkSkewAb {

  val HotKey = 424242424242L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-topk-skew"
    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4, 8)
    val reps = if (args.length > 3) args(3).toInt else 3
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

    factors.foreach(f => buildHotShards(spark, sfDir, s"$work/x$f", f))
    spark.range(1000).selectExpr("sum(id)").collect()
    // warm both plan shapes (codegen, footers) on the smallest corpus
    val d0 = s"$work/x${factors.head}"
    graft.SparkEntry.queries("q_topk_group")(spark, d0).count()
    graft.SparkEntry.queries("q_topk_group_native")(spark, d0).count()

    factors.foreach { f =>
      val dir = s"$work/x$f"
      val arms = Seq("q_topk_group" -> "window",
        "q_topk_group_native" -> "native")
      val times = scala.collection.mutable.Map(
        arms.map(_._2 -> List.empty[Double]): _*)
      var rows = 0L
      for (_ <- 1 to reps; (q, arm) <- arms) {
        val t0 = System.nanoTime()
        rows = graft.SparkEntry.queries(q)(spark, dir).count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val body = arms.map { case (_, arm) =>
        f""""$arm":{"med":${med(times(arm))}%.3f,"min":${times(arm).min}%.3f}"""
      }.mkString(",")
      println(s"""{"factor":$f,"hot_rows":${(f - 1).toLong * baseRows(spark, sfDir)},"out_rows":$rows,$body}""")
    }
    // identity at the top factor: the total order makes the result unique
    val dTop = s"$work/x${factors.max}"
    val w = graft.SparkEntry.queries("q_topk_group")(spark, dTop)
    val n = graft.SparkEntry.queries("q_topk_group_native")(spark, dTop)
    val diff = w.exceptAll(n).count() + n.exceptAll(w).count()
    println(s"""{"topk_skew":"identity","sym_diff_rows":$diff}""")
    spark.stop()
    if (diff != 0) {
      System.err.println(
        s"TopkSkewAb FAIL: window vs native symmetric diff = $diff")
      System.exit(1)
    }
  }

  private var cachedBase = -1L
  private def baseRows(spark: SparkSession, sfDir: String): Long = {
    if (cachedBase < 0)
      cachedBase = graft.Tables.lineitem(spark, sfDir).count()
    cachedBase
  }

  /** lineitem with copies 1..f−1 folded into the single hot order; the
    * remapped l_linenumber keeps (rev desc, linenumber asc) total. */
  private[tools] def buildHotShards(
      spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    val li = graft.Tables.lineitem(spark, sfDir)
    val copies = (0 until factor).map { c =>
      // Remap l_linenumber from the ORIGINAL key BEFORE overwriting
      // l_orderkey — withColumn resolves against the current frame, so
      // computing ln after the HotKey swap would collapse hot-copy
      // linenumbers to ~7 distinct values per copy (ADVICE r12) and
      // break the total-order invariant the identity assert relies on.
      val remapped = li.withColumn("l_linenumber",
        (col("l_orderkey") * 10L + col("l_linenumber")) * 16L +
          lit(c.toLong))
      if (c == 0) remapped
      else remapped.withColumn("l_orderkey", lit(HotKey))
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }
}
