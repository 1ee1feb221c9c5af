package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Cols
import graft.Tables.events

/** Interleaved A/B for q_cube's round-8 ordering rewrite (r8 verdict
  * "what's wrong" 2): the driver's r8 bench put q_cube at 2.35 s vs r7's
  * < 1.02 s, co-located with the rewrite that sorts on (grouping flags,
  * raw keys) before rendering sentinels instead of sorting on the
  * rendered strings after. The whole r8 run sat in a slow host window
  * (warmup 69.9 s vs 48.8 s on unchanged code), so the doctrine demands a
  * same-JVM interleaved alternation before calling it noise or real.
  *
  * Arms (identical aggregation, identical output rows; ONLY the sort key
  * differs):
  *  - `new`: the shipped [[graft.operators.Relational.qCube]] — sort on
  *    (ge, gk, raw event_type, raw k_bucket), then render. Collision-free
  *    by construction.
  *  - `old`: render first, then sort on the rendered (etype, kb) strings
  *    — the pre-r8 shape (reconstructed with the CURRENT -5/-6 sentinels
  *    so the arms differ in ordering strategy only, not in the separate
  *    sentinel-collision fix).
  *
  * Also prints a plan audit per arm: #Exchange and #Sort nodes in the
  * executed plan — the rewrite's claim is that either key choice costs
  * exactly one range-partitioned global sort.
  *
  * Usage: runMain graft.tools.CubeAb [reps] [sfDir]
  */
object CubeAb {

  /** The pre-r8 ordering shape: render, then sort the rendering. */
  def qCubeOld(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .withColumn("k_bucket", col("k") % 5)
      .cube(col("event_type"), col("k_bucket"))
      .agg(grouping(col("event_type")).as("ge"), grouping(col("k_bucket")).as("gk"),
        count(lit(1)).as("n"), Cols.r2(sum(col("value"))).as("sum_value"))
      .select(
        when(col("ge") === 1, lit("ALL"))
          .otherwise(coalesce(col("event_type"), lit("(null)"))).as("etype"),
        when(col("gk") === 1, lit(-5L))
          .otherwise(coalesce(col("k_bucket"), lit(-6L))).as("kb"),
        col("n"), col("sum_value"))
      .orderBy(col("etype"), col("kb"))

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
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

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "new" -> (() => graft.operators.Relational.qCube(spark, sfDir)),
      "old" -> (() => qCubeOld(spark, sfDir)))

    // plan audit: the ordering choice must not change the exchange/sort
    // count — one cube expand + its aggregate exchange + one global sort
    def planCounts(df: DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      (p.linesIterator.count(_.contains("Exchange")),
        p.linesIterator.count(l =>
          l.contains("Sort ") || l.contains("Sort[")))
    }
    arms.foreach { case (name, mk) =>
      val (nEx, nSort) = planCounts(mk())
      println(s"""{"metric":"cube_ab_plan","arm":"$name","exchanges":$nEx,"sorts":$nSort}""")
    }

    // warm both arms once (session/codegen init is not the question)
    arms.foreach { case (_, mk) => mk().count() }

    val times = scala.collection.mutable.Map(
      arms.map { case (n, _) => n -> List.empty[Double] }: _*)
    for (_ <- 1 to reps; (name, mk) <- arms) {
      val t0 = System.nanoTime()
      mk().count()
      times(name) = (System.nanoTime() - t0) / 1e9 :: times(name)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val armJson = arms.map { case (n, _) =>
      f""""$n":{"median_sec":${med(times(n))}%.3f,"min_sec":${times(n).min}%.3f}"""
    }.mkString(",")
    // equal-output sanity: both arms must return the identical row multiset
    val sameRows = {
      val a = graft.operators.Relational.qCube(spark, sfDir)
      val b = qCubeOld(spark, sfDir)
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    }
    println(s"""{"metric":"cube_ab","sf":"$sfDir","reps":$reps,"same_rows":$sameRows,"arms":{$armJson}}""")
    spark.stop()
  }
}
