package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Clamp-octave probe for the grid-generating operators (r7 verdict
  * "next" item 3).
  *
  * q_resample and q_date_spine densify a time axis with `sequence()`.
  * Round 7 proved correctness of their conf clamps
  * (`spark.graft.resample.maxSpanHours` / `datespine.maxSpanDays`): one
  * 1900-era poison timestamp no longer stretches the grid to a century.
  * This probe measures the SCALING claim behind the clamp — that with
  * the poison present, grid cost is bounded by the CONF, not the data:
  *
  *  1. Volume octaves (×1/×4/×8/×16 copies of the POISONED corpus, the
  *     1900 row present in every copy): grid-row count must stay EXACTLY
  *     constant (clamped span × series count) while wall time grows only
  *     with the linear pre-aggregation of observations. An unclamped
  *     implementation would hold a century-sized grid at every octave.
  *  2. Dial sweep (fixed ×1 data, clamp dial ×¼ / ×1 / ×4): output rows
  *     must track the dial ~linearly — direct evidence the conf is the
  *     binding bound (the poison span, ~1.09M hours, exceeds every dial).
  *
  * Shard growth shifts only the copy keys (event_id / l_orderkey);
  * timestamps are untouched so the poison span is identical at every
  * factor. One JSON line per measurement; recorded in BASELINE.md.
  *
  * Usage: runMain graft.tools.ClampOctave <dirtyDir> [workDir] [factors]
  * where <dirtyDir> is a tools/dirty.py output (carries the 1900 rows).
  */
object ClampOctave {

  def main(args: Array[String]): Unit = {
    val dirtyDir = args.headOption.getOrElse("/tmp/graft-dirty")
    val work = if (args.length > 1) args(1) else "/tmp/graft-clamp"
    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 4, 8, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    factors.foreach(f => buildShards(spark, dirtyDir, s"$work/x$f", f))
    // session/codegen warm-up so factor-1 cold isn't charged JVM init
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q_resample")(spark, s"$work/x${factors.head}").count()

    val queries = Seq("q_resample", "q_date_spine")
    for (f <- factors; q <- queries) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, s"$work/x$f").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"clamp_octave":"volume","factor":$f,"query":"$q","sec":$dt%.2f,"rows":$rows}""")
    }

    // Dial sweep on the ×1 corpus: the poison span exceeds every dial, so
    // output rows must be dial-bounded. Restore defaults afterwards.
    val dials = Seq(
      ("q_resample", "spark.graft.resample.maxSpanHours",
        Seq("2190", "8760", "35040")),
      ("q_date_spine", "spark.graft.datespine.maxSpanDays",
        Seq("1825", "7300", "29200")))
    for ((q, key, vals) <- dials; v <- vals) {
      spark.conf.set(key, v)
      try {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, s"$work/x${factors.head}").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"clamp_octave":"dial","query":"$q","dial":$v,"sec":$dt%.2f,"rows":$rows}""")
      } finally spark.conf.unset(key)
    }
    spark.stop()
  }

  /** workDir = `factor` key-shifted copies of the poisoned events +
    * lineitem tables; timestamps (and so the 1900 poison span) untouched. */
  private def buildShards(
      spark: SparkSession, dirtyDir: String, outDir: String, factor: Int): Unit = {
    val ev = graft.Tables.events(spark, dirtyDir)
    (0 until factor).map { c =>
      if (c == 0) ev
      else ev.withColumn("event_id", col("event_id") + lit(c * 1000000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val li = graft.Tables.lineitem(spark, dirtyDir)
    (0 until factor).map { c =>
      if (c == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(c * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }
}
