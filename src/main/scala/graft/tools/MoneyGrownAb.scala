package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Grown-scale demonstration that the r2-cent-boundary class cannot fire
  * on the DECIMAL money lane (r14 verdict item 4 done-criterion).
  *
  * The class (BASELINE r14): at ×16 grown volume, q_join_broadcast's
  * fp64 `brand_revenue` sums accumulate enough order-dependent spread
  * (~hundreds of ULPs ≈ millicents at 2×10¹⁰ sums) that a cell straddles
  * a half-cent boundary across engines/partitionings. This tool runs
  * q_join_broadcast on a corpus dir under BOTH lanes × several shuffle
  * partitionings (different partial-aggregation merge orders — the same
  * degree of freedom that separates engines) and reports, per lane, how
  * many cells move across partitionings. Expected on a grown corpus:
  * fp64 MAY move (the class firing is boundary luck); decimal MUST be 0
  * everywhere, every time — its per-cell sum is exact and therefore
  * partitioning-independent by construction.
  *
  * Usage: runMain graft.tools.MoneyGrownAb <corpusDir>
  * Prints one JSON line: {"metric":"moneygrownab", ...}.
  */
object MoneyGrownAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-grown-x16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val parts = Seq(7, 16, 32)
    def cells(lane: Boolean, n: Int): Map[String, Double] = {
      spark.conf.set("spark.graft.money.decimal", lane.toString)
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try SparkEntry.queries("q_join_broadcast")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      finally {
        spark.conf.unset("spark.graft.money.decimal")
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
      }
    }
    def sweep(lane: Boolean): (Int, Seq[String]) = {
      val runs = parts.map(cells(lane, _))
      val keys = runs.head.keySet
      val movers = keys.toSeq.sorted.filter(k => runs.map(_(k)).distinct.size > 1)
      (movers.size, movers.map(k =>
        s"$k:" + runs.map(_(k)).mkString("/")))
    }
    val (fpMovers, fpDetail) = sweep(lane = false)
    val (decMovers, decDetail) = sweep(lane = true)
    val ok = decMovers == 0
    println(s"""{"metric":"moneygrownab","dir":"$dir","partitionings":[${parts.mkString(",")}],"fp64_movers":$fpMovers,"decimal_movers":$decMovers,"ok":$ok,"fp64_detail":${fpDetail.map("\"" + _ + "\"").mkString("[", ",", "]")},"decimal_detail":${decDetail.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
