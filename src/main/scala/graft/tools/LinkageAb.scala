package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B/C for qRecordLinkage's candidate strategies (block | band |
  * symdel): per SF, candidate-pair count and wall (interleaved reps,
  * median) for each lane. The quadratic cell this measures: plain block
  * candidates are 88 / 8,965 / 901,746 across sf0.001/0.01/0.1 (×100 per
  * 10× data); `band` was measured useless here (constant "000" band on
  * zero-padded sequential IDs → zero reduction) and `symdel` is the
  * asymptotic lane (near-true-pair candidates for ~172× row inflation).
  *
  * Usage: runMain graft.tools.LinkageAb [reps] [sfDir ...]
  */
object LinkageAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = Seq("block", "band", "symdel")

    // candidate counts (pre-verify) from the OPERATOR'S OWN generator —
    // Hygiene.linkageCandidates is the exact code qRecordLinkage executes,
    // so the reported counts cannot drift from the operator (pre-r9 this
    // was a copy that only RecordLinkageBlockSpec kept honest)
    def candidates(d: String, arm: String): Long =
      graft.operators.Hygiene.linkageCandidates(spark, d, arm).count()

    for (d <- dirs) {
      val cand = arms.map(a => a -> candidates(d, a)).toMap
      val times = scala.collection.mutable.Map(
        arms.map(_ -> List.empty[Double]): _*)
      var rows = -1L
      for (_ <- 1 to reps; arm <- arms) {
        spark.conf.set("spark.graft.linkage.strategy", arm)
        val t0 = System.nanoTime()
        rows = graft.operators.Hygiene.qRecordLinkage(spark, d).count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      spark.conf.unset("spark.graft.linkage.strategy")
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val armJson = arms.map(a =>
        f""""$a":{"cand":${cand(a)},"sec":${med(times(a))}%.2f}""")
        .mkString(",")
      println(s"""{"metric":"linkage_ab","sf":"$d","rows":$rows,"arms":{$armJson}}""")
    }
    spark.stop()
  }
}
