package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-head A/B for the `spark.graft.sort.ckpt` dial (r13; see
  * TrainingData.sortedOutput for the mechanism and SortCostProbe for the
  * discovery measurement): every head wrapped in sortedOutput is timed
  * interleaved — (off, on) pairs, pass-major, v2 noop action — and the
  * table decides which sites KEEP the wrapper (win ≥ ~10% of the head's
  * wall) and which revert to a plain orderBy. Results in BASELINE r13.
  *
  * Usage: runMain graft.tools.CkptSortAb [sfDir] [reps] [q ...]
  */
object CkptSortAb {

  val WrappedHeads = Seq(
    "q_record_linkage", "q_line_dedup", "q_substring_dup", "q_dedup_ngram",
    "q_dedup_embed", "q_dedup_minhash", "q_dedup_simhash",
    "q_incremental_dedup", "q_unigram_logprob", "q_bigram_logprob",
    "q_triangles", "q_win_ntile", "q_repetition", "q_gopher_gate")

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val heads = if (args.length > 2) args.drop(2).toSeq else WrappedHeads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(q: String, on: Boolean): Double = {
      spark.conf.set("spark.graft.sort.ckpt", on.toString)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      finally spark.conf.unset("spark.graft.sort.ckpt")
      (System.nanoTime() - t0) / 1e9
    }
    heads.foreach(q => run(q, on = false)) // warm assets + codegen
    val off = collection.mutable.Map(heads.map(_ -> List.empty[Double]): _*)
    val on = collection.mutable.Map(heads.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to reps; q <- heads) {
      off(q) = run(q, on = false) :: off(q)
      on(q) = run(q, on = true) :: on(q)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    heads.foreach { q =>
      val o = med(off(q)); val c = med(on(q))
      println(f"""{"q":"$q","off_med":$o%.3f,"on_med":$c%.3f,"win_pct":${100 * (o - c) / o}%.1f}""")
    }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
