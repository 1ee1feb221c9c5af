package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-head A/B/C for the `spark.graft.sort.ckpt` dial (r13, persist arm
  * r14; see TrainingData.sortedOutput for the mechanism and SortCostProbe
  * for the discovery measurement): every head wrapped in sortedOutput is
  * timed interleaved — (off, ckpt, persist) triples, pass-major, v2 noop
  * action. `persist` is the survivability-preserving barrier (lineage
  * kept; lost blocks recompute) — if it captures most of ckpt's win, the
  * fault-tolerance argument against a barrier DEFAULT loses its teeth
  * and the default decision must be re-made on memory-footprint grounds
  * alone. Results in BASELINE r13 (two-arm) / r14 (three-arm).
  *
  * Usage: runMain graft.tools.CkptSortAb [sfDir] [reps] [q ...]
  */
object CkptSortAb {

  val WrappedHeads = Seq(
    "q_record_linkage", "q_line_dedup", "q_substring_dup", "q_dedup_ngram",
    "q_dedup_embed", "q_dedup_minhash", "q_dedup_simhash",
    "q_incremental_dedup", "q_unigram_logprob", "q_bigram_logprob",
    "q_triangles", "q_win_ntile", "q_repetition", "q_gopher_gate",
    // r15 extension: non-LLM heads whose pre-sort segment (window /
    // final agg / salted join) was re-executed by the range sampling
    // job, and whose sort keys are unique by construction
    // (q_percentile / q_stats_moments / q_rfm were measured and left
    // unwrapped: repartition-on-grouping-key merges into the aggregate's
    // own exchange, so the flavor is a static no-op there)
    // (q_overlap_join / q_dedup_events likewise: sort keys equal the
    // grouping/window key, so the barrier merges away — left unwrapped)
    "q_asof", "q_join_salted", "q_supplier", "q_win_session",
    "q_resample", "q_attribution",
    // (q_win_rank / q_win_frame / q_win_share / q_topk_group(+native) /
    // q_anomaly / q_ewma / q_cdc_apply / q_join_salted measured and left
    // unwrapped: bounded or cheap-to-re-run pre-sort segments — the
    // paired two-JVM HeadTime A/B had the barrier flat-to-losing there)
    // (q_range_bin wrapped r15 on a segment≫result argument, UNWRAPPED
    // r16: sort keys are a prefix of the grouping keys, so the barrier
    // pays a full extra result shuffle while sampling only re-runs the
    // final-merge aggregate — rotated table −28%, paired ABBA −21% at
    // sf0.1 and −23% at ×8 grown, losing every instrument)
    "q_dedup_clusters", "q_tfidf", "q_active_users")

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
    def run(q: String, mode: String): Double = {
      spark.conf.set("spark.graft.sort.ckpt", mode)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      finally {
        spark.conf.unset("spark.graft.sort.ckpt")
        // free ONLY the barrier artifacts (this head's persisted/
        // checkpointed result) so arms are storage-independent while
        // the shared cached() corpus assets stay warm for every arm
        graft.operators.TrainingData.releaseBarriers()
      }
      (System.nanoTime() - t0) / 1e9
    }
    val modes = Seq("false", "true", "persist", "shuffle")
    for (m <- modes; q <- heads) run(q, m) // warm assets + codegen
    val times = collection.mutable.Map(
      (for (m <- modes; q <- heads) yield (m, q) -> List.empty[Double]): _*)
    // Arm order ROTATES per (rep, head) — r15 found the fixed order
    // ("false" always first per quadruple) inflates the first arm on
    // cheap heads (JIT/page-cache settle lands on it); rotating puts
    // every arm in every position equally often, so with reps >= 4 the
    // per-arm medians carry no position bias. The r15 verdicts were
    // re-adjudicated with paired two-JVM HeadTime runs; this fixes the
    // tool itself (r15 verdict item 5).
    for (r <- 0 until reps; (q, qi) <- heads.zipWithIndex) {
      val off = (r + qi) % modes.size
      for (m <- modes.drop(off) ++ modes.take(off))
        times((m, q)) = run(q, m) :: times((m, q))
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    heads.foreach { q =>
      val o = med(times(("false", q)))
      val c = med(times(("true", q)))
      val p = med(times(("persist", q)))
      val sh = med(times(("shuffle", q)))
      println(f"""{"q":"$q","off_med":$o%.3f,"ckpt_med":$c%.3f,"persist_med":$p%.3f,"shuffle_med":$sh%.3f,"ckpt_win_pct":${100 * (o - c) / o}%.1f,"persist_win_pct":${100 * (o - p) / o}%.1f,"shuffle_win_pct":${100 * (o - sh) / o}%.1f}""")
    }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
