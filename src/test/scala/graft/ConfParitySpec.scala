package graft

/** Permanent regression gate distilled from `tools/ConfParity` (which
  * sweeps all six perturbation arms over the full 138-query surface —
  * BASELINE.md round-7): the two arms most likely to catch a NEW bug run
  * here on every `sbt test`, over the queries that exercise the custom
  * kernels and the partition-sensitive disciplines.
  *
  *  - nocodegen: wholeStage off + factoryMode=NO_CODEGEN — every custom
  *    Expression's interpreted eval() must agree with its doGenCode() in
  *    situ (KernelLawsSpec checks eval in isolation; THIS checks the
  *    codegen path against it through real plans).
  *  - tinysplit: 64 KiB scan splits — many more input partitions; the
  *    vocab zipWithIndex ids, sampling buckets and window results must
  *    not depend on the scan partitioning (at 100 TB the split count is
  *    three orders of magnitude higher than local).
  *  - noansi: spark.sql.ansi.enabled=false — the round-8 sweep caught a
  *    real coupling here (legacy size(NULL) = -1 leaking into token
  *    counts); q_token_count and q_bm25 are in the watch list precisely
  *    because they were the queries that moved.
  *
  * The comparator is proven non-vacuous by ConfParity's `negctl` arm (a
  * session-timezone flip produces 20 diffs — see BASELINE.md). */
class ConfParitySpec extends SparkSpec {

  import graft.tools.ConfParity.{arms, canon}

  private val watchQueries = Seq(
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram", "q_dedup_embed",
    "q_sim_topk", "q_ann_ivf", "q_topk_group_native", "q_bloom_join",
    "q_fingerprint", "q_sample", "q_dataset_split", "q_win_frame",
    "q_token_count", "q_bm25")

  private val armNames = Seq("nocodegen", "tinysplit", "noansi")

  private def resetDerived(): Unit = {
    graft.operators.TrainingData.unpersistAll()
    spark.catalog.clearCache()
  }

  private lazy val base: Map[String, Vector[String]] = {
    val d = sfDir("sf0.001")
    resetDerived()
    watchQueries.map(q =>
      q -> canon(SparkEntry.queries(q)(spark, d))).toMap
  }

  for (armName <- armNames) {
    test(s"$armName arm: kernel queries bit-identical to the baseline conf") {
      val d = sfDir("sf0.001")
      val arm = arms.find(_.name == armName).get
      val b = base // force baseline under default conf FIRST
      val saved = arm.confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      arm.confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        resetDerived() // rebuild shared caches UNDER the arm's conf
        for (q <- watchQueries) {
          val got = canon(SparkEntry.queries(q)(spark, d))
          assert(got == b(q),
            s"$q differs under $armName: base ${b(q).size} rows vs arm ${got.size}")
        }
      } finally {
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        resetDerived()
      }
    }
  }
}
