package graft

/** Full-surface pin of the round-10 re-scan triage criterion (BASELINE
  * "scan_audit" section): Catalyst does not share deduplicated subplans,
  * so a query that derives two results from the same source pays one
  * FULL SOURCE SCAN per derivation — invisible at sf0.1, a whole extra
  * pass over the corpus at 100 TB. Round 10 removed the fixable cases
  * (q_hll_merge's third events pass; q_bm25's four document passes;
  * q_retention / q_active_users / q_resample / q_cdc_apply /
  * q_incremental_agg) by riding extra stats on an existing stream or
  * checkpointing a bounded intermediate; THIS spec guards the rest of
  * the surface and every future query: no static plan may scan the same
  * source table 3+ times per run.
  *
  * Ledger rules (tools.ScanAudit.tally): scans inside a `cached()`
  * asset's subtree count once per distinct cache (corpus-snapshot
  * assets materialize once and amortize across the suite — charging
  * them per consumer would overstate the IO); `trackedCheckpoint()`
  * reads appear as "<rdd>" markers and are reads of materialized state,
  * not corpus passes. AQE stays off, matching GenJoinAuditSpec: the
  * count of source scans is the static plan's property.
  */
class ScanAuditSpec extends SparkSpec {

  /** Per-run re-scans allowed at 3+, because the table is a BOUNDED
    * DIMENSION, not a corpus: q_pagerank re-reads the 25-row nation
    * table for the rank-vector init, the teleport total, and the final
    * name join — each a footer-plus-one-page read of the node dimension,
    * never a data pass (the corpus-sized fact tables feed the edge build
    * exactly once, behind its trackedCheckpoint). */
  private val boundedByDesign = Set("q_pagerank")

  test("no static plan scans the same source table 3+ times per run") {
    val d = sfDir("sf0.001")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, _) if boundedByDesign(name) => Nil
        case (name, fn) =>
          val (perRun, _) =
            tools.ScanAudit.tally(fn(spark, d).queryExecution.executedPlan)
          perRun.collect {
            case (table, n) if n >= 3 && !table.startsWith("<") =>
              s"$name: $table x$n"
          }
      }
      assert(offenders.isEmpty,
        "a source table is scanned 3+ times in one run — fold the " +
          "extra derivation onto an existing stream (the q_hll_merge " +
          "n_partials shape), checkpoint the bounded intermediate, or " +
          "classify it per the BASELINE scan_audit criterion:\n" +
          offenders.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
