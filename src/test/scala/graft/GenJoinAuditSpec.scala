package graft

/** Full-surface pin of the round-9 explode-blind-stats triage criterion
  * (BASELINE "gen_join_audit" section): Spark's size-only estimator does
  * not model Generate's row multiplication, so a join planned above an
  * explode can broadcast a build side that is really corpus-sized — the
  * mis-plan that OOM'd the linkage symdel lane at ×20 growth. Per-query
  * pins exist for the decided cases (RecordLinkageBlockSpec,
  * ExplodeJoinPinSpec); THIS spec guards the rest of the surface and
  * every future query: each `BroadcastExchange → … → Generate` chain in
  * each static plan must contain a node that re-bounds the size estimate
  * before the explode is reached —
  *
  *  - an aggregate (HashAggregate / ObjectHashAggregate / SortAggregate):
  *    model-, vocabulary- or stats-sized by construction;
  *  - a top-k operator (TakeOrderedAndProject / WindowGroupLimit):
  *    cardinality-bounded outright;
  *  - a cache scan (InMemoryTableScan): a materialized relation reports
  *    its REAL byte size, so the estimate above it is honest.
  *
  * Queries that join Generate-inflated sides directly must either pin
  * their shuffle (and then never produce a broadcast chain here) or be
  * listed in `boundedByDesign` with the measured rationale. AQE stays
  * off: the hazard is the static planner's choice — a broadcast build
  * with no shuffle below it executes before AQE ever sees a runtime
  * size.
  */
class GenJoinAuditSpec extends SparkSpec {

  /** Chains allowed WITHOUT a bounding node, because the explode's row
    * inflation is a small design constant rather than a corpus factor:
    * BinnedRangeJoin sizes `binWidth` near the median interval span, so
    * an interval explodes into 1–2 bins and a mis-broadcast is at worst
    * a few × the intended size (BASELINE r9: broadcast measured 3.9×
    * faster than the pinned shuffle at sf0.1 for q_overlap_join). */
  private val boundedByDesign = Set("q_overlap_join", "q_range_bin")

  private val bounding = Seq("HashAggregate", "ObjectHashAggregate",
    "SortAggregate", "TakeOrderedAndProject", "WindowGroupLimit",
    "InMemoryTableScan")

  test("every broadcast-over-Generate chain in every static plan is size-bounded") {
    val d = sfDir("sf0.001")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if boundedByDesign(name) => Nil
        case (name, fn) =>
          tools.GenJoinAudit
            .chains(fn(spark, d).queryExecution.executedPlan)
            .filterNot(c => bounding.exists(c.contains))
            .map(c => s"$name: $c")
      }
      assert(offenders.isEmpty,
        "unbounded broadcast build over a Generate (the symdel OOM " +
          "shape) — pin the join's shuffle or classify it per the " +
          s"BASELINE gen_join_audit criterion:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
