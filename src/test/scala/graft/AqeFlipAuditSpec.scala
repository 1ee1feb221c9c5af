package graft

import org.apache.spark.sql.functions._

/** CI pin of the SIXTH static-plan audit class (r15 — the root-caused
  * ×16 broadcast-OOM generalized): a join side that is an aggregate over
  * corpus-cardinality group keys with no join-strategy pin is
  * AQE-flippable into a broadcast whose deserialized size its compressed
  * shuffle stats wildly understate. Sensitivity controls prove the
  * walker fires on exactly the fixed hazard shape; the fixed operators
  * prove the merge pins register; the lineage tests prove
  * calendar-derived keys do not false-positive.
  */
class AqeFlipAuditSpec extends SparkSpec {

  private def findingsOf(df: org.apache.spark.sql.DataFrame,
      name: String = "q_test") =
    tools.AqeFlipAudit.findings(name, df.queryExecution.optimizedPlan)

  test("sensitivity: un-pinned corpus-keyed aggregate join side is flagged") {
    val d = sfDir("sf0.001")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // the exact pre-fix qSubstringDup shape: per-key frequency joined back
    val freq = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val bad = docs.join(freq, "doc_id")
    val fs = findingsOf(bad)
    assert(fs.exists(f => f.kind == "HIT" && f.detail.contains("doc_id")), fs)
  }

  test("a merge hint on either side settles the join (PINNED, no HIT)") {
    val d = sfDir("sf0.001")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val freq = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pinned = docs.join(freq.hint("merge"), "doc_id")
    val fs = findingsOf(pinned)
    assert(fs.forall(_.kind != "HIT"), fs)
    assert(fs.exists(_.kind == "PINNED"), fs)
  }

  test("calendar-derived group keys resolve through alias lineage (no flag)") {
    val d = sfDir("sf0.001")
    val ev = Tables.events(spark, d)
    val daily = ev.select(to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val weekly = ev
      .select(date_trunc("week", col("ts")).as("wk"), col("value"))
      .groupBy(col("wk")).agg(count(lit(1)).as("m"))
    val joined = daily.join(weekly, to_date(col("wk")) === col("day"))
    assert(findingsOf(joined).isEmpty, findingsOf(joined))
  }

  test("bounded-domain keys (event_type, statuses) never flag") {
    val d = sfDir("sf0.001")
    val ev = Tables.events(spark, d)
    val cuts = ev.groupBy(col("event_type")).agg(avg(col("value")).as("mu"))
    val joined = ev.join(cuts, "event_type")
    assert(findingsOf(joined).isEmpty, findingsOf(joined))
  }

  test("the fixed operators carry their pins: hygiene freq joins and count join-backs") {
    val d = sfDir("sf0.001")
    for ((name, df) <- Seq(
        "q_substring_dup" -> operators.Hygiene.qSubstringDup(spark, d),
        "q_line_dedup" -> operators.Hygiene.qLineDedup(spark, d),
        "q_contamination" -> operators.CorpusFilters.qContamination(spark, d),
        "q_basket_pairs" -> operators.Insights.qBasketPairs(spark, d),
        "q_triangles" -> operators.Insights.qTriangles(spark, d),
        "q_incremental_dedup" -> operators.TrainingData.qIncrementalDedup(spark, d))) {
      val fs = findingsOf(df, name)
      assert(fs.forall(_.kind != "HIT"), s"$name: $fs")
    }
  }
}
