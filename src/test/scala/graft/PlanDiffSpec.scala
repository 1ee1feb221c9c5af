package graft

/** CI promotion of the plan-complexity baseline diff (r10 verdict item
  * 6): every declared query's static-plan counts (hash/single-partition
  * exchanges, broadcasts, sorts, windows, scans, checkpoint reads —
  * tools.PlanSnapshot's columns, sf0.001, AQE off) must equal the
  * committed `PLANS_BASELINE.jsonl`. An unintended shuffle or broadcast
  * creeping into a rewrite now fails CI as a one-line diff instead of
  * surfacing as a bench mystery three rounds later.
  *
  * UPDATE PROTOCOL for an INTENDED plan change: regenerate the baseline
  * with `sbt "runMain graft.tools.PlanSnapshot /root/testdata/sf0.001
  * BASELINE"` (writes PLANS_BASELINE.jsonl in the cwd), eyeball the git
  * diff — every changed line must be a query you meant to change — and
  * commit it together with the rewrite and a BASELINE.md note.
  */
class PlanDiffSpec extends SparkSpec {

  private val fields = Seq("hashEx", "singleEx", "bcast", "sorts",
    "windows", "scans", "rddScans")

  private def parseBaseline(): Map[String, Map[String, Int]] = {
    val path = java.nio.file.Paths.get("PLANS_BASELINE.jsonl")
    assert(java.nio.file.Files.exists(path),
      "PLANS_BASELINE.jsonl missing — run the update protocol in this spec's scaladoc")
    val qRe = """"q":"([^"]+)"""".r
    val fRe = fields.map(f => f -> (""""""" + f + """":(-?\d+)""").r).toMap
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(path)).asScala
      .filter(_.nonEmpty).map { line =>
        val q = qRe.findFirstMatchIn(line).map(_.group(1))
          .getOrElse(fail(s"unparseable baseline line: $line"))
        q -> fields.flatMap(f => fRe(f).findFirstMatchIn(line)
          .map(m => f -> m.group(1).toInt)).toMap
      }.toMap
  }

  test("static plan complexity matches the committed baseline, query by query") {
    val d = sfDir("sf0.001")
    val baseline = parseBaseline()
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // COLD-CACHE CONVENTION: a MATERIALIZED InMemoryRelation reports its
    // ACTUAL byte size, so suites that executed queries before this one
    // leave the planner seeing accurate (smaller) sizes and legitimately
    // different join picks (q_basket_pairs gains a broadcast, the
    // ngram/near stats-gated lanes flip) — that is runtime adaptivity,
    // not plan drift. The baseline is generated in a fresh session where
    // caches are registered but never materialized; restore that state:
    // drop the shared-registry assets (unpersist + registry clear, so
    // cached() re-registers cold during each query's construction), then
    // clear any stray persisted frames other suites left behind.
    graft.operators.TrainingData.unpersistAll()
    spark.catalog.clearCache()
    try {
      val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val c = tools.PlanSnapshot.counts(
            fn(spark, d).queryExecution.executedPlan)
          val live = Map("hashEx" -> c.hashEx, "singleEx" -> c.singleEx,
            "bcast" -> c.bcast, "sorts" -> c.sorts, "windows" -> c.windows,
            "scans" -> c.scans, "rddScans" -> c.rddScans)
          baseline.get(name) match {
            case None => Seq(s"$name: missing from PLANS_BASELINE.jsonl")
            case Some(base) =>
              fields.collect {
                case f if base.getOrElse(f, -1) != live(f) =>
                  s"$name.$f: baseline ${base.getOrElse(f, -1)} != live ${live(f)}"
              }
          }
      }
      val stale = baseline.keySet -- SparkEntry.queries.keySet
      assert(stale.isEmpty, s"baseline rows for retired queries: $stale")
      assert(diffs.isEmpty,
        "static plan complexity drifted from PLANS_BASELINE.jsonl — if " +
          "intended, follow the update protocol in PlanDiffSpec's " +
          "scaladoc; if not, find the rewrite that added the node:\n" +
          diffs.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
