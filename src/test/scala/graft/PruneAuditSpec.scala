package graft

import org.apache.spark.sql.functions._

/** Sensitivity controls + full-surface pin for tools.PruneAudit (the
  * round-10 pushdown/pruning audit). The controls prove the walker can
  * actually SEE both failure shapes before the surface-wide assertion
  * means anything — the GenJoinAudit negative-control discipline:
  *
  *  - positive pushdown: an equality predicate on a stored column must
  *    surface as a pushed data filter and count pushable-shaped;
  *  - cast-blocked true positive: cast(column) vs literal is
  *    pushable-SHAPED but parquet translation drops casts — the silent
  *    full-read regression NOPUSH exists to catch must flag;
  *  - function-wrapped true negative: upper(column) = literal is
  *    structurally untranslatable — seen, but classified out;
  *  - column pruning: a two-column projection must read strictly fewer
  *    columns than the file holds.
  *
  * Surface pin: across all 138 static plans, every PUSHABLE-SHAPED
  * data-filter atom (bare or cast-wrapped column vs literals) reaches
  * the parquet reader as a pushed filter — the 18 declared predicates
  * that do not push are all function-wrapped (length(text), isnan(v),
  * key % k, mixBucket) and filter post-scan by nature, audited out by
  * shape, not by a name list. And every scan of the two widest fact
  * tables (lineitem, orders) prunes at least one column — the
  * full-width read the brief calls out ("a scan that reads all columns
  * for a 2-column projection is wrong") stays impossible by CI.
  */
class PruneAuditSpec extends SparkSpec {

  test("controls: the walker sees pushed filters, blocked pushdown, and pruning") {
    val d = sfDir("sf0.001")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pushable = spark.read.parquet(s"$d/orders.parquet")
        .where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
      val p = tools.PruneAudit.reports(pushable.queryExecution.executedPlan)
      assert(p.size == 1, p.toString)
      assert(p.head.pushedData >= 1 && p.head.pushableAtoms >= 1 &&
        p.head.pushedData >= p.head.pushableAtoms,
        s"equality on a stored column must push: ${p.head}")
      assert(p.head.colsRead == 3 && p.head.colsRead < p.head.colsInFile,
        s"2 projected + 1 filter column, strictly pruned: ${p.head}")

      // cast-blocked TRUE POSITIVE: pushable-shaped (cast of a bare
      // column vs a literal) but parquet translation drops casts —
      // the exact silent regression NOPUSH exists to catch
      val castBlocked = spark.read.parquet(s"$d/orders.parquet")
        .where(col("o_orderkey").cast("string") === "5")
        .select(col("o_orderkey"))
      val cb = tools.PruneAudit.reports(castBlocked.queryExecution.executedPlan)
      assert(cb.size == 1 && cb.head.pushableAtoms == 1 &&
        cb.head.pushedData == 0,
        s"a cast-wrapped compare must flag as NOPUSH: ${cb.head}")

      // function-wrapped TRUE NEGATIVE: structurally untranslatable,
      // must be classified out (not a regression)
      val blocked = spark.read.parquet(s"$d/orders.parquet")
        .where(upper(col("o_orderstatus")) === "F")
        .select(col("o_orderkey"))
      val b = tools.PruneAudit.reports(blocked.queryExecution.executedPlan)
      assert(b.size == 1, b.toString)
      assert(b.head.pushedData == 0 && b.head.parentFilterAtoms >= 1 &&
        b.head.pushableAtoms == 0,
        s"a function-wrapped predicate is untranslatable by nature — " +
          s"seen but not counted pushable: ${b.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("full surface: no filtered scan pushes zero atoms; wide fact tables always prune") {
    val d = sfDir("sf0.001")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          tools.PruneAudit.reports(fn(spark, d).queryExecution.executedPlan)
            .flatMap { r =>
              val noPush =
                if (r.pushableAtoms > r.pushedData)
                  Seq(s"$name: NOPUSH ${r.table} pushable=" +
                    s"${r.pushableAtoms} pushed=${r.pushedData}")
                else Seq.empty
              val wide =
                if (Set("lineitem.parquet", "orders.parquet")(r.table) &&
                    r.colsRead == r.colsInFile)
                  Seq(s"$name: WIDE ${r.table} ${r.colsRead}/${r.colsInFile}")
                else Seq.empty
              noPush ++ wide
            }
      }
      assert(offenders.isEmpty,
        "pushdown/pruning regression — a filter lost its row-group " +
          s"skip or a wide fact table is read full-width:\n" +
          offenders.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
