package graft

import org.apache.spark.sql.functions._

/** Every declared query runs on sf0.001 and returns rows; every query with
  * an oracle has matching column names (the driver compare sorts by name).
  * Deep value checks are the DuckDB-oracle loop's job (tools/check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("oracle map only names declared queries") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir("sf0.001"))
      assert(df.count() > 0)
    }
  }

  test("approx_count_distinct within 5% of exact (native HLL path)") {
    val approx = operators.Relational.qAggApproxHll(spark, sfDir("sf0.001"))
      .select(col("event_type"), col("approx_users"))
    val exact = Tables.events(spark, sfDir("sf0.001"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    joined.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("q_agg_approx (declared KMV): estimate within 15% of the exact column it carries") {
    SparkEntry.queries("q_agg_approx")(spark, sfDir("sf0.001"))
      .collect().foreach { r =>
        val (a, e) = (r.getAs[Double]("approx_users"), r.getAs[Long]("exact_users"))
        // k=128 KMV: σ ≈ 1/√(k−2) ≈ 8.9%; 15% ≈ 1.7σ on the seeded fixture
        assert(math.abs(a - e) <= math.max(1.0, e * 0.15),
          s"${r.getString(0)}: kmv $a vs exact $e")
      }
  }

  test("q_agg_approx_quantile (declared fixed-grid): within one grid cell of exact") {
    val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, sfDir("sf0.001"))
      .select(col("event_type"), col("p50_approx"), col("p90_approx"))
    val exact = Tables.events(spark, sfDir("sf0.001"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
    approx.join(exact, "event_type").collect().foreach { r =>
      // the grid estimate and the exact interpolated percentile both lie in
      // (or at the edge of) the bin holding rank q·n → differ by < 2·w
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 2.0,
        s"${r.getString(0)}: p50 grid ${r.getDouble(1)} vs exact ${r.getDouble(3)}")
      assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 2.0,
        s"${r.getString(0)}: p90 grid ${r.getDouble(2)} vs exact ${r.getDouble(4)}")
    }
  }

  test("approx_percentile within 10% of exact (native GK path)") {
    val approx = operators.Relational.qAggApproxQuantileNative(spark, sfDir("sf0.001"))
      .select(col("event_type"), col("p50_approx"), col("p90_approx"))
    val exact = Tables.events(spark, sfDir("sf0.001"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
    approx.join(exact, "event_type").collect().foreach { r =>
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      val (e50, e90) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - e50) <= math.max(1.0, math.abs(e50) * 0.1),
        s"${r.getString(0)}: p50 approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) <= math.max(1.0, math.abs(e90) * 0.1),
        s"${r.getString(0)}: p90 approx $a90 vs exact $e90")
    }
  }
}
