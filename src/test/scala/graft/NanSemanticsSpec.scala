package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the adversarial-input semantics declared in round 7 (BASELINE.md
  * "Random-corpus differential fuzzing") so they cannot regress without a
  * failing test even where the DuckDB gate isn't running:
  *
  *  - rounding folds are NaN-TRANSPARENT (the old fold silently rounded
  *    NaN to 0.0 — poison masked as a plausible value);
  *  - order statistics exclude NaN via [[Cols.nanNull]];
  *  - the incremental state/delta merge is null-safe (merge == recompute
  *    even when a dimension value is null);
  *  - one corrupt row cannot kill a job (zero-quantity division,
  *    null-user stickiness, Derby NaN, null vecbin label) — covered
  *    operator-by-operator in DirtyInputSpec; here the kernel helpers. */
class NanSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("r2/r6 pass NaN through and still round normal values") {
    val row = Seq((Double.NaN, 1.2345678949, -0.006)).toDF("a", "b", "c")
      .select(Cols.r2(col("a")).as("na"), Cols.r6(col("a")).as("na6"),
        Cols.r6(col("b")).as("rb"), Cols.r2(col("c")).as("rc"))
      .head()
    assert(row.getDouble(0).isNaN && row.getDouble(1).isNaN)
    assert(row.getDouble(2) == 1.234568) // floor(x*1e6 + 0.5)/1e6
    assert(row.getDouble(3) == -0.01)    // floor semantics, not trunc
  }

  test("r2/r6 keep null null and saturate ±inf (documented engine default)") {
    val row = Seq((Option.empty[Double], Double.PositiveInfinity))
      .toDF("n", "i")
      .select(Cols.r2(col("n")).as("rn"), Cols.r2(col("i")).as("ri"))
      .head()
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == Long.MaxValue / 100.0)
  }

  test("nanNull: NaN → null (statistics exclude it), values/null preserved") {
    val df = Seq(1.0, 2.0, Double.NaN).toDF("v")
    val r = df.agg(
      stddev_samp(Cols.nanNull(col("v"))).as("sd"),
      avg(Cols.nanNull(col("v"))).as("mu"),
      expr("percentile(CASE WHEN NOT isnan(v) THEN v END, 0.5)").as("p50"))
      .head()
    assert(math.abs(r.getDouble(1) - 1.5) < 1e-12, "NaN must leave the mean")
    assert(!r.getDouble(0).isNaN && !r.getDouble(2).isNaN)
    // un-guarded statistics would be NaN-poisoned — the contrast pin
    val poisoned = df.agg(avg(col("v"))).head().getDouble(0)
    assert(poisoned.isNaN)
  }

  test("incremental merge is null-safe: one row per status incl. the null one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nullmerge").toString
    // orders where the NULL status has rows on BOTH sides of the cut —
    // under an '=' merge key they'd split into two output rows
    val base = spark.read.parquet(s"${sfDir("sf0.001")}/orders.parquet")
    val schema = base.schema
    import scala.jdk.CollectionConverters._
    def ts(s: String) = java.sql.Timestamp.valueOf(s).toLocalDateTime
    val rows = Seq(
      Row(1L, 1L, null, 10.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      Row(2L, 1L, null, 20.0, ts("2024-06-01 00:00:00"), "1-URGENT"),
      Row(3L, 1L, "O", 30.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      Row(4L, 1L, "O", 40.0, ts("2024-06-01 00:00:00"), "1-URGENT"))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = operators.Insights.queries("q_incremental_agg")
      .apply(spark, dir).collect()
    assert(out.length == 2, s"null status must MERGE, got ${out.toSeq}")
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 2 && nullRow.getLong(2) == 1
      && nullRow.getLong(3) == 1,
      s"state+delta must combine across the null key: $nullRow")
  }
}
