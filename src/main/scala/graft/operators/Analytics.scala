package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Cols

/** Statistical / reshaping analytics beyond the SURVEY §2 core: exact
  * percentiles, distribution moments, fixed-width histograms, pivot tables,
  * and latest-state (upsert-materialization) extraction.
  *
  * Scale notes: percentile/moments/histogram are single-shuffle grouped
  * aggregates (exact percentile needs the per-group value multiset — at
  * 100 TB swap in approx_percentile, same API shape); pivot compiles to
  * conditional aggregation (one shuffle, no reshape pass); latest-state is
  * the classic row_number()=1 upsert compaction, one shuffle on the key.
  */
object Analytics {

  /** Exact interpolated percentiles (median, p90) of event value per type.
    * Both engines use the classic pos = p·(n−1) linear interpolation. */
  def qPercentile(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        Cols.r6(expr("percentile(value, 0.5)")).as("p50"),
        Cols.r6(expr("percentile(value, 0.9)")).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Sample moments + correlation of value with the JSON-extracted k. */
  def qStatsMoments(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(
        Cols.r6(stddev_samp(col("value"))).as("sd"),
        Cols.r6(var_samp(col("value"))).as("vr"),
        Cols.r6(corr(col("value"), col("k"))).as("corr_vk"),
        Cols.r6(covar_samp(col("value"), col("k"))).as("covar_vk"))
      .orderBy("event_type")

  /** Fixed-width histogram of event values: 50-unit buckets, explicit
    * integer arithmetic (identical on both engines, no width_bucket
    * dialect differences). */
  def qHistogram(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", floor(col("value") / 50.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), Cols.r2(sum(col("value"))).as("sum_value"))
      .orderBy("bucket")

  /** Pivot: order status columns per priority. Spark's pivot compiles to
    * conditional aggregation — the oracle states that form directly. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Cols.r2(sum(col("o_totalprice"))))
      .orderBy("o_orderpriority")

  /** Latest-state compaction ("upsert view" of the event stream): the most
    * recent event per user, ties broken by event_id. */
  def qLatestState(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events(s, d)
      .select(col("user_id"), col("event_id"), Cols.epochUs(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_percentile"    -> (qPercentile _),
    "q_stats_moments" -> (qStatsMoments _),
    "q_histogram"     -> (qHistogram _),
    "q_pivot"         -> (qPivot _),
    "q_latest_state"  -> (qLatestState _))

  val oracles: ListMap[String, String] = ListMap(
    "q_percentile" ->
      """SELECT event_type,
        | floor((quantile_cont(value, 0.5))*1000000.0 + 0.5)/1000000.0 AS p50,
        | floor((quantile_cont(value, 0.9))*1000000.0 + 0.5)/1000000.0 AS p90,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stats_moments" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k FROM events)
        |SELECT event_type,
        | floor((stddev_samp(value))*1000000.0 + 0.5)/1000000.0 AS sd,
        | floor((var_samp(value))*1000000.0 + 0.5)/1000000.0 AS vr,
        | floor((corr(value, k))*1000000.0 + 0.5)/1000000.0 AS corr_vk,
        | floor((covar_samp(value, k))*1000000.0 + 0.5)/1000000.0 AS covar_vk
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        | count(*) AS n, floor((sum(value))*100.0 + 0.5)/100.0 AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        | floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END))*100.0 + 0.5)/100.0 AS "F",
        | floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END))*100.0 + 0.5)/100.0 AS "O",
        | floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END))*100.0 + 0.5)/100.0 AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_latest_state" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
}
