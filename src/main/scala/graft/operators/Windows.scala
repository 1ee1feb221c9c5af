package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Cols
import graft.operators.TrainingData.CheckpointOps

/** Window functions (SURVEY §2.5): ranking, analytic (lag/lead/first/last),
  * frame specs, ratio-to-report.
  *
  * Scale notes: all windows here partition by a key (customer / user), so the
  * physical plan is one hash shuffle on the partition key + an in-partition
  * sort — embarrassingly parallel across executors. The one exception is the
  * global date-ordered window in [[qWinFrame]], which is bounded by the number
  * of distinct DAYS (tiny regardless of row count) because it runs AFTER the
  * daily pre-aggregation.
  */
object Windows {

  /** Ranking trio: top-3 orders per customer. row_number/rank/dense_rank over
    * one shared (partition, sort) spec — single window exec, single shuffle. */
  def qWinRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .where(col("rn") <= 3)
      // r15: measured for the final-sort barrier and left unwrapped —
      // the orders-scaled window is too cheap for the sampling re-exec
      // to beat the barrier exchange (CkptSortAb 5-rep: shuffle −7.5%)
      .orderBy("o_custkey", "rn")
  }

  /** Analytic functions: per-user inter-event gap (lag) + partition-wide
    * first/last event instants. Frame for first/last is the FULL partition. */
  def qWinLag(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), col("event_id"), Cols.epochUs(col("ts")).as("ts_us"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.select(col("user_id"), col("event_id"), col("ts_us"),
        lag(col("ts_us"), 1).over(wOrd).as("prev_us"),
        lead(col("ts_us"), 1).over(wOrd).as("next_us"),
        first(col("ts_us")).over(wAll).as("first_us"),
        last(col("ts_us")).over(wAll).as("last_us"))
      .withColumn("gap_us", col("ts_us") - col("prev_us"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Frame specs over the daily-revenue series: 7-row moving average
    * (rowsBetween -6..0) and running total (unboundedPreceding..0).
    * Daily totals are rounded BEFORE the window fold, so both engines fold the
    * identical sequence of 2-decimal values in the identical (date) order —
    * window sums are deterministic by construction. */
  def qWinFrame(s: SparkSession, d: String): DataFrame = {
    // |days|-bounded rollup consumed twice (series + day-less split) —
    // checkpointed, one orders scan (ScanAudit r10 batch 2: 2 -> 1)
    val daily = orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(Cols.moneySum(col("o_totalprice")).as("day_rev"))
      .trackedCheckpoint()
    // A day-less group (null order dates) is OUTSIDE the time series: its
    // moving average / running total are undefined (null), and it must not
    // seed the real series' frames — before round 7 it rode FIRST in the
    // nulls-first window and a NaN day_rev there would poison every
    // running value after it. The oracle has carried this exclude-and-
    // union-back form since round 6 (DuckDB's parallel window sort places
    // a null ordering key nondeterministically); the operator now declares
    // the same semantics.
    val w = Window.orderBy(col("day"))
    val series = daily.where(col("day").isNotNull).select(
      Cols.epochUs(col("day")).as("day_us"),
      col("day_rev"),
      Cols.r6(avg(col("day_rev")).over(w.rowsBetween(-6, 0))).as("ma7"),
      Cols.r2(sum(col("day_rev")).over(
        w.rowsBetween(Window.unboundedPreceding, 0))).as("running"))
    val dayless = daily.where(col("day").isNull).select(
      lit(null).cast("long").as("day_us"), col("day_rev"),
      lit(null).cast("double").as("ma7"),
      lit(null).cast("double").as("running"))
    series.unionByName(dayless)
      // r15: measured for the final-sort barrier, left unwrapped (the
      // |days|-bounded window behind the checkpoint is ~free to re-run)
      .orderBy("day_us")
  }

  /** Ratio-to-report: each order's share of its customer's total spend.
    * Unordered partition-wide sum; r6 masks double fold-order noise. */
  def qWinShare(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        // nullif: a zero group total (e.g. +x and −x orders) would make the
        // share ±inf, where the engines' inf-through-floor folds diverge —
        // an undefined share is null on both engines instead
        Cols.r6(col("o_totalprice") /
          nullif(sum(col("o_totalprice")).over(w), lit(0.0))).as("share"))
      // r15: measured for the final-sort barrier and left unwrapped
      // (orders-scaled share window too cheap; CkptSortAb −3.5%)
      .orderBy("o_orderkey")
  }

  /** Distribution trio: quartile bucket (ntile), percent_rank, cume_dist
    * per priority class — one shared window spec, one shuffle. Unique sort
    * key (price, orderkey) makes the ratio outputs deterministic. */
  def qWinNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        Cols.r6(percent_rank().over(w)).as("pct_rank"),
        Cols.r6(cume_dist().over(w)).as("cume"))
      .transform(TrainingData.sortedOutput(s,
        col("o_orderpriority"), col("o_orderkey")))
  }

  /** RANGE frame (vs [[qWinFrame]]'s ROWS frames): per user, the count and
    * value-sum of their events in the trailing 30 event-time minutes — a
    * moving window keyed by the ORDER VALUE, so ties and gaps behave
    * correctly where a row-count frame would not (RANGE includes every row
    * whose time falls in the bound, regardless of how many). One shuffle on
    * user_id; frame evaluation is a per-partition sliding two-pointer.
    *
    * Skew lanes (`spark.graft.winrange.strategy`, r13 — the WindowSkewAb
    * ladder's verdict, BASELINE r13):
    *
    *  - `plain`: the one-shuffle per-user window above. The
    *    100 TB hazard is a single hot user: the whole stream sorts in
    *    ONE task, and because Spark's sliding RANGE frame re-aggregates
    *    its buffer whenever the lower bound moves (no retraction), wall
    *    was measured ×2.1–2.3 per ×2 hot mass — 23.7 s at a 3.1M-row
    *    hot key while every other head on the ladder stayed linear.
    *  - `bucketed`: the bounded-frame parallelization. A trailing
    *    30-min frame at time t can only reach rows in t's own
    *    30-min-aligned bucket or the one before it, so each row is
    *    emitted twice — once as an OWN row in its bucket, once as a
    *    CONTEXT row in the next bucket — and the window partitions by
    *    (user_id, bucket) instead of user_id. Frames never cross a
    *    partition boundary (every in-frame row is present locally),
    *    context rows are dropped after evaluation, and the result is
    *    row-identical to plain (WinRangeLaneSpec pins it, clean +
    *    hot-key corpora). The hot key now splits across span/30min
    *    tasks: measured 22.8 s → 3.63 s (×6.3) at the ×32 hot cell
    *    (3.1M-row hot key), near-linear across the whole ladder, at
    *    the cost of a 2× pre-shuffle row mass — 0.42 → 0.52 s at the
    *    skew-free ×1 cell (WindowSkewAb table, BASELINE r13).
    *  - `auto` (r14, the DEFAULT — the linkage-auto doctrine applied):
    *    [[winRangeAutoChoice]]'s one cheap pre-aggregate picks the lane
    *    from the corpus's own hot-user mass. Both lanes are
    *    result-identical (WinRangeLaneSpec + the `graftlanes` parity
    *    arm), so the dispatch is a pure cost choice with no correctness
    *    dimension — the same safety class that made linkage flip to
    *    auto in r13, and the OPPOSITE of simpairs (whose lsh lane is
    *    probabilistic and therefore must not be a default's choice).
    *    DEFAULT DECISION (r14, written): auto, not plain. plain's loss
    *    on a hot corpus is UNBOUNDED (×2.1–2.3 per ×2 hot mass — the
    *    measured ladder reaches ×6.3 and still bends) while bucketed's
    *    loss on a skew-free corpus is BOUNDED (the ~×1.25 2×-mass tax),
    *    so a default that cannot see the corpus must buy the cheap
    *    insurance: one map-side-combined single-column aggregate over
    *    events. Its measured price at the declared shape is +0.25 s on
    *    plain's 0.47 s (WinRangeLaneAb, sf0.1) — dominated by fixed
    *    job-launch overhead at local scale, NOT by the pass itself,
    *    and the trade inverts with size: the decision reads one column
    *    and combines map-side while the window shuffles and sorts full
    *    rows, so the relative insurance premium shrinks at 100 TB
    *    exactly where plain's unbounded hot-key loss grows. The
    *    per-call decision is deliberate (no per-corpus memo): one real
    *    deployment query pays it once; the bench repping it is the
    *    honest per-query cost, the sort.ckpt default-false doctrine.
    *    Manual `plain` stays available for operators who KNOW their
    *    corpus is skew-free and want the decision pass back. */
  def qWinRange(s: SparkSession, d: String): DataFrame = {
    val HalfHourUs = 1800000000L
    val conf = s.conf.get("spark.graft.winrange.strategy", "auto")
    require(Set("plain", "bucketed", "auto")(conf),
      s"spark.graft.winrange.strategy must be plain, bucketed or auto, got $conf")
    val strategy =
      if (conf == "auto") winRangeAutoChoice(s, d)._1 else conf
    val base = events(s, d)
      .select(col("event_id"), col("user_id"),
        Cols.epochUs(col("ts")).as("us"), col("value"))
    val framed =
      if (strategy == "plain") {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-HalfHourUs, 0)
        base.select(col("user_id"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("n_30m"),
          Cols.r2(sum(col("value")).over(w)).as("sum_30m"))
      } else {
        // floor(us / H): exact for every |us| < 2^53 µs (double holds
        // such longs exactly and the k·H boundary quotients are exact),
        // i.e. through year ~2255; floor (not truncate) keeps the
        // bucket walk monotonic for negative timestamps, the
        // BinnedRangeJoin r12 discipline
        val bucket = expr(s"floor(us / ${HalfHourUs}L)")
        val w = Window.partitionBy(col("user_id"), col("bucket"))
          .orderBy(col("us")).rangeBetween(-HalfHourUs, 0)
        base
          .select(col("user_id"), col("event_id"), col("us"), col("value"),
            explode(array(
              struct(bucket.as("bucket"), lit(true).as("own")),
              struct((bucket + 1).as("bucket"), lit(false).as("own"))))
              .as("b"))
          .select(col("user_id"), col("event_id"), col("us"), col("value"),
            col("b.bucket").as("bucket"), col("b.own").as("own"))
          .select(col("user_id"), col("event_id"), col("us"), col("own"),
            count(lit(1)).over(w).as("n_30m"),
            Cols.r2(sum(col("value")).over(w)).as("sum_30m"))
          .where(col("own"))
          .drop("own")
      }
    framed.orderBy("user_id", "us", "event_id")
  }

  /** The `auto` strategy's decision, exposed for tools/specs — the
    * [[graft.operators.Hygiene.linkageAutoChoice]] discipline applied to
    * the window-lane dial. One map-side-combined aggregate over events
    * computes the two lanes' cost drivers — `hot` = the largest single
    * user's row count (plain's whole hot stream sorts and slides in ONE
    * task) and `total` = the corpus row count (bucketed's wall is linear
    * in 2× this) — and picks bucketed iff
    *
    *   hot · shufflePartitions > 2 · total
    *
    * i.e. iff the hottest user holds more than ~2 balanced task shares.
    * Why 2, and why the bias points the OPPOSITE way from linkage's:
    * plain's stage wall is max(hot task, balanced tasks), so at hot =
    * C shares the stage runs ≥ C× a balanced stage while bucketed's tax
    * is the fixed ~2× row mass — the walls cross physically near C ≈ 2,
    * and Spark's SlidingWindowFunctionFrame re-aggregation (the measured
    * ×2.1–2.3/octave bend, BASELINE r13) makes plain's true hot-task
    * cost SUPER-linear in hot mass, so the real crossover is at or below
    * the sort-only estimate. plain's loss past the crossover is
    * unbounded; bucketed's below it is the bounded ~×1.25 tax — the
    * threshold must lean toward bucketed, the safe loser (linkage leans
    * toward block for the mirror-image reason). The measured bracket
    * agrees: the WindowSkewAb ladder's ×1 cell (hot/share ≈ 0.06 at
    * P=32) has plain winning ×1.25 and its ×2 cell (hot/share = 16) has
    * bucketed winning ×1.6 — C = 2 sits inside the bracket at the
    * physical knee.
    *
    * The returned stats are ONE row (a sanctioned bounded `.collect()`,
    * CollectLedgerSpec ledger): a 2-long aggregate over ≤ |users|
    * map-side partials — O(1) driver state at any corpus size. */
  def winRangeAutoChoice(s: SparkSession, d: String): (String, Long, Long) = {
    val parts = s.conf.get("spark.sql.shuffle.partitions", "200").toLong
    val r = events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")), sum(col("cnt")))
      .collect()(0)
    val hot = if (r.isNullAt(0)) 0L else r.getLong(0)
    val total = if (r.isNullAt(1)) 0L else r.getLong(1)
    val choice = if (hot * parts > 2L * total) "bucketed" else "plain"
    (choice, hot, total)
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_win_rank"  -> (qWinRank _),
    "q_win_lag"   -> (qWinLag _),
    "q_win_frame" -> (qWinFrame _),
    "q_win_share" -> (qWinShare _),
    "q_win_ntile" -> (qWinNtile _),
    "q_win_range" -> (qWinRange _))

  val oracles: ListMap[String, String] = ListMap(
    // NULLS FIRST qualifiers: Spark defaults ASC NULLS FIRST, DuckDB the
    // opposite — invisible on clean fixtures (keys non-null), aligns the
    // presentation order under dirty-corpus poison rows.
    "q_win_range" ->
      """WITH e AS (SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events)
        |SELECT user_id, event_id, us,
        |  count(*) OVER w AS n_30m,
        |  floor((sum(value) OVER w)*100.0 + 0.5)/100.0 AS sum_30m
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us NULLS FIRST
        |  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id NULLS FIRST, us NULLS FIRST, event_id""".stripMargin,
    "q_win_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  floor((percent_rank() OVER w)*1000000.0 + 0.5)/1000000.0 AS pct_rank,
        |  floor((cume_dist() OVER w)*1000000.0 + 0.5)/1000000.0 AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderkey""".stripMargin,
    "q_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_custkey NULLS FIRST, rn""".stripMargin,
    "q_win_lag" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT user_id, event_id, ts_us,
        |  lag(ts_us, 1) OVER wo AS prev_us,
        |  lead(ts_us, 1) OVER wo AS next_us,
        |  first_value(ts_us) OVER wa AS first_us,
        |  last_value(ts_us) OVER wa AS last_us,
        |  ts_us - lag(ts_us, 1) OVER wo AS gap_us
        |FROM e
        |WINDOW wo AS (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id),
        |       wa AS (PARTITION BY user_id ORDER BY ts_us NULLS FIRST, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id NULLS FIRST, ts_us NULLS FIRST, event_id""".stripMargin,
    // isnan guard mirrors Spark's floor(double)→LONG NaN.toLong == 0 on a
    // NaN-poisoned aggregate. The null-day group is kept OUT of the window
    // input and unioned back with NULL window outputs: DuckDB 1.0.0's
    // parallel window sort places a NULL ordering key nondeterministically
    // (measured: the null row's running flips between NULL and the grand
    // total across runs), while a null ROWS-frame slot contributes nothing
    // to sum/avg on either engine — so this form is value-identical to
    // Spark's nulls-first frames and deterministic on both. MATERIALIZED:
    // without it DuckDB 1.0.0's CTE-sharing optimizer evaluates the window
    // as if the day IS NOT NULL filter weren't there (measured). No-op on
    // clean fixtures.
    "q_win_frame" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         floor((sum(o_totalprice))*100.0 + 0.5)/100.0 AS day_rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT epoch_us(CAST(day AS TIMESTAMP)) AS day_us, day_rev,
        |    floor((avg(day_rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))*1000000.0 + 0.5)/1000000.0 AS ma7,
        |    floor((sum(day_rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*100.0 + 0.5)/100.0 AS running
        |  FROM daily WHERE day IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), day_rev,
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM daily WHERE day IS NULL)
        |SELECT day_us, day_rev, ma7, running FROM w
        |ORDER BY day_us NULLS FIRST""".stripMargin,
    "q_win_share" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  floor((o_totalprice / nullif(sum(o_totalprice) OVER w, 0.0))
        |    *1000000.0 + 0.5)/1000000.0 AS share
        |FROM orders WINDOW w AS (PARTITION BY o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
}
