package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Hand-computed edge cases on a tiny synthetic universe written with the
  * fixture schemas, driven through the SAME declared query functions. */
class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  /** A miniature sfDir with hand-authored events + orders. */
  private lazy val mini: String = {
    val dir = Files.createTempDirectory("graft-mini").toString
    // user 1: events at t=0, 29, 60, 95 min → sessions {0,29}, {60}, {95}
    //   (gap 31 min and 35 min both >= 30 → split; 29 min < 30 → merge)
    // user 2: single event
    Seq(
      (1L, ts(0), 1L, "signup", 1.0, """{"k": 1}"""),
      (2L, ts(29), 1L, "purchase", 2.0, """{"k": 2}"""),
      (3L, ts(60), 1L, "view", 3.0, """{"k": 3}"""),
      (4L, ts(95), 1L, "view", 4.0, """{"k": 4}"""),
      (5L, ts(10), 2L, "purchase", 5.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // user 1 orders at t=5 and t=29; user 2 none
    Seq(
      (101L, 1L, "O", 10.0, ts(5), "1-URGENT"),
      (102L, 1L, "F", 20.0, ts(29), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("session_window splits above, not at, the 30-min gap boundary") {
    val rows = operators.EventTime.qWinSession(spark, mini).collect()
    val u1 = rows.filter(_.getLong(0) == 1L)
    assert(u1.length == 3)
    assert(u1.map(_.getLong(3)).toSeq == Seq(2L, 1L, 1L)) // n_events per session
    // session end = last event + 30 min
    assert(u1.head.getLong(2) == ts(59).getTime * 1000L)

    // the EXACT boundary: events 30:00.000000 apart MERGE (Spark 4's
    // MergingSessionsIterator starts a new session only when
    // sessionStart > currentSessionEnd), and a microsecond past it splits
    // — the oracles' gaps-and-islands rule is strictly-greater to match
    val dir = java.nio.file.Files.createTempDirectory("graft-gap").toString
    Seq(
      (1L, ts(0), 9L, "view", 1.0, "{}"),
      (2L, ts(30), 9L, "view", 1.0, "{}"),            // exactly 30 min later
      (3L, new java.sql.Timestamp(ts(60).getTime + 1), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val u9 = operators.EventTime.qWinSession(spark, dir).collect()
      .filter(_.getLong(0) == 9L)
    assert(u9.map(_.getLong(3)).toSeq == Seq(2L, 1L),
      "events at exactly the gap must merge; 1ms past it must split")
  }

  test("as-of join picks the latest order at-or-before each event") {
    val rows = operators.Relational.qAsof(spark, mini).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(rows(1L) == -1L)  // event at t=0: no order yet
    assert(rows(2L) == 102L) // event at t=29: order 102 exactly at t=29 (at-or-before)
    assert(rows(3L) == 102L) // later event: still latest
    assert(rows(5L) == -1L)  // user 2: no orders
  }

  test("funnel: converted iff first purchase at-or-after first signup within 24h") {
    val rows = operators.EventTime.qSessionizeFunnel(spark, mini).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows(1L) == 1L) // signup t=0, purchase t=29min
    assert(rows(2L) == 0L) // purchase without signup
  }

  test("late-data: events older than (max ts - 1h) per type are late") {
    val rows = operators.EventTime.qLateData(spark, mini).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    // 'view': max=95min, watermark=35min → event at 60 and 95 both on-time
    assert(rows.contains(("view", 0L, 2L)))
  }

  test("aggregation on empty input yields zero groups, not a crash") {
    val empty = spark.range(0).select(
      col("id").as("l_orderkey"), col("id").cast("int").as("l_linenumber"),
      lit(0.0).as("l_quantity"), lit(0.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
      lit(null).cast("timestamp").as("l_shipdate"))
    val out = empty
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity"))
    assert(out.count() == 0)
  }

  test("cosine: self-similarity 1, orthogonality 0, symmetry") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(0.0f, 0.0f, 3.0f)))
      .toDF("a", "b")
      .select(
        cosine(toDouble(col("a")), toDouble(col("a"))).as("self"),
        cosine(toDouble(col("a")), toDouble(col("b"))).as("ab"),
        cosine(toDouble(col("b")), toDouble(col("a"))).as("ba"))
      .head()
    assert(math.abs(df.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(df.getDouble(1) - 2.0 / 3.0) < 1e-12)
    assert(df.getDouble(1) == df.getDouble(2))
  }

  test("range_bin: every session counts ALL purchases inside its window") {
    // sessions: u1 [0,59] [60,90] [95,125]; u2 [10,40] (ends = last + 30)
    // purchases at t=29 (u1) and t=10 (u2); both land in [0,59] AND [10,40];
    // the two later u1 sessions see none and drop out of the inner join
    val rows = operators.EventTime.qRangeBin(spark, mini).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 60000000L, r.getLong(3)))
    assert(rows.toSet == Set((1L, 0L, 2L), (2L, 10L, 2L)), rows.toSeq)
  }

  test("win_range: trailing 30-min frame is value-keyed, not row-keyed") {
    val rows = operators.Windows.qWinRange(spark, mini).collect()
      .map(r => (r.getLong(0), r.getLong(2) / 60000000L,
        r.getLong(3), r.getDouble(4)))
    // u1 events at 0,29,60,95 min (values 1,2,3,4): t=29 sees t=0 (29 <= 30);
    // t=60 does NOT see t=29 (gap 31); u2 single event sees itself
    assert(rows.toSet == Set(
      (1L, 0L, 1L, 1.0), (1L, 29L, 2L, 3.0),
      (1L, 60L, 1L, 3.0), (1L, 95L, 1L, 4.0),
      (2L, 10L, 1L, 5.0)), rows.toSeq)
  }

  test("cdc_apply: delete, update and insert each hit their key class") {
    val dir = Files.createTempDirectory("graft-cdc").toString
    // 194 ≡ 0 (mod 97) → deleted; 98 ≡ 1 → price +10%; 99 ≡ 2 → also
    // inserted as 100000099; 100 ≡ 3 → untouched
    Seq(
      (194L, 1L, "O", 10.0, ts(1), "1-URGENT"),
      (98L, 1L, "O", 20.0, ts(2), "1-URGENT"),
      (99L, 2L, "F", 30.0, ts(3), "2-HIGH"),
      (100L, 2L, "F", 40.0, ts(4), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val rows = operators.Analytics.qCdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows == Map(98L -> 22.0, 99L -> 30.0, 100L -> 40.0,
      100000099L -> 30.0), rows)
  }

  test("line dedup rebuilds the all-boilerplate doc to the empty string") {
    val dir = Files.createTempDirectory("graft-ld").toString
    // docs 1+2 share segment "a b c d e" in source s1 → boilerplate (nd=2);
    // doc 1 is NOTHING BUT that segment twice → empty rebuild; doc 3 untouched
    Seq(
      (1L, "a b c d e a b c d e", "en", "s1", 19L),
      (2L, "a b c d e x y z w v", "en", "s1", 19L),
      (3L, "p q r s t u v w x y", "en", "s1", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = operators.Hygiene.qLineDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.toSeq == Seq(
      (1L, 2L, 0L, m("")),
      (2L, 2L, 1L, m("x y z w v")),
      (3L, 2L, 2L, m("p q r s t u v w x y"))), rows.toSeq)
  }

  test("resample interpolates interior gaps and carries values at the edges") {
    val dir = Files.createTempDirectory("graft-rs").toString
    // type m: hours 0 and 2 observed (1.0, 3.0) → hour 1 interpolates to 2.0
    // type n: only hour 1 observed (5.0) → hours 0 and 2 carry 5.0
    Seq(
      (1L, ts(10), 1L, "m", 1.0, "{}"),
      (2L, ts(130), 1L, "m", 3.0, "{}"),
      (3L, ts(70), 2L, "n", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = operators.EventTime.qResample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val hr = 3600000000L
    assert(rows.toSeq == Seq(
      ("m", 0L, 1.0, true), ("m", hr, 2.0, false), ("m", 2 * hr, 3.0, true),
      ("n", 0L, 5.0, false), ("n", hr, 5.0, true), ("n", 2 * hr, 5.0, false)),
      rows.toSeq)
  }

  test("attribution: horizon is inclusive, latest click wins, no-click stays new") {
    val dir = Files.createTempDirectory("graft-at").toString
    Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(60), 1L, "purchase", 1.0, "{}"),   // exactly 1h after → attributed
      (3L, ts(122), 1L, "purchase", 1.0, "{}"),  // 2h02m after the only click → new
      (4L, ts(10), 2L, "click", 0.0, "{}"),
      (5L, ts(20), 2L, "click", 0.0, "{}"),
      (6L, ts(25), 2L, "purchase", 1.0, "{}"),   // latest click (id 5) wins
      (7L, ts(5), 3L, "purchase", 1.0, "{}"))    // user 3 never clicked
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = operators.EventTime.qAttribution(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      (2L, 1L, 3600000000L, true),
      (3L, -1L, -1L, false),
      (6L, 5L, 300000000L, true),
      (7L, -1L, -1L, false)), rows.toSeq)
  }

  test("bfs: chain distances, threshold-filtered edges, other components unreached") {
    val dir = Files.createTempDirectory("graft-bfs").toString
    // baskets → co-purchase edges need >= 2 shared orders:
    //   A-B (orders 1,2), B-C (orders 3,4) → chain A-B-C
    //   C-D co-occurs ONCE (order 5) → below threshold, no edge
    //   E-F (orders 6,7) → separate component, unreachable from A
    val baskets = Seq(
      1L -> Seq(100L, 200L), 2L -> Seq(100L, 200L),
      3L -> Seq(200L, 300L), 4L -> Seq(200L, 300L),
      5L -> Seq(300L, 400L),
      6L -> Seq(500L, 600L), 7L -> Seq(500L, 600L))
    baskets.flatMap { case (o, parts) =>
      parts.zipWithIndex.map { case (p, i) =>
        (o, p, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(0))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = operators.Insights.qBfs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.toSeq == Seq(100L -> 0L, 200L -> 1L, 300L -> 2L), rows.toSeq)
    // an edgeless graph (every pair co-occurs once) yields the empty reach
    val dir2 = Files.createTempDirectory("graft-bfs-empty").toString
    Seq((1L, 100L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(0)),
      (1L, 200L, 1L, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(0)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir2/lineitem.parquet")
    assert(operators.Insights.qBfs(spark, dir2).count() == 0)
  }

  test("kmv: groups below k are exact (estimate == distinct, rel_err 0)") {
    // the shipped fixture's scopes all exceed k=128 distinct keys, so the
    // sketch-is-the-whole-set branch only proves out on a mini corpus
    val rows = operators.Insights.qKmvDistinct(spark, mini).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (scope, exact, size, est, relErr) =>
      assert(size == exact, s"$scope: sketch must hold the whole set")
      assert(est == exact.toDouble && relErr == 0.0,
        s"$scope: below-k estimate must be exact, got $est / $relErr")
    }
  }

  test("r2/r6 rounding matches the shared floor formula at half boundaries") {
    val row = Seq((2.675, 0.0000005)).toDF("a", "b")
      .select(Cols.r2(col("a")), Cols.r6(col("b"))).head()
    // IEEE: 2.675 stores as 2.67500000000000017764, so *100 = 267.50000000000003
    // → floor(+0.5) = 268 → 2.68 on BOTH engines (the shared formula is the
    // point: each engine computes the identical IEEE value, whatever it is).
    assert(row.getDouble(0) == 2.68)
    assert(row.getDouble(1) == 1e-6 || row.getDouble(1) == 0.0) // formula-defined
  }
}
