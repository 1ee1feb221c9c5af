package graft

import org.apache.spark.sql.functions._

import graft.operators.Insights

/** Independent checks for the decision-support operators: brute-force
  * replays on the sf0.001 fixture (small enough to recompute driver-side)
  * plus the structural invariants each operator promises. */
class InsightsSpec extends SparkSpec {

  private val d = sfDir("sf0.001")

  test("q_retention: offset-0 cell equals the cohort size (everyone is active in their first week)") {
    val rows = Insights.qRetention(spark, d).collect()
    assert(rows.nonEmpty)
    val zero = rows.filter(_.getAs[Long]("week_offset") == 0L)
    assert(zero.nonEmpty, "every cohort must have an offset-0 cell")
    zero.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"), r.toString)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"), r.toString)
    }
  }

  test("q_rfm: scores in 1..4, monotone in the metric, match driver-side cut points") {
    val rows = Insights.qRfm(spark, d).collect()
    assert(rows.length > 0)
    // recompute the cut points independently (exact linear-interpolation
    // percentile over the collected metric, r6-rounded like the operator)
    def cutPoints(xs: Array[Double]): Seq[Double] = {
      val s = xs.sorted
      Seq(0.25, 0.5, 0.75).map { q =>
        val pos = q * (s.length - 1)
        val lo = s(pos.toInt)
        val hi = s(math.min(pos.toInt + 1, s.length - 1))
        val v = lo + (hi - lo) * (pos - pos.toInt)
        math.floor(v * 1e6 + 0.5) / 1e6
      }
    }
    def check(metricCol: String, scoreCol: String, asc: Boolean): Unit = {
      val metric = rows.map(r => r.getAs[Any](metricCol) match {
        case l: Long => l.toDouble
        case x: Double => x
      })
      val cuts = cutPoints(metric)
      rows.zip(metric).foreach { case (r, m) =>
        val above = cuts.count(m > _).toLong
        val expected = if (asc) 1L + above else 4L - above
        assert(r.getAs[Long](scoreCol) == expected,
          s"$scoreCol mismatch at $metricCol=$m cuts=$cuts: $r")
      }
      // every score level is populated on this fixture
      assert(rows.map(_.getAs[Long](scoreCol)).distinct.sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L), s"$scoreCol levels")
    }
    check("recency_days", "r_score", asc = true)
    check("frequency", "f_score", asc = false)
    check("monetary", "m_score", asc = false)
    rows.foreach { r =>
      val seg = s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}${r.getAs[Long]("m_score")}"
      assert(r.getAs[String]("segment") == seg, r.toString)
    }
  }

  test("q_anomaly: one row per (type, day); flags match the reported z at the 2.0 threshold") {
    val rows = Insights.qAnomaly(spark, d).collect()
    val keys = rows.map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day")))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(r.getAs[Boolean]("anomalous") == (math.abs(z) > 2.0), r.toString)
    }
  }

  test("q_bm25 matches a driver-side brute-force BM25 on the fixture") {
    val terms = Seq("spark", "hash", "join")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val dfreq = terms.map(t => t -> docs.values.count(_.contains(t))).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else Some(math.log(1.0 + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl)))
      }
      if (contribs.isEmpty) None
      else Some(id -> math.floor(contribs.sum * 1e6 + 0.5) / 1e6)
    }.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(20)
    val got = Insights.qBm25(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toSeq
    assert(got == expected)
  }

  test("q_skyline matches the brute-force dominance check and is itself dominance-free") {
    val parts = Tables.part(spark, d)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = parts.exists { q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val expected = parts.filter(!dominated(_))
      .groupBy(p => (p._2, p._3)).map(_._2.minBy(_._1)).map(_._1).toSet
    val got = Insights.qSkyline(spark, d).collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expected)
  }

  test("skyline dup-collapse and equal-price ties: synthetic front with duplicates") {
    // (partkey, brand, price, size):
    //  - 1 & 2 are exact duplicates on the front -> only min partkey (1) survives
    //  - 3 shares price 10.0 with them but is smaller -> dominated
    //  - 4 dominates 5 (cheaper AND larger)
    //  - 6 is the cheap-small corner, on the front
    import spark.implicits._
    val df = Seq(
      (1L, "B1", 10.0, 50), (2L, "B2", 10.0, 50), (3L, "B1", 10.0, 40),
      (4L, "B2", 5.0, 30), (5L, "B1", 7.0, 20), (6L, "B1", 1.0, 10))
      .toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
    val got = Insights.paretoFrontGlobal(
      Insights.paretoFront(df, Seq(col("p_brand"))))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 6L))
  }

  test("paretoFrontGlobal == the partition-less window formulation on adversarial synthetics") {
    // the prefix-max scan must be row-identical to the window it
    // replaced, including duplicate collapse and equal-price ties, and
    // must stay exact when the front IS the whole set (anti-correlated
    // price/size — the shape that makes the single-task window a
    // scale hazard in the first place)
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    val random = (1 to 500).map { i =>
      (i.toLong, s"B${rnd.nextInt(4)}",
        (rnd.nextInt(40) + 1).toDouble, rnd.nextInt(30) + 1)
    }
    val antiCorr = (1 to 300).map { i =>
      (1000L + i, s"B${i % 4}", i.toDouble, i)
    }
    for (rows <- Seq(random, antiCorr)) {
      val df = rows.toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
        .repartition(7)
      val windowForm = {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("p_retailprice").asc, col("p_size").desc,
            col("p_partkey").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        df.withColumn("runmax", max(col("p_size")).over(w))
          .where(col("runmax").isNull || col("p_size") > col("runmax"))
          .drop("runmax")
      }
      val scanForm = Insights.paretoFrontGlobal(df)
      assert(scanForm.exceptAll(windowForm).isEmpty &&
        windowForm.exceptAll(scanForm).isEmpty,
        s"prefix-max scan diverged from the window formulation")
    }
  }

  test("q_skyline never joins; the global pass is the prefix-max scan, not a one-task window") {
    val p = Insights.qSkyline(spark, d).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), s"skyline must not join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"),
      s"the survivor scan rides the range-sorted RDD:\n$p")
    assert(!p.contains("Window"),
      s"no window may remain in the FINAL plan (the brand-local one " +
        s"lives inside the RDD lineage; a window here would be the " +
        s"partition-less global sort again):\n$p")
  }

  test("q_ewma matches a driver-side replay of the recursion") {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("dv"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date](1), r.getDouble(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_._2.toString).toSeq
      var acc = ordered.head._3
      ordered.zipWithIndex.map { case ((_, day, x), i) =>
        if (i > 0) acc = acc * 0.7 + 0.3 * x
        (t, day, math.floor(acc * 1e6 + 0.5) / 1e6)
      }
    }.toSeq.sortBy(r => (r._1, r._2.toString))
    val got = Insights.qEwma(spark, d).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1), r.getAs[Double]("ewma"))).toSeq
    assert(got == expected)
  }

  test("q_ewma stays inside each type's [min, max] day-value envelope (convexity)") {
    val env = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("dv"))
      .groupBy("event_type").agg(min("dv").as("lo"), max("dv").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Insights.qEwma(spark, d).collect().foreach { r =>
      val (lo, hi) = env(r.getString(0))
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"$r outside [$lo, $hi]")
    }
  }

  test("q_hll_merge (native HLL): per-day sketches merge losslessly and estimate within 5% of exact") {
    val rows = Insights.qHllMergeNative(spark, d).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_lossless"),
        s"merged estimate must equal direct: $r")
      assert(r.getAs[Long]("n_partials") > 1, s"need >1 partial to prove a merge: $r")
      val (a, e) = (r.getAs[Long]("approx_direct"), exact(r.getString(0)))
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong), s"$a vs $e")
    }
  }

  test("q_hll_merge (declared KMV): full-sketch merge equality and estimate within 15% of exact") {
    val rows = Insights.qHllMerge(spark, d).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_lossless"),
        s"merged SKETCH must equal direct sketch: $r")
      assert(r.getAs[Long]("n_partials") > 1, s"need >1 partial to prove a merge: $r")
      assert(r.getAs[Double]("approx_direct") == r.getAs[Double]("approx_merged"),
        s"equal sketches must estimate equally: $r")
      val (a, e) = (r.getAs[Double]("approx_direct"), exact(r.getString(0)))
      // k=128 KMV: σ ≈ 1/√(k−2) ≈ 8.9%; 15% ≈ 1.7σ on the seeded fixture
      assert(math.abs(a - e) <= math.max(1.0, e * 0.15), s"$a vs $e")
    }
  }

  test("q_active_users: wau7 >= dau, stickiness in (0, 1], day-1 wau equals its dau") {
    val rows = Insights.qActiveUsers(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau7"))
      assert(wau >= dau, r.toString)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0 && st <= 1.0, r.toString)
    }
    // the very first observed day has no trailing history: wau7 == dau
    val first = rows.minBy(_.getAs[java.sql.Date]("day").toString)
    assert(first.getAs[Long]("wau7") == first.getAs[Long]("dau"), first.toString)
  }

  test("q_winsorize: clipped mean between p05 and p95, clip count matches tails") {
    val rows = Insights.qWinsorize(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val mw = r.getAs[Double]("mean_wins")
      assert(mw >= p05 - 1e-9 && mw <= p95 + 1e-9, r.toString)
      val clipFrac = r.getAs[Long]("n_clipped").toDouble / r.getAs[Long]("n")
      assert(clipFrac > 0.0 && clipFrac <= 0.11, s"~10% should clip: $r")
    }
  }

  test("q_incremental_agg: state + delta partitions are both non-trivial and sum to the total") {
    val rows = Insights.qIncrementalAgg(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_state") + r.getAs[Long]("n_delta") ==
        r.getAs[Long]("n_total"), r.toString)
    }
    // the cutoff must actually split history, or the merge proves nothing
    assert(rows.map(_.getAs[Long]("n_state")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_delta")).sum > 0)
  }

  test("q_pagerank matches a driver-side replay of the 5 power iterations") {
    val df = Insights.qPagerank(spark, d)
    // rebuild edges independently via SQL over the same fixtures
    Seq("lineitem", "orders", "customer", "supplier", "nation").foreach { t =>
      Tables.table(spark, d, t).createOrReplaceTempView(s"pg_$t")
    }
    val edges = spark.sql(
      """SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
        |FROM pg_lineitem l JOIN pg_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN pg_customer c ON o.o_custkey = c.c_custkey
        |JOIN pg_supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nodes = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val nN = nodes.length.toDouble
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(n => n._1 -> 1.0 / nN).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map(e => e._3.toDouble / outw(e._1) * pr(e._1)).sum).toMap
      pr = nodes.map(n => n._1 -> (0.15 / nN + 0.85 * contrib.getOrElse(n._1, 0.0))).toMap
    }
    val expected = nodes.map { case (k, name) =>
      name -> math.floor(pr(k) * 1e6 + 0.5) / 1e6
    }.sortBy(_._1).toSeq
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    // r6 rounding can differ by one ulp-step between independent double sums;
    // require equality within 1e-6 per node plus exact name order
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) <= 1e-6 + 1e-12, s"$g vs $e")
    }
    // total rank mass stays in [teleport floor, 1]
    val mass = got.map(_._2).sum
    assert(mass > 0.15 && mass <= 1.0 + 1e-6, s"mass $mass")
  }

  test("transition matrix rows are probability distributions") {
    val rows = operators.Insights.qTransitionMatrix(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (from, hops) =>
      val pSum = hops.map(_._3).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from sums to $pSum")
    }
    // hop conservation: total hops = total events - one per user
    val ev = graft.Tables.events(spark, d)
    val expectHops = ev.count() -
      ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == expectHops)
  }

  test("kmv per-type sketches merge into the ALL sketch losslessly") {
    val rows = operators.Insights.qKmvDistinct(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    val all = rows.find(_._1 == "ALL").get
    val perType = rows.filter(_._1 != "ALL")
    // union exact >= any per-type exact; the merged sketch is full whenever
    // any per-type sketch is full
    assert(perType.forall(_._2 <= all._2))
    if (perType.exists(_._3 == 128L)) assert(all._3 == 128L)
    // k=128 => sigma ~ 1/sqrt(127) ~ 8.9%; allow 5 sigma on every scope
    rows.foreach { case (scope, _, _, relErr) =>
      assert(relErr < 0.45, s"$scope rel_err $relErr")
    }
  }
}
