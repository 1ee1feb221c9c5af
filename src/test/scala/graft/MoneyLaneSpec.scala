package graft

import org.apache.spark.sql.functions._

/** Laws of the opt-in DECIMAL money-sum lane
  * (Cols.moneySum, `spark.graft.money.decimal` — decision and measured
  * basis in the moneySum scaladoc / BASELINE r14 "×16 r2-cent-boundary"):
  *
  *  - DECLARED-SF IDENTITY: lane on == lane off on fixture money heads
  *    (full-surface hash proof is the `decmoney` ConfParity arm; three
  *    representative heads pinned here in CI, including the head the
  *    ×16 cent-boundary class fired on).
  *  - ORDER INDEPENDENCE: the decimal lane returns the same cents under
  *    any accumulation order — the exact property the fp64 lane was
  *    proven NOT to have at ×16 volume. Pinned by REPRODUCING the
  *    r2-cent-boundary class at test scale (a crafted mixed-magnitude
  *    multiset whose two accumulation orders straddle a half-cent
  *    boundary on the fp64 lane) and showing the decimal lane is
  *    invariant on the identical inputs.
  *  - POISON VISIBILITY: NaN inputs propagate to a NaN sum on BOTH
  *    lanes (decimal has no NaN — the lane re-injects it); null-only
  *    groups stay null.
  */
class MoneyLaneSpec extends SparkSpec {

  private def withLane[T](f: => T): T = {
    spark.conf.set("spark.graft.money.decimal", "true")
    try f
    finally spark.conf.unset("spark.graft.money.decimal")
  }

  test("fixture identity: three money heads return identical rows under both lanes") {
    val d = sfDir("sf0.001")
    for (q <- Seq("q_agg_pricing", "q_join_broadcast", "q_histogram")) {
      val base = SparkEntry.queries(q)(spark, d).collect().toSeq
      val dec = withLane(SparkEntry.queries(q)(spark, d).collect().toSeq)
      assert(base.nonEmpty && dec == base, s"$q lanes diverge at declared SF")
    }
  }

  test("the r2-cent-boundary class fires on the fp64 lane and CANNOT fire on the decimal lane") {
    // The ×16 grown class, reproduced at test scale: the same multiset
    // summed in two accumulation orders. Exact sum = 40050×0.0001 = 4.005
    // (a half-cent boundary); the ±1e9 pair makes each small add round at
    // ULP(1e9) ≈ 2.4e-7, so the fp64 running error is cent-scale and
    // ORDER-DEPENDENT — smalls-first lands below the boundary (→ 4.00),
    // big-first lands above it (→ 4.01). The decimal lane's exact sum is
    // order-independent by associativity, so both orders give one cent.
    val smalls = Seq.fill(40050)(0.0001)
    val smallsFirst = smalls ++ Seq(1e9, -1e9)
    val bigFirst = Seq(1e9) ++ smalls ++ Seq(-1e9)
    def sumOrdered(vals: Seq[Double]): Double = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      df.agg(Cols.moneySum(col("v"))).collect()(0).getDouble(0)
    }
    val fpA = sumOrdered(smallsFirst)
    val fpB = sumOrdered(bigFirst)
    assert(fpA == 4.0 && fpB == 4.01,
      s"fp64 straddle shape changed (expected 4.0/4.01): $fpA / $fpB")
    val decA = withLane(sumOrdered(smallsFirst))
    val decB = withLane(sumOrdered(bigFirst))
    assert(decA == decB, s"decimal lane is order-dependent: $decA vs $decB")
    // r2(double(exact 4.005)): double(4.005)·100 lands on exactly 400.5,
    // so the deterministic cent is 4.01 — the point is not WHICH side of
    // the boundary, it is that the answer is a function of the exact sum
    // alone, never of partitioning.
    assert(decA == 4.01, s"decimal lane moved from r2(double(4.005 exact)): $decA")
  }

  test("lane divergence at declared SF is exactly the half-cent boundary-cell class") {
    // The decmoney ConfParity extra-arm measured 137/138 bit-identical at
    // sf0.01 with q_date_spine the one mover. The LAW (not the count —
    // which cells flip is fp64 accumulation-order luck and varies with
    // session shape): every lane diff must be (a) a one-cent flip
    // (b) on a cell whose EXACT decimal sum lies within 1e-3 cents of
    // the half-cent grid — the population where fp64 has no stable
    // answer to diverge from. The boundary population itself is computed
    // exactly (decimal sums), so the non-vacuity check is deterministic.
    val d = sfDir("sf0.01")
    def spine(lane: Boolean): Map[Long, Double] = {
      if (lane) spark.conf.set("spark.graft.money.decimal", "true")
      try SparkEntry.queries("q_date_spine")(spark, d).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.conf.unset("spark.graft.money.decimal")
    }
    val fp = spine(lane = false)
    val dec = spine(lane = true)
    assert(fp.keySet == dec.keySet)
    // exact per-day sums, unrounded, in decimal — the ground truth grid
    val exact = Tables.lineitem(spark, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,16)")).as("s"))
      .select(Cols.epochUs(col("day")).as("day_us"), col("s"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    def centsFromBoundary(s: BigDecimal): BigDecimal = {
      val c = (s * 100).abs
      val frac = c - BigDecimal(c.toBigInt)
      (frac - BigDecimal("0.5")).abs
    }
    val boundary = exact.filter { case (_, s) =>
      centsFromBoundary(s) <= BigDecimal("0.001") }.keySet
    assert(boundary.nonEmpty,
      "no boundary cells at sf0.01 — the class test is vacuous")
    val diffs = fp.keys.filter(k => fp(k) != dec(k)).toSeq
    for (k <- diffs) {
      assert(math.abs(math.abs(fp(k) - dec(k)) - 0.01) < 1e-9,
        s"non-cent lane diff at $k: ${fp(k)} vs ${dec(k)}")
      assert(boundary.contains(k),
        s"lane diff OFF the boundary population at $k: ${fp(k)} vs ${dec(k)}" +
          s" (exact ${exact.get(k)})")
    }
  }

  test("NaN propagates and null-only groups stay null on the decimal lane") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(Double.NaN)),   // poisoned group
      ("b", None: Option[Double]),                 // null-only group
      ("c", Some(2.005)), ("c", Some(3.0))         // clean group
    ).toDF("k", "v")
    val rows = withLane {
      df.groupBy("k").agg(Cols.moneySum(col("v")).as("s"))
        .orderBy("k").collect()
    }
    assert(rows(0).getDouble(1).isNaN, "NaN poison must stay visible")
    assert(rows(1).isNullAt(1), "null-only group must stay null")
    assert(rows(2).getDouble(1) == 5.01, s"clean group: ${rows(2).getDouble(1)}")
  }
}
