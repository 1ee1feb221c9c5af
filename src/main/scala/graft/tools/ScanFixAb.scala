package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols
import graft.Tables._

/** Interleaved A/B for the seven round-10 scan-audit rewrites
  * (q_hll_merge n_partials fold; q_bm25 in-row tf; q_retention per-user
  * profile; q_active_users / q_resample checkpointed intermediates;
  * q_cdc_apply one-pass changelog; q_incremental_agg flag-grouped
  * split): per the repo's jitter doctrine (BASELINE.md; CubeAb /
  * EmbedPinAb / TopkGroupAb precedents), cross-run comparisons at
  * sub-2-second per-query magnitudes are NOT evidence — only a same-JVM
  * alternation where a degraded host window hits both arms equally.
  *
  * Arms per query: `old` = the r9 formulation (inlined below verbatim
  * from the pre-8a6ff2f sources), `new` = the declared operator as it
  * now stands. Both must return the identical row multiset
  * (`exceptAll` both ways) — the A/B is a cost comparison of PROVEN
  * EQUAL plans, never a correctness argument.
  *
  * The scan rewrites trade per-run corpus passes (the 100 TB cost) for,
  * in four of the seven, an eager `localCheckpoint` materialization
  * whose fixed job-submission overhead is real at bench SF. This tool
  * prices that trade honestly at sf0.1 so the BASELINE entry can state
  * both sides with measured numbers.
  *
  * Usage: runMain graft.tools.ScanFixAb [reps] [sfDir] [query ...]
  */
object ScanFixAb {

  // ---- r9 formulations, inlined verbatim (pre-8a6ff2f) ----

  private def oldHllMerge(s: SparkSession, d: String): DataFrame = {
    val K = 128
    val P = 2147483647L
    val bk = graft.functions.BottomKAgg.bottomK(s) _
    def est(sk: Column): Column =
      when(size(sk) < K, size(sk).cast("double"))
        .otherwise(lit((K - 1).toDouble) * lit(P.toDouble) /
          element_at(sk, K).cast("double"))
    val e = events(s, d)
      .withColumn("h", (col("user_id") * 2654435761L + 1409L) % P)
      .where(col("h").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("h"))
    val perDay = e.groupBy(col("event_type"), col("day"))
      .agg(bk(col("h"), K).as("sk"))
    val merged = perDay
      .select(col("event_type"), explode(col("sk")).as("h"))
      .groupBy(col("event_type")).agg(bk(col("h"), K).as("skm"))
    val nPart = perDay.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_partials"))
    val direct = e.groupBy(col("event_type")).agg(bk(col("h"), K).as("skd"))
    direct.join(merged, Seq("event_type")).join(nPart, Seq("event_type"))
      .select(col("event_type"),
        Cols.r2(est(col("skd"))).as("approx_direct"),
        Cols.r2(est(col("skm"))).as("approx_merged"),
        col("n_partials"),
        (col("skd") === col("skm")).as("merge_lossless"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  private def oldBm25(s: SparkSession, d: String): DataFrame = {
    val qTerms = Seq("spark", "hash", "join")
    val docs = documents(s, d)
    val dl = docs.select(col("doc_id"),
      Cols.sizeN(split(col("text"), " ")).cast("double").as("dl"))
    val corpus = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib", col("idf") * (col("tf") * 2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), Cols.r6(sum(col("contrib"))).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  private def oldRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val active = ev.select(col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("week")).distinct()
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(firsts, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        Cols.r6(col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  private def oldActiveUsers(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val mx = ud.agg(max(col("day")).as("mx"))
    val wau = ud
      .select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("mx"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau7"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    wau.join(dau, "day")
      .select(col("day"), col("dau"), col("wau7"),
        Cols.r6(col("dau").cast("double") /
          nullif(col("wau7"), lit(0L))).as("stickiness"))
      .orderBy("day")
  }

  private def oldResample(s: SparkSession, d: String): DataFrame = {
    val obs = events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(avg(col("value")).as("v"))
    val maxSpanHours =
      s.conf.get("spark.graft.resample.maxSpanHours", "8760").toInt
    val bounds = obs.agg(min(col("hr")).as("mn0"), max(col("hr")).as("mx"))
      .selectExpr(s"greatest(mn0, mx - interval $maxSpanHours hours) AS mn",
        "mx")
    val grid = obs.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("hr"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(obs, Seq("event_type", "hr"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(col("v").isNotNull, col("hr")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(when(col("v").isNotNull, col("hr")),
        ignoreNulls = true).over(wNext))
      .select(col("event_type"), Cols.epochUs(col("hr")).as("hr_us"),
        Cols.r6(when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((Cols.epochUs(col("hr")) - Cols.epochUs(col("pt"))) * lit(1.0) /
              (Cols.epochUs(col("nt")) - Cols.epochUs(col("pt")))))).as("value"),
        col("v").isNotNull.as("observed"))
      .orderBy("event_type", "hr_us")
  }

  private def oldCdcApply(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val m = col("o_orderkey") % 97
    val changes = base.where(m === 0).withColumn("op", lit("D"))
      .unionByName(base.where(m === 1)
        .withColumn("o_totalprice", Cols.r2(col("o_totalprice") * 1.1))
        .withColumn("op", lit("U")))
      .unionByName(base.where(m === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("op", lit("I")))
      .select(col("o_orderkey").as("c_key"), col("o_custkey").as("c_cust"),
        col("o_orderstatus").as("c_status"), col("o_totalprice").as("c_price"),
        col("op"))
    base.join(changes, col("o_orderkey") === col("c_key"), "full_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("c_key"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("c_cust"), col("o_custkey")).as("o_custkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("c_price"), col("o_totalprice")).as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  private def oldIncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val cut = broadcast(o.agg(
      date_sub(to_date(max(col("o_orderdate"))), 30).as("cut")))
    val oc = o.crossJoin(cut)
    def aggOf(df: DataFrame) = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sp"),
        min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"))
    val state = aggOf(oc.where(to_date(col("o_orderdate")) < col("cut")))
      .toDF("o_orderstatus", "n_s", "sp_s", "mn_s", "mx_s")
    val delta = aggOf(oc.where(to_date(col("o_orderdate")) >= col("cut")))
      .toDF("o_orderstatus", "n_d", "sp_d", "mn_d", "mx_d")
    state.join(delta,
        state("o_orderstatus") <=> delta("o_orderstatus"), "full")
      .select(coalesce(state("o_orderstatus"), delta("o_orderstatus"))
          .as("o_orderstatus"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_total"),
        coalesce(col("n_s"), lit(0L)).as("n_state"),
        coalesce(col("n_d"), lit(0L)).as("n_delta"),
        Cols.r2(coalesce(col("sp_s"), lit(0.0)) + coalesce(col("sp_d"), lit(0.0)))
          .as("total_price"),
        Cols.epochUs(least(coalesce(col("mn_s"), col("mn_d")),
          coalesce(col("mn_d"), col("mn_s")))).as("min_date_us"),
        Cols.epochUs(greatest(coalesce(col("mx_s"), col("mx_d")),
          coalesce(col("mx_d"), col("mx_s")))).as("max_date_us"))
      .orderBy("o_orderstatus")
  }

  // ---- batch-2 r9 formulations (the x2 bounded-rollup class) ----

  private def oldAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("day_value"), count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col("event_type"))
      .agg(avg(graft.Cols.nanNull(col("day_value"))).as("mu"),
        stddev_samp(graft.Cols.nanNull(col("day_value"))).as("sigma"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("z",
        Cols.r6((col("day_value") - col("mu")) / nullif(col("sigma"), lit(0.0))))
      .select(col("event_type"), col("day"),
        Cols.r2(col("day_value")).as("day_value"), col("n_events"),
        col("z"), (abs(col("z")) > 2.0).as("anomalous"))
      .orderBy("event_type", "day")
  }

  private def oldEwma(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("day_value"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = daily.where(col("day").isNotNull)
      .withColumn("xs", collect_list(col("day_value")).over(w))
      .withColumn("ewma", expr(
        "CASE WHEN size(xs) >= 1 THEN " +
          "aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1), " +
          "(acc, x) -> acc * 0.7 + 0.3 * x) END"))
      .select(col("event_type"), col("day"),
        Cols.r2(col("day_value")).as("day_value"), Cols.r6(col("ewma")).as("ewma"))
    val dayless = daily.where(col("day").isNull)
      .select(col("event_type"), col("day"),
        Cols.r2(col("day_value")).as("day_value"),
        lit(null).cast("double").as("ewma"))
    series.unionByName(dayless).orderBy("event_type", "day")
  }

  private def oldRfm(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
    val per = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice")).as("monetary0"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"),
        Cols.r2(col("monetary0")).as("monetary"))
    val qs = typedLit(Seq(0.25, 0.5, 0.75))
    val cuts = per.agg(
      percentile(col("recency_days"), qs).as("rc"),
      percentile(col("frequency"), qs).as("fc"),
      percentile(graft.Cols.nanNull(col("monetary").cast("double")), qs).as("mc"))
    def above(metric: Column, cutsArr: Column): Column = (1 to 3)
      .map(i => when(metric.cast("double") >
        Cols.r6(element_at(cutsArr, i)), 1L).otherwise(0L))
      .reduce(_ + _)
    per.crossJoin(broadcast(cuts))
      .withColumn("r_score", lit(1L) + above(col("recency_days"), col("rc")))
      .withColumn("f_score", lit(4L) - above(col("frequency"), col("fc")))
      .withColumn("m_score", lit(4L) - above(col("monetary"), col("mc")))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .drop("rc", "fc", "mc")
      .orderBy("o_custkey")
  }

  private def oldWinFrame(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(Cols.r2(sum(col("o_totalprice"))).as("day_rev"))
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
    series.unionByName(dayless).orderBy("day_us")
  }

  private def oldDateSpine(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val rev = li
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(Cols.r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"))
    val maxSpanDays =
      s.conf.get("spark.graft.datespine.maxSpanDays", "7300").toInt
    val days = li
      .agg(date_trunc("day", min(col("l_shipdate"))).as("lo0"),
        date_trunc("day", max(col("l_shipdate"))).as("hi"))
      .selectExpr(s"greatest(lo0, hi - interval $maxSpanDays days) AS lo",
        "hi")
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    days.join(rev, Seq("day"), "left")
      .select(Cols.epochUs(col("day")).as("day_us"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("day_us")
  }

  private def oldBigramPmi(s: SparkSession, d: String): DataFrame = {
    val big = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"))
        .as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val uni = graft.operators.TrainingData.allToks(s, d)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = big.agg(sum(col("c_ab")).as("n_big"))
      .crossJoin(uni.agg(sum(col("c")).as("n_uni")))
    big
      .join(uni.toDF("a", "c_a"), "a")
      .join(uni.toDF("b", "c_b"), "b")
      .crossJoin(broadcast(tot))
      .where(col("c_ab") >= 5)
      .withColumn("pmi", Cols.r6(log(
        (col("c_ab").cast("double") / col("n_big")) /
          ((col("c_a").cast("double") / col("n_uni"))
            * (col("c_b").cast("double") / col("n_uni"))))))
      .select(col("a"), col("b"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  private def oldSkyline(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def front(df: DataFrame, partition: Seq[Column]): DataFrame = {
      val ord = Seq(col("p_retailprice").asc, col("p_size").desc,
        col("p_partkey").asc)
      val w = (if (partition.isEmpty) Window.orderBy(ord: _*)
               else Window.partitionBy(partition: _*).orderBy(ord: _*))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("runmax", max(col("p_size")).over(w))
        .where(col("runmax").isNull || col("p_size") > col("runmax"))
        .drop("runmax")
    }
    val p = part(s, d)
      .where(col("p_retailprice").isNotNull && !isnan(col("p_retailprice"))
        && col("p_size").isNotNull)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))
    front(front(p, Seq(col("p_brand"))), Seq.empty)
      .select(col("p_partkey"), col("p_brand"),
        Cols.r2(col("p_retailprice")).as("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  private val pairs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_skyline" -> (oldSkyline _),
    "q_hll_merge" -> (oldHllMerge _),
    "q_bm25" -> (oldBm25 _),
    "q_retention" -> (oldRetention _),
    "q_active_users" -> (oldActiveUsers _),
    "q_resample" -> (oldResample _),
    "q_cdc_apply" -> (oldCdcApply _),
    "q_incremental_agg" -> (oldIncrementalAgg _),
    "q_anomaly" -> (oldAnomaly _),
    "q_ewma" -> (oldEwma _),
    "q_rfm" -> (oldRfm _),
    "q_win_frame" -> (oldWinFrame _),
    "q_date_spine" -> (oldDateSpine _),
    "q_bigram_pmi" -> (oldBigramPmi _))

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = pairs
      .filter { case (q, _) => only.isEmpty || only(q) }
      .map { case (q, oldFn) =>
        val newFn = graft.SparkEntry.queries(q)
        // equal-output gate first (also warms both arms)
        val a = oldFn(spark, sfDir)
        val b = newFn(spark, sfDir)
        val sameRows = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
        var oldT = List.empty[Double]
        var newT = List.empty[Double]
        for (_ <- 1 to reps) {
          val t0 = System.nanoTime()
          oldFn(spark, sfDir).count()
          oldT = (System.nanoTime() - t0) / 1e9 :: oldT
          val t1 = System.nanoTime()
          newFn(spark, sfDir).count()
          newT = (System.nanoTime() - t1) / 1e9 :: newT
        }
        def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
        val line = f""""$q":{"same_rows":$sameRows,"old_med":${med(oldT)}%.3f,"new_med":${med(newT)}%.3f,"new_over_old":${med(newT) / med(oldT)}%.3f,"old_min":${oldT.min}%.3f,"new_min":${newT.min}%.3f}"""
        println(s"AB $q: old ${f"${med(oldT)}%.3f"} new ${f"${med(newT)}%.3f"} " +
          s"ratio ${f"${med(newT) / med(oldT)}%.3f"} same_rows=$sameRows")
        line
      }
    println(s"""{"metric":"scan_fix_ab","sf":"$sfDir","reps":$reps,"queries":{${results.mkString(",")}}}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
