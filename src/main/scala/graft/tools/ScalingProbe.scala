package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** One-off SCALING-CURVE probe for the dedup family (not a declared query;
  * r4 verdict item 6): grow the sf0.1 documents corpus ×1/×2/×4 and check
  * that the candidate-bounded dedup operators grow near-linearly in wall
  * time and output.
  *
  * Growth model is SHARDS, not clones: copy `c` shifts doc_id by c·10⁷
  * (residues mod 10 preserved, so q_incremental_dedup's batch fraction
  * stays 10%) and suffixes every token with `_c`, so a copy reproduces the
  * original's internal near-dup structure WITHOUT becoming a near-dup of
  * it — the way a corpus actually grows (new similar-shaped data, not
  * byte-identical twins). Cross-copy docs still share interior character
  * shingles, whose document frequency doubles per factor — exactly the
  * common-shingle mass the PPJoin rarity-ordered prefix filter must keep
  * out of the candidate join for the scaling to stay linear. A naive ×2
  * clone corpus instead quadruples every clone group's TRUE pair count —
  * super-linear OUTPUT, which says nothing about candidate efficiency.
  *
  * Per (factor, query): cold time (includes building that corpus's cached
  * shingle/token assets), warm time (assets resident — the incremental
  * cost a long-lived service pays), and output rows. One JSON line each to
  * stdout; the curve is recorded in BASELINE.md.
  *
  * Usage: runMain graft.tools.ScalingProbe [sfDir] [workDir] [factors] [mode]
  * where `factors` is a comma-separated growth list (default "1,2,4";
  * e.g. "1,2,4,8" extends the curve a further octave) and `mode` is
  * `volume` (default) or `skew`; `volumebuild`/`skewbuild` write the
  * shard corpora and exit (for MinhashAb/SkewDiag reruns).
  *
  * SKEW mode (r5 verdict item 2): volume growth alone never tests the
  * 100 TB killer — Zipfian keys. Here each octave's new data concentrates
  * on a fixed hot head instead of spreading uniformly:
  *  - documents: copy c>0 suffixes tokens with `_c` as in volume mode
  *    EXCEPT every 4th token, which keeps its base form — so the shared
  *    head tokens' document frequency grows ×factor (Zipf head growth)
  *    while copies still aren't near-dups of each other (token Jaccard
  *    ≈ 0.14, far under every dedup θ). The rarity-ordered prefix filter
  *    must keep that common-shingle mass out of the candidate join.
  *  - events: copy c>0 shifts event_id and folds user_id into a 16-key
  *    hot pool — hot-key event mass doubles per octave while the tail
  *    stays fixed, exactly the one-user-with-10^8-events shape
  *    q_join_salted exists for (and q_attribution's per-user window).
  * After the growth curve, the top factor runs a salted-vs-plain
  * interleaved A/B on the hot corpus (broadcast disabled in both arms —
  * the at-100-TB shape where neither side fits an executor) and prints
  * the hottest key's row count plus whether AQE marked the plain join's
  * partitions skewed — the "where salting/AQE engaged" plan evidence.
  */
object ScalingProbe {

  private val Queries = Seq(
    "q_dedup_ngram", "q_dedup_minhash", "q_incremental_dedup",
    "q_substring_dup")

  private val SkewQueries = Seq(
    "q_dedup_ngram", "q_dedup_minhash", "q_substring_dup",
    "q_join_salted", "q_attribution")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-scaling"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B hook for probe-side experiments (e.g. GRAFT_NGRAM_BLOOM=false
    // isolates whether a cross-query anomaly follows the ngram plan change)
    sys.env.get("GRAFT_NGRAM_BLOOM")
      .foreach(v => spark.conf.set("spark.graft.ngram.verifyBloom", v))

    val factors =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4)
    val skew = args.length > 3 && args(3).startsWith("skew")
    val buildOnly = args.length > 3 && args(3).endsWith("build")
    val queries = if (skew) SkewQueries else Queries
    factors.foreach { f =>
      if (skew) buildSkewShards(spark, sfDir, s"$work/x$f", f)
      else buildShards(spark, sfDir, s"$work/x$f", f)
    }
    if (buildOnly) { spark.stop(); return }
    // JVM/codegen warm-up so the first factor's cold isn't charged session
    // init (warm against the first BUILT shard — the factor list may omit 1)
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q_dedup_exact")(spark, s"$work/x${factors.head}").count()

    factors.foreach { f =>
      val dir = s"$work/x$f"
      queries.foreach { q =>
        graft.operators.TrainingData.unpersistAll()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"""{"factor":$f,"query":"$q","mode":"${if (skew) "skew" else "volume"}","cold_sec":$cold%.2f,"warm_sec":$warm%.2f,"rows":$rows}""")
      }
    }
    if (skew) saltAb(spark, s"$work/x${factors.max}", reps = 3)
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }

  /** Salted-vs-plain interleaved A/B on the hot-key events corpus, plus
    * the plan evidence: hottest-key mass, and whether AQE flagged the
    * plain join's shuffle partitions as skewed. Broadcast is disabled in
    * BOTH arms — the honest 100 TB shape (a user-totals aggregate over a
    * 10^9-user corpus does not broadcast); both arms therefore shuffle,
    * and the question the A/B answers is whether salting's bounded
    * per-task key share is worth its 8× build-side replication once the
    * hot head dominates. Result identity is asserted every rep. */
  private def saltAb(spark: SparkSession, dir: String, reps: Int): Unit = {
    val hot = graft.Tables.events(spark, dir)
      .groupBy("user_id").count().orderBy(col("count").desc).limit(3)
      .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(", ")
    println(s"""{"salt_ab":"hottest user_id:events", "top3":"$hot"}""")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def plain = {
        val ev = graft.Tables.events(spark, dir)
        val agg = ev.groupBy(col("user_id"))
          .agg(graft.Cols.r2(sum(col("value"))).as("user_total"),
            count(lit(1)).as("user_events"))
        ev.join(agg, Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("user_total"), col("user_events"))
      }
      def salted = SparkEntry.queries("q_join_salted")(spark, dir)
      // warm both shapes once (parquet footers, codegen) before timing
      plain.count(); salted.count()
      (1 to reps).foreach { rep =>
        Seq("plain" -> (() => plain), "salted" -> (() => salted)).foreach {
          case (arm, mk) =>
            val t0 = System.nanoTime()
            val n = mk().count()
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"""{"salt_ab_rep":$rep,"arm":"$arm","sec":$dt%.2f,"rows":$n}""")
        }
      }
      val planStr = {
        val df = plain
        df.count() // let AQE finalize the adaptive plan
        df.queryExecution.executedPlan.toString
      }
      val skewMarked = planStr.contains("skew=true")
      println(s"""{"salt_ab":"aqe_skew_marked","plain_join":$skewMarked}""")
      // identity: the salted join must produce exactly the plain join's rows
      val diff = plain.exceptAll(salted).count() +
        salted.exceptAll(plain).count()
      println(s"""{"salt_ab":"identity","sym_diff_rows":$diff}""")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** workDir/documents.parquet = `factor` token-suffixed, id-shifted copies. */
  private[graft] def buildShards(
      spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val base = graft.Tables.documents(spark, sfDir)
    val copies = (0 until factor).map { c =>
      if (c == 0) base
      else {
        val txt = array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_$c"))), " ")
        base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          txt.as("text"), col("lang"), col("source"),
          length(txt).cast("long").as("n_chars"))
      }
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Skew-growth shards (see the class note): documents with Zipf-head
    * token growth, events with a 16-key hot user pool absorbing every
    * octave's new volume, plus a base copy of orders so q_attribution's
    * input dir is self-contained. */
  private[tools] def buildSkewShards(
      spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val docs = graft.Tables.documents(spark, sfDir)
    val docCopies = (0 until factor).map { c =>
      if (c == 0) docs
      else {
        // every 4th token keeps its base form: shared head tokens whose
        // document frequency grows with the factor (the Zipf head), the
        // rest suffixed so copies never become near-dups of each other
        val txt = array_join(
          zip_with(split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (t, i) => when(i % 4 === 0, t).otherwise(concat(t, lit(s"_$c")))),
          " ")
        docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          txt.as("text"), col("lang"), col("source"),
          length(txt).cast("long").as("n_chars"))
      }
    }
    docCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val ev = graft.Tables.events(spark, sfDir)
    val evCopies = (0 until factor).map { c =>
      if (c == 0) ev
      else ev.withColumn("event_id", col("event_id") + lit(c * 1000000000L))
        .withColumn("user_id", pmod(col("user_id"), lit(16L)))
    }
    evCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    graft.Tables.orders(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }
}
