package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg

/** Production-lane MinHash A/B (r6 verdict item 2): the declared surface
  * runs the K=8 / b=2×r=4 sketch whose candidate recall at J=0.8 is
  * analytically 1−(1−J⁴)² ≈ 0.65; production dedup is supposed to run the
  * same one-buffer aggregate at 64–128 lanes. This tool MEASURES that
  * claim end-to-end on the skew-shard corpus (ScalingProbe skew mode,
  * default /tmp/graft-scaling/x4): (k, rows-per-band) arms interleaved,
  * same vocab, same banding discipline (r rows per band, k/r bands,
  * lowest-matching-band dedup, carried signatures), with PLANTED
  * ground-truth twins. Round-7 arms add the production r/b retune —
  * (60,5) and (64,8) lift the band S-curve threshold (1/b)^(1/r) from
  * 0.50 to 0.61 / 0.77 to shed sub-θ candidate mass.
  *
  * Twin protocol (the AnnRecallSpec idea, Jaccard edition): every 37th doc
  * gets one twin built from its DISTINCT token set — keep the first
  * m = round(2nJ/(1+J)) tokens, replace the rest with fresh unique tokens,
  * so the realized set-Jaccard is exactly m/(2n−m) ≈ J with
  * J ∈ {0.6, 0.7, 0.8, 0.9, 0.95} cycled by doc_id. Signatures are pure
  * functions of the token SET, so recall measured on twin pairs is the
  * sketch-tier recall, uncontaminated by corpus near-dup ambiguity.
  *
  * Per (rep, K) one JSON line: wall seconds for signature→bands→join→
  * dedup→count, candidate-pair count, per-J-bin band recall (pair agreed
  * on ≥1 band) and post-threshold recall (est_jac ≥ 0.75). Recorded in
  * BASELINE.md; not part of the declared contract.
  *
  * Usage: runMain graft.tools.MinhashAb [shardDir]
  */
object MinhashAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-scaling/x4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val TwinShift = 100000000L // shard shift is c·10⁷, c ≤ 7 — disjoint
    val targets = Array(0.60, 0.70, 0.80, 0.90, 0.95)

    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    // Twins from the distinct token set (minhash input domain).
    val twins = base.where(pmod(col("doc_id"), lit(37L)) === 3L)
      .withColumn("dtoks", array_distinct(split(col("text"), " ")))
      .withColumn("n", size(col("dtoks")))
      .where(col("n") >= 8)
      .withColumn("j_target",
        element_at(typedLit(targets.toSeq), (pmod(col("doc_id"), lit(5L)) + 1).cast("int")))
      .withColumn("m",
        round(lit(2.0) * col("n") * col("j_target") / (lit(1.0) + col("j_target")))
          .cast("int"))
      .withColumn("twin_toks", concat(
        slice(col("dtoks"), lit(1), col("m")),
        transform(sequence(lit(1), col("n") - col("m")),
          i => concat_ws("_", lit("twk"), col("doc_id"), i))))
      .select((col("doc_id") + lit(TwinShift)).as("doc_id"), col("lang"),
        array_join(col("twin_toks"), " ").as("text"),
        col("j_target"),
        (col("m").cast("double") / (lit(2) * col("n") - col("m"))).as("true_jac"))
    val planted = twins.select(
        (col("doc_id") - lit(TwinShift)).as("a_id"), col("doc_id").as("b_id"),
        col("j_target"), col("true_jac"))
      .persist()
    val corpus = base.unionByName(
        twins.select(col("doc_id"), col("lang"), col("text")))
      .persist()
    val nPlanted = planted.count()
    log(spark, s"""{"step":"setup","dir":"$d","docs":${corpus.count()},"planted":$nPlanted}""")

    // Shared assets (both arms): distinct doc-tokens and the dense vocab —
    // the TrainingData.vocab discipline (range sort + zipWithIndex, never a
    // one-task window), inlined against the planted corpus.
    val toks = corpus
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .persist()
    val sortedToks = toks.select(col("tok")).distinct()
      .orderBy(col("tok")).as[String].rdd
    val vocab = spark.createDataFrame(
        sortedToks.zipWithIndex().map { case (t, i) => (t, i + 1L) })
      .toDF("tok", "tok_id").persist()
    val tv = toks.join(vocab, "tok")
      .select(col("doc_id"), col("lang"), col("tok_id")).persist()
    tv.count() // materialize shared assets outside the timed region

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def runArm(k: Int, r: Int): Unit = {
      val bandsN = k / r
      val sigK = MinHashAgg.minhashSigK(spark, k) _
      val mh = tv.groupBy(col("doc_id"), col("lang")).agg(sigK(col("tok_id")).as("sig"))
      val bandStructs = (0 until bandsN).map { j =>
        struct((lit(j).as("band") +:
          (0 until r).map(i => col("sig")(r * j + i).as(s"x$i"))): _*)
      }
      val bands = mh.select(col("doc_id"), col("lang"),
          explode(array(bandStructs: _*)).as("b"), col("sig"))
        .select((Seq(col("doc_id"), col("lang"), col("b.band").as("band")) ++
          (0 until r).map(i => col(s"b.x$i").as(s"x$i")) :+ col("sig")): _*)
      def bandMatch(j: Int) = (0 until r)
        .map(i => col("siga")(r * j + i) === col("sigb")(r * j + i))
        .reduce(_ && _)
      val earlierMatch = (0 until bandsN - 1)
        .map(j => when(lit(j) < col("band") && bandMatch(j), 1).otherwise(0))
        .reduce(_ + _)
      val nMatch = (0 until k)
        .map(i => when(col("siga")(i) === col("sigb")(i), 1).otherwise(0))
        .reduce(_ + _)
      val xCols = (0 until r).map(i => s"x$i")
      val colNames = (id: String, sig: String) =>
        Seq(id, "lang", "band") ++ xCols :+ sig
      val pairs = bands.toDF(colNames("a_id", "siga"): _*)
        .join(bands.toDF(colNames("b_id", "sigb"): _*),
          Seq("lang", "band") ++ xCols)
        .where(col("a_id") < col("b_id"))
        .where(earlierMatch === 0)
        .withColumn("est_jac", nMatch.cast("double") / k.toDouble)
      // One streaming aggregation pass — never materialize the pair set
      // (13M pairs × two carried 64-lane signatures OOMed a persist()).
      val ((nCand, nThresh), sec) = time {
        val r = pairs.agg(count(lit(1)),
          sum(when(col("est_jac") >= 0.75, 1L).otherwise(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      // Recall per J bin against the planted twins (recomputes the band
      // join — untimed; the sig columns are dropped before the join so
      // only (a_id, b_id, est_jac) shuffles).
      val found = planted.join(pairs.select(col("a_id"), col("b_id"), col("est_jac")),
          Seq("a_id", "b_id"), "left")
      val bins = found.groupBy(col("j_target"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("est_jac").isNotNull, 1).otherwise(0)).as("band_hit"),
          sum(when(col("est_jac") >= 0.75, 1).otherwise(0)).as("thr_hit"))
        .orderBy("j_target").collect()
      val binJson = bins.map { r =>
        val j = r.getDouble(0); val n = r.getLong(1)
        f""""${j}%.2f":{"n":$n,"band_recall":${r.getLong(2).toDouble / n}%.3f,"thr_recall":${r.getLong(3).toDouble / n}%.3f}"""
      }.mkString("{", ",", "}")
      log(spark, f"""{"step":"arm","k":$k,"r":$r,"bands":$bandsN,"sec":$sec%.2f,"cand_pairs":$nCand,"thr_pairs":$nThresh,"bins":$binJson}""")
    }

    // Arms as (k, rows-per-band): (8,4)/(64,4) are the round-7 anchors;
    // (60,5) and (64,8) measure the predicted production retune — lifting
    // the band S-curve threshold (1/b)^(1/r) from 0.50 toward the dedup θ
    // sheds sub-θ candidate mass without (60,5) or with (64,8) a measured
    // recall cost at J=0.8. Override via SPARK_GRAFT_MINHASH_ARMS="k:r,k:r".
    val arms = sys.env.get("SPARK_GRAFT_MINHASH_ARMS")
      .map(_.split(",").toSeq.map { a =>
        val Array(k, r) = a.split(":"); (k.trim.toInt, r.trim.toInt) })
      .getOrElse(Seq((8, 4), (64, 4), (60, 5), (64, 8)))
    for (rep <- 1 to 3; (k, r) <- arms) {
      log(spark, s"""{"step":"rep","rep":$rep,"k":$k,"r":$r}""")
      runArm(k, r)
    }
    spark.stop()
  }

  private def log(s: SparkSession, line: String): Unit = println(line)
}
