package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.TrainingData

/** Scratch diagnostic for the two super-linear skew-octave cells
  * (ScalingProbe skew mode): q_dedup_ngram's candidate growth and
  * q_dedup_minhash's output excess. Round-6 findings driven from here:
  * the degenerate no-wrap MinHash family (all est_jac = 1.0 at ×8) and
  * the saturated 2^16 rarity sketch (collision background swamping the
  * copy-local-vs-shared DF distinction). After the fixes it serves as the
  * re-measurement harness: interleaved sketchBits A/B on the ngram path
  * and the minhash cross-copy breakdown. Not part of the contract.
  *
  * Usage: runMain graft.tools.SkewDiag [shardDir]
  */
object SkewDiag {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-scaling/x8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Interleaved sketchBits A/B on the ngram path. The prefix cache is
    // keyed per corpus snapshot, so each arm must drop the shared caches
    // to rebuild its own prefix table — the timed unit is therefore
    // "cold assets, given a warm JVM", identical for both arms.
    for (rep <- 1 to 3; bits <- Seq("16", "auto");
         if !sys.env.get("CAND_COUNT").contains("1")) {
      TrainingData.unpersistAll()
      spark.conf.set("spark.graft.ngram.sketchBits", bits)
      val (n, t) = time(SparkEntry.queries("q_dedup_ngram")(spark, d).count())
      println(f"""{"step":"ngram","bits":"$bits","rep":$rep,"sec":$t%.2f,"rows":$n}""")
    }
    spark.conf.unset("spark.graft.ngram.sketchBits")

    // Candidate-pair count per shard factor: an inline replica of the
    // qDedupNgram candidate stage (same kernels, same predicates — may
    // drift if the operator changes; scratch-tool risk accepted) so the
    // BASELINE.md scaling claim rests on the actual candidate volume,
    // not an inference from wall times.
    if (sys.env.get("CAND_COUNT").contains("1")) {
      val theta = 0.8
      val factors = sys.env.get("CAND_FACTORS")
        .map(_.split(",").toSeq.map(_.trim.toInt))
        .getOrElse(Seq(1, 2, 4, 8))
      factors.foreach { f =>
        val dir = d.replaceAll("x\\d+$", s"x$f")
        val sh = graft.functions.ShingleHashes.shingles(spark) _
        val docsSh = graft.Tables.documents(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism)
          .where(length(col("text")) >= 5)
          .select(col("doc_id"), col("lang"), sh(col("text"), 5).as("shs"))
          .persist()
        // coalesce: sum over an empty/filtered-out shard is NULL
        val instances = docsSh
          .agg(coalesce(sum(size(col("shs"))), lit(0L))).head().getLong(0)
        Seq(16, 21).foreach { bits =>
          val freqs = docsSh
            .select(graft.functions.BucketHistAgg.hist(spark)(col("shs"), bits))
            .head().getSeq[Int](0).toArray
          val pf = graft.functions.PrefixByFreq.prefix(spark)(col("shs"), freqs, theta)
          val prefix = docsSh.select(col("doc_id"), col("lang"),
              size(col("shs")).as("n"), posexplode(pf).as(Seq("r0", "sh")))
            .select(col("doc_id"), col("lang"), col("sh"), col("n"),
              (col("r0") + 1).as("r"))
          val alpha = ceil(lit(theta / (1 + theta)) * (col("na") + col("nb")) - lit(1e-9))
          val aShort = col("ra") <=
            col("na") - ceil(lit(2 * theta / (1 + theta)) * col("na") - lit(1e-9)) + 1
          val (nc, tc) = time(prefix.toDF("a_id", "lang", "sh", "na", "ra").where(aShort)
            .join(prefix.toDF("b_id", "lang", "sh", "nb", "rb"), Seq("lang", "sh"))
            .where((col("na") < col("nb")
                || (col("na") === col("nb") && col("a_id") < col("b_id")))
              && col("nb") * lit(theta) <= col("na")
              && lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
            .select(least(col("a_id"), col("b_id")), greatest(col("a_id"), col("b_id")))
            .distinct().count())
          println(f"""{"step":"cand_count","factor":$f,"bits":$bits,"instances":$instances,"cands":$nc,"sec":$tc%.2f}""")
        }
        docsSh.unpersist()
      }
    }

    if (sys.env.get("CAND_COUNT").contains("1")) { spark.stop(); return }

    // Minhash output: cross-copy vs within-copy pair mass + est dist.
    // Skew copies shift doc_id by c*10^7.
    TrainingData.unpersistAll()
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, d)
      .withColumn("cross", (col("a_id") / lit(10000000L)).cast("long") =!=
        (col("b_id") / lit(10000000L)).cast("long"))
    val (agg, tmh) = time(mh.groupBy(col("cross"), col("est_jac"))
      .count().orderBy("cross", "est_jac").collect())
    println(f"""{"step":"minhash_breakdown","sec":$tmh%.2f}""")
    agg.foreach(r => println(
      s"""{"cross":${r.getBoolean(0)},"est_jac":${r.getDouble(1)},"pairs":${r.getLong(2)}}"""))
    spark.stop()
  }
}
