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
  * Usage: runMain graft.tools.ScalingProbe [sfDir] [workDir] [factors]
  * where `factors` is a comma-separated growth list (default "1,2,4";
  * e.g. "1,2,4,8" extends the curve a further octave).
  */
object ScalingProbe {

  private val Queries = Seq(
    "q_dedup_ngram", "q_dedup_minhash", "q_incremental_dedup",
    "q_substring_dup")

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
    factors.foreach(f => buildShards(spark, sfDir, s"$work/x$f", f))
    // JVM/codegen warm-up so the first factor's cold isn't charged session
    // init (warm against the first BUILT shard — the factor list may omit 1)
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q_dedup_exact")(spark, s"$work/x${factors.head}").count()

    factors.foreach { f =>
      val dir = s"$work/x$f"
      Queries.foreach { q =>
        graft.operators.TrainingData.unpersistAll()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"""{"factor":$f,"query":"$q","cold_sec":$cold%.2f,"warm_sec":$warm%.2f,"rows":$rows}""")
      }
    }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }

  /** workDir/documents.parquet = `factor` token-suffixed, id-shifted copies. */
  private[tools] def buildShards(
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
}
