package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for q_dedup_ngram — not part of the library
  * surface; run with `runMain graft.tools.ProfileNgram`. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE ${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }

    val theta = 0.8
    val shingles = graft.functions.ShingleHashes.shingles(s) _
    val docsSh = graft.Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .where(length(col("text")) >= 5)
      .select(col("doc_id"), col("lang"), shingles(col("text"), 5).as("shs"))
      .persist()
    time("docsSh populate")(docsSh.count())

    val sketchBits = sys.env.getOrElse("SKETCH_BITS", "16").toInt
    val freqs = time("sketch collect") {
      docsSh.select(graft.functions.BucketHistAgg.hist(s)(col("shs"), sketchBits))
        .head().getSeq[Int](0).toArray
    }
    val pf = graft.functions.PrefixByFreq.prefix(s)(col("shs"), freqs, theta)
    val prefix = docsSh.select(col("doc_id"), col("lang"),
        size(col("shs")).as("n"), posexplode(pf).as(Seq("r0", "sh")))
      .select(col("doc_id"), col("lang"), col("sh"), col("n"),
        (col("r0") + 1).as("r"))
      .persist()
    time("prefix populate")(prefix.count())

    val alpha = ceil(lit(theta / (1 + theta)) * (col("na") + col("nb")))
    val aShort = col("ra") <=
      col("na") - ceil(lit(2 * theta / (1 + theta)) * col("na") - lit(1e-9)) + 1
    val cand = prefix.toDF("a_id", "lang", "sh", "na", "ra").where(aShort)
      .join(prefix.toDF("b_id", "lang", "sh", "nb", "rb"), Seq("lang", "sh"))
      .where((col("na") < col("nb")
          || (col("na") === col("nb") && col("a_id") < col("b_id")))
        && col("nb") * lit(theta) <= col("na") && col("na") * lit(theta) <= col("nb")
        && lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
      .select(col("lang"), least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id")).distinct()
      .persist()
    val nc = time("candidate join")(cand.count())
    println(s"candidates: $nc")
    val raw = time("raw matches") {
      prefix.toDF("a_id", "lang", "sh", "na", "ra").where(aShort)
        .join(prefix.toDF("b_id", "lang", "sh", "nb", "rb"), Seq("lang", "sh"))
        .count()
    }
    println(s"raw: $raw")
    val rawNoFilter = time("raw matches sym") {
      prefix.toDF("a_id", "lang", "sh", "na", "ra")
        .join(prefix.toDF("b_id", "lang", "sh", "nb", "rb"), Seq("lang", "sh"))
        .count()
    }
    println(s"rawsym: $rawNoFilter")

    val interCount = graft.functions.SortedIntersectCount.interCount(s) _
    val arr = docsSh.select(col("doc_id"), col("shs"))
    val res = cand
      .join(arr.toDF("a_id", "sha"), "a_id")
      .join(arr.toDF("b_id", "shb"), "b_id")
      .withColumn("c", interCount(col("sha"), col("shb")))
      .withColumn("jac", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")).cast("double"))
      .where(col("jac") >= theta)
    time("verify")(res.count())

    // end-to-end uncached, like Bench sees it (fresh session caches aside)
    graft.operators.TrainingData.unpersistAll()
    docsSh.unpersist(); prefix.unpersist(); cand.unpersist()
    time("end-to-end via SparkEntry")(
      graft.SparkEntry.queries("q_dedup_ngram")(s, d).count())
    s.stop()
  }
}
