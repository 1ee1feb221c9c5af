package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Scratch profiler (not part of the contract). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val theta = 0.8
    val shingles = graft.functions.ShingleHashes.shingles(s) _
    val docsSh = documents(s, d).repartition(32)
      .where(length(col("text")) >= 5)
      .select(col("doc_id"), col("lang"), shingles(col("text"), 5).as("shs"))
      .persist()
    t("materialize_kernel")(println(docsSh.count()))
    t("full_query_1")(println(graft.operators.LlmPipeline.qDedupNgram(s, d).count()))
    t("full_query_2")(println(graft.operators.LlmPipeline.qDedupNgram(s, d).count()))
    val sh = docsSh.select(col("doc_id"), col("lang"), size(col("shs")).as("n"),
      explode(col("shs")).as("sh"))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("dfreq"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("dfreq").asc, col("sh").asc)
    val prefix = sh.join(broadcast(dfreq), "sh")
      .withColumn("r", row_number().over(wOrd))
      .where(col("r") <= col("n") - ceil(lit(theta) * col("n")) + 1)
      .select(col("doc_id"), col("lang"), col("sh"), col("n"), col("r"))
    t("prefix_1")(println(prefix.count()))
    t("prefix_2")(println(prefix.count()))
    val alpha = ceil(lit(theta / (1 + theta)) * (col("na") + col("nb")))
    val cand = prefix.toDF("a_id", "lang", "sh", "na", "ra")
      .join(prefix.toDF("b_id", "lang", "sh", "nb", "rb"), Seq("lang", "sh"))
      .where(col("a_id") < col("b_id")
        && col("nb") * lit(theta) <= col("na") && col("na") * lit(theta) <= col("nb")
        && lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
      .select(col("lang"), col("a_id"), col("b_id")).distinct()
    t("cand")(println(cand.count()))
    s.stop()
  }
}
