package graft.tools

import org.apache.spark.sql.SparkSession

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
    t("ngram_cold")(println(graft.operators.LlmPipeline.qDedupNgram(s, d).count()))
    t("ngram_warm")(println(graft.operators.LlmPipeline.qDedupNgram(s, d).count()))
    s.stop()
  }
}
