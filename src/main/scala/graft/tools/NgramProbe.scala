package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    t("minhash_1")(println(graft.operators.TrainingData.qDedupMinhash(s, d).count()))
    t("minhash_2")(println(graft.operators.TrainingData.qDedupMinhash(s, d).count()))
    t("minhash_3")(println(graft.operators.TrainingData.qDedupMinhash(s, d).count()))
    s.stop()
  }
}
