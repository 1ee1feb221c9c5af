package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Measurement probe for the streaming corpus-ingestion dedup loop
  * ([[graft.streaming.Streams.dedupIngestBatch]]): feed the REAL
  * documents corpus through N sequential micro-batches into one asset
  * directory and time each batch as the history grows from empty to the
  * full corpus behind it.
  *
  * What the numbers must show for the O(batch)-per-day claim to hold:
  * per-batch wall roughly flat (the probe joins are batch-bounded; the
  * history side only grows as a SCAN of pre-bucketed parquet assets,
  * never as a self-join), and the status mix shifting toward dup as the
  * history accumulates the corpus's planted twins — evidence the
  * history probe actually bites on real data rather than admitting
  * everything.
  *
  * Usage: runMain graft.tools.IngestProbe [sfDir] [nBatches] [k] [r]
  * (k/r set the `spark.graft.minhash.*` dials — e.g. `60 5` probes the
  * θ=0.8 production lane geometry through the identical loop)
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val dials = args.drop(2).take(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (dials.length == 2) {
      spark.conf.set("spark.graft.minhash.k", dials(0).toString)
      spark.conf.set("spark.graft.minhash.r", dials(1).toString)
    }

    val assetDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-probe").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    for (b <- 0 until nBatches) {
      val batch = docs.where(pmod(col("doc_id"), lit(nBatches)) === b)
      val t0 = System.nanoTime()
      val st = Streams.dedupIngestBatch(batch, assetDir, b.toLong)
      val mix = st.groupBy(col("status")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      val n = mix.values.sum
      val mixJson = mix.toSeq.sorted
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      println(f"""{"metric":"ingest_probe","batch":$b,"sec":$dt%.2f,"docs":$n,"docs_per_sec":${n / dt}%.0f,"mix":{$mixJson}}""")
    }
    spark.stop()
  }
}
