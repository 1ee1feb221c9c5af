package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

/** EMPTY-INPUT TOTALITY: every declared query must execute (not crash) on a
  * corpus where every fixture table exists with its real schema and ZERO
  * rows. At 100 TB this is not an edge case — a partition-pruned read, a
  * date filter past the watermark, or an upstream quality gate routinely
  * hands an operator no rows at all, and "works on data, throws on empty"
  * operators take down exactly the scheduled runs nobody is watching.
  * Rows are free to be zero; throwing is the only failure. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty-corpus").toString
    // the events fixture stores TIMESTAMP(NANOS); read its schema the way
    // Tables.events does (nanos as long — the long→timestamp truncation
    // then happens at the source boundary on the empty frame too)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val schema = spark.read.parquet(s"${sfDir("sf0.001")}/$t.parquet").schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name is total on the all-empty corpus") {
      fn(spark, emptyDir).collect()
    }
  }
}
