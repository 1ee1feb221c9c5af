package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders.
  *
  * Every declared query receives `(SparkSession, sfDir)` and reads its inputs
  * through here, so the scan always goes through `spark.read.parquet` — the
  * schema comes from the parquet footer (no inference pass) and Catalyst gets
  * a plain `LogicalRelation` it can push filters/column pruning into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark 4 parquet reader rejects by default. We read nanos as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds at
    * the source boundary — the identical ns→µs truncation DuckDB applies via
    * `CAST(ts AS TIMESTAMP)`, so oracle parity holds. Downstream operators
    * always see a plain `TimestampType` column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div` — ns since epoch overflows double precision
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
