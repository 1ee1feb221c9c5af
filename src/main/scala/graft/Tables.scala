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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations (rounds 1–5) and plain µs in others (round 6+). The nanos
    * form is rejected by the Spark 4 reader by default, so we always set
    * `spark.sql.legacy.parquet.nanosAsLong` and then branch on the schema
    * that actually materialized: a long column gets the ns→µs truncation
    * at the source boundary (the identical truncation DuckDB applies via
    * `CAST(ts AS TIMESTAMP)`, so oracle parity holds); a native timestamp
    * passes through. Downstream operators always see a timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The conf is set once at session build in every repo-owned harness
    // (Verify/Bench/spec wrapper); this guard only fires for externally
    // built sessions (the driver's smoke session) and only writes when the
    // value actually differs, so concurrent loaders never race on a
    // global-conf write (r6 verdict item 3).
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
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
