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

  /** Footer-schema cache (r15, guide §6 metadata caching): every
    * `spark.read.parquet` call without a schema runs a footer-inference
    * job before planning — one small job per table() call, hundreds per
    * bench pass (138 queries × reps × their tables). The SCHEMA of a
    * fixture table is immutable within a JVM, so read it from the footer
    * once per (dir, table) and pass it explicitly afterwards; the data
    * path (scan, pushdown, pruning) is untouched — this caches metadata
    * the way a lake catalog/manifest does at 100 TB, never rows. Keyed
    * per directory because the same table can ship different physical
    * types across fixture generations (see events below). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val cached = schemaCache.get((sfDir, name))
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent((sfDir, name), df.schema)
      df
    }
  }

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
