package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The vecbin DSv2 connector end-to-end: lossless roundtrip, record-aligned
  * split planning, footer min/max file skipping, column pruning reaching the
  * scan, truncate-overwrite, and write-side schema/dim validation. */
class VecBinSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.VecBinSource"
  private def freshDir(): String =
    Files.createTempDirectory("vecbin-spec").toString

  private def emb(d: String): DataFrame =
    Tables.embeddings(spark, d).select("vec_id", "label", "embedding")

  private val d = sfDir("sf0.001")

  test("write -> read roundtrip is lossless, all 64 dims bit-exact") {
    val out = freshDir()
    emb(d).write.format(fmt).mode("overwrite").save(out)
    val back = spark.read.format(fmt).load(out)
    assert(back.count() == emb(d).count())
    assert(back.except(emb(d)).isEmpty && emb(d).except(back).isEmpty)
  }

  test("one big file fans out into record-aligned splits") {
    val out = freshDir()
    emb(d).repartition(1).write.format(fmt).mode("overwrite").save(out)
    val n = emb(d).count()
    val split = spark.read.format(fmt)
      .option("maxRecordsPerSplit", "7").load(out)
    assert(split.rdd.getNumPartitions == ((n + 6) / 7),
      s"expected ceil($n/7) splits, got ${split.rdd.getNumPartitions}")
    assert(split.count() == n)
    // sanity: the split reader sees every row exactly once
    assert(split.agg(sum("vec_id")).head.getLong(0)
      == emb(d).agg(sum("vec_id")).head.getLong(0))
  }

  test("footer min/max skips files outside a vec_id range predicate") {
    val out = freshDir()
    // range-partitioned write -> each file covers a disjoint vec_id range
    emb(d).repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.format(fmt).mode("overwrite").save(out)
    val all = spark.read.format(fmt).load(out)
    assert(all.rdd.getNumPartitions == 4)
    val filtered = all.where(col("vec_id") < 10)
    assert(filtered.rdd.getNumPartitions == 1,
      "only the file whose [min,max] overlaps vec_id<10 should be planned")
    assert(filtered.count() == emb(d).where(col("vec_id") < 10).count())
  }

  test("column pruning reaches the vecbin scan") {
    val out = freshDir()
    emb(d).write.format(fmt).mode("overwrite").save(out)
    val slim = spark.read.format(fmt).load(out).select("vec_id", "label")
    val p = slim.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("cols=vec_id,label"), p)
    assert(slim.count() == emb(d).count())
  }

  test("overwrite truncates: old files never leak into the new table") {
    val out = freshDir()
    emb(d).write.format(fmt).mode("overwrite").save(out)
    val half = emb(d).where(col("vec_id") % 2 === 0)
    half.write.format(fmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out).count() == half.count())
  }

  test("count/min/max aggregate answers from footers without scanning records") {
    val out = freshDir()
    emb(d).repartition(3).write.format(fmt).mode("overwrite").save(out)
    val table = spark.read.format(fmt).load(out)
    val agg = table.agg(count(lit(1)), min("vec_id"), max("vec_id"))
    val p = agg.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("statsOnly"), s"agg must be answered from metadata:\n$p")
    val row = agg.head()
    val n = emb(d).count()
    assert(row.getLong(0) == n && row.getLong(1) == 0L && row.getLong(2) == n - 1)
    // a filtered aggregate must NOT take the stats path (filters stay residual)
    val filtered = table.where(col("label") > 0).agg(count(lit(1)))
    val fp = filtered.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!fp.contains("statsOnly"), fp)
    assert(filtered.head().getLong(0)
      == emb(d).where(col("label") > 0).count())
  }

  test("non-default dim option flows through write and read; wrong dim fails fast") {
    val out = freshDir()
    val df = Seq((1L, 0, Array.fill(8)(1.5f)), (2L, 1, Array.tabulate(8)(_.toFloat)))
      .toDF("vec_id", "label", "embedding")
    df.write.format(fmt).option("dim", "8").mode("overwrite").save(out)
    val back = spark.read.format(fmt).option("dim", "8").load(out)
    assert(back.count() == 2)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
    // a mismatched reader dim is caught by the footer check at plan time
    val e = intercept[Exception] {
      spark.read.format(fmt).load(out).collect() // default dim 64
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("dim"))
  }

  test("special floats roundtrip bit-exactly: NaN, infinities, -0.0, denormals") {
    val out = freshDir()
    val specials = Array(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, -0.0f, 0.0f, Float.MinPositiveValue,
      -Float.MinPositiveValue, Float.MaxValue)
    val df = Seq((1L, 0, specials)).toDF("vec_id", "label", "embedding")
    df.write.format(fmt).option("dim", "8").mode("overwrite").save(out)
    val got = spark.read.format(fmt).option("dim", "8").load(out)
      .select("embedding").head.getSeq[Float](0)
    // bit-level compare: SQL equality would conflate -0.0 with 0.0 and
    // needs special NaN handling — raw bits prove true losslessness
    assert(got.map(java.lang.Float.floatToRawIntBits).toSeq
      == specials.map(java.lang.Float.floatToRawIntBits).toSeq)
  }

  test("write rejects wrong-dim vectors and wrong schemas") {
    val out = freshDir()
    val badDim = emb(d).withColumn("embedding", slice(col("embedding"), 1, 3))
    val e1 = intercept[Exception] {
      badDim.write.format(fmt).mode("overwrite").save(out)
    }
    assert(e1.getMessage.contains("dims") ||
      Option(e1.getCause).exists(_.getMessage.contains("dims")))
    val e2 = intercept[Exception] {
      emb(d).select("vec_id", "label") // missing embedding column
        .write.format(fmt).mode("overwrite").save(out)
    }
    // Spark's own table-compat check fires first (INCOMPATIBLE_DATA_FOR_TABLE
    // against the vecbin table schema); our builder require is the backstop
    assert(e2.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE") ||
      e2.getMessage.contains("schema"))
  }
}
