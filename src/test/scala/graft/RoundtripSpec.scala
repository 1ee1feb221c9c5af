package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial round-trip checks for the text formats behind
  * q_csv/json_roundtrip: the fixture strings are benign, so these crafted
  * rows prove the write→read cycle survives delimiters, quotes, escapes,
  * unicode, negative/extreme doubles, and nulls — the values a real corpus
  * WILL contain. */
class RoundtripSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-roundtrip-spec").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("x", DoubleType)))

  private def nasty = {
    import spark.implicits._
    Seq(
      (0L, "plain", 1.5),
      (1L, "comma, inside", -0.0),
      (2L, "quote \" and 'single'", 1e-300),
      (3L, "tab\tand\nnewline", -1.7976931348623157e308),
      (4L, "unicode: üñïçødé — §", 0.1 + 0.2), // 0.30000000000000004
      (5L, null.asInstanceOf[String], Double.MaxValue),
      (6L, "trailing space ", 1234.5678901234567)
    ).toDF("id", "s", "x")
  }

  test("CSV write→read with explicit schema is lossless on adversarial rows") {
    val out = tmp() + "/csv"
    // same write options as qCsvRoundtrip (writer-side trimming OFF);
    // multiLine on read because row 3 embeds a quoted newline — the
    // non-splittable-read trade-off the production Scaladoc documents
    nasty.write.option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    val back = spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true")
      .csv(out).orderBy("id").collect()
    val orig = nasty.orderBy("id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      // CSV cannot distinguish null from empty by default — both sides null here
      assert(b.getLong(0) == o.getLong(0))
      assert((b.isNullAt(1) && o.isNullAt(1)) || b.getString(1) == o.getString(1),
        s"row ${o.getLong(0)}: '${b.get(1)}' != '${o.get(1)}'")
      assert(java.lang.Double.compare(b.getDouble(2), o.getDouble(2)) == 0
        || (b.getDouble(2) == 0.0 && o.getDouble(2) == 0.0), // -0.0 sign may drop
        s"row ${o.getLong(0)}: ${b.getDouble(2)} != ${o.getDouble(2)}")
    }
  }

  test("XML write→read escapes markup-significant characters losslessly") {
    import spark.implicits._
    // markup chars are XML's CSV-comma equivalent: they MUST entity-escape
    val rows = Seq(
      (0L, "plain", 1.5),
      (1L, "angle <brackets> & ampersand", -0.0),
      (2L, "entity-looking &amp; &lt; literal", 1e-300),
      (3L, "unicode: üñïçødé — §", 0.30000000000000004),
      (4L, "quote \" apostrophe '", 1234.5678901234567)
    ).toDF("id", "s", "x")
    val out = tmp() + "/xml"
    rows.write.option("rowTag", "row").xml(out)
    val back = spark.read.schema(schema).option("rowTag", "row").xml(out)
      .orderBy("id").collect()
    val orig = rows.orderBy("id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getString(1) == o.getString(1),
        s"row ${o.getLong(0)}: '${b.getString(1)}' != '${o.getString(1)}'")
      assert(java.lang.Double.compare(b.getDouble(2), o.getDouble(2)) == 0
        || (b.getDouble(2) == 0.0 && o.getDouble(2) == 0.0))
    }
  }

  test("JDBC read pushes filters into the database scan") {
    val db = tmp() + "/derbydb"
    val url = s"jdbc:derby:$db;create=true"
    val drv = "org.apache.derby.jdbc.EmbeddedDriver"
    Tables.supplier(spark, sfDir("sf0.001")).write.mode("overwrite")
      .format("jdbc").option("url", url).option("driver", drv)
      .option("dbtable", "supplier").save()
    val filtered = spark.read.format("jdbc")
      .option("url", url).option("driver", drv).option("dbtable", "supplier")
      .load()
      .where(col("s_suppkey") >= 5 && col("s_acctbal") > 0)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.toLowerCase.contains("s_suppkey") &&
      pushed.toLowerCase.contains("s_acctbal"),
      s"JDBC predicates must run in the database, got: $pushed\n$plan")
    assert(filtered.count() ==
      Tables.supplier(spark, sfDir("sf0.001"))
        .where(col("s_suppkey") >= 5 && col("s_acctbal") > 0).count())
  }

  test("JSON write→read with explicit schema is lossless on adversarial rows") {
    val out = tmp() + "/json"
    nasty.write.json(out)
    val back = spark.read.schema(schema).json(out).orderBy("id").collect()
    val orig = nasty.orderBy("id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getLong(0) == o.getLong(0))
      assert((b.isNullAt(1) && o.isNullAt(1)) || b.getString(1) == o.getString(1),
        s"row ${o.getLong(0)}: '${b.get(1)}' != '${o.get(1)}'")
      assert(java.lang.Double.compare(b.getDouble(2), o.getDouble(2)) == 0
        || (b.getDouble(2) == 0.0 && o.getDouble(2) == 0.0),
        s"row ${o.getLong(0)}: ${b.getDouble(2)} != ${o.getDouble(2)}")
    }
  }
}
