package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** DIRTY-INPUT TOTALITY: every declared query must execute on a corpus
  * where the PAYLOAD columns carry the damage a 100 TB feed actually
  * accumulates — null / empty / single-char / control-character text,
  * null and malformed JSON props, null timestamps and measures, null,
  * empty, wrong-dimension and NaN-element embeddings. Keys stay valid and
  * unique (the fixture contract guarantees them); everything else is fair
  * game. Under ANSI mode (Spark 4 default) the classic failure is a
  * ratio over an empty denominator or an array index past a short
  * vector — exactly what scheduled runs hit in production first.
  * Rows are free to differ from the clean corpus; throwing is the only
  * failure. */
class DirtyInputSpec extends SparkSpec {

  /** sf0.001 with dirty payload rows unioned into the tables operators
    * read payloads from. Dirty ids start at 9,000,001 — far above any
    * fixture id, so keys stay unique. */
  private lazy val dirtyDir: String = {
    val dir = Files.createTempDirectory("graft-dirty-corpus").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = sfDir("sf0.001")

    def copy(t: String, extra: DataFrame => DataFrame): Unit = {
      val src = spark.read.parquet(s"$base/$t.parquet")
      extra(src).write.parquet(s"$dir/$t.parquet")
    }
    def rows(t: String, rs: Seq[Row]): DataFrame => DataFrame = { src =>
      import scala.jdk.CollectionConverters._
      src.unionByName(
        spark.createDataFrame(rs.asJava, src.schema))
    }

    copy("region", identity)
    copy("nation", identity)
    copy("customer", identity)
    copy("supplier", identity)
    copy("part", identity)
    copy("orders", rows("orders", Seq(
      // null measure, null date, null status/priority
      Row(9000001L, 1L, null, null, null, null),
      // ±Infinity measures (Spark-side totality only: inf→long folds are
      // engine-defined — Spark saturates to Long.Max/MinValue where DuckDB
      // errors on the cast — so these rows stay OUT of the parity corpus)
      Row(9000002L, 2L, "F", Double.PositiveInfinity, null, "2-HIGH"),
      Row(9000003L, 3L, "O", Double.NegativeInfinity, null, "3-MEDIUM"))))
    copy("lineitem", rows("lineitem", Seq(
      Row(9000001L, 1L, 1L, 1, null, null, null, null, null, null, null),
      Row(9000002L, 1L, 1L, 1, 1.0, Double.PositiveInfinity, 0.0, 0.0,
        "N", "O", null),
      Row(9000003L, 1L, 1L, 2, 2.0, 100.0, Double.NegativeInfinity, 0.0,
        "R", "F", null))))
    // events.ts: nanos-as-long under the legacy flag when the fixture is
    // TIMESTAMP(NANOS); a plain (NTZ) timestamp when the fixture is µs —
    // adapt the dirty rows to whichever representation the source schema
    // carries so the spec survives fixture regeneration
    def tsv(secs: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val evSchema = spark.read.parquet(s"$base/events.parquet").schema
    val (t1, t2): (Any, Any) = evSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (1700000000000000000L, 1700000001000000000L)
      case org.apache.spark.sql.types.TimestampType =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000001L)))
      case _ => (tsv(1700000000L), tsv(1700000001L))
    }
    copy("events", rows("events", Seq(
      Row(9000001L, null, 1L, null, null, null),            // all-null payload
      Row(9000002L, t1, 2L, "view", 1.0, "{not json"),      // malformed props
      Row(9000003L, t2, 3L, "", 0.0, ""),                   // empty strings
      Row(9000004L, t1, 4L, "view", Double.PositiveInfinity, null),
      Row(9000005L, t2, 4L, "click", Double.NegativeInfinity, null))))
    copy("documents", rows("documents", Seq(
      Row(9000001L, null, null, null, null),                 // all-null payload
      Row(9000002L, "", "en", "web", 0L),                    // empty text
      Row(9000003L, "a", "en", "web", 1L),                   // single char
      Row(9000004L, "\u0000\u0001 中文 😀\n\t", null, "web", 12L),   // control + unicode
      Row(9000005L, "   \t\n  ", "en", "web", 7L),          // whitespace only
      Row(9000006L, "x" * 10000, "en", "web", 10000L))))     // one huge token
    copy("embeddings", rows("embeddings", Seq(
      Row(9000001L, null, null),                             // null vector
      Row(9000002L, Seq.empty[Float], 0),                    // empty vector
      Row(9000003L, Seq(1.0f, 2.0f, 3.0f), 1),               // wrong dimension
      Row(9000004L, Seq.tabulate(64)(i =>
        if (i == 7) Float.NaN else i.toFloat), 2),           // NaN element
      Row(9000005L, Seq.tabulate(64)(i =>
        if (i == 0) Float.PositiveInfinity else 1.0f), 3),   // +inf element
      Row(9000006L, Seq.fill(64)(Float.NegativeInfinity), 3),    // all -inf
      Row(9000007L, Seq.fill(64)(1.0e30f), 4))))  // long-saturating magnitude
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name is total on the dirty corpus") {
      fn(spark, dirtyDir).collect()
    }
  }

  test("ivf centroid build excludes degenerate vectors") {
    // the NaN-element embedding must contribute NOTHING to the k-means
    // update: one NaN folded into a centroid mean nulls that centroid's
    // cosine against every vector the next iteration, and (because null
    // ranks FIRST in a min-struct argmin) would silently collapse every
    // assignment into one bucket rather than crash. Likewise ±inf: an
    // infinite-norm vector's cosine is inf/inf = NaN under a naive guard,
    // and its elements fold ±inf (or inf−inf = NaN) into the mean — the
    // round-7 inf poison rows caught exactly that with the pre-fix
    // `!isnan(den) && den > 0` guard; cosCol now requires a FINITE
    // positive norm
    val cents = operators.TrainingData.ivfCentroids(spark, dirtyDir)
      .collect().map(_.getSeq[Double](1))
    assert(cents.nonEmpty)
    assert(cents.forall(_.forall(v => !v.isNaN && !v.isInfinite)),
      "non-finite value leaked into a centroid")
    assert(cents.map(_.toList).distinct.length > 1, "centroids collapsed")
  }
}
