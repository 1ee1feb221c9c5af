package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TrainingData}

class SaltedMediaSpec extends SparkSpec {

  private val d = sfDir("sf0.001")

  test("q_join_salted equals the plain unsalted join") {
    val ev = Tables.events(spark, d)
    val agg = ev.groupBy(col("user_id"))
      .agg(Cols.r2(sum(col("value"))).as("user_total"),
        count(lit(1)).as("user_events"))
    val plain = ev.join(agg, "user_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("user_total"), col("user_events"))
    val salted = Relational.qJoinSalted(spark, d)
    assert(salted.count() === ev.count())
    assert(salted.collect().map(_.mkString("|")).toSet ===
      plain.collect().map(_.mkString("|")).toSet)
  }

  test("media decode stub is deterministic byte arithmetic") {
    val dec = new TrainingData.StubDecoder
    val bytes = "abc".getBytes("UTF-8") // 97+98+99 = 294
    val m = dec.decode(7L, bytes)
    assert(m === TrainingData.DecodedMedia(7L, 3L, 294L,
      64L + 294L % 192L, 64L + (294L * 31L + 3L) % 192L, 1L + 3L % 30L))
  }

  test("q_media_decode emits one typed row per document") {
    val docs = Tables.documents(spark, d)
    val out = TrainingData.qMediaDecode(spark, d)
    assert(out.count() === docs.count())
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_bytes", "byte_sum", "width", "height", "n_frames"))
    // widths/heights stay inside the stub's [64, 256) envelope
    val bad = out.where(col("width") < 64 || col("width") >= 256
      || col("height") < 64 || col("height") >= 256).count()
    assert(bad === 0L)
  }
}
