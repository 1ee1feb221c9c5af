package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Corpus/record hygiene operators: the cleanup passes that run between raw
  * ingest and the dedup/quality stages — segment-level boilerplate removal
  * (the CCNet line-dedup step), k-anonymity generalization, and blocked
  * fuzzy record linkage.
  *
  * Scale notes:
  *  - line dedup: the segment-frequency table is |distinct segments| (≪
  *    corpus after map-side combine); the join back to the corpus keys on
  *    (source, segment) and degrades broadcast → shuffle as the segment
  *    dictionary grows; the rebuild is one shuffle on doc_id.
  *  - k-anonymity: one map-side-combined aggregate over the generalized
  *    quasi-identifier — class count rows, not record rows, leave the
  *    exchange.
  *  - record linkage: candidate pairs come only from bounded blocks
  *    (Σ block² ≪ n²), the standard entity-resolution shape; the edit
  *    distance runs on candidates only.
  */
object Hygiene {

  /** CCNet-style segment-level boilerplate removal. The dedup unit is a
    * 5-token segment at stride 5 (the fixture corpus has no newlines, so
    * fixed-stride word windows stand in for lines — same semantics, the
    * unit is a dial). A segment is boilerplate when its exact content
    * appears in ≥ 2 distinct documents of the same source; each document
    * reports its segment count, how many survived, and an md5 of the
    * rebuilt (boilerplate-free) text — the content signature convention of
    * q_chunk.
    *
    * Scale: segmentation is in-row (sequence → slice, zero shuffle); the
    * frequency pass is a map-side-combined aggregate whose output is
    * |distinct segments| rows; the rebuild re-assembles segments in
    * seg_idx order inside a per-doc aggregate — one shuffle on doc_id,
    * order restored by an in-row array_sort, never a window sort over the
    * corpus. */
  def qLineDedup(s: SparkSession, d: String): DataFrame = {
    // segment table feeds two subtrees (frequency pass + rebuild join)
    val segs = TrainingData.cached("lineSegs", s, d) {
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("lang"), col("source"),
          posexplode(expr(
            "transform(sequence(0, CAST((size(toks) + 4) DIV 5 AS INT) - 1), " +
              "i -> array_join(slice(toks, i * 5 + 1, 5), ' '))"))
            .as(Seq("seg_idx", "seg")))
    }
    val freq = segs.groupBy(col("source"), col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    segs.join(freq, Seq("source", "seg"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("nd") < 2, lit(1))).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("nd") < 2,
              struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")),
          " ")).as("clean_md5"))
      .orderBy("doc_id")
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_line_dedup" -> (qLineDedup _))

  val oracles: ListMap[String, String] = ListMap(
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |segs AS (SELECT doc_id, lang, source, CAST(i AS INT) AS seg_idx,
        |    array_to_string(toks[(i*5+1):(i*5+5)], ' ') AS seg
        |  FROM t, unnest(range(0, (len(toks)+4)//5)) r(i)),
        |freq AS (SELECT source, seg, count(DISTINCT doc_id) AS nd
        |         FROM segs GROUP BY 1, 2)
        |SELECT s.doc_id, s.lang, s.source, CAST(count(*) AS BIGINT) AS n_segs,
        |  CAST(count(*) FILTER (f.nd < 2) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
        |        FILTER (f.nd < 2), '')) AS clean_md5
        |FROM segs s JOIN freq f ON s.source = f.source AND s.seg = f.seg
        |GROUP BY 1, 2, 3 ORDER BY s.doc_id""".stripMargin)
}
