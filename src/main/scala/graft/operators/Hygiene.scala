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

  /** k-anonymity audit: generalize the customer quasi-identifier to
    * (region, market segment, 1000-wide balance band) and report every
    * equivalence class with its size and whether it meets k = 5 — the
    * pre-release check a dataset publisher runs to find re-identifiable
    * rows (classes below k are the ones to suppress or generalize
    * further).
    *
    * Scale: two broadcast dimension hops (nation, region are bounded) and
    * ONE map-side-combined aggregate — class rows leave the exchange, not
    * customer rows; at 100 TB this is a scan + small shuffle. */
  def qAnonymize(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .withColumn("bal_band",
        (floor(col("c_acctbal") / 1000.0) * 1000).cast("long"))
      .groupBy(col("r_name").as("region"),
        col("c_mktsegment").as("segment"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("meets_k", col("class_size") >= 5)
      .orderBy("region", "segment", "bal_band")

  /** Blocked fuzzy record linkage (entity resolution): candidate pairs
    * only within a (nation, market segment) block, matched at name edit
    * distance ≤ 2. The block is what makes linkage scale: candidates are
    * Σ block² instead of n², and the edit distance — the expensive kernel —
    * runs on candidates only. Block keys are a recall/cost dial; a skewed
    * block would get a salt or a sorted-neighborhood pass, same as
    * q_join_salted.
    *
    * Both engines evaluate the same classic Levenshtein, so the match set
    * is bit-identical by construction. */
  def qRecordLinkage(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
    c.toDF("a_key", "a_name", "nationkey", "segment")
      .join(c.toDF("b_key", "b_name", "nationkey", "segment"),
        Seq("nationkey", "segment"))
      .where(col("a_key") < col("b_key"))
      // the bounded variant: a banded DP that abandons a pair the moment
      // its distance must exceed 2 — O(len·k) on the candidate mass vs
      // O(len²) for the unbounded kernel (returns −1 past the bound, and
      // the true distance when within it, so the match set and the
      // reported distances are identical to the unbounded formulation the
      // oracle runs)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), 2))
      .where(col("dist") >= 0)
      .select(col("a_key"), col("b_key"), col("nationkey").cast("int"),
        col("segment"), col("dist").cast("long"))
      .orderBy("a_key", "b_key")
  }

  /** Cross-document long-substring duplication (the signal behind
    * suffix-array dedup of training corpora): per document, how many of its
    * distinct 30-char windows also occur verbatim in ANOTHER document, the
    * duplicated fraction, and a flag at ≥ 50%. Exact-duplicate and
    * copy-paste-contaminated docs light up at 1.0; organic text stays near
    * 0.
    *
    * Scale: windows travel as 64-bit hashes from the one-pass
    * [[graft.functions.ShingleHashes]] kernel (never strings — the shuffle
    * carries 8 bytes per window and a within-corpus collision is
    * ~|windows|²/2⁶⁴); the frequency pass is a map-side-combined aggregate;
    * the join back keys on the hash and degrades broadcast → shuffle as
    * the corpus grows. This is the hashed-window approximation of the
    * suffix-array method — linear passes only, no suffix sort. */
  def qSubstringDup(s: SparkSession, d: String): DataFrame = {
    val shingles = graft.functions.ShingleHashes.shingles(s) _
    // window table feeds the frequency pass AND the join back
    val wins = TrainingData.cached("subWins", s, d) {
      documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .where(length(col("text")) >= 30)
        .select(col("doc_id"), explode(shingles(col("text"), 30)).as("h"))
    }
    val freq = wins.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    wins.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        count(when(col("nd") >= 2, lit(1))).as("n_dup"))
      .withColumn("dup_frac",
        graft.Cols.r6(col("n_dup").cast("double") / col("n_win")))
      .withColumn("flagged", col("dup_frac") >= 0.5)
      .orderBy("doc_id")
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_line_dedup" -> (qLineDedup _),
    "q_anonymize" -> (qAnonymize _),
    "q_record_linkage" -> (qRecordLinkage _),
    "q_substring_dup" -> (qSubstringDup _))

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
        |GROUP BY 1, 2, 3 ORDER BY s.doc_id""".stripMargin,
    "q_anonymize" ->
      """SELECT r_name AS region, c_mktsegment AS segment,
        |  CASE WHEN isnan(c_acctbal) THEN 0
        |       ELSE CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) END
        |    AS bal_band,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  (count(*) >= 5) AS meets_k
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2, 3
        |ORDER BY region, segment NULLS FIRST, bal_band NULLS FIRST""".stripMargin,
    "q_record_linkage" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
        |  a.c_nationkey AS nationkey, a.c_mktsegment AS segment,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        |  AND a.c_mktsegment = b.c_mktsegment
        |  AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY a_key, b_key""".stripMargin,
    "q_substring_dup" ->
      """WITH w AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(text) - 28),
        |      i -> substr(text, CAST(i AS INT), 30)))) AS win
        |  FROM documents WHERE len(text) >= 30),
        |f AS (SELECT win, count(DISTINCT doc_id) AS nd FROM w GROUP BY 1)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_win,
        |  CAST(count(*) FILTER (f.nd >= 2) AS BIGINT) AS n_dup,
        |  floor((count(*) FILTER (f.nd >= 2)) * 1.0 / count(*)
        |    * 1000000.0 + 0.5) / 1000000.0 AS dup_frac,
        |  (floor((count(*) FILTER (f.nd >= 2)) * 1.0 / count(*)
        |    * 1000000.0 + 0.5) / 1000000.0 >= 0.5) AS flagged
        |FROM w JOIN f ON w.win = f.win
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
