package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Cols

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization: repetition filtering (Gopher-style
  * quality signal), benchmark decontamination (n-gram overlap against a
  * held-out eval set), and mixture-weight computation for domain balancing.
  *
  * Scale notes:
  *  - repetition: computed entirely INSIDE the row with higher-order array
  *    functions — zero shuffles, embarrassingly parallel, the per-doc cost a
  *    100 TB scrub can actually afford (an explode+groupBy formulation would
  *    shuffle the full 2-gram mass of the corpus; the oracle does exactly
  *    that as an independent check).
  *  - contamination: gram join keys are 64-bit hashes, never strings; the
  *    eval-set gram table is broadcast BY CONSTRUCTION (benchmark suites are
  *    MBs while the corpus is TBs — this is the rare broadcast that stays
  *    valid at any corpus scale, because only the eval side is bounded).
  *  - mix weights: one map-side-combined aggregate over the corpus plus a
  *    single-row broadcast of the totals.
  */
object CorpusFilters {

  /** Gopher-style repetition signals per document: the highest multiplicity
    * of any token 2-gram (found via sort + longest-equal-run fold, all
    * within the row), its fraction of the doc's 2-gram mass, the distinct
    * 2-gram fraction, and a `repetitive` flag at top2_frac > 0.2. Docs with
    * fewer than 2 tokens have no 2-grams and are excluded on both sides. */
  def qRepetition(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .where(col("n_tok") >= 2)
      .withColumn("grams", expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
      .withColumn("top2_cnt", expr(
        "aggregate(array_sort(grams), " +
          "named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), " +
          "(acc, x) -> named_struct('prev', x, " +
          "'run', IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)), " +
          "'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))), " +
          "acc -> acc.best)"))
      .withColumn("n_dist_gram", size(array_distinct(col("grams"))).cast("long"))
      .withColumn("top2_frac",
        Cols.r6(col("top2_cnt").cast("double") / (col("n_tok") - 1)))
      .withColumn("dist2_frac",
        Cols.r6(col("n_dist_gram").cast("double") / (col("n_tok") - 1)))
      .withColumn("repetitive", col("top2_frac") > 0.2)
      .select(col("doc_id"), col("n_tok"), col("top2_cnt"), col("top2_frac"),
        col("dist2_frac"), col("repetitive"))
      .orderBy("doc_id")

  /** Benchmark decontamination: docs with doc_id % 100 == 0 act as the
    * held-out eval suite; every other (training) doc reports how many of its
    * distinct token 5-grams appear anywhere in the eval set, plus a
    * `contaminated` flag at >= 50% overlap. Grams travel as xxhash64 LONGS
    * (the oracle joins the gram strings — identical membership up to a
    * ~|grams|²/2⁶⁴ collision, far below the rounding noise floor). */
  def qContamination(s: SparkSession, d: String): DataFrame = {
    val grams = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(toks) - 4), " +
          "i -> xxhash64(concat_ws(' ', slice(toks, i, 5))))"))).as("gh"))
    // Eval suites are bounded (MBs) no matter how big the corpus grows —
    // the one broadcast in this module that is justified at ANY scale.
    val ev = broadcast(grams.where(col("doc_id") % 100 === 0)
      .select(col("gh")).distinct())
    val tr = grams.where(col("doc_id") % 100 =!= 0)
    val n = tr.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val m = tr.join(ev, "gh").groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
    n.join(m, Seq("doc_id"), "left")
      .withColumn("n_contam", coalesce(col("n_contam"), lit(0L)))
      .withColumn("contam_frac",
        Cols.r6(col("n_contam").cast("double") / col("n_grams")))
      .withColumn("contaminated", col("contam_frac") >= 0.5)
      .orderBy("doc_id")
  }

  /** Domain-mixture weights: per (lang, source) stratum, doc/token counts,
    * the stratum's share of corpus tokens, and the up/down-sampling weight
    * that would equalize token mass across strata (uniform target). */
  def qMixWeights(s: SparkSession, d: String): DataFrame = {
    val strata = documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"))
    val tot = strata.agg(sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_strata"))
    strata.crossJoin(broadcast(tot))
      .withColumn("token_share",
        Cols.r6(col("n_tokens").cast("double") / col("tot_tokens")))
      .withColumn("mix_weight", Cols.r6(col("tot_tokens").cast("double") /
        (col("n_strata") * col("n_tokens"))))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("token_share"), col("mix_weight"))
      .orderBy("lang", "source")
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_repetition"    -> (qRepetition _),
    "q_contamination" -> (qContamination _),
    "q_mix_weights"   -> (qMixWeights _))

  val oracles: ListMap[String, String] = ListMap(
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        |g AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
        |        unnest(list_transform(range(1, len(toks)),
        |          i -> toks[i] || ' ' || toks[i+1])) AS gram
        |      FROM t),
        |c AS (SELECT doc_id, n_tok, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |m AS (SELECT doc_id, n_tok, CAST(max(cnt) AS BIGINT) AS top2_cnt,
        |        CAST(count(*) AS BIGINT) AS n_dist_gram
        |      FROM c GROUP BY 1, 2)
        |SELECT doc_id, n_tok, top2_cnt,
        |  floor((top2_cnt*1.0/(n_tok-1))*1000000.0 + 0.5)/1000000.0 AS top2_frac,
        |  floor((n_dist_gram*1.0/(n_tok-1))*1000000.0 + 0.5)/1000000.0 AS dist2_frac,
        |  (floor((top2_cnt*1.0/(n_tok-1))*1000000.0 + 0.5)/1000000.0 > 0.2) AS repetitive
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-3),
        |        i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |      FROM t WHERE len(toks) >= 5),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 0),
        |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 100 <> 0),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM tr GROUP BY 1),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contam
        |      FROM tr JOIN ev USING (gram) GROUP BY 1)
        |SELECT n.doc_id, n_grams,
        |  coalesce(n_contam, CAST(0 AS BIGINT)) AS n_contam,
        |  floor((coalesce(n_contam, 0)*1.0/n_grams)*1000000.0 + 0.5)/1000000.0 AS contam_frac,
        |  (floor((coalesce(n_contam, 0)*1.0/n_grams)*1000000.0 + 0.5)/1000000.0 >= 0.5)
        |    AS contaminated
        |FROM n LEFT JOIN m ON n.doc_id = m.doc_id ORDER BY n.doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH strata AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |          CAST(count(*) AS BIGINT) AS n_strata FROM strata)
        |SELECT lang, source, n_docs, n_tokens,
        |  floor((n_tokens*1.0/tot_tokens)*1000000.0 + 0.5)/1000000.0 AS token_share,
        |  floor((tot_tokens*1.0/(n_strata*n_tokens))*1000000.0 + 0.5)/1000000.0 AS mix_weight
        |FROM strata CROSS JOIN tot ORDER BY lang, source""".stripMargin)
}
