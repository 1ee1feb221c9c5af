package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusFilters

/** Law tests for the per-row corpus-filter kernels on CRAFTED inputs the
  * fixture corpus can't guarantee to contain (heavy repetition, zero
  * vectors, boundary-straddling docs). The fixture-driven value checks live
  * in the DuckDB-oracle loop. */
class CorpusFiltersSpec extends SparkSpec {

  private val d = sfDir("sf0.001")

  test("dataset split partitions the corpus: counts sum to total, ids disjoint") {
    val rows = operators.CorpusFilters.qDatasetSplit(spark, d).collect()
    val total = graft.Tables.documents(spark, d).count()
    assert(rows.map(_.getLong(2)).sum == total,
      "every doc lands in exactly one split")
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    // 80/10/10 target: train dominates, both holdouts non-empty
    assert(bySplit("train") > bySplit("valid") && bySplit("valid") > 0
      && bySplit("test") > 0, bySplit.toMap.toString)
  }

  test("repetition longest-equal-run fold equals the explode+groupBy max") {
    import spark.implicits._
    val docs = Seq(
      "a b a b a b a b",       // top 2-gram "a b" x4
      "x x x x x",             // "x x" x4
      "u v w x y z",           // all 2-grams unique
      "p q").toDF("text")
    val folded = docs
      .withColumn("toks", split(col("text"), " "))
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
      .select(col("text"), col("top2_cnt"), explode(col("grams")).as("gram"))
    val reference = folded.groupBy(col("text"), col("top2_cnt"), col("gram"))
      .count().groupBy(col("text"), col("top2_cnt"))
      .agg(max(col("count")).as("ref_max"))
      .collect()
    assert(reference.nonEmpty)
    reference.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"fold=${r.getLong(1)} ref=${r.getLong(2)} for '${r.getString(0)}'")
    }
  }

  test("quantization reconstruction error is bounded by scale/2 per dimension") {
    val q = CorpusFilters.qVecQuantize(spark, d)
      .select(col("vec_id"), col("scale_x1000"), col("recon_err")).collect()
    assert(q.length > 0)
    q.foreach { r =>
      val scale = r.getDouble(1) / 1000.0
      val err = r.getDouble(2)
      // per-dim error <= scale/2 (half-up to nearest code) => L2 over 64 dims
      // <= sqrt(64) * scale/2; rounding of the reported columns adds epsilon
      assert(err <= 8.0 * scale / 2.0 + 1e-3,
        s"vec ${r.getLong(0)}: err $err vs bound ${8.0 * scale / 2.0}")
    }
  }

  test("dedup clusters match a driver-side union-find over the same pairs") {
    val pairs = operators.LlmPipeline.qDedupNear(spark, d)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = operators.LlmPipeline.qDedupClusters(spark, d)
      .select("doc_id", "cluster_id").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == find(r.getLong(0)),
        s"doc ${r.getLong(0)}: spark=${r.getLong(1)} union-find=${find(r.getLong(0))}")
    }
  }

  test("seq_pack offsets are contiguous within each (lang, shard) stream") {
    val rows = CorpusFilters.qSeqPack(spark, d)
      .select(col("lang"), col("shard"), col("doc_id"), col("n_tok"),
        col("tok_offset"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.values.foreach { stream =>
      val sorted = stream.sortBy(_.getLong(2))
      sorted.foldLeft(0L) { (expected, r) =>
        assert(r.getLong(4) == expected,
          s"offset gap at doc ${r.getLong(2)}: ${r.getLong(4)} != $expected")
        expected + r.getLong(3)
      }
    }
  }
}
