package graft

import org.apache.spark.sql.functions._

import graft.functions.{BandsMatchBefore, SignBands, SignProjBands}

/** Pins the native lowest-band dedup predicate against the unrolled
  * OR-chain it replaced (they must agree row-for-row on real band-join
  * shapes — the unrolled form IS the executable spec, it just cannot
  * survive 32 bands inside a fused codegen stage), plus codegen ==
  * interpreted parity and the defensive edge semantics. */
class BandsMatchBeforeSpec extends SparkSpec {

  private def unrolled(nBands: Int) =
    (0 until nBands - 1)
      .map(t => col("bi") > t &&
        element_at(col("bva"), t + 1) === element_at(col("bvb"), t + 1))
      .reduce(_ || _)

  test("native predicate == unrolled OR-chain on real band-join rows, both geometries") {
    // fixture vectors plus exact duplicates: a duplicate pair agrees on
    // EVERY band, so the multi-band (dedup-fires) branch is exercised
    // even for the 16-bit proj geometry, whose fixture-pair double-band
    // odds are ~0
    val base = Tables.embeddings(spark, sfDir("sf0.001"))
    val e = base.select(col("vec_id"), col("embedding"))
      .unionByName(base.select((col("vec_id") + 10000).as("vec_id"),
        col("embedding")))
    val mb = BandsMatchBefore.matchBefore(spark) _
    for ((name, nBands, bandsCol) <- Seq(
      ("axis8", 8, SignBands.bands(spark)(col("embedding"), 8, 8)),
      ("proj16x16", 16,
        SignProjBands.bands(spark)(col("embedding"), 0x67726166L, 16, 16)))) {
      val banded = e.select(col("vec_id"), bandsCol.as("bvs"),
        posexplode(bandsCol).as(Seq("bi", "bv")))
      val joined = banded.toDF("a_id", "bva", "bi", "bv")
        .join(banded.toDF("b_id", "bvb", "bi", "bv"), Seq("bi", "bv"))
        .where(col("a_id") < col("b_id"))
      val disagree = joined
        .where(mb(col("bva"), col("bvb"), col("bi")) =!= unrolled(nBands))
        .count()
      assert(disagree == 0, s"$name: native and unrolled predicates disagree")
      // and the band join must actually exercise both outcomes
      val hits = joined.where(mb(col("bva"), col("bvb"), col("bi"))).count()
      val total = joined.count()
      assert(hits > 0 && hits < total,
        s"$name: degenerate fixture (hits=$hits of $total) — test is vacuous")
    }
  }

  test("codegen == interpreted, and edge semantics") {
    val mb = BandsMatchBefore.matchBefore(spark) _
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(9L, 2L, 3L), 1, false), -- match at 1 >= pos
        |  (array(1L, 2L, 3L), array(9L, 2L, 3L), 2, true),  -- match at 1 < pos
        |  (array(1L, 2L),     array(1L),         5, true),  -- pos past both ends
        |  (array(1L, 2L),     array(3L),         5, false),
        |  (array(),           array(),           3, false),
        |  (array(1L, NULL),   array(1L, NULL),   9, true),  -- first elem matches
        |  (array(NULL, 2L),   array(NULL, 2L),   1, false)  -- NULL never matches
        |AS t(a, b, p, want)""".stripMargin)
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val bad = df.where(mb(col("a"), col("b"), col("p")) =!= col("want")).count()
        assert(bad == 0, s"[$codegen] edge rows disagree with expected")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    // null-intolerance: NULL input → NULL out
    assert(spark.sql("SELECT 1").select(
      mb(lit(null).cast("array<bigint>"), array(lit(1L)), lit(1)).as("r"))
      .head().isNullAt(0))
  }
}
