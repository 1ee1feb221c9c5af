package graft

import org.apache.spark.sql.functions._

import graft.functions.{BandsMatchBefore, LanesEqualCount, SignProjBands}

/** Pins the native minhash kernels lane-for-lane against the unrolled
  * column expressions they replaced in qDedupMinhash (which scale with
  * the k dial and measurably degrade the fused stage at the production
  * dials): lanes_equal_count == the k-term when-sum, and the grouped
  * bands_match_before == the (bands−1)·r-term earlier-band when-sum,
  * on real signature joins at the declared AND a production geometry. */
class LanesEqualCountSpec extends SparkSpec {

  private def sigJoin(k: Int, r: Int) = {
    val d = sfDir("sf0.001")
    // stand-in signatures with realistic collisions: k hash lanes mod a
    // small space over the fixture embeddings ids (duplicates planted by
    // the ×2 union so multi-band matches occur at every geometry)
    val base = Tables.embeddings(spark, d).select(col("vec_id"))
    val ids = base.unionByName(base.select((col("vec_id") + 10000).as("vec_id")))
    val sigged = ids.select(col("vec_id"),
      expr(s"transform(sequence(1, $k), i -> " +
        "pmod(xxhash64(pmod(vec_id, 10000L), i), 7))").as("sig"))
    val bandsN = k / r
    val banded = sigged.select(col("vec_id"), col("sig"),
      explode(expr(s"transform(sequence(0, ${bandsN - 1}), j -> j)")).as("band"))
      .select(col("vec_id"), col("sig"), col("band"),
        expr("slice(sig, band * " + r + " + 1, " + r + ")").as("bx"))
    banded.toDF("a_id", "siga", "band", "bx")
      .join(banded.toDF("b_id", "sigb", "band", "bx"), Seq("band", "bx"))
      .where(col("a_id") < col("b_id"))
  }

  test("native kernels == unrolled forms on signature band joins, both geometries") {
    for ((k, r) <- Seq((8, 4), (64, 8))) {
      val joined = sigJoin(k, r)
      val nMatchUnrolled = (0 until k)
        .map(i => when(col("siga")(i) === col("sigb")(i), 1).otherwise(0))
        .reduce(_ + _)
      def bandMatch(j: Int) = (0 until r)
        .map(i => col("siga")(r * j + i) === col("sigb")(r * j + i))
        .reduce(_ && _)
      val earlierUnrolled = (0 until k / r - 1)
        .map(j => when(lit(j) < col("band") && bandMatch(j), 1).otherwise(0))
        .reduce(_ + _)
      val le = LanesEqualCount.lanesEqual(spark) _
      val mb = BandsMatchBefore.matchBeforeGrouped(spark) _
      val bad = joined.where(
        le(col("siga"), col("sigb")) =!= nMatchUnrolled ||
          mb(col("siga"), col("sigb"), col("band"), r) =!= (earlierUnrolled > 0))
        .count()
      assert(bad == 0, s"(k=$k, r=$r): native kernels disagree with unrolled")
      // non-vacuity: the join must exercise both dedup outcomes
      val hits = joined.where(mb(col("siga"), col("sigb"), col("band"), r)).count()
      assert(hits > 0 && hits < joined.count(), s"(k=$k, r=$r) vacuous")
    }
  }

  test("edge semantics: nulls, short arrays, codegen == interpreted") {
    val le = LanesEqualCount.lanesEqual(spark) _
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(1L, 9L, 3L), 2),
        |  (array(1L, 2L),     array(1L, 2L, 3L), 2), -- extra pos uncounted
        |  (array(NULL, 2L),   array(NULL, 2L),   1), -- NULL equals nothing
        |  (array(),           array(1L),         0)
        |AS t(a, b, want)""".stripMargin)
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try assert(df.where(le(col("a"), col("b")) =!= col("want")).count() == 0,
        s"[$codegen] lanes_equal_count edge rows disagree")
      finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    assert(spark.sql("SELECT 1").select(
      le(lit(null).cast("array<bigint>"), array(lit(1L))).as("r"))
      .head().isNullAt(0))
  }
}
