package graft

/** The shared test session is built with
  * `spark.sql.extensions=graft.GraftExtensions` (see [[SparkSpec]]), so the
  * native expressions must resolve from plain SQL with no imperative
  * registration call anywhere in the test path. */
class ExtensionsSpec extends SparkSpec {

  test("vec_dot_f resolves from SQL via the session extension") {
    val r = spark.sql(
      """SELECT vec_dot_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d"""
        .stripMargin).head().getDouble(0)
    assert(r === 1.5 * 4.0 + 2.0 * 0.5)
  }

  test("sorted_intersect_count resolves from SQL via the session extension") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L, 9L), array(3L, 4L, 5L)) AS c")
      .head().getLong(0)
    assert(r === 2L)
  }

  test("minhash_sig aggregate resolves from SQL via the session extension") {
    val r = spark.sql(
      """SELECT minhash_sig(x) AS sig FROM VALUES (1L), (2L), (3L) AS t(x)""")
      .head().getSeq[Long](0)
    assert(r.length === 8)
    // lane 0: min over x of (2971x + 1409) mod p
    assert(r.head === (1 to 3).map(x => (2971L * x + 1409L) % 2147483647L).min)
  }

  test("bloom agg + probe resolve from SQL via the session extension") {
    val r = spark.sql(
      """WITH b AS (SELECT graft_bloom_agg(x) AS bf FROM VALUES (10L), (20L) AS t(x))
        |SELECT graft_bloom_might_contain(bf, 10L) AS hit,
        |       graft_bloom_might_contain(bf, 12345678L) AS miss FROM b"""
        .stripMargin).head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1)) // 1-in-~2^30 FP chance at this load, fixed hashes
  }

  test("bottom_k aggregate resolves from SQL via the session extension") {
    val r = spark.sql(
      "SELECT bottom_k(x, 2) AS sk FROM VALUES (5L), (1L), (9L), (1L) AS t(x)")
      .head().getSeq[Long](0)
    assert(r == Seq(1L, 5L))
  }

  test("extension functions are codegen-compatible in a real pipeline") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 7L), Seq(2L, 7L, 9L))).toDF("a", "b")
    df.createOrReplaceTempView("ext_probe")
    val r = spark.sql(
      "SELECT sorted_intersect_count(a, b) AS c FROM ext_probe").head().getLong(0)
    assert(r === 2L)
  }
}
