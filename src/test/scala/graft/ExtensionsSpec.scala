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
    // lane 0: min over x of (a0·(x mod P) + b0) mod P, from the shared family
    val (a0, b0, p) = (graft.functions.MinHashAgg.A(0),
      graft.functions.MinHashAgg.B(0), graft.functions.MinHashAgg.P)
    assert(r.head === (1 to 3).map(x => (a0 * (x % p) + b0) % p).min)
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

  test("auto bloom rule plants the probe below the fact-side exchange; identical results on/off") {
    import org.apache.spark.sql.functions._
    val d = sfDir("sf0.001")
    // the shape qBloomJoin writes by hand: selective dim filter + shuffle
    // join (hinted, so neither side broadcasts — the at-scale shape). Tiny
    // data means Spark's OWN runtime bloom filter skips it (its creation/
    // application size thresholds), which is exactly the gap the opt-in
    // rule covers.
    def query() = {
      val dim = Tables.customer(spark, d)
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000)
        .select(col("c_custkey"), col("c_name"))
      Tables.orders(spark, d).select(col("o_custkey"), col("o_totalprice"))
        .join(dim.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("c_custkey")
    }
    val off = query().collect()
    assert(off.nonEmpty)
    spark.conf.set(graft.plans.AutoBloomJoinRule.EnabledKey, "true")
    try {
      val dfOn = query()
      val on = dfOn.collect()
      assert(on.toSeq == off.toSeq, "rule must never change results")
      // plan shape: probe BELOW the fact side's hashpartitioning exchange
      val lines = dfOn.queryExecution.executedPlan.toString
        .linesIterator.toVector
      def indent(l: String): Int = l.indexWhere(c => c.isLetter || c == '*')
      val ex = lines.indexWhere(_.contains("Exchange hashpartitioning(o_custkey"))
      val probe = lines.indexWhere(_.contains("graft_bloom_might_contain"))
      assert(ex >= 0 && probe > ex && indent(lines(probe)) > indent(lines(ex)),
        s"auto-planted probe must filter fact rows before the shuffle:\n${lines.mkString("\n")}")
    } finally spark.conf.unset(graft.plans.AutoBloomJoinRule.EnabledKey)
  }

  test("auto bloom rule backs off from a nondeterministic creation side") {
    import org.apache.spark.sql.functions._
    val d = sfDir("sf0.001")
    spark.conf.set(graft.plans.AutoBloomJoinRule.EnabledKey, "true")
    try {
      // the creation subtree is DUPLICATED into the bloom-build subquery;
      // with rand() in it the subquery would sample different rows than
      // the join reads and the probe could drop matching fact rows
      val dim = Tables.customer(spark, d)
        .where(col("c_acctbal") > 8000 && rand(42) < 0.99)
      val j = Tables.orders(spark, d)
        .join(dim.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
      assert(!j.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"),
        "nondeterministic dim side must not build a bloom")
      // a LIMIT without order picks arbitrary rows — same hazard
      val lim = Tables.customer(spark, d)
        .where(col("c_acctbal") > 8000).limit(3)
      val j2 = Tables.orders(spark, d)
        .join(lim.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
      assert(!j2.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"),
        "limited dim side must not build a bloom")
    } finally spark.conf.unset(graft.plans.AutoBloomJoinRule.EnabledKey)
  }

  test("bloom probe rejects a wrong-geometry filter array loudly") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bloom_might_contain(array(1L, 2L), 7L)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("graft_bloom_agg result")),
      s"want the diagnosable geometry message, got: ${messages(err)}")
  }

  test("kernels codegen-compile with NON-nullable children sharing one projection") {
    import org.apache.spark.sql.functions._
    // vecbin's read schema declares embedding non-nullable, so
    // nullSafeCodeGen inlines kernel bodies UNBRACED into one method
    // scope — fixed local names would collide across instances and
    // silently fall back to interpreted eval; fallback=false makes that
    // a loud failure
    val dir = java.nio.file.Files.createTempDirectory("graft-cg").toString
    Tables.embeddings(spark, sfDir("sf0.001")).limit(50)
      .select(col("vec_id"), col("label"), col("embedding"))
      .write.format("graft.sources.VecBinSource").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val fdot = graft.functions.FloatVectorDot.dotF(spark) _
      val rows = spark.read.format("graft.sources.VecBinSource").load(dir)
        .select(
          fdot(col("embedding"), col("embedding")).as("d1"),
          fdot(col("embedding"), col("embedding")).as("d2"),
          graft.functions.SignBands.bands(spark)(col("embedding"), 8, 8).as("b"))
        .collect()
      assert(rows.length == 50)
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("auto bloom rule backs off: unfiltered dims, both-filtered joins, non-bigint keys") {
    import org.apache.spark.sql.functions._
    val d = sfDir("sf0.001")
    spark.conf.set(graft.plans.AutoBloomJoinRule.EnabledKey, "true")
    try {
      // no selective filter on either side → no probe
      val plain = Tables.orders(spark, d)
        .join(Tables.customer(spark, d).hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey"))
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"), "unfiltered join must not probe")
      // both sides filtered → ambiguous, back off
      val both = Tables.orders(spark, d).where(col("o_totalprice") > 1000)
        .join(Tables.customer(spark, d).where(col("c_acctbal") > 0)
          .hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
      assert(!both.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"), "ambiguous dim must back off")
    } finally spark.conf.unset(graft.plans.AutoBloomJoinRule.EnabledKey)
  }
}
