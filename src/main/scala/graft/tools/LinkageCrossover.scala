package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Locate the record-linkage block→symdel WALL crossover by measurement
  * (r8 verdict "next" item 5): the r8 LinkageAb curves showed symdel's
  * candidate set growing ×~3.5/decade slower than plain block candidates,
  * with a curve-fit crossover "≈ sf0.5–1" — extrapolated, not measured,
  * because no larger fixture exists. This tool BUILDS the corpus the claim
  * needs and measures.
  *
  * Corpus construction: the sf0.1 customer table grown ×g by extending the
  * key range with the fixture's own name generator (`Customer#%09d`,
  * sequential keys — exactly how a larger SF densifies the ID space, which
  * is what drives both the true-pair growth and the Σ block² growth).
  * nation/segment are hash-uniform over the same 25×5 block key space, so
  * block sizes scale ×g like a real SF-g·0.1 fixture. Entropy is PRESERVED
  * by construction (same generator, denser sequence), unlike sharding the
  * fixture g times (which would create g exact-name copies and inflate
  * true pairs artificially).
  *
  * Block-key hash choice is LOAD-BEARING: the first cut used a Knuth
  * multiplicative hash (`id·2654435761 mod 25`), which is LINEAR in id —
  * and the ed ≤ 2 matches on zero-padded sequential names are exactly the
  * pairs differing by Δ = c·10^k, where 25 | 100 and 5 | 10, so every
  * digit-substitution neighbor at the tens place or above landed in the
  * SAME block automatically. That correlation densified true pairs ×28 on
  * a ×2 growth (927k matches at 30k rows vs the fixture family's ~×2/×2
  * trend), poisoning the crossover read. `xxhash64` (non-linear) restores
  * block assignment independent of the match metric.
  *
  * Per growth factor: interleaved reps of the full qRecordLinkage under
  * `block` vs `symdel` (conf-dialed, same verify, same output), median
  * wall per arm, candidate counts from the operator's own shared
  * generator, and a match-set fingerprint equality check (count +
  * key-sum) pinning that the arms still agree at every scale.
  *
  * Usage: runMain graft.tools.LinkageCrossover [reps] [workDir] [g ...]
  */
object LinkageCrossover {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val workDir = args.drop(1).headOption.getOrElse("/tmp/graft_linkage_growth")
    val growths = {
      val gs = args.drop(2).map(_.toInt)
      if (gs.nonEmpty) gs.toSeq else Seq(1, 2, 5, 10)
    }
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.customer(spark, srcDir)
    val n0 = base.count()

    def grownDir(g: Int): String = {
      val dir = s"$workDir/g$g"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/customer.parquet"))) {
        val extra = spark.range(n0, n0 * g)
          .select(col("id").as("c_custkey"),
            format_string("Customer#%09d", col("id")).as("c_name"),
            // non-linear hash → block key independent of digit structure
            pmod(xxhash64(col("id")), lit(25)).cast("int")
              .as("c_nationkey"),
            round(pmod(col("id") * 40503L, lit(10000)) + lit(0.01), 2)
              .as("c_acctbal"),
            element_at(
              array(lit("MACHINERY"), lit("AUTOMOBILE"), lit("HOUSEHOLD"),
                lit("FURNITURE"), lit("BUILDING")),
              (pmod(xxhash64(col("id"), lit(7)), lit(5)) + 1).cast("int"))
              .as("c_mktsegment"))
        base.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"), col("c_mktsegment"))
          .unionByName(extra)
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      }
      dir
    }

    val arms = Seq("block", "symdel")
    for (g <- growths) {
      val d = grownDir(g)
      val cand = arms.map(a =>
        a -> graft.operators.Hygiene.linkageCandidates(spark, d, a).count()).toMap
      // match-set fingerprint per arm: the dial must never change answers
      val fps = arms.map { a =>
        spark.conf.set("spark.graft.linkage.strategy", a)
        val r = graft.operators.Hygiene.qRecordLinkage(spark, d)
          .agg(count(lit(1)).as("n"),
            sum(col("a_key") * 31 + col("b_key")).as("ksum"))
          .collect()(0)
        a -> ((r.getLong(0), r.getLong(1)))
      }.toMap
      val matchesAgree = fps.values.toSet.size == 1
      val times = scala.collection.mutable.Map(
        arms.map(_ -> List.empty[Double]): _*)
      for (_ <- 1 to reps; arm <- arms) {
        spark.conf.set("spark.graft.linkage.strategy", arm)
        val t0 = System.nanoTime()
        graft.operators.Hygiene.qRecordLinkage(spark, d).count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      spark.conf.unset("spark.graft.linkage.strategy")
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val armJson = arms.map(a =>
        f""""$a":{"cand":${cand(a)},"median_sec":${med(times(a))}%.2f,"min_sec":${times(a).min}%.2f}""")
        .mkString(",")
      // r10: does the auto dispatch's pre-aggregate decision pick the arm
      // this very measurement crowns? (ties within 15% count as tracked —
      // near the crossover both walls are equal by definition)
      val (choice, bp, vr) = graft.operators.Hygiene.linkageAutoChoice(spark, d)
      val winner = arms.minBy(a => med(times(a)))
      val tracks = choice == winner ||
        med(times(choice)) <= med(times(winner)) * 1.15
      println(s"""{"metric":"linkage_crossover","g":$g,"rows":${n0 * g},"true_pairs":${fps("block")._1},"matches_agree":$matchesAgree,"auto":{"choice":"$choice","block_pairs":$bp,"variant_rows":$vr,"winner":"$winner","tracks_winner":$tracks},"arms":{$armJson}}""")
    }
    spark.stop()
  }
}
