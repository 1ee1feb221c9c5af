package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** A/B/C for qRecordLinkage's candidate strategies (block | band |
  * symdel): per SF, candidate-pair count and wall (interleaved reps,
  * median) for each lane. The quadratic cell this measures: plain block
  * candidates are 88 / 8,965 / 901,746 across sf0.001/0.01/0.1 (×100 per
  * 10× data); `band` was measured useless here (constant "000" band on
  * zero-padded sequential IDs → zero reduction) and `symdel` is the
  * asymptotic lane (near-true-pair candidates for ~172× row inflation).
  *
  * Usage: runMain graft.tools.LinkageAb [reps] [sfDir ...]
  */
object LinkageAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = Seq("block", "band", "symdel")

    // candidate counts (pre-verify), rebuilt the same way the operator
    // builds them (kept honest by RecordLinkageBlockSpec's 3-way A/B)
    def candidates(d: String, arm: String): Long = {
      val c = Tables.customer(spark, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"))
      val base = c.toDF("key", "name", "nationkey", "segment")
        .where(col("name").isNotNull)
        .withColumn("len", length(col("name")))
      arm match {
        case "block" =>
          c.toDF("a_key", "a_name", "nationkey", "segment")
            .join(c.toDF("b_key", "b_name", "nationkey", "segment"),
              Seq("nationkey", "segment"))
            .where(col("a_key") < col("b_key")).count()
        case "band" =>
          val bandStructs = (0 until 3).map { j =>
            struct(lit(j).as("j"),
              expr(s"substring(name, len - ${8 - 3 * j}, 3)").as("bs"))
          }
          val idx = base.where(col("len") >= 9)
            .select(col("key").as("b_key"), col("nationkey"), col("segment"),
              explode(array(bandStructs: _*)).as("b"))
            .select(col("b_key"), col("nationkey"), col("segment"),
              col("b.j").as("j"), col("b.bs").as("bs"))
          val probeStructs = for (j <- 0 until 3; delta <- -2 to 2) yield
            struct(lit(j).as("j"),
              expr(s"substring(name, len - ${8 - 3 * j} + $delta, 3)").as("bs"))
          val probe = base.where(col("len") >= 9)
            .select(col("key").as("a_key"), col("nationkey"), col("segment"),
              explode(array(probeStructs: _*)).as("p"))
            .where(length(col("p.bs")) === 3)
            .select(col("a_key"), col("nationkey"), col("segment"),
              col("p.j").as("j"), col("p.bs").as("bs"))
          val bandPairs = probe.join(idx, Seq("nationkey", "segment", "j", "bs"))
            .where(col("a_key") < col("b_key"))
            .select(col("a_key"), col("b_key"))
          val short = base.where(col("len") < 11)
          val shortPairs = short.select(col("key").as("a_key"),
              col("nationkey"), col("segment"))
            .join(short.select(col("key").as("b_key"), col("nationkey"),
              col("segment")), Seq("nationkey", "segment"))
            .where(col("a_key") < col("b_key"))
            .select(col("a_key"), col("b_key"))
          bandPairs.union(shortPairs).distinct().count()
        case "symdel" =>
          val variants =
            "array_distinct(array(name) || " +
              "coalesce(transform(pos, i -> " +
              "  concat(substring(name, 1, i - 1), substring(name, i + 1, len))" +
              "), array()) || " +
              "coalesce(flatten(transform(pos, i -> " +
              "  transform(filter(pos, j -> j > i), j -> " +
              "    concat(substring(name, 1, i - 1), " +
              "           substring(name, i + 1, j - i - 1), " +
              "           substring(name, j + 1, len)))" +
              ")), array()))"
          val v = base
            .withColumn("pos",
              expr("case when len >= 1 then sequence(1, len) end"))
            .select(col("key"), col("nationkey"), col("segment"),
              explode(expr(variants)).as("v"))
          v.toDF("a_key", "nationkey", "segment", "v")
            .join(v.toDF("b_key", "nationkey", "segment", "v"),
              Seq("nationkey", "segment", "v"))
            .where(col("a_key") < col("b_key"))
            .select(col("a_key"), col("b_key")).distinct().count()
      }
    }

    for (d <- dirs) {
      val cand = arms.map(a => a -> candidates(d, a)).toMap
      val times = scala.collection.mutable.Map(
        arms.map(_ -> List.empty[Double]): _*)
      var rows = -1L
      for (_ <- 1 to reps; arm <- arms) {
        spark.conf.set("spark.graft.linkage.strategy", arm)
        val t0 = System.nanoTime()
        rows = graft.operators.Hygiene.qRecordLinkage(spark, d).count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      spark.conf.unset("spark.graft.linkage.strategy")
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val armJson = arms.map(a =>
        f""""$a":{"cand":${cand(a)},"sec":${med(times(a))}%.2f}""")
        .mkString(",")
      println(s"""{"metric":"linkage_ab","sf":"$d","rows":$rows,"arms":{$armJson}}""")
    }
    spark.stop()
  }
}
