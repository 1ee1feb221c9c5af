package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-grade probe (r13): how much of an ordered head's v2 wall is
  * the final global orderBy — and within that, the RangePartitioning
  * sampling pass that re-executes the stage feeding the sort. Arms, per
  * rep interleaved: declared (orderBy as shipped) / nosort (orderBy
  * stripped via sortWithinPartitions-free noop of the unsorted plan) /
  * ckpt (localCheckpoint barrier before the orderBy — the sampling pass
  * then re-reads the materialized blocks instead of recomputing the
  * stage). Decision data for whether a checkpoint-before-sort is worth
  * shipping; results in BASELINE r13. */
object SortCostProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // q_record_linkage's body, declared lane pinned to block (the sf0.1
    // auto pick) so all arms share the candidate plan
    spark.conf.set("spark.graft.linkage.strategy", "block")
    def unsorted = graft.operators.Hygiene
      .linkageCandidates(spark, d, "block")
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), 2))
      .where(col("dist") >= 0)
      .select(col("a_key"), col("b_key"), col("nationkey").cast("int"),
        col("segment"), col("dist").cast("long"))
    noop(unsorted.orderBy("a_key", "b_key")) // warm
    val arms = Seq[(String, () => Unit)](
      "declared" -> (() => noop(unsorted.orderBy("a_key", "b_key"))),
      "nosort" -> (() => noop(unsorted)),
      "ckpt" -> (() => {
        val c = unsorted.localCheckpoint()
        noop(c.orderBy("a_key", "b_key"))
        c.unpersist()
      }))
    val t = scala.collection.mutable.Map(arms.map(_._1 -> List.empty[Double]): _*)
    for (_ <- 1 to reps; (n, f) <- arms) {
      val t0 = System.nanoTime(); f()
      t(n) = (System.nanoTime() - t0) / 1e9 :: t(n)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(arms.map { case (n, _) =>
      f""""$n":${med(t(n))}%.3f""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
