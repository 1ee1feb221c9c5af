package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.operators.TrainingData

/** Warm-list accounting (r8 verdict item 6): the driver's warmup grew
  * 48.8 → 69.9 s on an UNCHANGED 12-query warm list, and nobody could say
  * which entry cost what or which entries even need to be there. This
  * tool answers both questions with measurements:
  *
  *  1. Runs Bench's warm list in order on a cold cache, timing each entry
  *     and logging (via [[TrainingData.loggedAccesses]]) which named
  *     corpus-snapshot assets it populates.
  *  2. Runs the FULL 138-query surface with caches hot, logging which
  *     assets each query touches — giving the true consumer count per
  *     asset.
  *
  * The warm list's purpose (r3 verdict) is to stop MULTI-consumer asset
  * population from being charged to whichever consumer runs first. An
  * asset with exactly one consumer needs no warming: its population cost
  * legitimately belongs to its only query, and Bench's median-of-3 sheds
  * the first-touch rep anyway. So every warm entry whose populated assets
  * are all single-consumer is a trim candidate, and the tool prints the
  * warm seconds each trim would save.
  *
  * Usage: runMain graft.tools.WarmAudit [sfDir]
  */
object WarmAudit {

  private def warmQs = graft.Bench.warmQs

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    // absorb session/codegen init so the first warm entry's time is honest
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // phase 1: warm list on a cold cache — per-entry wall + populated assets
    TrainingData.unpersistAll()
    val warmRows = warmQs.map { q =>
      val t0 = System.nanoTime()
      val (_, touched) = TrainingData.loggedAccesses {
        SparkEntry.queries(q)(spark, sfDir).count()
      }
      (q, (System.nanoTime() - t0) / 1e9, touched)
    }
    // assets seen by earlier entries are not POPULATED by this one
    val populated = {
      val seen = scala.collection.mutable.Set[String]()
      warmRows.map { case (q, sec, touched) =>
        val mine = touched -- seen; seen ++= touched; (q, sec, mine)
      }
    }

    // phase 2: full surface, caches hot — true consumer count per asset
    val consumers = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set())
    SparkEntry.queries.keys.toSeq.foreach { q =>
      val (_, touched) = TrainingData.loggedAccesses {
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"$q failed: $e") }
      }
      touched.foreach(a => consumers(a) = consumers(a) + q)
    }

    populated.foreach { case (q, sec, mine) =>
      val assetJson = mine.toSeq.sorted.map { a =>
        s""""$a":${consumers(a).size}"""
      }.mkString("{", ",", "}")
      val keep = mine.exists(a => consumers(a).size > 1)
      println(f"""{"metric":"warm_audit_entry","q":"$q","sec":$sec%.2f,"keep":$keep,"populated_assets_with_consumer_count":$assetJson}""")
    }
    // every shared (≥2-consumer) asset across the WHOLE surface — the warm
    // list must first-touch each of these, or population gets charged to
    // whichever consumer runs first in rep 1 (medians shed it, but the
    // warm list's contract is explicit population accounting)
    val sharedAssets = consumers.filter(_._2.size > 1)
    val warmCovered = populated.flatMap(_._3).toSet
    val uncovered = sharedAssets.keySet -- warmCovered
    println(s"""{"metric":"warm_audit_shared_assets","assets":${
      sharedAssets.toSeq.sortBy(_._1).map { case (a, qs) =>
        s""""$a":[${qs.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}]"""
      }.mkString("{", ",", "}")},"not_covered_by_warm_list":[${
      uncovered.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}]}""")
    val trim = populated.filter { case (_, _, mine) =>
      mine.forall(a => consumers(a).size <= 1)
    }
    val saved = trim.map(_._2).sum
    val total = populated.map(_._2).sum
    println(f"""{"metric":"warm_audit","sf":"$sfDir","warm_total_sec":$total%.2f,"trim":[${trim.map(t => "\"" + t._1 + "\"").mkString(",")}],"trim_saves_sec":$saved%.2f}""")
    TrainingData.unpersistAll()
    spark.stop()
  }
}
