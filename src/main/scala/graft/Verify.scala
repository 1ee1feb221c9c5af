package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these queries (local iteration aid;
    // the driver always calls with exactly two args = full run)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // q_recursive's deployment dial (BASELINE r12, measured by
      // HeadsOctave): Spark's recursive-CTE guard caps TOTAL rows across
      // iterations at 1e6 by default — a foot-gun fence, not a memory
      // bound — and the walk produces |customers|·depth rows, which
      // clears 1e6 somewhere around 60k customers. The harness sets the
      // dial the way a deployment would so the same binary verifies at
      // any corpus size (result-invariant below the default limit).
      .config("spark.sql.cteRecursionRowLimit", "2000000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ListBuffer[String]()
    var okCount = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        okCount += 1
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Tail-hardened self-check (same discipline as Bench): teardown FIRST
    // at ERROR log level, then one final stdout line with per-query ok/err
    // counts — a future CORRECTNESS artifact failure is diagnosable from
    // the driver's 2000-char combined-stream tail alone.
    graft.operators.TrainingData.unpersistAll()
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    // Cap the failure list at 20 names (r7 verdict item 2): a catastrophic
    // round with all 138 queries failing would otherwise bloat exactly the
    // diagnostic line that must survive the driver's 2000-char tail. The
    // full count is always in "err"; the names are a sample.
    val failedJson = failed.toList.sorted.take(20)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"verify","ok":$okCount,"err":${failed.size},"failed":$failedJson}""")
  }
}
