package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-point range join WITHOUT an equi-key, rewritten as a binned
  * equi-join — the technique OSS Spark lacks natively (a pure
  * `p BETWEEN lo AND hi` join plans as BroadcastNestedLoopJoin, O(|P|·|I|)
  * work and a broadcast of a whole side).
  *
  * Shape: intervals explode into the fixed-width bins they overlap
  * (`lo div w .. hi div w`), points map to exactly ONE bin (`p div w`), and
  * the join becomes a shuffled equi-join on the bin id with the range
  * predicate as a residual filter. Because a point owns a single bin, every
  * qualifying (point, interval) pair surfaces exactly once — no dedup pass.
  *
  * This is deliberately tier (a) of the custom-operator ladder (compose
  * existing ops): the binned plan is a plain equi-join, so Catalyst gives
  * AQE, skew handling, codegen and column pruning for free — a custom
  * `SparkPlan` could not beat it without reimplementing all four.
  *
  * At 100 TB: cost is |P| + Σ(interval span / binWidth) shuffled rows and
  * per-bin candidate work, instead of |P|·|I|. Pick `binWidth` near the
  * median interval span so most intervals land in 1–2 bins; heavily
  * overlapped "hot" bins are ordinary join skew, which AQE splits.
  *
  * Bin arithmetic uses integer `div` — never double division, whose
  * rounding near bin boundaries could disagree between the point side and
  * the interval side and silently drop boundary matches.
  */
object BinnedRangeJoin {

  /** Join `points` to every row of `intervals` whose `[loCol, hiCol]`
    * (inclusive) contains `pointCol`. All three columns must be integral
    * and non-negative (e.g. epoch-micros); column names must not collide
    * across the two inputs. Output = point columns ++ interval columns.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"$loCol div ${binWidth}L"), expr(s"$hiCol div ${binWidth}L"))))
    val pt = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    pt.join(iv, pt("__bin") === iv("__bin")
        && pt(pointCol) >= iv(loCol) && pt(pointCol) <= iv(hiCol))
      .drop("__bin")
  }
}
