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
  *
  * Join strategy is deliberately LEFT TO STATS, unlike the linkage
  * symdel/band lanes' shuffle pins, even though the bin explode sits
  * under the join (the r9 gen_join_audit flags both entry points): here
  * the explode-blindness of the static size estimate is bounded by
  * design — `binWidth` near the median span puts most intervals in 1–2
  * bins, so the estimate is off by a small constant, not the ×172 of a
  * deletion-variant explode, and a mis-broadcast is at worst a few ×
  * the intended size rather than corpus-sized. The broadcast plan is
  * also measured 3.9× faster at sf0.1 (BcastAb, q_overlap_join 0.49 vs
  * 1.92 s); past the threshold the estimate crosses honestly (within
  * that same small constant) and the join degrades to the shuffled
  * equi-join the scale analysis above describes.
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

  /** Join `a` to every row of `b` whose `[bLo, bHi]` overlaps `[aLo, aHi]`
    * (inclusive on both ends: `aLo <= bHi && bLo <= aHi`). Both sides
    * explode over their bin ranges, so a pair can share many bins; the
    * OWNERSHIP predicate — emit only at bin `max(aLo, bLo) div w` — keeps
    * exactly one copy without a dedup shuffle: that bin is an endpoint of
    * the later-starting interval's sequence and, by the overlap condition,
    * lies inside the other's. Column names must not collide across inputs.
    * Output = a's columns ++ b's columns.
    *
    * At 100 TB: Σ(span/w) shuffled rows per side vs |A|·|B| comparisons —
    * the same economics as [[pointInInterval]], with `binWidth` near the
    * median SPAN of the shorter-interval side.
    */
  /** All UNORDERED pairs of `points` rows sharing `keys` whose `tsCol`
    * values differ by at most `window` (inclusive), each pair emitted
    * exactly once and oriented `a_<idCol> < b_<idCol>`. Output columns:
    * keys ++ (a_idCol, a_tsCol, b_idCol, b_tsCol).
    *
    * This is the self-pair variant of the ownership-bin discipline: a
    * bare self-join on `keys` alone is Σ per-key² candidate pairs — one
    * hot key (the r6 skew-octave shape) makes a single task quadratic.
    * Binning each point at `ts div window` and probing only (bin, bin+1)
    * bounds candidates by per-(key, adjacent-bin) mass instead: since
    * |Δts| ≤ window implies the two bins differ by at most 1
    * (⌊y/w⌋ ≤ ⌊(x+w)/w⌋ = ⌊x/w⌋+1), every qualifying pair meets the
    * probe, and the OWNERSHIP predicate — same bin: smaller id emits;
    * adjacent bins: only the probe row exploded to bin+1 emits — keeps
    * exactly one copy with no dedup shuffle, exactly like
    * [[intervalOverlap]]'s max-lo bin rule. `tsCol` must be integral and
    * non-negative (integer `div` truncates toward zero below zero, which
    * would mis-bucket pairs straddling 0); `idCol` must be unique within
    * a key group (it both orders the pair and drops the self-pair).
    *
    * At 100 TB: the join shuffles on (keys, bin) — 2|P| probe rows and
    * |P| build rows — and per-task work is per-(key, bin)² candidate
    * mass, so a key's cost grows with its per-window density, not with
    * its total row count; a residual hot (key, bin) is ordinary join
    * skew, which AQE splits. */
  def selfPairsWithin(
      points: DataFrame, keys: Seq[String], idCol: String, tsCol: String,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val base = points.select(
      keys.map(col) ++ Seq(col(idCol), col(tsCol)): _*)
    val probe = base
      .withColumn("__bin", expr(s"$tsCol div ${window}L"))
      .withColumn("__jbin", explode(array(col("__bin"), col("__bin") + 1L)))
      .toDF(keys ++ Seq(s"a_$idCol", s"a_$tsCol", "__bin", "__jbin"): _*)
    val build = base
      .withColumn("__bbin", expr(s"$tsCol div ${window}L"))
      .toDF(keys.map("__b_" + _) ++ Seq(s"b_$idCol", s"b_$tsCol", "__bbin"): _*)
    val keyCond = keys.map(k => probe(k) === build(s"__b_$k"))
      .foldLeft(probe("__jbin") === build("__bbin"))(_ && _)
    probe.join(build, keyCond)
      .where(abs(col(s"b_$tsCol") - col(s"a_$tsCol")) <= lit(window)
        // ownership: emit the same-bin case once (smaller id) and the
        // adjacent-bin case only from the +1 probe row
        && ((col("__bin") === col("__bbin")
              && col(s"a_$idCol") < col(s"b_$idCol"))
            || col("__bin") + 1L === col("__bbin")))
      // the adjacent-bin case emits with a = the earlier-BIN event, which
      // is not necessarily the smaller id — normalize the orientation
      .select(keys.map(col) ++ {
        val lt = col(s"a_$idCol") < col(s"b_$idCol")
        Seq(when(lt, col(s"a_$idCol")).otherwise(col(s"b_$idCol")).as(s"a_$idCol"),
          when(lt, col(s"a_$tsCol")).otherwise(col(s"b_$tsCol")).as(s"a_$tsCol"),
          when(lt, col(s"b_$idCol")).otherwise(col(s"a_$idCol")).as(s"b_$idCol"),
          when(lt, col(s"b_$tsCol")).otherwise(col(s"a_$tsCol")).as(s"b_$tsCol"))
      }: _*)
  }

  def intervalOverlap(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ea = a.withColumn("__abin",
      explode(sequence(
        expr(s"$aLo div ${binWidth}L"), expr(s"$aHi div ${binWidth}L"))))
    val eb = b.withColumn("__bbin",
      explode(sequence(
        expr(s"$bLo div ${binWidth}L"), expr(s"$bHi div ${binWidth}L"))))
    ea.join(eb, ea("__abin") === eb("__bbin")
        && ea(aLo) <= eb(bHi) && eb(bLo) <= ea(aHi))
      // integer div, like the bin ids — double division could round the
      // other way at a bin edge and drop (or double-emit) a boundary pair
      .where(expr(s"__abin = (greatest($aLo, $bLo) div ${binWidth}L)"))
      .drop("__abin", "__bbin")
  }
}
