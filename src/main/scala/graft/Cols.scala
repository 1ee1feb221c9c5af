package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column helpers enforcing the determinism conventions of
  * SURVEY.md §2 (epoch-micros instants, rounded double aggregates).
  */
object Cols {

  /** Instant → epoch microseconds (BIGINT), the canonical cross-engine
    * representation of a point in time (DuckDB: `epoch_us(ts)`).
    *
    * Fixture timestamps are parquet `isAdjustedToUTC=false` → Spark 4 reads
    * them as TIMESTAMP_NTZ; the session timezone is pinned UTC, so the cast
    * to TIMESTAMP is wall-clock preserving and matches DuckDB's naive
    * `epoch_us` exactly.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Money rounding (2 decimals).
    *
    * NOT Spark's `round` (BigDecimal HALF_UP) — that disagrees with DuckDB's
    * FP-based `round` at half-boundaries, which are common here (price ×
    * discount products have 4 decimals). Instead both engines evaluate the
    * bit-identical IEEE formula `floor(x*100.0 + 0.5)/100.0` (oracle side:
    * [[graft.OracleDsl.r2]]), so the result is deterministic across engines
    * by construction.
    */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Ratio rounding (6 decimals) — same shared-formula trick as [[r2]]. */
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
}
