package graft

/** Tiny string helpers for building the DuckDB oracle SQL so that every
  * rounding site uses the exact same IEEE-754 formula as the Spark side
  * ([[graft.Cols.r2]]/[[graft.Cols.r6]]) — cross-engine hash parity by
  * construction instead of by hoping two `round` implementations agree.
  */
object OracleDsl {
  /** floor(e*100 + 0.5)/100 — money rounding, 2 decimals. */
  def r2(e: String): String = s"floor(($e)*100.0 + 0.5)/100.0"

  /** floor(e*1e6 + 0.5)/1e6 — ratio rounding, 6 decimals. */
  def r6(e: String): String = s"floor(($e)*1000000.0 + 0.5)/1000000.0"
}
