package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Guards for SQL-function builders that consume CONSTANT arguments
  * (`bottom_k(x, 3)`, `sign_bands(v, 8, 8)`, …). Builders run at analysis
  * time, before binding — calling `eval()` on a non-foldable argument
  * (e.g. a column) there dies with an unbound-reference/NPE-style error
  * deep inside Catalyst. These helpers fail the same call with a clear
  * "must be a literal" message instead. */
private[graft] object FnArgs {

  private def folded(e: Expression, fn: String, arg: String): Any = {
    require(e.foldable,
      s"$fn: $arg must be a literal, got non-constant expression ${e.sql}")
    val v = e.eval()
    require(v.isInstanceOf[Number],
      s"$fn: $arg must be a numeric literal, got $v")
    v
  }

  def literalInt(e: Expression, fn: String, arg: String): Int =
    folded(e, fn, arg).asInstanceOf[Number].intValue()

  def literalDouble(e: Expression, fn: String, arg: String): Double =
    folded(e, fn, arg).asInstanceOf[Number].doubleValue()

  def literalLong(e: Expression, fn: String, arg: String): Long =
    folded(e, fn, arg).asInstanceOf[Number].longValue()
}
