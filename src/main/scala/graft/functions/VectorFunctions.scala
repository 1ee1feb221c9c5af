package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType|DoubleType)` embeddings.
  *
  * Everything here composes Spark's higher-order functions (`transform`,
  * `zip_with`, `aggregate`), which stay inside whole-stage codegen — no UDFs,
  * no serialization boundary, and the fold over the array is sequential and
  * deterministic (important for oracle hash-parity of double sums).
  *
  * Floats are cast to double element-wise BEFORE multiplying so both engines
  * (Spark and the DuckDB oracle) accumulate in float64 in identical order.
  */
object VectorFunctions {

  /** Element-wise cast to double — do all arithmetic in float64. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold sum of an array<double> column. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (same length). */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm of an array<double> column. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two array<double> columns.
    * Caller is responsible for zero-norm guards (`nullif`-style) if the data
    * can contain all-zero vectors; the fixture embeddings are N(0, 0.1^2) so
    * norms are strictly positive.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
