package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 is one entry in `queries`
  * (name → (spark, sfDir) => DataFrame) and — unless it is inherently
  * non-SQL-expressible (approximate sketches) — one matching DuckDB oracle
  * SQL string in `oracleSql`. Column names and row order are deterministic
  * and identical on both sides (see the determinism box in SURVEY.md §2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed curation pipeline — quality gate → exact-dedup survivors
    * → stratified sample → sequence packing in one DAG — exercises scan
    * pruning, two window shuffles and the repo's determinism conventions in
    * a single smoke. */
  def entry(spark: SparkSession): DataFrame =
    CorpusFilters.qCorpusPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Scalars.queries ++
      EventTime.queries ++ LlmPipeline.queries ++ TrainingData.queries ++
      Analytics.queries ++ Roundtrip.queries ++ CorpusFilters.queries ++
      Insights.queries ++ Hygiene.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windows.oracles ++ Scalars.oracles ++
      EventTime.oracles ++ LlmPipeline.oracles ++ TrainingData.oracles ++
      Analytics.oracles ++ Roundtrip.oracles ++ CorpusFilters.oracles ++
      Insights.oracles ++ Hygiene.oracles
}
