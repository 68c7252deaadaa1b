package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CdcQueries, CoreQueries, ExtQueries, FunctionQueries, PipelineQueries, QualityQueries, RetrievalQueries, SurfaceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module query catalogs; every entry with a
  * DuckDB-expressible equivalent also appears in `oracleSql` with matching
  * column names/aliases (the driver's compare hashes columns by name).
  */
object SparkEntry {

  /** Flagship query (star join + grouped agg + top-k) on sf=0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02StarRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++ PipelineQueries.queries ++
      SurfaceQueries.queries ++ FunctionQueries.queries ++
      CdcQueries.queries ++ RetrievalQueries.queries ++
      QualityQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles ++ PipelineQueries.oracles ++
      SurfaceQueries.oracles ++ FunctionQueries.oracles ++
      CdcQueries.oracles ++ RetrievalQueries.oracles ++
      QualityQueries.oracles
}
