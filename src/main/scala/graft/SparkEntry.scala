package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's end-to-end ETL on embedded fixtures —
    * two ingest runs (second overlapping, proving idempotent re-run)
    * into parquet stock tables, returning the loaded daily table.
    */
  def entry(spark: SparkSession): DataFrame = StockPipeline.demo(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Stock.queries ++
    graft.queries.Corpus.queries ++
    graft.queries.Advanced.queries ++
    graft.queries.Extensions.queries ++
    graft.queries.TpcH.queries ++
    graft.queries.GraphQueries.queries ++
    graft.queries.Features.queries ++
    graft.queries.HashProbes.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.Stock.oracles ++
    graft.queries.Corpus.oracles ++
    graft.queries.Advanced.oracles ++
    graft.queries.Extensions.oracles ++
    graft.queries.TpcH.oracles ++
    graft.queries.GraphQueries.oracles ++
    graft.queries.Features.oracles ++
    graft.queries.HashProbes.oracles
}
