package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.cdc.CdcQueries
import graft.operators.{Advanced, Curation, Dedup, Extras, Graph, Multimodal, Relational, Relational2, ScalePatterns, Similarity, TextOps, TimeWindows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a query here; everything with an
  * `oracleSql` entry is hash-checked against DuckDB at sf0.01 by the
  * driver. Queries without an oracle (approximate / not SQL-expressible:
  * minhash LSH, simhash, ANN, the mapPartitions feature extractor) get the
  * rows-only check plus scalatest coverage.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Dedup.queries ++
      Similarity.queries ++ TextOps.queries ++ Multimodal.queries ++
      CdcQueries.queries ++ Extras.queries ++ TimeWindows.queries ++
      Advanced.queries ++ Curation.queries ++ ScalePatterns.queries ++
      Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TextOps.oracles ++ Multimodal.oracles ++
      CdcQueries.oracles ++ Extras.oracles ++ TimeWindows.oracles ++
      Advanced.oracles ++ Curation.oracles ++ ScalePatterns.oracles ++
      Graph.oracles
}
