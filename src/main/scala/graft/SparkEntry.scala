package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in per-domain catalogs:
  *   - [[CoreQueries]]   relational core + dialect + functions (§2.1–§2.8)
  * Each entry pairs a Spark implementation with a DuckDB oracle query
  * (where SQL-expressible) whose column names match exactly.
  */
object SparkEntry {

  private def catalogs: Seq[(String, Queries.Spec)] =
    CoreQueries.all ++ PipelineQueries.all ++ SystemQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map { case (name, spec) => name -> spec.fn }.toMap

  /** Equivalent DuckDB SQL for the driver's oracle compare. */
  def oracleSql: Map[String, String] =
    catalogs.collect { case (name, spec) if spec.oracle.isDefined =>
      name -> spec.oracle.get
    }.toMap

  /** Queries Bench times at sf0.1. */
  def headline: Seq[String] =
    catalogs.collect { case (name, spec) if spec.headline => name }
}
