package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is a named query in [[queries]]; [[oracleSql]] carries the
  * DuckDB-equivalent SQL for the driver's hash compare. Queries without an
  * oracle (engine-private hash arithmetic) get the rows-only check.
  */
object SparkEntry {

  /** Flagship raw→stg→dwh→datamart pipeline on sf0.001; driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
