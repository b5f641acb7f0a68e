package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry: every operator from SURVEY.md §2 that is "done" has an
  * entry here (and, when SQL-expressible, a DuckDB oracle). Category objects
  * live in graft.queries.*; this object just concatenates them so
  * SparkEntry stays a thin driver contract. */
object QueryRegistry {
  type Q = (SparkSession, String) => DataFrame

  private def modules: Seq[QueryModule] = Seq(
    queries.RelationalQueries,
    queries.CdcQueries,
    queries.WindowQueries,
    queries.EventQueries,
    queries.FunctionQueries,
    queries.LlmQueries,
    queries.ExtraQueries,
    queries.AdvancedQueries,
    queries.TrainingDataQueries)

  def all: Map[String, Q] = modules.flatMap(_.queries).toMap
  def oracles: Map[String, String] = modules.flatMap(_.oracles).toMap
}

/** One category of queries (relational / cdc / dedup / …). */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
