package graft.queries

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pre-materialized `token_cost` path (q105's scaladoc promise made
  * real): IngestCuration's audit column equals the batch derivation
  * exactly, a persisted 4-column text-free layout feeds the cap core to
  * the same rows as q105's derive-per-query plan, and DomainQuota's token
  * mode budgets in the same units off the same column. */
class TokenCostLayoutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("persisted text-free layout reproduces q105 row for row") {
    val out = Files.createTempDirectory("graft_token_cost").toString
    // materialize once (the ingest-side derivation), persist WITHOUT text
    graft.operators.TextAnalysis.chunkTokenCost(
        graft.Tables.documents(spark, dir)
          .select($"doc_id", $"source", $"lang", $"text"))
      .select($"doc_id", $"source", $"lang", $"token_cost")
      .write.mode("overwrite").parquet(out)
    val layout = spark.read.parquet(out)
    assert(!layout.columns.contains("text"), "the layout must be text-free")
    val fromLayout = TrainingDataQueries.chunkDomainCapOn(layout)
      .collect().map(_.toSeq).toSeq
    val perQuery = TrainingDataQueries.chunkDomainCap(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromLayout == perQuery,
      s"pre-materialized and derive-per-query caps must agree (${fromLayout.size} rows)")
  }

  test("IngestCuration's token_cost audit column is the exact chunkTokenCost") {
    val reg = Files.createTempDirectory("graft_tc_reg").toString
    val batch = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").limit(50)
    val verdict = graft.streaming.IngestCuration.processBatch(batch, reg)
      .select($"doc_id", $"token_cost")
      .as[(Long, Long)].collect().toMap
    val expect = graft.operators.TextAnalysis.chunkTokenCost(batch)
      .select($"doc_id", $"token_cost").as[(Long, Long)].collect().toMap
    assert(verdict == expect,
      "the audit column must equal the batch derivation per doc")
  }

  test("DomainQuota token mode budgets off the materialized column") {
    val reg = Files.createTempDirectory("graft_tc_quota").toString
    val costed = graft.operators.TextAnalysis.chunkTokenCost(
        graft.Tables.documents(spark, dir)
          .select($"doc_id", $"source", $"lang", $"text"))
      .select($"doc_id", $"source", $"token_cost")
    val v = graft.streaming.DomainQuota.processBatchTokens(
      costed, reg, budget = 600L, tokenCol = "token_cost")
    val admittedTokens = v.filter($"admitted")
      .join(costed, Seq("doc_id", "source"))
      .groupBy($"source").agg(sum($"token_cost").as("t"))
      .as[(String, Long)].collect().toMap
    assert(admittedTokens.nonEmpty && admittedTokens.values.forall(_ <= 600L),
      s"every domain's admitted chunk tokens must fit the budget: $admittedTokens")
  }
}
