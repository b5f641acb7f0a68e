package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale guard for q92's recurring-block set: the set is corpus-derived and
  * unbounded on template-heavy crawls, so the anti-join must not DEPEND on
  * a driver-side broadcast. This spec floods the operator with a corpus
  * where (nearly) every block is shared scaffolding — a large recurring
  * set — and proves the shuffle fallback completes with the same verdicts
  * the broadcast path produces on a clean corpus. */
class ParagraphDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** `nDocs` docs, each = one 32-token scaffold block from a shared pool
    * (block i appears in docs i and i+1 → EVERY pool block recurs) followed
    * by one unique 32-token block; plus `nAllScaffold` docs made of nothing
    * but pool blocks (these must drop entirely). */
  private def floodCorpus(nDocs: Int, nAllScaffold: Int) = {
    def pool(i: Int) = (0 until 32).map(j => s"tpl${i}_$j").mkString(" ")
    val mixed = (0 until nDocs).map { i =>
      (i.toLong, pool(i % nDocs) + " " + pool((i + 1) % nDocs) + " " +
        (0 until 32).map(j => s"uniq${i}_$j").mkString(" "))
    }
    val scaffoldOnly = (0 until nAllScaffold).map { j =>
      ((nDocs + j).toLong, pool(j) + " " + pool(j + 1))
    }
    (mixed ++ scaffoldOnly).toDF("doc_id", "text")
  }

  test("scaffolding flood: shuffle fallback completes and matches the broadcast path") {
    val docs = floodCorpus(nDocs = 2000, nAllScaffold = 10)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    // 2000 recurring fingerprints is tiny for a driver but far over a 1 KB
    // threshold — planner AND AQE must route the anti-join through a shuffle
    spark.conf.set(key, "1KB")
    val (fallbackRows, fallbackPlan) =
      try {
        val df = TrainingDataQueries.paragraphDedupOn(docs)
        val rows = df.collect()
        (rows, df.queryExecution.executedPlan.toString)
      } finally spark.conf.set(key, prev)
    // the fallback genuinely engaged: no broadcast anywhere in the final plan
    assert(!fallbackPlan.contains("BroadcastExchange"), fallbackPlan)
    assert(fallbackPlan.contains("LeftAnti"), fallbackPlan)
    // every mixed doc keeps exactly its unique block; scaffold-only docs drop
    assert(fallbackRows.length == 2000, s"got ${fallbackRows.length}")
    assert(fallbackRows.forall(r => r.getLong(1) == 1L && r.getLong(2) == 32L),
      "each surviving doc keeps its one 32-token unique block")
    // identical verdicts under the default (broadcast-eligible) config
    val defaultRows = TrainingDataQueries.paragraphDedupOn(docs).collect()
    assert(defaultRows.map(_.toSeq).toSeq == fallbackRows.map(_.toSeq).toSeq,
      "broadcast and shuffle paths must agree row-for-row")
  }
}
