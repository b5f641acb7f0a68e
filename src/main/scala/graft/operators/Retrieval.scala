package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse retrieval + rank fusion — the LEXICAL half of the retrieval
  * stack beside the dense ANN family ([[Similarity]], [[graft.sources
  * .IvfIndexStore]]): BM25 top-k over the corpus for a bounded query-term
  * list, and reciprocal-rank fusion of ranked lists — the standard
  * hybrid-retrieval combiner (dense + sparse is how production retrieval
  * for training-data curation and RAG actually ships). EXT surface: the
  * reference has no retrieval (its core is CDC/webhook plumbing —
  * `/root/reference/src/cdc_webhook.c:153`).
  *
  * Determinism discipline (the battery's): per-(doc, term) BM25
  * contributions quantize to integer millionths BEFORE the per-doc sum,
  * so the aggregation is exact long addition — order-free, engine-free —
  * and the only floating-point work is one scalar expression per
  * (doc, term) row whose arithmetic is IEEE-specified except `ln`
  * (q45's accepted tolerance, floor-margined). RRF is integer-exact end
  * to end: `1000000 div (rrfK + rank)` — no floats anywhere.
  */
object Retrieval {

  /** BM25 top-k: score(D) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    * IDF(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the Robertson/Spärck
    * Jones form with the +1 that keeps IDF positive at any df.
    *
    * Scale shape: one tokenization pass feeds document lengths (per-doc
    * partial+final count) and the query-term postings (the `tok IN
    * (terms)` filter prunes the explode's output BEFORE the tf
    * aggregation — postings volume is O(matching tokens), never the
    * corpus token stream); per-term df and the 2-row corpus stats
    * broadcast back; the only corpus-keyed shuffle is the tf/doc-length
    * equi-join on the doc id; top-k is one TakeOrderedAndProject.
    * `queryTerms` is a driver-side request payload by contract (the
    * [[graft.sources.IvfIndexStore.topKBatch]] discipline).
    *
    * Output: `(rnk, doc_id, n_terms_hit, bm25_q)` — quantized millionths,
    * ranked (bm25_q desc, doc_id), exactly `k` rows or every matching
    * document if fewer. Documents matching NO query term never score
    * (BM25 of an empty intersection is 0 — they are not ranked). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query-term list")
    require(k >= 1, "bm25: k must be positive")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // 1 row: corpus size and total token count (avgdl derives in the
    // scorer so both engines compute the same double the same way)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val qtf = toks.filter(col("tok").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    bm25Rank(
      qtf.join(broadcast(qdf), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), bm25ContribQ(k1, b).as("contrib_q")),
      k)
  }

  /** The quantized per-(doc, term) BM25 contribution over columns
    * `(tf, dl, df, n_docs, total_len)` — ONE definition shared by the
    * from-corpus scorer above and the persisted-index serving path
    * ([[graft.sources.PostingsStore.bm25TopK]]), so the two paths are
    * expression-shape-identical by construction: same casts, same
    * operation order, same IEEE doubles, same floored millionths. */
  private[graft] def bm25ContribQ(k1: Double, b: Double): Column = {
    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    floor(contrib * lit(1000000.0)).cast("long")
  }

  /** [[bm25TopK]]'s shared tail over `(doc_id, contrib_q)` rows: exact
    * long-sum per document, bounded top-k, rank window over the k
    * survivors only. */
  private[graft] def bm25Rank(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_q")).as("bm25_q"))
      .orderBy(col("bm25_q").desc, col("doc_id"))
      .limit(k)
      // rank over the k surviving rows only (bounded window input)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("bm25_q").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("n_terms_hit"), col("bm25_q"))
  }

  /** Reciprocal-rank fusion: score(d) = Σ_lists 1000000 div (rrfK + rank_d)
    * — the standard hybrid combiner (Cormack/Clarke/Büttcher's RRF with
    * the classic k = 60), in integer millionths so every engine replays
    * it bit-for-bit: no floats, order-free long sums. Each input list is
    * `(idCol, rankCol)` with rank 1-based; a document absent from a list
    * contributes nothing for it (the RRF convention). Input lists are
    * top-k serving RESULTS — bounded by contract — so the fusion is
    * KB-scale algebra: union, one aggregate, one TakeOrderedAndProject.
    *
    * Output: `(rnk, idCol, n_lists, rrf_q)` ranked (rrf_q desc, id). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60,
              idCol: String = "doc_id", rankCol: String = "rnk"): DataFrame = {
    require(lists.nonEmpty, "rrf: no lists to fuse")
    require(k >= 1 && rrfK >= 0, "rrf: need k >= 1 and rrfK >= 0")
    import org.apache.spark.sql.expressions.Window
    val contribs = lists.map(_.select(col(idCol).cast("long").as(idCol),
        expr(s"CAST(1000000 AS BIGINT) div " +
          s"(CAST($rrfK AS BIGINT) + CAST($rankCol AS BIGINT))").as("c")))
      .reduce(_ unionByName _)
    contribs.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("c")).as("rrf_q"))
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf_q").desc, col(idCol))))
      .select(col("rnk"), col(idCol), col("n_lists"), col("rrf_q"))
  }
}
