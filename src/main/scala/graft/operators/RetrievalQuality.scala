package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Labeled-relevance evidence for hybrid retrieval — WHY the RRF fusion
  * (q125/q128) exists, measured: recall@k for sparse-only (BM25),
  * dense-only (exact cosine), and the RRF fusion over one deterministic
  * fixture. q125/q128 pin the fusion's arithmetic; this pins its VALUE
  * (the ivfpq_recall discipline: a quality claim gets a number, not an
  * adjective). EXT surface — the reference has no retrieval.
  *
  * The fixture: the testdata's embeddings are DELIBERATELY not aligned
  * with the texts (measured: token-near-dup pairs have median cosine
  * ≈ the random baseline), so no single fixture signal can be "semantic
  * relevance". Instead each query document's relevant set is the UNION
  * of one signal per modality — its lexical near-duplicates (exact
  * token-set Jaccard ≥ `jaccardPpmMin`, integer ppm) and its `nSem`
  * nearest exact-cosine neighbors — which is exactly the production
  * scenario hybrid retrieval is built for: each retriever can reach its
  * own kind of relevant document and is blind to the other's, and the
  * fusion must keep both. The spec asserts `fused ≥ max(single)` on this
  * fixture; SCALE.md publishes the table.
  *
  * Everything is deterministic and integer-quantized: query ids are the
  * smallest `nQueries` carriers of the corpus's near-dup marker token
  * ("dup" — the q124 fixture family), Jaccard is floored ppm, both lists
  * and the fusion are the battery's own quantized operators, and
  * recall@k is floored ppm of an integer ratio. Driver-side pulls are
  * bounded: query token sets (document-length), truth sets (threshold +
  * nSem), and k-row serving lists — the topKBatch request-payload
  * contract. */
object RetrievalQuality {

  /** One row per mode: `(mode, recall_ppm, n_queries, k)` — recall_ppm is
    * the floored-ppm mean over queries of |top-k ∩ relevant| / |relevant|. */
  def recallAtK(spark: SparkSession, dir: String, k: Int = 10,
                nQueries: Int = 8, jaccardPpmMin: Long = 400000L,
                nSem: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct().localCheckpoint(true) // token SETS feed 3 consumers
    val queryIds = toks.filter(col("tok") === "dup")
      .select(col("doc_id")).orderBy(col("doc_id")).limit(nQueries)
      .as[Long].collect().toSeq
    require(queryIds.nonEmpty, s"no 'dup'-marked documents under $dir")

    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // lexical truth: exact token-set Jaccard vs the whole corpus, floored
    // ppm (integer — both engines and reruns agree bit for bit)
    val qtoks = toks.filter(col("doc_id").isInCollection(queryIds))
      .select(col("doc_id").as("qid"), col("tok"))
    val lexTruth = qtoks.join(toks, Seq("tok"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "qid")
        .withColumnRenamed("sz", "sz_q"), Seq("qid"))
      .join(sizes, Seq("doc_id"))
      .filter(col("n_inter") * 1000000L >=
        lit(jaccardPpmMin) * (col("sz_q") + col("sz") - col("n_inter")))
      .select(col("qid"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    def denseList(qid: Long, n: Int): Seq[Long] =
      Similarity.topK(emb, qid, n + 1)
        .select(col("vec_id").cast("long")).as[Long]
        .collect().filter(_ != qid).take(n).toSeq

    val truth: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> (lexTruth.filter(_._1 == qid).map(_._2).toSet ++
        denseList(qid, nSem))
    }.toMap

    val perQuery = queryIds.map { qid =>
      val qTerms = qtoks.filter(col("qid") === qid)
        .select(col("tok")).as[String].collect().toSeq
      val sparseDf = Retrieval.bm25TopK(docs, qTerms, k + 1)
      val sparse = sparseDf.select(col("doc_id")).as[Long]
        .collect().filter(_ != qid).take(k).toSeq
      val dense = denseList(qid, k)
      def asList(ids: Seq[Long]) =
        ids.zipWithIndex.map { case (id, i) => (i + 1, id) }
          .toDF("rnk", "doc_id")
      val fused = Retrieval.rrfFuse(Seq(asList(sparse), asList(dense)), k)
        .select(col("doc_id")).as[Long].collect().toSeq
      val t = truth(qid)
      def ppm(hits: Seq[Long]): Long =
        if (t.isEmpty) 0L else hits.count(t).toLong * 1000000L / t.size
      (ppm(sparse), ppm(dense), ppm(fused))
    }

    val n = perQuery.size.toLong
    Seq(("sparse", perQuery.map(_._1).sum / n),
        ("dense", perQuery.map(_._2).sum / n),
        ("fused", perQuery.map(_._3).sum / n))
      .map { case (m, r) => (m, r, n, k) }
      .toDF("mode", "recall_ppm", "n_queries", "k")
  }
}
