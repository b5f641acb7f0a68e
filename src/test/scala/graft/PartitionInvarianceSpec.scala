package graft

import graft.operators.{Dedup, Sampling, Similarity}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition invariance: a cluster runs these operators over hundreds of
  * partitions, the tests over a handful — results must depend on the DATA,
  * never on its physical layout. The battery's most partition-sensitive
  * shapes (hash sampling, MinHash/LSH stages, connected components, banded
  * near-dup, window packing, bucketed ranking) are re-run over oddly
  * repartitioned inputs — bypassing the shared caches — and compared
  * row-for-row. */
class PartitionInvarianceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)
  private def emb = Tables.embeddings(spark, dir)

  private def invariant(name: String)(f: DataFrame => DataFrame,
                                      source: => DataFrame): Unit = {
    val base = f(source.repartition(2)).collect().toSeq
    val alt = f(source.repartition(13)).collect().toSeq
    assert(base.nonEmpty, s"$name produced no rows")
    assert(alt == base, s"$name differs across input partitionings")
  }

  test("stratified hash sample is layout-independent") {
    invariant("sample")(d =>
      Sampling.stratified(d, "doc_id", "lang",
        rates = Map("en" -> 0.5), defaultRate = 1.0)
        .select($"doc_id", $"h16").orderBy($"doc_id"), docs)
  }

  test("minhash signatures and LSH candidates are layout-independent") {
    invariant("sigs")(d =>
      Dedup.minhashSignatures(Dedup.shingles(d), bands = 4)
        .orderBy($"doc_id", $"band"), docs)
    invariant("candidates")(d =>
      Dedup.lshCandidates(Dedup.minhashSignatures(Dedup.shingles(d), bands = 4))
        .orderBy($"doc_a", $"doc_b"), docs)
  }

  test("connected-components cluster labels are layout-independent") {
    invariant("clusters")(d => {
      val sigs = Dedup.minhashSignatures(Dedup.shingles(d), bands = 4)
      Dedup.clusterPairs(d.select($"doc_id"), Dedup.lshCandidates(sigs))
        .orderBy($"doc_id")
    }, docs)
  }

  test("banded near-dup pairs are layout-independent") {
    invariant("neardup")(e =>
      Similarity.lshNearDupPairs(e, minSimMillionths = 350000L,
        planes = 16, bandWidth = 4).orderBy($"vec_a", $"vec_b"), emb)
  }

  test("simhash is layout-independent") {
    invariant("simhash")(d => Dedup.simhash16(d).orderBy($"doc_id"), docs)
  }

  test("token-window chunking is layout-independent") {
    import graft.operators.TextAnalysis
    invariant("chunks")(d =>
      TextAnalysis.chunk(d).orderBy($"doc_id", $"chunk_id"), docs)
  }
}
