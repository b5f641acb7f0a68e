package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q97's invariants beyond the DuckDB hash check: an oracle-independent
  * plain-JVM replay of the whole quantize → centroid → cosine algebra
  * (exact equality — the integer discipline means there is no tolerance to
  * hide behind), plus threshold-binding and range sanity. */
class EmbeddingOutlierSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val result =
    LlmQueries.embeddingOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  private lazy val raw = {
    import spark.implicits._
    graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
  }

  test("plain-JVM replay of the full algebra matches every row exactly") {
    val byLabel = raw.groupBy(_._2)
    val cent: Map[Int, (Array[Long], Long)] = byLabel.map { case (label, vs) =>
      val sums = new Array[Long](64)
      vs.foreach { case (_, _, emb) =>
        var i = 0
        while (i < 64) { sums(i) += math.floor(emb(i).toDouble * 1024).toLong; i += 1 }
      }
      val n = vs.length.toLong
      label -> (sums.map(s => math.floor(s.toDouble / n).toLong), n)
    }
    val expect = raw.map { case (id, label, emb) =>
      val (c, n) = cent(label)
      val qv = emb.map(x => math.floor(x.toDouble * 1024).toLong)
      val dot = qv.zip(c).map { case (a, b) => a * b }.sum
      val nd2 = qv.map(x => x * x).sum
      val nc2 = c.map(x => x * x).sum
      val ppm = math.floor(dot.toDouble / (math.sqrt(nd2.toDouble) * math.sqrt(nc2.toDouble)) * 1e6).toLong
      (id, label, n, ppm, ppm < -100000L)
    }.sortBy(_._1)
    assert(result.toSeq == expect.toSeq)
  }

  test("threshold binds without flagging everything; scores in range") {
    val ppm = result.map(_._4)
    assert(result.exists(_._5), "at least one outlier must fire at sf0.001")
    assert(result.count(_._5) < result.length / 2, "most vectors are inliers")
    assert(ppm.forall(p => p >= -1000000L && p <= 1000000L))
    // quantized centroids never zero out on this corpus (guards the
    // division — a zero norm would surface as a null ppm / missing row)
    assert(result.length == raw.length)
  }
}
