package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[RetrievalQuality]] — the hybrid-retrieval VALUE claim: on the
  * two-signal labeled fixture (lexical near-dups + cosine neighbors),
  * the RRF fusion must not lose what either single list had: fused
  * recall@k ≥ max(sparse, dense). Deterministic end to end, so the pin
  * is exact, not statistical. */
class RetrievalQualitySpec extends AnyFunSuite with SparkTestSession {

  test("fused recall@10 >= max(single-list) and every mode finds something") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val rows = RetrievalQuality.recallAtK(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.keySet == Set("sparse", "dense", "fused"), s"$sf: $rows")
      assert(rows("fused") >= math.max(rows("sparse"), rows("dense")),
        s"$sf: fusion LOST recall: $rows")
      // each modality contributes real signal on its own axis: neither
      // single list is zero (dense finds the cosine neighbors, sparse the
      // lexical near-dups), and neither is perfect alone (each is blind
      // to the other's axis) — which is the scenario fusion exists for
      assert(rows("sparse") > 0 && rows("dense") > 0, s"$sf: $rows")
      assert(rows("fused") > 0, s"$sf: $rows")
    }
  }

  test("the fixture is deterministic: a second run reproduces every ppm") {
    val a = RetrievalQuality.recallAtK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = RetrievalQuality.recallAtK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
