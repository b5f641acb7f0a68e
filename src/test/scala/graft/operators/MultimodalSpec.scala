package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codec is a stub; what these tests pin is the REAL plumbing — schema,
  * encoders, partition-wise batch shape, determinism, payload-size behavior. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val assets =
    Multimodal.assetsFromDocuments(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).cache()

  test("asset schema: opaque binary payload + typed metadata") {
    val sch = assets.schema
    assert(sch("data").dataType.typeName == "binary")
    assert(Seq("asset_id", "kind", "width", "height", "sample_rate", "duration_ms")
      .forall(sch.fieldNames.contains))
    assert(assets.select($"kind").distinct().as[String].collect().toSet ==
      Set("image", "audio", "video"))
  }

  test("feature extraction: histogram mass equals byte count; deterministic") {
    val f = Multimodal.extractFeatures(assets)
    val rows = f.limit(50).collect()
    assert(rows.forall(r => r.byte_hist.sum == r.n_bytes))
    assert(rows.forall(r => r.brightness > 0 && r.brightness < 256))
    val again = Multimodal.extractFeatures(assets).limit(50).collect()
    assert(rows.map(_.brightness).toSeq == again.map(_.brightness).toSeq)
  }

  test("resize caps dimensions and shrinks payloads, never upscales") {
    val resized = Multimodal.resize(assets, maxW = 100, maxH = 100).collect()
    assert(resized.forall(a => a.width <= 100 && a.height <= 100))
    val orig = assets.collect().map(a => a.asset_id -> a).toMap
    resized.foreach { a =>
      assert(a.data.length <= orig(a.asset_id).data.length)
    }
  }

  test("frame sampling emits every stride-th fixed-size window, video only") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val kinds = assets.filter($"kind" === "video").select($"asset_id")
      .as[Long].collect().toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(kinds))
    assert(frames.filter(_.frame_no == 0).forall(_.data.length == 32))
  }
}
