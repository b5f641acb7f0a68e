package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.VariantType
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, event_type: String, props: String)
case class EvX(event_id: Long, event_type: String, props: String, extra: Int)

/** The persisted VARIANT layout: props decodes once at write, the stored
  * column round-trips as a real parquet VariantType, the shared
  * aggregation over the layout equals q103's query-time decode row for
  * row, malformed rows degrade to null variants instead of failing
  * the write, and the streaming sink appends the same layout per
  * micro-batch while refusing schema-drifted batches. */
class VariantStoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  test("persisted layout stores VariantType and reproduces q103 exactly") {
    val out = Files.createTempDirectory("graft_variant_store").toString
    VariantEventStore.write(graft.Tables.events(spark, dir), out)
    val stored = VariantEventStore.read(spark, out)
    assert(stored.schema("props_v").dataType == VariantType,
      s"layout must persist a real variant column, got ${stored.schema("props_v").dataType}")
    assert(!stored.columns.contains("props"),
      "the JSON string must not ride along — the layout IS the decode")
    val fromLayout = VariantEventStore.propsAgg(stored).collect().map(_.toSeq).toSeq
    val queryTime = graft.queries.EventQueries.variantProps(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromLayout == queryTime,
      s"layout and query-time decode must agree:\n$fromLayout\nvs\n$queryTime")
  }

  test("the layout writes SHREDDED and a single-field read scans only the typed subcolumn") {
    val out = Files.createTempDirectory("graft_variant_shred").toString
    VariantEventStore.write(graft.Tables.events(spark, dir), out)
    val p = VariantEventStore.read(spark, out)
      .select(expr("variant_get(props_v, '$.k', 'int')").as("k"))
      .queryExecution.executedPlan.toString
    // pushVariantIntoScan replaces the variant with a struct of requested
    // fields; a regression to reading the opaque binary would show
    // props_v:variant in the ReadSchema instead of a struct subcolumn
    assert(p.contains("props_v:struct"),
      s"the scan must read the shredded subcolumn, not the variant binary:\n$p")
    assert(!p.contains("props_v:variant"), p)
  }

  test("streaming sink appends per micro-batch; equals the batch write; drift aborts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = Files.createTempDirectory("graft_variant_stream").toString
    val rows = Seq(Ev(1L, "click", """{"k": 1}"""),
      Ev(2L, "view", """{"k": 2}"""), Ev(3L, "click", """{"k": 5}"""))

    val ms = MemoryStream[Ev]
    val q = VariantEventStore.sink(ms.toDF(), out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_variant_ck").toString)
      .start()
    ms.addData(rows(0), rows(1))
    q.processAllAvailable()
    ms.addData(rows(2))
    q.processAllAvailable()
    q.stop()

    val stored = VariantEventStore.read(spark, out)
    assert(stored.schema("props_v").dataType == VariantType)
    // value-identical to the batch write of the same rows
    val batchOut = Files.createTempDirectory("graft_variant_twin").toString
    VariantEventStore.write(rows.toDF(), batchOut)
    assert(VariantEventStore.propsAgg(stored).collect().map(_.toSeq).toSeq ==
      VariantEventStore.propsAgg(VariantEventStore.read(spark, batchOut))
        .collect().map(_.toSeq).toSeq)

    // at-least-once REPLAY: re-running a batch id rewrites its own
    // ingest_batch partition (dynamic overwrite) — events never double
    VariantEventStore.appendBatch(rows.take(2).toDF(), out, "props", 0L)
    assert(VariantEventStore.read(spark, out).count() == 3,
      "a replayed batch must rewrite its partition, not append a copy")

    // a drifted batch (extra column) against the SAME layout must abort
    // the query — and append NOTHING
    val ms2 = MemoryStream[EvX]
    val q2 = VariantEventStore.sink(ms2.toDF(), out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_variant_ck2").toString)
      .start()
    ms2.addData(EvX(4L, "click", """{"k": 9}""", 7))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("drifted")), msgs(e).mkString(" | "))
    assert(VariantEventStore.read(spark, out).count() == 3,
      "the drifted batch must not have appended")
  }

  test("malformed props become null variants at write, not job failures") {
    val out = Files.createTempDirectory("graft_variant_bad").toString
    val feed = Seq(
      (1L, "click", """{"k": 3}"""),
      (2L, "click", """not json at all"""),
      (3L, "view", null.asInstanceOf[String]))
      .toDF("event_id", "event_type", "props")
    VariantEventStore.write(feed, out)
    val stored = VariantEventStore.read(spark, out)
    val nulls = stored.filter(col("props_v").isNull)
      .select($"event_id").as[Long].collect().toSet
    assert(nulls == Set(2L, 3L), s"malformed + null rows store null variants: $nulls")
    val agg = VariantEventStore.propsAgg(stored)
      .select($"event_type", $"sum_k", $"n_null_k").collect()
      .map(r => r.getString(0) -> (r.get(1), r.getLong(2))).toMap
    assert(agg.keySet == Set("click", "view"))
    assert(agg("click") == ((3L, 1L)),
      s"the parsed row aggregates; the malformed one counts as null k: $agg")
  }
}
