package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The round-8 postmortem tripwire: the driver regenerating testdata with a
  * different parquet encoding must fail HERE, with a message naming the
  * drifted column — not as fifteen unrelated analysis exceptions. */
class SchemaDriftSpec extends AnyFunSuite with SparkTestSession {
  private val sf = "/root/testdata/sf0.001"

  test("all 10 tables load with accepted column types (tripwire)") {
    val v = SchemaContract.violations(spark, sf)
    assert(v.isEmpty, "schema drift detected:\n" + v.mkString("\n"))
  }

  test("Tables.events canonicalizes ts to TIMESTAMP regardless of encoding") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("a ts range predicate reaches the parquet scan as a pushed filter") {
    // the 100 TB access path: event-time range scans must prune at the
    // source, so the canonicalized ts column has to stay scan-native — a
    // plan that filters above a cast reads every row group
    import org.apache.spark.sql.functions.{col, lit}
    val df = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-02 00:00:00").cast(TimestampType))
      .select("event_id", "ts")
    val plan = df.queryExecution.executedPlan.toString
    // the RANGE predicate specifically — IsNotNull(ts) alone also lands in
    // PushedFilters and must not satisfy this test
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"ts range predicate must be pushed to the scan:\n$plan")
  }

  test("a deliberate re-encode produces a failure naming the drifted column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toFile
    try {
      // copy the real tables, then overwrite events with ts re-encoded STRING
      for (t <- Tables.all)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$t.parquet"),
          java.nio.file.Paths.get(s"${tmp.getAbsolutePath}/$t.parquet"))
      val drifted = Tables.load(spark, sf, "events")
        .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(StringType))
      val out = s"${tmp.getAbsolutePath}/events.rewrite"
      drifted.coalesce(1).write.mode("overwrite").parquet(out)
      val part = new java.io.File(out).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"${tmp.getAbsolutePath}/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val v = SchemaContract.violations(spark, tmp.getAbsolutePath)
      assert(v.exists(_.startsWith("events.ts:")),
        s"expected a violation naming events.ts, got: $v")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("true TIMESTAMP(NANOS) parquet canonicalizes via the scoped legacy retry") {
    // committed fixture: sf0.001 events re-encoded as TIMESTAMP(NANOS) (the
    // pre-round-8 driver encoding; Spark cannot write it, pyarrow generated
    // it once). The plain reader refuses this outright, so it exercises
    // loadAdaptive's refusal-matched conf retry end-to-end.
    val nanosDir = new java.io.File(
      getClass.getResource("/legacy-nanos/events.parquet").toURI).getParent
    val canon = Tables.events(spark, nanosDir)
    assert(canon.schema("ts").dataType == TimestampType)
    // ns values are exactly µs·1000 here, so truncation is lossless:
    // the fixture must read value-identical to the source table
    val a = Tables.events(spark, sf).select("event_id", "ts")
    val b = canon.select("event_id", "ts")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // the tripwire must not misreport the encoding it accepts as a load
    // failure, and must be stable across calls (no session-order effects)
    val v1 = SchemaContract.violations(spark, nanosDir)
      .filter(l => l.startsWith("events") || l.startsWith("Tables.events"))
    val v2 = SchemaContract.violations(spark, nanosDir)
      .filter(l => l.startsWith("events") || l.startsWith("Tables.events"))
    assert(v1.isEmpty, s"false drift report on accepted NANOS encoding: $v1")
    assert(v2 == v1, "violations must be call-order independent")
  }

  test("legacy nanos-as-long encoding still canonicalizes (LongType branch)") {
    // simulate the pre-round-8 encoding: ts as raw nanos since epoch
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nanos").toFile
    try {
      val asLong = Tables.events(spark, sf)
        .withColumn("ts", (unix_micros(col("ts")) * lit(1000L) + lit(789L)))
      val out = s"${tmp.getAbsolutePath}/events.rewrite"
      asLong.coalesce(1).write.mode("overwrite").parquet(out)
      val part = new java.io.File(out).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"${tmp.getAbsolutePath}/events.parquet"))
      val canon = Tables.events(spark, tmp.getAbsolutePath)
      assert(canon.schema("ts").dataType == TimestampType)
      // ns→µs truncation drops the injected 789 ns; values match the source
      val a = Tables.events(spark, sf).select("event_id", "ts")
      val b = canon.select("event_id", "ts")
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
