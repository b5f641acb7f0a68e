package graft

import java.nio.file.Files

import graft.cdc.Emp
import graft.delivery.CaptureServer
import graft.model.TriggerConfig
import graft.queue.{CredentialStore, Dispatcher, EventLog}
import graft.queue.EventLog.QueueRow
import graft.streaming.ChangeRec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Control-plane lifecycle — the reference's create_event_trigger flow
  * (SURVEY §3.1) end to end: validate → credentials → bind → deliver. */
class TriggerRegistrySpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var server: CaptureServer = _
  private var registry: TriggerRegistry = _
  private val root = Files.createTempDirectory("graft_reg_").toString

  override def beforeAll(): Unit = {
    server = new CaptureServer
    registry = new TriggerRegistry(spark,
      credentialsDir = s"$root/credentials",
      queueDir = s"$root/event_log",
      checkpointRoot = s"$root/ck")
  }
  override def afterAll(): Unit = { registry.stopAll(); server.stop() }

  private def feed() = {
    val ms = MemoryStream[ChangeRec]
    ms.addData(
      ChangeRec("INSERT", null, Emp(1, "alice", 100)),
      ChangeRec("DELETE", Emp(3, "carol", 300), null))
    (ms, ms.toDF().select($"op", $"oldImage".as("old"), $"newImage".as("new")))
  }

  test("SYNC trigger: create binds a query and payloads reach the webhook") {
    server.received.clear()
    val (_, changes) = feed()
    val q = registry.create(TriggerConfig(
      name = "reg_sync", tableName = "employees",
      operations = Seq("INSERT", "DELETE"), webhookUrl = server.url), changes)
    try {
      q.processAllAvailable()
      assert(server.bodies.length == 2)
      assert(registry.list.contains("reg_sync"))
    } finally registry.drop("reg_sync")
    assert(!q.isActive)
  }

  test("PRIVATE trigger: secrets land in the store, retained config is scrubbed, delivery works") {
    server.received.clear()
    val (_, changes) = feed()
    val q = registry.create(TriggerConfig(
      name = "reg_priv", tableName = "employees",
      operations = Seq("INSERT", "DELETE"), webhookUrl = server.url,
      headers = Map("X-API-Key" -> "registrysecret"), security = "PRIVATE"), changes)
    try {
      q.processAllAvailable()
      assert(server.bodies.length == 2)
      val stored = CredentialStore.read(spark, s"$root/credentials")
        .filter($"trigger_name" === "reg_priv")
        .select($"webhook_url", $"headers").as[(String, String)].head()
      assert(stored._1 == server.url && stored._2.contains("registrysecret"))
    } finally registry.drop("reg_priv")
  }

  test("ASYNC trigger: events reach the durable queue; dispatcher delivers") {
    server.received.clear()
    val (_, changes) = feed()
    val q = registry.create(TriggerConfig(
      name = "reg_async", tableName = "employees",
      operations = Seq("INSERT", "DELETE"), webhookUrl = server.url,
      mode = "ASYNC"), changes)
    try q.processAllAvailable() finally registry.drop("reg_async")
    val pending = EventLog.read(spark, s"$root/event_log").as[QueueRow]
      .filter(_.trigger_name == "reg_async").collect()
    assert(pending.length == 2 && pending.forall(_.status == "PENDING"))
    val stats = Dispatcher.runOnce(spark, s"$root/event_log")
    assert(stats.delivered == 2 && server.bodies.length == 2)
  }

  test("multiple triggers on the same table fire independently per their op filters") {
    // reference test_multiple_triggers_on_same_table: one change feed, two
    // triggers with different operation filters — each webhook sees only
    // its own operations.
    val insServer = new CaptureServer
    val delServer = new CaptureServer
    try {
      val (_, changes) = feed()
      val qi = registry.create(TriggerConfig(
        name = "reg_multi_ins", tableName = "employees",
        operations = Seq("INSERT"), webhookUrl = insServer.url), changes)
      val (_, changes2) = feed()
      val qd = registry.create(TriggerConfig(
        name = "reg_multi_del", tableName = "employees",
        operations = Seq("DELETE"), webhookUrl = delServer.url), changes2)
      try {
        qi.processAllAvailable(); qd.processAllAvailable()
        assert(registry.list.toSet.intersect(
          Set("reg_multi_ins", "reg_multi_del")).size == 2)
        assert(insServer.bodies.length == 1 &&
          insServer.bodies.head.contains("\"op\":\"INSERT\""))
        assert(delServer.bodies.length == 1 &&
          delServer.bodies.head.contains("\"op\":\"DELETE\""))
      } finally { registry.drop("reg_multi_ins"); registry.drop("reg_multi_del") }
    } finally { insServer.stop(); delServer.stop() }
  }

  test("idempotent create: same name replaces the running query") {
    val (_, c1) = feed()
    val cfgT = TriggerConfig(name = "reg_dup", tableName = "employees",
      operations = Seq("INSERT"), webhookUrl = server.url)
    val q1 = registry.create(cfgT, c1)
    val (_, c2) = feed()
    val q2 = registry.create(cfgT, c2)
    try {
      assert(!q1.isActive && q2.isActive)
      assert(registry.list.count(_ == "reg_dup") == 1)
    } finally registry.drop("reg_dup")
  }
}
