package graft

import graft.cdc.{ChangeCapture, SnapshotDiff}
import graft.delivery.{Backoff, HeadersCodec}
import graft.model.TriggerConfig
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

case class PropRow(id: Int, a: Option[Int], b: Option[Int])

/** Property-based pins for the semantics that are easy to get subtly wrong:
  * null-safe change detection (P2), the backoff schedule (F12), and the
  * header JSON roundtrip (F13). Raw ScalaCheck runner (no scalatestplus
  * bridge in the offline dependency set). */
class PropertySpecs extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def check(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("F12: backoff schedule — linear constant, exponential doubles from interval") {
    check(Prop.forAll(Gen.choose(1, 600), Gen.choose(0, 20)) { (interval, retries) =>
      val lin = Backoff.schedule("LINEAR", interval, retries)
      val exp = Backoff.schedule("EXPONENTIAL", interval, retries)
      lin.length == retries && lin.forall(_ == interval.toLong) &&
        exp.zipWithIndex.forall { case (d, n) => d == interval.toLong << n }
    })
  }

  test("F13: headers JSON roundtrip incl. quotes/backslashes in keys/values") {
    val str = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', ' ', ':')))
      .map(_.mkString)
    val kv = for { k <- str; v <- str } yield (k + "k", v) // non-empty keys
    check(Prop.forAll(Gen.mapOf(kv)) { m =>
      HeadersCodec.parse(HeadersCodec.toJson(m)) == m
    })
  }

  test("P2: update gate fires iff a tracked column IS DISTINCT, null-safely") {
    val cell = Gen.option(Gen.choose(0, 2))
    val rows = Gen.listOfN(60, for { a <- cell; b <- cell; a2 <- cell; b2 <- cell }
      yield (a, b, a2, b2))
    val trackedGen = Gen.oneOf(Seq.empty[String], Seq("a"), Seq("b"), Seq("a", "b"))
    check(Prop.forAll(rows, trackedGen) { (rs, tracked) =>
      val oldDf = rs.zipWithIndex
        .map { case ((a, b, _, _), i) => PropRow(i, a, b) }.toDF()
      val newDf = rs.zipWithIndex
        .map { case ((_, _, a2, b2), i) => PropRow(i, a2, b2) }.toDF()
      val cfg = TriggerConfig(name = "p", tableName = "t",
        operations = Seq("UPDATE"), webhookUrl = "http://x/",
        updateColumns = tracked)
      val fired = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
        .filter(ChangeCapture.operationFilter(cfg))
        .filter(ChangeCapture.updateGate(cfg))
        .select(col("id")).as[Int].collect().toSet
      val expected = rs.zipWithIndex.collect {
        case ((a, b, a2, b2), i)
          // reachable as a non-no-op UPDATE (diff drops unchanged rows)
          if (a != a2 || b != b2) &&
            // gate: empty tracked list ⇒ fire; else some tracked col changed
            (tracked.isEmpty ||
              tracked.exists(c => if (c == "a") a != a2 else b != b2)) => i
      }.toSet
      fired == expected
    }, n = 8)
  }
}
