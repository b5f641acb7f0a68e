package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // one hot key (90% of rows) + a tail — the classic skew shape
  private lazy val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
    .toDF("k", "payload")
  private lazy val small = Seq((1L, "hot"), (950L, "cold"), (999L, "tail"))
    .toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, "k")
      .select($"k", $"payload", $"name").as[(Long, Int, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.salted(big, small, "k", $"payload", buckets = 8)
      .select($"k", $"payload", $"name").as[(Long, Int, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 900) // the hot key really is hot
  }

  test("join key is widened with the salt (hot key spreads across tasks)") {
    val plan = SkewJoin.salted(big, small, "k", $"payload", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt must be part of the join key:\n$plan")
  }

  test("bucket count 1 degenerates to the plain join") {
    val one = SkewJoin.salted(big, small, "k", $"payload", buckets = 1).count()
    assert(one == big.join(small, "k").count())
  }
}
