package graft.queries

import graft.SparkTestSession
import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q96's invariants beyond the DuckDB hash check: the split is actually
  * leakage-free (no near-dup candidate pair straddles a split boundary),
  * the naive per-document split it replaces DOES leak on the same corpus
  * (so the operator is not vacuous), and singleton documents degrade to
  * exactly the per-document hash split. */
class LeakageSplitSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val assigned =
    LlmQueries.leakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  private lazy val pairs =
    SharedStages.lshCandidates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("no near-dup candidate pair straddles a split boundary") {
    assert(pairs.nonEmpty, "corpus must have near-dup pairs or the test is vacuous")
    val straddling = pairs.filter { case (a, b) => assigned(a)._2 != assigned(b)._2 }
    assert(straddling.isEmpty,
      s"${straddling.length} pairs split apart, e.g. ${straddling.take(3).toSeq}")
  }

  test("the naive per-document split leaks on the same corpus") {
    import spark.implicits._
    // q79's per-document discipline on the same fractions: at least one
    // near-dup pair lands on opposite sides (measured 86 of 454 pairs at
    // sf0.001) — the failure q96 exists to prevent.
    val naive = Sampling.split(
        graft.Tables.documents(spark, dir).select($"doc_id"),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "expected the per-document split to separate at least one near-dup pair")
  }

  test("singletons degrade to the per-document hash split; fractions sane") {
    import spark.implicits._
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val singletons = assigned.filterNot { case (id, _) => inPair(id) }
    assert(singletons.nonEmpty)
    // a singleton is its own representative, so its band must equal the
    // plain hash split of its own id under q96's salt
    val own = Sampling.split(
        spark.createDataset(singletons.keys.toSeq).toDF("doc_id"),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
        salt = "lsplit")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    singletons.foreach { case (id, (rep, split)) =>
      assert(rep == id && split == own(id), s"singleton $id: $split vs ${own(id)}")
    }
    val shares = assigned.values.groupBy(_._2).view.mapValues(_.size).toMap
    val train = shares.getOrElse("train", 0).toDouble / assigned.size
    assert(train > 0.8 && train < 0.97, s"train share off: $shares")
  }
}
