package graft.plans

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotFusionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDotFusion
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == VecDotFusion)
  }

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("rewrites the HOF dot-product pattern into FloatVectorDot") {
    withRule {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val df = emb.crossJoin(q).select(Similarity.dot($"embedding", $"qv").as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("floatvectordot"),
        s"expected fusion in:\n$optimized")
      assert(!optimized.contains("aggregate(zip_with"),
        s"HOF form should be gone:\n$optimized")
    }
  }

  test("fused plan returns bit-identical values to the interpreted HOF") {
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    def values = emb.crossJoin(q)
      .select($"vec_id", Similarity.dot($"embedding", $"qv").as("d"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val unfused = values
    val fused = withRule(values)
    assert(fused == unfused) // exact ==: same accumulation order ⇒ same bits
  }

  test("fused path matches HOF null semantics: null element, null array, length mismatch") {
    // array<float> with containsNull=true via explicit schema
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // clean
      org.apache.spark.sql.Row(2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)), // null elem
      org.apache.spark.sql.Row(3L, null, Array(3.0f, 4.0f)),                // null array
      org.apache.spark.sql.Row(4L, Array(1.0f), Array(3.0f, 4.0f)))         // mismatch
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, a ARRAY<FLOAT>, b ARRAY<FLOAT>")
    // via parquet so the optimizer can't constant-fold the LocalRelation away
    val dir = java.nio.file.Files.createTempDirectory("graft_vdnull_").toString + "/t"
    spark.createDataFrame(rows, schema).write.parquet(dir)
    val df = spark.read.schema(schema).parquet(dir)
    def values(frame: org.apache.spark.sql.DataFrame) = frame
      .select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    val unfused = values(df)
    val fused = withRule {
      val out = df.select($"id", Similarity.dot($"a", $"b").as("d"))
      assert(out.queryExecution.optimizedPlan.toString.contains("floatvectordot"),
        "rule must fire on nullable-element arrays too")
      values(df)
    }
    assert(fused == unfused)
    assert(unfused.map(_._2) == Seq(Some(11.0), None, None, None))
  }

  test("does not fire on non-float arrays or different folds") {
    withRule {
      // double arrays: FloatVectorDot's getFloat would misread — must not fuse
      val d = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      val plan = d.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, v) => s + v).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("floatvectordot"))
      // float arrays but a MAX fold, not a sum — must not fuse
      val f = Seq((Array(1.0f), Array(2.0f))).toDF("a", "b")
      val plan2 = f.select(
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (s, v) => greatest(s, v)).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!plan2.contains("floatvectordot"))
    }
  }

  test("GraftExtensions registers the function and the rule without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
