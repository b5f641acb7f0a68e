package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.9 L2).
  *
  * Baseline: brute-force dot-product top-k — a broadcast of the query vector
  * against a scan of the corpus (linear, no shuffle, scales to any corpus
  * size for a bounded query set). Scale path: random-hyperplane LSH
  * bucketing, confining candidate generation to same-bucket groups.
  *
  * Numeric determinism: products are computed in double precision and folded
  * left-to-right by the `aggregate` HOF; similarity is then floor-quantized
  * to 1e-6 so the ±1e-13 accumulation-order noise of any other engine
  * (e.g. the DuckDB oracle) can never flip an ordering decision.
  */
object Similarity {

  /** Deterministic double-precision dot product of two float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** floor-quantize a similarity to integer millionths. */
  def quantize(sim: Column): Column = floor(sim * lit(1000000L)).cast("long")

  /** Brute-force top-k: corpus scan × broadcast 1-row query vector. */
  def topK(emb: DataFrame, queryId: Long, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    emb.crossJoin(broadcast(q))
      .select(col(idCol),
        quantize(dot(col(vecCol), col("query_vec"))).as("sim_q"))
      .orderBy(col("sim_q").desc, col(idCol))
      .limit(k)
  }

  /** All near-duplicate pairs above a quantized similarity threshold.
    * Brute-force pair join — correct baseline; use [[lshBuckets]] to confine
    * the join at corpus scale. */
  def nearDupPairs(emb: DataFrame, minSimMillionths: Long,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), quantize(dot(col("va"), col("vb"))).as("sim_q"))
      .filter(col("sim_q") >= minSimMillionths)
  }

  /** Random-hyperplane LSH signature.
    *
    * Plane p's coefficient for dimension i is derived from
    * md5("plane<p>_<i>"): the first two hex nibbles form v ∈ [0,255], and the
    * integer coefficient is 2v−255 ∈ [−255,255] (scaling never changes the
    * sign of the projection, so integer coefficients are exact). Signature
    * bit p = [Σ_i emb_i·coef_{p,i} > 0]; bucket = Σ bit_p · 2^p.
    *
    * md5-derived planes make the bucketing engine-portable (oracle-checkable)
    * and cluster-stable without any shared random state. */
  def lshBuckets(emb: DataFrame, planes: Int = 8,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val byDim = emb.select(col(idCol), posexplode(col(vecCol)).as(Seq("i0", "x")))
      .withColumn("dim", col("i0") + 1)
    val proj = byDim
      .withColumn("p", explode(lit((0 until planes).toArray)))
      .withColumn("h2", substring(md5(concat(lit("plane"), col("p").cast("string"),
        lit("_"), col("dim").cast("string"))), 1, 2))
      .withColumn("coef", expr(
        "2 * ((instr('0123456789abcdef', substring(h2, 1, 1)) - 1) * 16" +
          " + (instr('0123456789abcdef', substring(h2, 2, 1)) - 1)) - 255"))
      .groupBy(col(idCol), col("p"))
      .agg(sum(col("x").cast("double") * col("coef")).as("proj"))
    proj
      .groupBy(col(idCol))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1, p)")).otherwise(0))
        .cast("int").as("bucket"))
  }

  /** Bucketed ANN: top-k within the query's LSH bucket only — the candidate
    * set shrinks ~2^planes-fold; recall is traded for a bounded join. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets = lshBuckets(emb, planes, idCol, vecCol)
    val withBucket = emb.join(buckets, idCol)
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("bucket"))
    withBucket.join(broadcast(q), "bucket")
      .select(col(idCol), quantize(dot(col(vecCol), col("query_vec"))).as("sim_q"))
      .orderBy(col("sim_q").desc, col(idCol))
      .limit(k)
  }
}
