package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ): the memory-side half of the IVF-PQ
  * architecture large-scale ANN deployments run. A float32[64] embedding is
  * 256 B; its PQ code is `m` small integers (8 B at the 8×16 default) — the
  * 32× compression that decides whether a 100 TB corpus's vectors fit in
  * cluster memory at all. Recall is traded explicitly: ADC scores are
  * approximate, so retrieval refines the top `refine·k` ADC candidates by
  * exact rescore (measured recall in PqSpec, never silent).
  *
  * Everything is deterministic — subspace k-means seeds from the first
  * `ksub` vectors by id and iterates Lloyd exactly like
  * [[Similarity.ivfTrain]] (same engine discipline: no RNG state anywhere).
  *
  * Scale shapes:
  *   - `train`: per iteration, ONE corpus pass assigns all `m` subspaces at
  *     once against the broadcast codebooks (argmin via partial+final
  *     min-of-struct), and the update's elementwise sums shuffle
  *     O(tasks·m·ksub·subDim) partial rows, never the corpus. Production
  *     practice: train on a sample, encode the corpus once.
  *   - `encode`: map-side only — the codebooks fold into the plan as
  *     literals, each code is an argmin over `ksub` codegen'd dot products;
  *     no join, no shuffle, no exchange.
  *   - `adcTopK`: the query's `m × ksub` lookup table is computed driver-side
  *     (it is KBs) and folded in as literals; scoring the coded corpus is one
  *     map-side projection, the top `refine·k` survive a TakeOrdered, and
  *     only those few rows join back to raw vectors for the exact rescore.
  */
object ProductQuantizer {

  /** Trained PQ codebooks: `cents(s)(c)` is the `subDim`-dim centroid `c` of
    * subspace `s`. Driver-side by design — a codebook is m·ksub·subDim
    * floats (KBs), a plan literal, not a dataset. */
  final case class Codebooks(m: Int, ksub: Int, subDim: Int,
                             cents: Array[Array[Array[Float]]]) {
    require(cents.length == m && cents.forall(_.length == ksub) &&
      cents.forall(_.forall(_.length == subDim)))
  }

  private def subvecCol(vecCol: String, s: Int, subDim: Int): Column =
    slice(col(vecCol), s * subDim + 1, subDim)

  /** Squared Euclidean distance of a subvector column to a literal centroid,
    * via the codegen'd dot: |a−c|² = a·a − 2·a·c + c·c (c·c folds to a
    * literal). `aa` is the per-row a·a column, computed once per subspace. */
  private def sqDist(spark: org.apache.spark.sql.SparkSession,
                     aa: Column, sub: Column, cent: Array[Float]): Column = {
    val cc = cent.map(x => x.toDouble * x).sum
    aa - lit(2.0) * GraftFunctions.vecDot(spark, sub, typedLit(cent)) + lit(cc)
  }

  /** Deterministic per-subspace Lloyd training (plain Euclidean k-means —
    * subvectors are not unit vectors, so the spherical update would be
    * wrong here). Seeds from the first `ksub` vectors by id; empty clusters
    * keep their centroid; `iters = 0` returns the seed.
    *
    * `trainFraction` < 1 trains on a deterministic hash-sample of the corpus
    * (md5 of the id, [[Sampling.hash16]] — stable across runs, engines and
    * partitionings): each Lloyd iteration then scans O(sample), not the
    * corpus, which is THE production practice at 100 TB — a codebook needs
    * thousands of points per centroid, not every row; [[encode]] still makes
    * exactly one full-corpus pass afterwards. The seed stays the first
    * `ksub` vectors by id regardless of the sample. */
  def train(emb: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 5,
            dims: Int = 64, idCol: String = "vec_id",
            vecCol: String = "embedding", trainFraction: Double = 1.0): Codebooks = {
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val subDim = dims / m
    val spark = emb.sparkSession
    import spark.implicits._
    val seedRows = emb.filter(col(idCol) < ksub)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    require(seedRows.length == ksub, s"need the first $ksub vectors by id as seed")
    var cents: Array[Array[Array[Float]]] = Array.tabulate(m, ksub) { (s, c) =>
      seedRows(c)._2.slice(s * subDim, (s + 1) * subDim).toArray
    }
    // A sampled training set is PERSISTED across the Lloyd loop: the filter
    // alone is lazy, so without this each iteration would re-scan the full
    // corpus (and re-md5 every id) just to discard (1 − fraction) of it —
    // the exact 5× corpus read the knob exists to avoid. Materialized once,
    // read `iters` times, dropped before the return.
    val trainSet =
      if (trainFraction >= 1.0 || iters == 0) emb
      else emb.filter(Sampling.hash16(col(idCol)) < lit(trainFraction * 65536.0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one training-set pass per iteration: explode to (sub, subvec), assign
    // all subspaces against the broadcast codebook rows, partial-agg the sums
    for (_ <- 1 to iters) {
      val cbDf = (for (s <- 0 until m; c <- 0 until ksub)
        yield (s, c, cents(s)(c).toSeq)).toDF("sub", "code", "cvec")
      val subs = trainSet.select(col(idCol),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("sub"), subvecCol(vecCol, s, subDim).as("sv"))): _*)).as("x"))
        .select(col(idCol), col("x.sub").as("sub"), col("x.sv").as("sv"))
        .withColumn("aa", GraftFunctions.vecDot(spark, col("sv"), col("sv")))
      // the argmin's group key is the ROW (id, sub), never the subvector
      // value: keying on the value would collapse duplicate subvectors
      // (zeros, repeated patterns) into one row and under-weight them in
      // the mean update — a bias invisible on random data and real on
      // sparse embeddings
      val assigned = subs.join(broadcast(cbDf), "sub")
        .select(col(idCol), col("sub"), col("sv"),
          struct(
            (col("aa") - lit(2.0) * GraftFunctions.vecDot(spark, col("sv"), col("cvec")) +
              GraftFunctions.vecDot(spark, col("cvec"), col("cvec"))).as("dist"),
            col("code").as("code")).as("sc"))
        .groupBy(col(idCol), col("sub"), col("sv"))
        .agg(min(col("sc")).as("best"))
      val sums = assigned
        .select(col("sub"), col("best.code").as("code"),
          posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .as[(Int, Int, Int, Double, Long)].collect()
      val next = cents.map(_.map(_.clone()))
      sums.groupBy(t => (t._1, t._2)).foreach { case ((s, c), rows) =>
        val n = rows.head._5
        if (n > 0) rows.foreach { case (_, _, pos, sm, _) =>
          next(s)(c)(pos) = (sm / n).toFloat
        }
      }
      cents = next
    }
    if (!(trainSet eq emb)) trainSet.unpersist()
    Codebooks(m, ksub, subDim, cents)
  }

  /** The k-means objective: mean over vectors of the summed per-subspace
    * squared reconstruction error. Non-increasing per Lloyd step. */
  def quantizationMse(emb: DataFrame, cb: Codebooks,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    val spark = emb.sparkSession
    val errCols = (0 until cb.m).map { s =>
      val sub = subvecCol(vecCol, s, cb.subDim)
      val aa = GraftFunctions.vecDot(spark, sub, sub)
      least((0 until cb.ksub).map(c => sqDist(spark, aa, sub, cb.cents(s)(c))): _*)
    }
    emb.select(errCols.reduce(_ + _).as("err"))
      .agg(avg(col("err"))).head().getDouble(0)
  }

  /** Map-side PQ encoding: `(idCol, codes array<int> of length m)`. The
    * codebooks are plan literals; each code is an argmin over `ksub`
    * codegen'd distances — no join, no shuffle. 32× smaller than the raw
    * float32 vectors at the 8×16 default (and the realistic deployment
    * persists THIS relation, not the raw embeddings).
    *
    * Engine-portable determinism (same discipline as [[Similarity.quantize]]):
    * since a·a is constant per (row, subspace), argmin |a−c|² = argmax
    * (2·a·c − c·c); the score is floor-quantized to millionths and exact
    * quantized ties break to the LOWEST code (`array_position` returns the
    * FIRST index holding the max), so another engine (the DuckDB oracle,
    * q89) reproduces every code bit-for-bit.
    *
    * The argmax is `array_position(scores, array_max(scores))`, not a
    * greatest-of-(score, code)-structs: the struct form's expression tree is
    * large enough that janino refuses the generated method and the WHOLE
    * stage silently falls back to interpreted evaluation — measured 10×
    * slower on the sf0.1 battery (q89 3.2 s → 0.3 s). The array form stays
    * inside WholeStageCodegen, and codegen's subexpression elimination
    * evaluates the scores array once per row even though the tree names it
    * twice. A null or wrong-length embedding yields a null code (the dots
    * are null, so `array_max` and the position are null) rather than the
    * struct form's silent code 0. */
  def encode(emb: DataFrame, cb: Codebooks,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), codesCol(emb.sparkSession, cb, vecCol).as("codes"))

  /** The quantized per-code scores `floor((2·a_s·c − c·c)·10⁶)` of one
    * subspace — the argmax substrate of [[codesCol]] and the lookup table
    * of [[reconstructionErrCol]]. */
  private def scoresArr(spark: org.apache.spark.sql.SparkSession, cb: Codebooks,
                        vecCol: String, s: Int): Column = {
    val sub = subvecCol(vecCol, s, cb.subDim)
    array((0 until cb.ksub).map { c =>
      val cc = cb.cents(s)(c).map(x => x.toDouble * x).sum
      Similarity.quantize(lit(2.0) *
        GraftFunctions.vecDot(spark, sub, typedLit(cb.cents(s)(c))) - lit(cc))
    }: _*)
  }

  /** [[encode]]'s code array as a bare Column, so a persisted layout (the
    * IVF-PQ index store) can carry `codes` BESIDE other columns in one
    * write instead of paying a join against a separate encode pass. */
  def codesCol(spark: org.apache.spark.sql.SparkSession, cb: Codebooks,
               vecCol: String = "embedding"): Column = {
    val codeCols = (0 until cb.m).map { s =>
      val scores = scoresArr(spark, cb, vecCol, s)
      (call_function("array_position", scores, array_max(scores)) - 1).cast("int")
    }
    array(codeCols: _*)
  }

  /** Quantized reconstruction error of a row against its STORED codes —
    * the drift instrument of the frozen-codebook maintenance contract:
    * `Σ_s (floor(a_s·a_s·10⁶) − scores_s[codes_s])`, i.e. the quantized
    * |a−c|² gap summed over subspaces, evaluated at the code the store
    * actually carries (a corrupted or stale code surfaces as error just
    * like drifted data does). Non-negative per subspace when the stored
    * code is the argmax (floor is monotone); integer-exact, so batch
    * means replay bit-for-bit in the q120 DuckDB oracle. Map-side only —
    * the codebooks fold in as literals. */
  def reconstructionErrCol(spark: org.apache.spark.sql.SparkSession,
                           cb: Codebooks, vecCol: String = "embedding",
                           codesCol: Column = col("codes")): Column =
    (0 until cb.m).map { s =>
      // evaluate ONLY the stored code's score: the pre-r21 form indexed
      // into the full scoresArr, computing all ksub dot products per
      // (row, subspace) to read one — a 16× per-row waste at the 8×16
      // default. Selecting the centroid by code through a literal 2-D
      // lookup computes the identical quantized value (same vecDot, same
      // element order, same floor) for one dot product; a null/invalid
      // code yields a null error either way.
      val sub = subvecCol(vecCol, s, cb.subDim)
      val code = element_at(codesCol, s + 1)
      val cents2d = typedLit(cb.cents(s).map(_.toSeq).toSeq)
      val ccArr = typedLit(cb.cents(s).map(c => c.map(x => x.toDouble * x).sum).toSeq)
      Similarity.quantize(GraftFunctions.vecDot(spark, sub, sub)) -
        Similarity.quantize(lit(2.0) *
          GraftFunctions.vecDot(spark, sub, element_at(cents2d, code + 1)) -
          element_at(ccArr, code + 1))
    }.reduce(_ + _)

  /** The query's per-(subspace, code) dot table — KBs, driver-side by
    * design (folds into the scoring plan as literals). */
  def adcTable(cb: Codebooks, q: Array[Float]): Array[Array[Double]] =
    Array.tabulate(cb.m, cb.ksub) { (s, c) =>
      val qs = q.slice(s * cb.subDim, (s + 1) * cb.subDim)
      qs.zip(cb.cents(s)(c)).map { case (a, b) => a.toDouble * b }.sum
    }

  /** The un-quantized ADC approximation `Σ_s table(s)(codes(s))` over a
    * `codes` column — the map-side projection both [[adcTopK]] and the
    * persisted-store serving path score with. Callers quantize the sum
    * ([[Similarity.quantize]]) for the deterministic candidate cut. */
  def adcApproxCol(cb: Codebooks, table: Array[Array[Double]],
                   codesCol: Column = col("codes")): Column =
    (0 until cb.m).map { s =>
      element_at(typedLit(table(s).toSeq), element_at(codesCol, s + 1) + 1)
    }.reduce(_ + _)

  /** [[Codebooks]] as a relation `(sub, code, cvec)` — m·ksub rows (KBs),
    * the persistable face of a trained codebook (the IVF-PQ store writes
    * this under `_pq_codebook/` exactly as the coarse codebook lands under
    * `_codebook/`). */
  def codebooksToDF(spark: org.apache.spark.sql.SparkSession,
                    cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until cb.m; c <- 0 until cb.ksub)
      yield (s, c, cb.cents(s)(c).toSeq)).toDF("sub", "code", "cvec")
  }

  /** Inverse of [[codebooksToDF]]: a bounded m·ksub-row collect. Fails
    * loudly on a ragged relation (missing (sub, code) cells or uneven
    * centroid dims — a torn or drifted codebook write). */
  def codebooksFromDF(df: DataFrame): Codebooks = {
    val rows = df.select(col("sub").cast("int"), col("code").cast("int"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, "pq codebook relation is empty")
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    require(rows.length == m * ksub,
      s"pq codebook is ragged: ${rows.length} rows for m=$m ksub=$ksub")
    // a duplicate (sub, code) row offsetting a missing cell passes the
    // row-count check but leaves a null cell — same ragged verdict
    require(rows.map(t => (t._1, t._2)).distinct.length == m * ksub,
      s"pq codebook is ragged: duplicate (sub, code) cells among " +
        s"${rows.length} rows for m=$m ksub=$ksub")
    val subDim = rows.head._3.length
    val cents = Array.ofDim[Array[Float]](m, ksub)
    rows.foreach { case (s, c, v) =>
      require(v.length == subDim, s"pq codebook sub=$s code=$c has dim ${v.length} != $subDim")
      cents(s)(c) = v
    }
    Codebooks(m, ksub, subDim, cents)
  }

  /** ADC (asymmetric distance computation) top-k: the query stays exact,
    * the corpus is its codes. The query's per-(subspace, code) dot table is
    * driver-computed (KBs) and folded in as literals; scoring is one
    * map-side projection over the coded corpus — `approx_sim = Σ_s
    * table(s)(codes(s))`. The top `refine·k` ADC candidates join back to
    * the raw vectors for an exact quantized rescore, so the final ordering
    * is exact over the refined set (recall vs brute force is measured in
    * PqSpec and tunes with `refine`). */
  def adcTopK(emb: DataFrame, codes: DataFrame, cb: Codebooks,
              queryId: Long, k: Int, refine: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    adcTopKFiltered(emb, codes, cb, queryId, k, refine, idCol, vecCol)

  /** IVF-PQ: the composed 100 TB ANN shape — the coarse quantizer
    * ([[Similarity.ivfAssignWith]], optionally [[Similarity.ivfTrain]]ed)
    * restricts the search to the `nprobe` inverted lists nearest the query,
    * and ADC scores only THOSE lists' codes (a `~nprobe/nlist` fraction of
    * the corpus, each row scored against an m-entry literal table), then
    * the refined candidates exact-rescore. Every stage keeps the
    * broadcast-small-side/map-side discipline: centroids and probe list
    * broadcast, the coded corpus streams, only `refine·k` rows ever touch
    * raw vectors again.
    *
    * `assigned` is the precomputed list assignment `(idCol, centroid_id)` —
    * query-independent corpus state, built once at index time exactly like
    * `codes`. Pass it in real deployments; the None default recomputes it
    * (one raw-vector corpus pass) for convenience at test scale. */
  def ivfPqTopK(emb: DataFrame, codes: DataFrame, cb: Codebooks,
                ivfCodebook: DataFrame, queryId: Long, k: Int,
                nprobe: Int = 2, refine: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding",
                assigned: Option[DataFrame] = None): DataFrame = {
    val spark = emb.sparkSession
    val assignedDf = assigned.getOrElse(
      Similarity.ivfAssignWith(emb, ivfCodebook, idCol, vecCol)
        .select(col(idCol), col("centroid_id")))
    val qvec = emb.filter(col(idCol) === queryId).select(col(vecCol).as("query_vec"))
    val probes = ivfCodebook.crossJoin(broadcast(qvec))
      .select(col("centroid_id"),
        Similarity.quantize(GraftFunctions.vecDot(spark, col("cvec"),
          col("query_vec"))).as("cdot"))
      .orderBy(col("cdot").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    val probedCodes = codes
      .join(assignedDf, idCol)
      .join(broadcast(probes), "centroid_id")
      .select(col(idCol), col("codes"))
    adcTopKFiltered(emb, probedCodes, cb, queryId, k, refine, idCol, vecCol)
  }

  private def adcTopKFiltered(emb: DataFrame, codes: DataFrame, cb: Codebooks,
                              queryId: Long, k: Int, refine: Int,
                              idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).as[Seq[Float]].head().toArray
    val approx = adcApproxCol(cb, adcTable(cb, q))
    // the candidate cut is quantized (floor-millionths) with an id
    // tiebreak — the battery's standard determinism discipline — so the
    // refined set is identical across runs, partitionings and engines
    // (q90's DuckDB oracle replays it), not dependent on double ulps
    val candidates = codes
      .select(col(idCol), Similarity.quantize(approx).as("approx_q"))
      .orderBy(col("approx_q").desc, col(idCol))
      .limit(refine * k)
      .select(col(idCol))
    emb.join(broadcast(candidates), idCol)
      .select(col(idCol),
        Similarity.quantize(GraftFunctions.vecDot(spark, col(vecCol),
          typedLit(q))).as("sim_q"))
      .orderBy(col("sim_q").desc, col(idCol))
      .limit(k)
  }
}
