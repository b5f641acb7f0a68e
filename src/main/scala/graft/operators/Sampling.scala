package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY §2.9 EXT).
  *
  * `sample()`/`rand()` are seed- and partitioning-dependent — rerunning the
  * pipeline (or re-partitioning the input) changes which rows survive,
  * which is unacceptable for reproducible dataset builds. Hash sampling
  * decides per row from a content hash of the row's id: stable across
  * runs, engines, partitionings, and cluster sizes, and embarrassingly
  * parallel (a pure per-row filter, pushed into the scan — no shuffle, no
  * shared RNG state).
  */
object Sampling {

  /** First 16 bits of md5(id) as an int in [0, 65536). */
  def hash16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** Stratified hash sample: keep a row iff hash16(id) < rate(stratum)·2¹⁶.
    * Per-stratum rates downweight overrepresented strata (the classic
    * data-mixing knob: e.g. sample `en` at 0.5 but keep all of `fr`). */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("h16", hash16(col(idCol)))
      .filter(col("h16") < rate * lit(65536.0))
  }

  /** Per-group "top `frac` by integer score" cutoffs — the quality-cut
    * primitive ("keep each source's best 40% by distinct-token count"):
    * returns one (group, cutoff) row per group, where cutoff is the
    * ⌈frac·n⌉-th largest score, so `score >= cutoff` keeps at least
    * frac·n rows with ALL ties at the boundary (deterministic — no
    * arbitrary within-tie ordering decides a document's fate).
    *
    * Scale shape: the ranking window runs over the (group, score)
    * HISTOGRAM — one row per distinct score per group, thousands of rows
    * where the corpus has billions — never over documents; callers then
    * broadcast-join the KB-scale cutoffs back and filter map-side. A
    * per-document rank window would shuffle the corpus by group and sort
    * every group's documents in one task. */
  def topFractionCutoffs(df: DataFrame, groupCol: String, scoreCol: String,
                         frac: Double): DataFrame =
    topFractionCutoffsFromHist(
      df.groupBy(col(groupCol), col(scoreCol)).agg(count(lit(1)).as("n")),
      groupCol, scoreCol, "n", frac)

  /** [[topFractionCutoffs]] over a PRE-AGGREGATED (group, score, count)
    * histogram — the form a maintained registry rollup already holds
    * ([[graft.streaming.IncrementalQualityCut]]'s read path), so the
    * ingest gate derives cutoffs without re-aggregating documents. The
    * batch entry point above is defined as histogram-then-this, so the
    * two paths cannot drift. */
  def topFractionCutoffsFromHist(hist: DataFrame, groupCol: String,
                                 scoreCol: String, nCol: String,
                                 frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    hist
      .withColumn("cum", sum(col(nCol)).over(cumW))
      .withColumn("total", sum(col(nCol)).over(totW))
      .filter(col("cum") >= ceil(lit(frac) * col("total")))
      .groupBy(col(groupCol))
      .agg(max(col(scoreCol)).as("cutoff"))
  }

  /** Deterministic dataset split (train/val/test …): each row lands in the
    * first fraction band its content hash falls into. Same guarantees as
    * [[stratified]] — stable across runs, engines, partitionings; adding
    * rows never moves an existing row between splits (no leakage between a
    * v1 and v2 dataset build). A salt in the hashed key gives independent
    * splits for independent purposes. */
  def split(df: DataFrame, idCol: String,
            fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = hash16(concat(col(idCol).cast("string"), lit(salt)))
    // Cumulative cut-offs accumulate in decimal, not binary floating point:
    // 0.9 + 0.05 must be exactly the 0.95 another engine writes as a literal,
    // or a hash landing within float-error of a boundary × 65536 could be
    // assigned to different splits by the two engines.
    val cuts = fractions
      .scanLeft(BigDecimal(0)) { case (acc, (_, f)) => acc + BigDecimal(f.toString) }
      .tail.map(_.toDouble)
    val assign = fractions.zip(cuts).foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), acc) =>
        when(h < lit(cut) * 65536.0, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }
}
