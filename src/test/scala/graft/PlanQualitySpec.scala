package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these operators
  * survive a 100× scale-up are in the PLAN, not the output — filters reaching
  * the parquet scan, pruned read schemas, broadcast dimension joins, and
  * partial aggregation. A refactor that silently loses one of these still
  * passes the value-level oracle; this spec fails instead. */
class PlanQualitySpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q2: filters are pushed to the parquet scan and columns pruned") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(p.contains("GreaterThan(l_quantity,45.0)"))
    // 11-column table read as 5 columns (plan strings truncate long fields,
    // so check inclusion of kept columns + absence of a pruned one)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"))
    assert(!p.contains("l_returnflag"))
  }

  test("q3: dimension joins are broadcast, no shuffle on the dim side") {
    val p = plan("q3_join_multiway")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastExchange"))
  }

  test("q4: explicitly hinted dimension broadcast survives planning") {
    assert(plan("q4_join_broadcast_dim").contains("BroadcastHashJoin"))
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2)
    assert(p.contains("partial_"))
  }

  test("q27: global top-n plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q27_topn_global").contains("TakeOrderedAndProject"))
  }

  test("q41: LSH bucketing is a scan + project with no join or explode") {
    val p = plan("q41_lsh_buckets")
    assert(!p.contains("Join") && !p.contains("Generate"))
    assert(p.contains("graft_vec_dot") || p.contains("floatvectordot") ||
      p.toLowerCase.contains("vec_dot"))
  }

  test("q35: brute-force ANN is a broadcast cross join (no shuffle of the corpus)") {
    val p = plan("q35_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("q86: the mega-bucket cap plans as anti-join + equi-join, never a cartesian") {
    val p = plan("q86_lsh_capped")
    // bucket histogram excluded via anti-join; pair stage stays an equi-join
    // on (band, minhash); a cartesian anywhere means the cap regressed
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the histogram is partial+final aggregated (map-side combine)
    assert(p.contains("partial_count"), p)
  }

  test("q56: hash sampling is a pure scan-side filter — zero exchanges before sort") {
    val p = plan("q56_stratified_sample")
    // the only exchange allowed is the final presentation sort's range partitioning
    assert("Exchange".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("Join"))
  }

  test("q68: revenue aggregation sits below the order join (eager agg)") {
    val p = plan("q68_preagg_join")
    // partial+final pre-aggregation on l_orderkey appears under the join
    assert(p.contains("hashpartitioning(l_orderkey"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 4) // pre-agg + final agg, each 2-phase
    // the pre-agg only rolls up QUALIFYING orders: a semi-join against the
    // date-filtered key set sits BELOW the aggregate (an unfiltered eager
    // agg shuffles one row per order in the whole fact table)
    val semiAt = p.indexOf("LeftSemi")
    // plans print top-down, so "below the pre-agg" = after the DEEPEST
    // (partial, l_orderkey) HashAggregate in the string
    val aggAt = p.lastIndexOf("HashAggregate")
    assert(semiAt >= 0, s"pre-agg must be prefiltered by a semi-join:\n$p")
    assert(semiAt > aggAt, s"semi-join prefilter must sit below the aggregate:\n$p")
  }

  test("q51: as-of join is union + one window, never a non-equi join") {
    val p = plan("q51_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("hot projection paths run inside WholeStageCodegen") {
    // text-heavy projections (q38 quality, q60 redact) and the custom
    // vec_dot expression (q35) must all stay inside codegen'd stages —
    // an interpreted expression in these paths is a silent 5-10× tax.
    // (AQE only materializes codegen in the FINAL plan, so execute first.)
    for (q <- Seq("q38_quality", "q60_redact", "q35_cosine_topk")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // "*(n)" prefixes mark operators fused into WholeStageCodegen stages
      assert(p.contains("*("), s"$q lost codegen:\n$p")
      assert(!p.contains("CodegenFallback"), s"$q fell back to interpretation:\n$p")
    }
  }

  test("q89: PQ encode has no inferred filter and compiles under codegen") {
    val df = SparkEntry.queries("q89_pq_codes")(spark, dir)
    // posexplode_outer keeps Catalyst from inferring a size(codes) > 0
    // filter that would inline the entire encode expression a second time
    // per row (the scan's Pushed/Partition/DataFilters metadata may
    // mention filters; a Filter NODE never follows a letter)
    val p = df.queryExecution.executedPlan.toString
    assert("(?<![A-Za-z])Filter".r.findFirstIn(p).isEmpty, p)
    // the argmax expression must stay under janino's method limit: with
    // fallback disabled a failed whole-stage compile throws instead of
    // silently interpreting (the struct-greatest form this replaced was
    // refused by janino — a 10× interpreted tax the oracle cannot see)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.collect().nonEmpty)
    finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("q67: corpus ranking is bucket-partitioned; only the offset table is single-partition") {
    val p = plan("q67_data_mixture")
    // the corpus-side window must rank within mix_bucket shards
    assert("""windowspecdefinition\(mix_bucket#\d+L, mix_key""".r
      .findFirstIn(p).isDefined, p)
    // the full documents relation never funnels through one task: the sole
    // single-partition exchange feeds the per-bucket COUNT offsets window
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1, p)
  }

  test("q91: the ranking window sits above the broadcast h16 prefilter") {
    val p = plan("q91_domain_cap")
    // the per-domain count table broadcasts back (one row per domain)
    assert(p.contains("BroadcastHashJoin"), p)
    // the h16 threshold filter (… * 65536.0) must be BELOW the Window in
    // the tree — window input is O(domains · cap) survivors, never the
    // whole corpus; losing this ordering reintroduces the giant-domain sort
    val iWindow = p.indexOf("Window")
    val iPrefilter = p.indexOf("65536.0")
    assert(iWindow >= 0 && iPrefilter > iWindow, p)
  }

  test("q93: the budget window sits above the broadcast token-mass prefilter") {
    val p = plan("q93_token_domain_cap")
    // only over-threshold domains broadcast (left join, keep-all default)
    assert(p.contains("BroadcastHashJoin"), p)
    // the h16 token-fraction prefilter must sit BELOW the running-sum
    // window: window input is O(budget) survivors per source, never the
    // whole corpus — q91's giant-domain-sort guard, in token space
    val iWindow = p.indexOf("Window")
    val iPrefilter = p.indexOf("65536.0")
    assert(iWindow >= 0 && iPrefilter > iWindow, p)
    // the whole query reads 4 columns — `text` never leaves the scan
    assert(!p.contains("text"), p)
  }

  test("q104: scoring runs the native codegen'd expression — no HOF, no per-gram md5") {
    val p = plan("q104_quality_classifier")
    // the fitted weight table is baked into QualityClassifierScore; a
    // regression to the HOF formulation would reintroduce one interpreted
    // md5 + substring + element_at per character (the 5.5 s -> 0.8 s tail
    // this expression removed)
    assert(p.contains("qualityclassifierscore"), p)
    assert(!p.contains("aggregate(transform"), p)
    assert(!p.contains("md5"), p)
  }

  test("q105: chunk-token budget window sits above the broadcast prefilter") {
    val p = plan("q105_chunk_domain_cap")
    // q93's two-phase shape in exact chunk-token units: over-threshold-only
    // broadcast, h16 prefilter BELOW the running-sum window
    assert(p.contains("BroadcastHashJoin"), p)
    val iWindow = p.indexOf("Window")
    val iPrefilter = p.indexOf("65536.0")
    assert(iWindow >= 0 && iPrefilter > iWindow, p)
  }

  test("q97: centroid sums partial-aggregate map-side; no cartesian") {
    val p = plan("q97_embedding_outliers")
    // the per-label sums shuffle tasks × labels × 64 rows, never the corpus:
    // losing the partial aggregate turns that into a corpus-sized explode
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q98: grouping sets are one Expand + partial+final aggregate; text never read") {
    val p = plan("q98_corpus_mix_report")
    // all four granularities come from ONE pass (Expand), partial-agg'd
    // map-side — a regression to per-slice scans or a final-only aggregate
    // turns the tiny shuffle into a corpus-sized one
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("text"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q101: savings report is one partial+final aggregate over the cluster join") {
    val p = plan("q101_dedup_savings")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q103: variant decode stays in the scan-side projection, agg partial+final") {
    val p = plan("q103_variant_props")
    // parse_json/variant_get evaluate in the pre-aggregate projection (one
    // decode per row), and the grouped agg map-side combines — a regression
    // to a post-shuffle decode would ship the raw JSON strings instead
    assert(p.contains("parse_json") || p.contains("variant_get"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q102: mining is a filter + candidate-only window, never a cartesian") {
    val p = plan("q102_contrastive_pairs")
    assert(!p.contains("CartesianProduct"), p)
    // the ranking window partitions by anchor over the (tiny) candidate
    // relation — candidates come from the banded equi-join, so a cartesian
    // or a corpus-wide window means the shared stage regressed
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("q92: span removal is an equi anti-join, no cartesian; broadcast is AQE's call") {
    val p = plan("q92_paragraph_dedup")
    // the recurring set is deliberately NOT hint-forced to broadcast (it is
    // corpus-derived and unbounded on template-heavy crawls) — AQE picks
    // broadcast-vs-shuffle from its runtime size, so the pin asserts the
    // anti-join SHAPE, not the exchange strategy; ParagraphDedupSpec pins
    // the shuffle fallback end-to-end
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the recurring-fingerprint aggregation map-side combines
    assert(p.contains("partial_count"), p)
  }

  test("q107: the ranking window partitions BY SHARD — no task sorts more than one shard") {
    val p = plan("q107_epoch_shard")
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q108: per-cluster argmax is one partial+final aggregate — no window, no cartesian") {
    val p = plan("q108_keep_best_rep")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q109: counts broadcast, window partitions by source, prefix plans as TakeOrdered") {
    val p = plan("q109_mix_schedule")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("hashpartitioning(source"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q110: upsampling is a pure explode + projection — no join, no window, one exchange") {
    val p = plan("q110_upsample_shard")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // the only exchange is the presentation sort's range partitioning
    assert("Exchange".r.findAllIn(p).length <= 1, p)
  }

  test("q111: the manifest scans the shard store without text; partial+final agg") {
    val p = plan("q111_shard_manifest")
    // the scan's ReadSchema must be pruned to (shard_pos, n_chars) — the
    // wide text payload never leaves the store for a manifest read
    val schemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(schemas.nonEmpty && schemas.forall(!_.contains("text")), p)
    assert(p.contains("graft-shard-store"), p)
    assert(p.contains("partial_"), p)
  }
}
