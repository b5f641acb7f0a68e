package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/Plans/tests: events.ts arrives as TIMESTAMP_NTZ and
      // Tables.events casts it to TIMESTAMP — only value-identical under UTC.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Schema-drift preflight (round-8 postmortem): if the driver re-encoded
    // the testdata, say WHICH column drifted up front — named lines beat
    // fifteen downstream analysis exceptions. Non-fatal: adaptive loaders
    // may still canonicalize, and partial bench data beats none.
    SchemaContract.violations(spark, sfDir)
      .foreach(v => System.err.println(s"[schema-drift] $v"))
    // Noop sink, not count(): a count lets Catalyst drop unused projections
    // and sorts, so projection-heavy queries would be timed as bare scans.
    // The noop writer consumes every row of the full result instead.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM + whole-stage-codegen warmup on the tiny SF (excluded from timings)
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // A failing query must NOT bench as a near-0 s success (a regression
    // would then make the bench look *faster*). Failures are recorded per
    // query, reported in their own line AND counted in the summary line,
    // and the process exits nonzero so the run is visibly broken.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // None = this run failed. A failed run's fail-fast elapsed time must
    // never enter the per-query min or the total — a flaky query would
    // otherwise bench FASTER than a healthy one (samples record it as -1
    // for forensics instead).
    def timeOnce(name: String,
                 fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) } catch {
        case e: Throwable =>
          // sweep ALL control characters (Spark messages often carry tabs and
          // embedded newlines), not just the quoting ones — the errors line
          // must stay parseable JSON exactly when something is broken
          errors(name) = (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(120)).replaceAll("[\\p{Cntrl}\"\\\\]", " ")
          None
      }
    }
    // dev knob: SPARK_GRAFT_ONLY=q32,q33 times a subset (driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }.toSeq
    // Three timing passes, ROUND-ROBIN over the whole battery (pass 1 all
    // queries, then pass 2, pass 3) rather than three consecutive runs per
    // query: a multi-second host load spike then inflates one sample of
    // many queries instead of all three samples of one, so the per-query
    // min stays a steady-state measurement. All samples are emitted so a
    // reader can spot the spike instead of inferring a regression.
    val samples = scala.collection.mutable.LinkedHashMap(
      selected.map { case (name, _) => name -> Vector.empty[Option[Double]] }: _*)
    for (_ <- 1 to 3; (name, fn) <- selected)
      samples(name) = samples(name) :+ timeOnce(name, fn)
    // De-noise the EXPENSIVE rows (r17 postmortem: a uniform ~1.14x host
    // drift plus one 1.28x outlier, q113, that was noise, not a plan
    // change): queries whose 3-pass min is >= 1.5 s get two more
    // round-robin passes, so their reported min is a min-of-5. Cheap rows
    // stay at 3 samples — their absolute noise is bounded by their size.
    val slow = selected.filter { case (name, _) =>
      samples(name).flatten.nonEmpty && samples(name).flatten.min >= 1.5 }
    for (_ <- 1 to 2; (name, fn) <- slow)
      samples(name) = samples(name) :+ timeOnce(name, fn)
    // per-query min over SUCCESSFUL runs only; a query with zero successes
    // appears in the errors line and count, never in the mins
    val results = samples.collect {
      case (name, ss) if ss.flatten.nonEmpty => name -> ss.flatten.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val all = samples.map { case (k, ss) =>
      s"\"" + k + "\":" + ss.map(_.getOrElse(-1.0)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Line order matters: the driver's fixed-size tail capture keeps the END
    // of stdout, so the LAST line must be short enough to always survive the
    // window whole. Rounds 4-5 proved a multi-KB final line gets its head
    // clipped (r5: 85 per-query mins ~4.7 KB, parsed=null). So: samples and
    // per-query mins print as their own EARLIER lines (forensics when the
    // window is generous), and the final line is a fixed ~100-byte summary.
    println(s"""{"metric":"samples","samples":$all,"sf":"$sfDir"}""")
    println(s"""{"metric":"queries","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    if (errors.nonEmpty) println(s"""{"metric":"errors","errors":$es}""")
    // Lossless artifact: the driver's fixed-size stdout tail clips the ~5 KB
    // per-query lines (r5/r6: only part of the mins survived), so the FULL
    // summary+mins+samples is also written to a repo file every run. The
    // stdout summary line stays the driver's signal; this file is the record.
    val detail = f"""{"metric":"bench_detail","total":$total%.3f,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir","queries":$qs,"errors":$es,"samples":$all}"""
    // A SPARK_GRAFT_ONLY subset run is a dev probe, not the record — it must
    // not clobber the committed full-battery artifact with partial data
    val detailFile =
      if (only.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL.partial.json"
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailFile),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () } // bench still reports via stdout
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
