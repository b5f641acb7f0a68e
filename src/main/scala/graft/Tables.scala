package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All analytic queries take the scale-factor directory as a parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * by extension, on a real cluster against arbitrarily large partitioned
  * parquet. Reads go through `spark.read.parquet` so Catalyst gets full
  * predicate-pushdown / column-pruning / partition-pruning on every scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** True iff `e` is Spark refusing a TIMESTAMP(NANOS) parquet column —
    * the one failure the legacy nanos-as-long retry can actually cure. */
  private def isNanosRefusal(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type")
  }

  /** `load`, with the TIMESTAMP(NANOS) fallback: such files are only
    * readable with `spark.sql.legacy.parquet.nanosAsLong=true` (the column
    * then surfaces as raw LongType nanos). The conf flip is scoped to the
    * refusal it cures in the sense that any other failure (missing path,
    * corrupt footer) propagates untouched and a FAILED retry restores the
    * previous value — but after a SUCCESSFUL retry the conf stays set for
    * the session: the returned DataFrame is lazy, and its scan re-resolves
    * the legacy mode at execution time, so restoring the conf here would
    * break the very read this fallback just enabled. The session-wide
    * residue is deliberate and guarded: a NANOS-encoded drift on a table
    * WITHOUT an adaptive loader would then surface as LongType instead of
    * a load refusal, which is exactly what SchemaContract's per-column
    * accepted-type check (and Bench's named-line preflight) trips on. */
  private[graft] def loadAdaptive(s: SparkSession, d: String, name: String): DataFrame =
    try load(s, d, name)
    catch {
      case e: Exception if isNanosRefusal(e) =>
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "true")
        try load(s, d, name)
        catch {
          case retryFailure: Throwable =>
            prev match {
              case Some(v) => s.conf.set(key, v)
              case None    => s.conf.unset(key)
            }
            throw retryFailure
        }
    }

  /** Schema-adaptive `events` loader. The driver has shipped `events.ts`
    * under more than one parquet encoding over time — TIMESTAMP(NANOS)
    * (which Spark only reads via the legacy nanos-as-long mode) and plain
    * TIMESTAMP(MICROS) — so we branch on what the file actually declares
    * instead of hard-coding one historical encoding:
    *   - TimestampType      → pass through
    *   - TimestampNTZType   → cast to TimestampType (session TZ is UTC in
    *                          every entry point, so the instant is unchanged)
    *   - LongType (legacy nanos-as-long) → floor-divide ns→µs, the same
    *                          truncation DuckDB applies coercing ns→µs
    * All downstream queries see one canonical shape: `ts TIMESTAMP` (µs). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = loadAdaptive(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other — extend Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Ceiling for the input-skew balancing repartition in [[balanced]]: a
    * layout at or above this size has enough row groups for the scan to
    * parallelize naturally, so only genuinely toy layouts qualify. */
  private val BalanceMaxBytes = 2L * 1024 * 1024 * 1024

  /** Bytes of COMPRESSED input per balanced partition. The pinned count
    * is data-derived (`bytes / this`, capped at defaultParallelism), not
    * the core count: r20 pinned `defaultParallelism` outright and the
    * driver's 8-vs-32-core scaling block showed the shingle/LSH family
    * running up to 3.5× FASTER at 8 cores — 32 partitions over a
    * KB-scale relation fragments every downstream stage into tasks whose
    * scheduling overhead dwarfs their work. 64 KiB of zstd'd text is
    * roughly 200–400 KiB in flight and several hundred ms of
    * explode/shingle/regex work — comfortably above task overhead —
    * so the derived count keeps tasks coarse while still spreading a
    * one-file layout. Parameterised for other deployments
    * (SPARK_GRAFT_BALANCE_BYTES_PER_PART); the production no-op argument
    * is unchanged — real tables exceed [[BalanceMaxBytes]] or the file
    * floor and never reach this arithmetic. */
  private lazy val BalanceBytesPerPartition: Long =
    sys.env.get("SPARK_GRAFT_BALANCE_BYTES_PER_PART").map(_.toLong)
      .getOrElse(64L * 1024)

  /** Memo of the balanced relation per (session, input-files signature):
    * the balance decision re-listed the input and issued one getFileStatus
    * per file on EVERY consuming query build (ADVICE r20) — pure driver
    * overhead repeated tens of times per bench run. The signature is the
    * sorted file list, so a swapped-out layout re-decides. */
  private val balanceMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Input-skew mitigation (optimization guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read"): a
    * table whose layout supplies fewer input FILES than the session has
    * cores cannot parallelize its scan stage past the file count when the
    * files are single-row-group — parquet splits at row-group granularity,
    * and the driver's testdata tables are exactly one file with one row
    * group — so everything FUSED into the scan stage (token explodes,
    * shingle generation, regex scrubs, codegen'd scorers) runs on a
    * handful of cores while the rest idle.
    *
    * CONDITIONAL by construction: fires only when the layout is both
    * under-filed (files < defaultParallelism) and small in absolute bytes
    * (< 2 GiB — generous for a local layout, far under any production
    * table), so a real multi-file table keeps its natural scan
    * parallelism and pays no extra exchange; the plan at scale is
    * unchanged. Hash-keyed, never round-robin: the row→partition mapping
    * is deterministic under task retry (guide §2.5's SPARK-38388 note),
    * and downstream per-key aggregations and joins REUSE the partitioning
    * (HashPartitioning(key) satisfies any clustering that contains the
    * key, so e.g. groupBy(doc_id, …) over the balanced relation needs no
    * further exchange). The partition count is pinned explicitly —
    * repartition(col) alone is an AQE-coalescable shuffle, and at these
    * input sizes AQE would fold it straight back to one partition — and
    * SCALED TO THE DATA, not the core count (see
    * [[BalanceBytesPerPartition]]). */
  def balanced(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val sess = df.sparkSession
    if (sys.env.contains("SPARK_GRAFT_NOBALANCE")) return df // dev A/B knob
    val files = df.inputFiles
    if (files.length >= sess.sparkContext.defaultParallelism) return df
    val memoKey = (sess, files.sorted.mkString("\n"), key.toString)
    balanceMemo.computeIfAbsent(memoKey, _ => {
      val conf = sess.sparkContext.hadoopConfiguration
      val bytes = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
      if (bytes >= BalanceMaxBytes) df
      else {
        val parts = math.max(1L, math.min(
          sess.sparkContext.defaultParallelism.toLong,
          (bytes + BalanceBytesPerPartition - 1) / BalanceBytesPerPartition)).toInt
        if (parts <= files.length) df
        else df.repartition(parts, key)
      }
    })
  }

  /** [[documents]] balanced by doc_id for scan-stage-heavy consumers
    * (tokenization, shingling, PII regexes, classifier scoring): the
    * identical relation, hash-spread over the cores when — and only
    * when — the file layout under-supplies them (see [[balanced]]). */
  def documentsBalanced(s: SparkSession, d: String): DataFrame =
    balanced(documents(s, d), org.apache.spark.sql.functions.col("doc_id"))
}
