package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text-corpus ingestion beyond parquet: JSONL and CSV document dumps —
  * the formats crawls and annotation pipelines actually deliver — loaded
  * under the SAME canonical `documents` schema the parquet battery uses
  * (doc_id, text, lang, source, n_chars), so every downstream operator
  * (dedup, curation, the ingest gates) runs unchanged on either.
  *
  * Design decisions, each the 100 TB-safe default:
  *
  *   - **Schema is DECLARED, never inferred.** Inference reads the data
  *     twice and lets one odd shard silently widen a column for the whole
  *     corpus; a declared schema makes one malformed file a per-ROW
  *     incident, not a corpus-wide type flip.
  *   - **Malformed rows are audited, not dropped.** PERMISSIVE mode
  *     captures the raw line in `_corrupt_record`; [[audit]] splits the
  *     load into (clean, corrupt) so a pipeline can count/quarantine the
  *     bad lines — DROPMALFORMED's silent data loss is the one mode this
  *     loader refuses to default to. FAILFAST is available for
  *     ingest-time contracts via `failFast = true`.
  *   - **`n_chars` is recomputed, not trusted**: a dump's precomputed
  *     length column drifts (different unicode length conventions); the
  *     canonical column is derived from `text` in one codegen'd
  *     projection, so q93/q98-style token accounting is self-consistent.
  *   - Scans stay splittable: JSONL and uncompressed CSV both split by
  *     line, so a 100 TB dump parallelizes per-block like parquet (minus
  *     column pruning — conversion to parquet is still the steady-state
  *     recommendation; these loaders are the INGEST EDGE).
  */
object DocumentSource {

  /** The canonical documents schema (doc_id, text, lang, source) +
    * `_corrupt_record` for the permissive audit. */
  private val schema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, _corrupt_record STRING")

  private def canonical(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("text"), col("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars"))

  // PERMISSIVE parses a malformed line as an all-null row plus the raw
  // line in _corrupt_record; projecting the marker away WITHOUT filtering
  // on it would hand downstream gates phantom all-null documents (a null
  // doc_id corrupts every doc_id join; CorpusStats would count the row
  // under the "" cell). The primary loaders therefore return CLEAN rows
  // only — the corrupt lines are not lost, [[audit]] surfaces them.
  //
  // The filter requires doc_id ALONGSIDE the corrupt marker, for two
  // load-bearing reasons beyond the schema contract (a document without
  // an id is unusable downstream):
  //   1. Spark refuses a raw JSON/CSV query whose referenced columns are
  //      ONLY the internal corrupt column — a downstream count() would
  //      prune everything else away and hit that guard; referencing
  //      doc_id keeps a data column in the scan under any pruning.
  //   2. CSV under parser column pruning may not flag a line whose
  //      unreferenced cells are malformed — but a doc_id that failed
  //      conversion is null either way, so the row still drops.
  private def clean(raw: DataFrame): DataFrame =
    canonical(raw.filter(col("_corrupt_record").isNull && col("doc_id").isNotNull))

  /** JSON-lines corpus dump → canonical documents (clean rows only; use
    * [[audit]] to also collect the malformed lines). */
  def jsonl(spark: SparkSession, path: String, failFast: Boolean = false): DataFrame =
    clean(spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))

  /** CSV corpus dump (with header) → canonical documents (clean rows only). */
  def csv(spark: SparkSession, path: String, failFast: Boolean = false): DataFrame =
    clean(spark.read.schema(schema)
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path))

  /** Split a permissive JSONL load into (clean, corrupt-audit): clean rows
    * in canonical shape, corrupt rows as (raw_line) for quarantine.
    *
    * The audit path reads the dump as TEXT and parses each line with
    * `from_json`, so every quarantined row carries its ORIGINAL line
    * verbatim — including a well-formed line merely missing doc_id (which
    * routes to the audit side to stay partition-consistent with
    * [[jsonl]]'s clean set; see the filter comment above). The earlier
    * design re-serialized such lines from the parsed struct, which
    * silently dropped any fields outside the declared schema and the
    * original formatting — a quarantine that cannot reproduce its input
    * is not a quarantine. Still one splittable line scan; the cache keeps
    * the two branches from re-reading the dump (the audit is an
    * ingest-edge step over one dump, not a steady-state scan). */
  def audit(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.text(path)
      // blank/whitespace-only lines are NOT records: the JSON datasource
      // (and therefore jsonl()) emits no row for them at all, so the audit
      // must not quarantine them either — clean + corrupt together account
      // for every non-blank line, exactly the datasource's universe.
      // rlike, not trim(): Spark's trim strips only the space character,
      // and a tab- or CR-only line is just as blank to the JSON parser
      .filter(!col("value").rlike("^\\s*$"))
      .select(col("value").as("raw_line"),
        from_json(col("value"), schema, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("d"))
      .cache()
    val clean = canonical(
      raw.filter(col("d._corrupt_record").isNull && col("d.doc_id").isNotNull)
        .select(col("d.*")))
    val corrupt = raw.filter(
        col("d").isNull ||
        col("d._corrupt_record").isNotNull || col("d.doc_id").isNull)
      .select(col("raw_line"))
    (clean, corrupt)
  }
}
