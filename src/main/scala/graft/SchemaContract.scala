package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Tripwire against driver testdata schema drift.
  *
  * Round 8 lost 15 battery queries and 8 specs to a silent re-encode of
  * `events.ts` (TIMESTAMP(NANOS) → plain TIMESTAMP(MICROS)): the loader
  * hard-coded one historical encoding and every events read failed at
  * analysis time. This contract names, per table and column, the set of
  * Spark types our loaders + queries are known to handle; `violations`
  * returns a human-readable line per drifted/missing/unexpected column so
  * the FIRST signal of the next regen is a message naming the column, not
  * fifteen unrelated analysis exceptions.
  *
  * Acceptance sets are deliberately wider than "what the file says today":
  * integer keys accept 32- or 64-bit, timestamps accept LTZ / NTZ — widths
  * and flavors our code already canonicalizes or Spark coerces
  * transparently — and events.ts alone additionally accepts the legacy
  * nanos-as-long surface, because only Tables.events has the ÷1000 branch.
  * Anything outside the set (a key re-encoded as STRING, a timestamp as
  * DATE, a raw-long date on a table with no canonicalizing loader) is a
  * real drift that needs a loader decision, and fails loudly here.
  */
object SchemaContract {

  private val int    = Set[DataType](IntegerType, LongType)
  private val dbl    = Set[DataType](DoubleType, FloatType)
  private val str    = Set[DataType](StringType)
  private val ts     = Set[DataType](TimestampType, TimestampNTZType)
  // LongType (legacy nanos-as-long) is accepted ONLY where a loader actually
  // canonicalizes it — events.ts. Accepting it for o_orderdate/l_shipdate
  // would silence exactly the drift this contract exists to catch: those
  // tables load raw, and a bigint date column would mis-compare downstream.
  private val tsOrNanos = ts + LongType
  private val fvec   = Set[DataType](ArrayType(FloatType, containsNull = true),
                                     ArrayType(FloatType, containsNull = false),
                                     ArrayType(DoubleType, containsNull = true),
                                     ArrayType(DoubleType, containsNull = false))

  /** table → column → accepted raw-load Spark types. */
  val accepted: Map[String, Map[String, Set[DataType]]] = Map(
    "region"   -> Map("r_regionkey" -> int, "r_name" -> str),
    "nation"   -> Map("n_nationkey" -> int, "n_name" -> str, "n_regionkey" -> int),
    "customer" -> Map("c_custkey" -> int, "c_name" -> str, "c_nationkey" -> int,
                      "c_acctbal" -> dbl, "c_mktsegment" -> str),
    "supplier" -> Map("s_suppkey" -> int, "s_name" -> str, "s_nationkey" -> int,
                      "s_acctbal" -> dbl),
    "part"     -> Map("p_partkey" -> int, "p_name" -> str, "p_brand" -> str,
                      "p_type" -> str, "p_size" -> int, "p_retailprice" -> dbl),
    "orders"   -> Map("o_orderkey" -> int, "o_custkey" -> int, "o_orderstatus" -> str,
                      "o_totalprice" -> dbl, "o_orderdate" -> ts,
                      "o_orderpriority" -> str),
    "lineitem" -> Map("l_orderkey" -> int, "l_partkey" -> int, "l_suppkey" -> int,
                      "l_linenumber" -> int, "l_quantity" -> dbl,
                      "l_extendedprice" -> dbl, "l_discount" -> dbl, "l_tax" -> dbl,
                      "l_returnflag" -> str, "l_linestatus" -> str,
                      "l_shipdate" -> ts),
    "events"   -> Map("event_id" -> int, "ts" -> tsOrNanos, "user_id" -> int,
                      "event_type" -> str, "value" -> dbl, "props" -> str),
    "documents" -> Map("doc_id" -> int, "text" -> str, "lang" -> str,
                       "source" -> str, "n_chars" -> int),
    "embeddings" -> Map("vec_id" -> int, "embedding" -> fvec, "label" -> int))

  /** First line of the exception's message (or its class-qualified
    * toString when the message is null/empty) — never throws itself. */
  private def firstLine(e: Throwable): String =
    Option(e.getMessage).flatMap(_.linesIterator.find(_.nonEmpty))
      .getOrElse(e.toString)

  /** One line per violation against the testdata under `dir`; empty = clean.
    * Also asserts the canonical `Tables.events` output carries `ts` as
    * TIMESTAMP — the invariant every events query depends on. Loads go
    * through [[Tables.loadAdaptive]] so the legacy TIMESTAMP(NANOS)
    * encoding (which the plain reader refuses outright) is inspected as
    * the LongType it surfaces as, not misreported as a load failure. */
  def violations(spark: SparkSession, dir: String): Seq[String] = {
    val raw = accepted.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val loaded =
        try Right(Tables.loadAdaptive(spark, dir, table).schema)
        catch { case e: Exception =>
          Left(s"$table: failed to load: ${firstLine(e)}") }
      loaded match {
        case Left(err) => Seq(err)
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          val missing = (cols.keySet -- byName.keySet).toSeq.sorted
            .map(c => s"$table.$c: missing from parquet")
          val extra = (byName.keySet -- cols.keySet).toSeq.sorted
            .map(c => s"$table.$c: unexpected new column (${byName(c).sql})")
          val drifted = cols.toSeq.sortBy(_._1).collect {
            case (c, ok) if byName.contains(c) && !ok.contains(byName(c)) =>
              s"$table.$c: loaded as ${byName(c).sql}, accepted: " +
                ok.map(_.sql).toSeq.sorted.mkString("{", ", ", "}")
          }
          missing ++ extra ++ drifted
      }
    }
    val canonical =
      try {
        val t = Tables.events(spark, dir).schema("ts").dataType
        if (t == TimestampType) Nil
        else Seq(s"Tables.events canonical ts is ${t.sql}, expected TIMESTAMP")
      } catch { case e: Exception =>
        Seq(s"Tables.events failed: ${firstLine(e)}") }
    raw ++ canonical
  }
}
