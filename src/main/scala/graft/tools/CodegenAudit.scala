package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: run every battery query with whole-stage codegen fallback
  * DISABLED, so a generated method that janino refuses (too large, too many
  * locals) aborts the query instead of silently dropping the stage to
  * interpreted evaluation — the failure mode q89's first encode hit: the
  * value-level oracle cannot see it, and the tax was 10× on the sf0.1
  * battery. PlanQualitySpec pins the known-risky plans individually; this
  * sweep catches the NEXT one anywhere in the battery before it ships.
  *
  * {{{ sbt "runMain graft.tools.CodegenAudit /root/testdata/sf0.01" }}}
  *
  * Prints one line per failure and a final JSON summary; exits nonzero on
  * any failure.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the audit's whole point: compile failures must surface, not fall back
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // execute the query's OWN plan (an RDD count over toRdd), not
        // df.count(): stacking count(1) on top would let Catalyst prune
        // the very projections whose generated code we are auditing
        try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
        catch {
          case e: Throwable =>
            val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last
            System.err.println(s"[codegen-audit] $name: ${root.getMessage}")
            Some(name)
        }
    }
    println(s"""{"metric":"codegen_audit","n_queries":${graft.SparkEntry.queries.size},""" +
      s""""n_failures":${failures.size},"failures":[${failures.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
