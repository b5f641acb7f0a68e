package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared reader for durable parquet state dirs (registries, stream
  * sinks): EXPLICIT schema (no footer inference — hive partition columns
  * come from the directory names, and an empty dir must not fail schema
  * discovery), returning an empty relation of that schema when nothing
  * has been written yet — "no state" is a normal first-run condition for
  * every consumer here, never an error. */
private[graft] object RegistryIO {

  /** Whether `dir` holds committed data. `partitionPrefix =
    * Some("sbucket=")` probes for hive partition dirs; `None` probes for
    * flat `part-*` data files (streaming file sinks, whose
    * `_spark_metadata` dir alone does not make the dir readable). */
  def hasData(dir: String, partitionPrefix: Option[String]): Boolean = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.exists(p) && {
      val s = java.nio.file.Files.list(p)
      try {
        val it = s.iterator(); var found = false
        while (!found && it.hasNext) {
          val name = it.next().getFileName.toString
          found = partitionPrefix match {
            case Some(pre) => name.startsWith(pre)
            case None => name.startsWith("part-")
          }
        }
        found
      } finally s.close()
    }
  }

  /** Read `dir` under the declared schema, or an empty relation of that
    * schema when [[hasData]] finds nothing committed yet. */
  def readOrEmpty(spark: SparkSession, dir: String, schema: StructType,
                  partitionPrefix: Option[String]): DataFrame = {
    if (!hasData(dir, partitionPrefix))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dir)
  }
}
