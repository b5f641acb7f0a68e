package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites reuse it).
  *
  * The session is rebuilt if its SparkContext has been stopped: the
  * single-lazy-session design otherwise has no recovery when the context
  * dies for ANY reason (an executor-thread fatal error in local mode, a
  * shutdown hook, an OOM kill of a task thread) — one casualty poisoned
  * every subsequent suite in the JVM. `getOrCreate` alone is not enough
  * because the default session it caches still points at the stopped
  * context; we clear both registrations before rebuilding. */
object SparkTestSession {
  private def build(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  @volatile private var current: SparkSession = _

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      if (current != null) {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
      current = build()
    }
    current
  }
}

trait SparkTestSession {
  /** Stays a `lazy val` (stable identifier — suites do
    * `import spark.implicits._`), resolved at first use inside the suite.
    * Suites are constructed as they start, so a context killed in an
    * earlier suite is replaced before this one touches it; the cascade
    * where one casualty poisoned every subsequent suite is gone. Only the
    * suite that actually witnesses the death still fails, which is the
    * honest outcome. */
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
