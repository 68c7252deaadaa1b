package graft

import org.apache.spark.sql.SparkSession

import graft.expressions.GraftFunctions

/** Session factory: the library's front door. Configures the session the
  * way every graft operator expects — UTC semantics, shuffle parallelism
  * sized to the machine (not the 200 default), AQE with skew handling, and
  * the custom SQL functions registered. */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = master match {
      case m if m.startsWith("local[") && !m.contains("*") =>
        m.stripPrefix("local[").stripSuffix("]").toInt
      case _ => Runtime.getRuntime.availableProcessors
    }
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      // CALL graft.system.rewrite_data_files/expire_snapshots/
      // remove_orphan_files — the SQL maintenance surface
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftProcedureCatalog].getName)
      .config("spark.ui.enabled", "false")
      // a long-lived session running many distinct queries (the test
      // battery, a notebook, the bench catalog) thrashes the default
      // 100-entry codegen cache into per-query recompilation — size it
      // for a whole workload (static conf: applies when this builder
      // CREATES the session)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
  }

  /** Build (or reuse) the session and ensure the custom functions are
    * registered even when attaching to a pre-existing session. */
  def getOrCreate(master: String = s"local[${Runtime.getRuntime.availableProcessors}]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
