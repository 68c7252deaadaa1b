package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer: loaders for the shared parquet test tables (TESTDATA.md).
  *
  * At production scale these would be catalog tables over object storage
  * (the reference reads Bronze parquet with `spark.read` the same way —
  * reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:46-50). The API takes a
  * directory so the same code serves local test parquet and a warehouse path;
  * Spark's vectorized parquet reader + partition discovery do the heavy
  * lifting either way.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. `events.ts` is written as parquet TIMESTAMP(NANOS),
    * which Spark's reader does not support natively: we read it as raw
    * nanos (legacy long mode) and floor-convert to a microsecond timestamp,
    * the same truncation DuckDB applies when casting TIMESTAMP_NS→TIMESTAMP.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view so `spark.sql` works over the same
    * data (the reference's interactive surface is SQL-over-catalog —
    * reference: README.md:245-276). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
