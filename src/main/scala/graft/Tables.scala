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

  /** Normalize an events frame whose `ts` may be parquet TIMESTAMP(NANOS)
    * (older fixtures; Spark reads it as raw long in legacy mode) or
    * TIMESTAMP(MICROS) without UTC adjustment (current fixtures; Spark
    * infers TIMESTAMP_NTZ). Both normalize to a session-zone TIMESTAMP —
    * the session is pinned to UTC, so the wall-clock values are identical
    * and downstream epoch arithmetic (`cast(ts as bigint)`, window frames)
    * stays legal. Shared by every events reader so code paths cannot drift;
    * the nanos→micros floor matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Load one table. `events.ts` may be TIMESTAMP(NANOS) in old fixtures:
    * legacy-nanos mode makes the read succeed either way, and
    * [[normalizeEventTs]] converts only when the raw long actually surfaced.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  // Last dir fully registered per session: SQL-surface queries call
  // registerAll on every invocation, and re-deriving 10 parquet reads
  // (footer/schema resolution each) costs ~0.1-0.2s per call — pure
  // overhead when the views already point at the same dir (bench reps
  // pay it 3x per SQL query). Weak keys so a dropped session doesn't
  // pin its catalog. Only a FULLY successful registration is cached;
  // any failure clears the entry so the next call retries everything.
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view so `spark.sql` works over the same
    * data (the reference's interactive surface is SQL-over-catalog —
    * reference: README.md:245-276). Registration is failure-isolated: one
    * unreadable table must not take down queries that never touch it. A table
    * whose load fails is dropped from the view catalog (so a stale view from
    * a prior registration cannot serve wrong data) and the failure is
    * recorded; queries touching it then fail at analysis with a
    * view-not-found error naming the table, while every other query runs.
    * Idempotent per (session, dir): a repeat call for the already-registered
    * dir is a no-op — but only after a catalog-only existence check on all
    * ten view names (`tableExists` reads the session catalog, no parquet
    * footers), so code that DROPPED a shared view without calling
    * [[invalidateRegistration]] gets re-registration instead of a silent
    * no-op serving a missing view. A view *shadowed* via
    * `createOrReplaceTempView` still exists and cannot be detected here —
    * shadowing code must call [[invalidateRegistration]] (the fixture
    * suites do, in `afterAll`).
    * Returns the names of tables that failed to register (empty = all good).
    */
  def registerAll(spark: SparkSession, sfDir: String): Seq[String] = {
    if (sfDir == registeredDir.get(spark) &&
      all.forall(spark.catalog.tableExists)) return Nil
    registeredDir.remove(spark) // mid-registration state is never trusted
    val failures = all.flatMap { n =>
      try { load(spark, sfDir, n).createOrReplaceTempView(n); None }
      catch {
        case scala.util.control.NonFatal(e) =>
          spark.catalog.dropTempView(n)
          System.err.println(s"[graft] registerAll: table '$n' failed to load from $sfDir: ${e.getMessage}")
          Some(n)
      }
    }
    if (failures.isEmpty) registeredDir.put(spark, sfDir)
    failures
  }

  /** Forget the cached registration for `spark` — REQUIRED after any
    * code deliberately shadows or drops one of the ten shared view
    * names (test fixtures do), so the next [[registerAll]] re-registers
    * instead of trusting the stale cache. */
  def invalidateRegistration(spark: SparkSession): Unit =
    registeredDir.remove(spark)
}
