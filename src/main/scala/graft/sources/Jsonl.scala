package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSON-lines source — the de-facto interchange format for LLM training
  * corpora. Reads with an EXPLICIT schema (never inference: at 100 TB a
  * schema-inference pass is a full extra scan, and drifting input must
  * fail loudly, not reshape the table).
  *
  * Valid and corrupt rows are split by TWO pushdown-friendly reads
  * instead of one PERMISSIVE read filtered on `_corrupt_record`: Spark
  * disallows plans whose required schema is only the corrupt-record
  * column (count() over such a filter prunes to exactly that), so
  * [[valid]] uses DROPMALFORMED — same surviving set — and [[corrupt]]
  * re-parses the raw text lines with a from_json capture, which carries
  * no such restriction. Each path stays a single clean scan.
  *
  * The reference's source surface is parquet + fixed-width text
  * (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:46); JSONL
  * extends it for the training-data pipeline the extension brief
  * targets. */
object Jsonl {

  val Corrupt = "_corrupt_record"

  /** Document-corpus schema (doc_id, lang, text). */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** Parseable rows only — malformed lines dropped at the scan. */
  def valid(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Malformed raw lines (for quarantine/metrics): the text scan re-parses
    * each line with a corrupt-record capture and keeps the failures. */
  def corrupt(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val capture = schema.add(StructField(Corrupt, StringType))
    spark.read.text(path)
      .select(col("value"), from_json(col("value"), capture,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> Corrupt)).as("p"))
      .filter(col(s"p.$Corrupt").isNotNull)
      .select(col("value").as(Corrupt))
  }
}
