package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-width / delimited text parsing for dimension files.
  *
  * The reference parses NOAA's fixed-width station/country/state files with
  * fragile regexes (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:51-86
  * — station names containing digits can confuse them; SURVEY.md §7.2). We
  * parse with true fixed column offsets per the NOAA layout the reference
  * cites (glue-jobs/noaa_dimensions_bronze_to_silver.py:40), as pure
  * `substring`/`trim`/`cast` projections — codegen'd, no shuffle, no UDF.
  * Empty numeric fields become null explicitly (ANSI-safe).
  */
object ParseFixedWidth {

  /** One output field: 1-based start offset, length, optional cast. */
  final case class FieldDef(name: String, start: Int, len: Int,
      dataType: DataType = StringType)

  private def field(f: FieldDef): Column = {
    val raw = trim(substring(col("value"), f.start, f.len))
    val c = f.dataType match {
      case StringType => raw
      case dt => when(raw === "", lit(null)).otherwise(raw).cast(dt)
    }
    c.as(f.name)
  }

  /** Project a `value: string` line DataFrame into typed columns. */
  def parse(lines: DataFrame, fields: Seq[FieldDef]): DataFrame =
    lines.select(fields.map(field): _*)

  /** NOAA ghcnd-stations layout (public NOAA spec; the file the reference
    * reads at glue-jobs/noaa_dimensions_bronze_to_silver.py:46):
    * ID 1-11, LAT 13-20, LON 22-30, ELEV 32-37, STATE 39-40, NAME 42-71,
    * GSN 73-75, HCN/CRN 77-79, WMO 81-85. */
  val stationLayout: Seq[FieldDef] = Seq(
    FieldDef("station_id", 1, 11),
    FieldDef("latitude", 13, 8, DoubleType),
    FieldDef("longitude", 22, 9, DoubleType),
    FieldDef("elevation", 32, 6, DoubleType),
    FieldDef("state", 39, 2),
    FieldDef("station_name", 42, 30),
    FieldDef("gsn_flag", 73, 3),
    FieldDef("hcn_crn_flag", 77, 3),
    FieldDef("wmo_id", 81, 5))

  /** Stations dimension: fixed-offset parse + flag booleans + non-empty key
    * (replaces the reference's regex chain,
    * glue-jobs/noaa_dimensions_bronze_to_silver.py:51-86). */
  def parseStations(lines: DataFrame): DataFrame =
    Cleanse.nonEmptyKey(parse(lines, stationLayout), "station_id")
      .withColumn("is_gsn", col("gsn_flag") === "GSN")
      .withColumn("is_hcn_crn", col("hcn_crn_flag").isin("HCN", "CRN"))

  /** Country/state code files: `CC Name...` — 2-char code + name remainder
    * (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:109-120,143-154). */
  def parseCodeName(lines: DataFrame, codeCol: String, nameCol: String): DataFrame =
    Cleanse.nonEmptyKey(
      lines.select(
        trim(substring(col("value"), 1, 2)).as(codeCol),
        trim(substring(col("value"), 4, 1000)).as(nameCol)),
      codeCol)

  /** Whitespace-delimited inventory lines: station, lat, lon, element,
    * first/last year (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:177-193,
    * the F9 split-and-index pattern). */
  def parseInventory(lines: DataFrame): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    Cleanse.nonEmptyKey(
      lines.select(
        toks.getItem(0).as("station_id"),
        toks.getItem(1).cast(DoubleType).as("latitude"),
        toks.getItem(2).cast(DoubleType).as("longitude"),
        toks.getItem(3).as("element"),
        toks.getItem(4).cast(IntegerType).as("first_year"),
        toks.getItem(5).cast(IntegerType).as("last_year")),
      "station_id")
  }
}
