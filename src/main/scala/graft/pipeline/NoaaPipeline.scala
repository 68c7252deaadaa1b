package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.operators.{Cleanse, Dims, ParseFixedWidth}

/** The reference's actual domain pipeline, re-expressed end-to-end: NOAA
  * GHCN observations + dimension text files → cleansed Silver → star-schema
  * Gold (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py,
  * noaa_dimensions_bronze_to_silver.py, noaa_ghcn_silver_to_gold.py).
  *
  * Inputs arrive as DataFrames (raw observation rows in the bronze parquet
  * shape; dimension files as `value: string` lines from `spark.read.text`),
  * so the same transforms serve any landing layout.
  */
object NoaaPipeline {

  /** Bronze→Silver observation cleanse
    * (reference: noaa_ghcn_bronze_to_silver.py:76-99): UPPERCASE→snake_case
    * projection with casts, yyyyMMdd decode, quality filter, partition
    * columns. */
  def observationsToSilver(raw: DataFrame): DataFrame = {
    val normalized = Cleanse.normalize(raw, Seq(
      Cleanse.FieldSpec("ID", "station_id"),
      Cleanse.FieldSpec(to_date(col("DATE").cast(StringType), "yyyyMMdd"),
        "observation_date"),
      Cleanse.FieldSpec("ELEMENT", "element_type"),
      Cleanse.FieldSpec("DATA_VALUE", "value", DoubleType),
      Cleanse.FieldSpec("M_FLAG", "measurement_flag"),
      Cleanse.FieldSpec("Q_FLAG", "quality_flag"),
      Cleanse.FieldSpec("S_FLAG", "source_flag")))
    Cleanse.qualityFilter(normalized, "value", "quality_flag")
      .withColumn("year", year(col("observation_date")))
      .withColumn("month", month(col("observation_date")))
      .withColumn("day", dayofmonth(col("observation_date")))
  }

  /** Silver dimensions from the fixed-width text files
    * (reference: noaa_dimensions_bronze_to_silver.py — regex there, true
    * offsets here). */
  def stationsToSilver(lines: DataFrame): DataFrame =
    ParseFixedWidth.parseStations(lines)

  def countriesToSilver(lines: DataFrame): DataFrame =
    ParseFixedWidth.parseCodeName(lines, "country_code", "country_name")

  def statesToSilver(lines: DataFrame): DataFrame =
    ParseFixedWidth.parseCodeName(lines, "state_code", "state_name")

  def inventoryToSilver(lines: DataFrame): DataFrame =
    ParseFixedWidth.parseInventory(lines)

  /** Gold dim_element: distinct codes + CASE-mapped names
    * (reference: noaa_ghcn_silver_to_gold.py:56-67). */
  def dimElement(silverObs: DataFrame): DataFrame =
    silverObs.select(col("element_type").as("element_code")).distinct()
      .withColumn("element_name",
        when(col("element_code") === "TMAX", "Max temperature")
          .when(col("element_code") === "TMIN", "Min temperature")
          .when(col("element_code") === "PRCP", "Precipitation")
          .when(col("element_code") === "SNOW", "Snowfall")
          .when(col("element_code") === "SNWD", "Snow depth")
          .when(col("element_code") === "AWND", "Avg wind speed")
          .when(col("element_code") === "TAVG", "Avg temperature")
          .otherwise("Other"))

  /** Gold dim_date (reference: noaa_ghcn_silver_to_gold.py:70-79). */
  def dimDate(silverObs: DataFrame): DataFrame =
    Dims.calendarDim(silverObs, "observation_date")

  /** Gold fact_climate: tenths-of-degree temperatures normalized to degrees
    * (reference: noaa_ghcn_silver_to_gold.py:82-94 — F5/F6/F14). */
  def factClimate(silverObs: DataFrame): DataFrame =
    silverObs.select(
      col("station_id"),
      substring(col("station_id"), 1, 2).as("country_code"),
      col("element_type"),
      col("observation_date"),
      when(col("element_type").isin("TMAX", "TMIN", "TAVG"),
        col("value") / 10.0).otherwise(col("value")).as("value"),
      col("year"), col("month"))

  /** Full run: silver + gold written to the warehouse (dims overwrite,
    * fact append — the reference's write-mode split). */
  def run(rawObs: DataFrame, stationLines: DataFrame,
      countryLines: DataFrame, wh: Warehouse): Unit = {
    val silver = observationsToSilver(rawObs)
    Medallion.writeTable(silver, wh, Medallion.Silver, "noaa_ghcn",
      SaveMode.Overwrite, partitionBy = Seq("year", "month"))
    Medallion.writeTable(stationsToSilver(stationLines), wh,
      Medallion.Silver, "dim_stations")
    Medallion.writeTable(countriesToSilver(countryLines), wh,
      Medallion.Silver, "dim_countries")
    val spark = rawObs.sparkSession
    val silverObs = Medallion.readTable(spark, wh, Medallion.Silver, "noaa_ghcn")
    Medallion.writeTable(dimElement(silverObs), wh, Medallion.Gold, "dim_element")
    Medallion.writeTable(dimDate(silverObs), wh, Medallion.Gold, "dim_date")
    Medallion.writeTable(factClimate(silverObs), wh, Medallion.Gold,
      "fact_climate", SaveMode.Append, partitionBy = Seq("year", "month"))
  }
}
