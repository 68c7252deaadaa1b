package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end run of the NOAA-shaped pipeline on FIXTURES.md B1/B2/B3
  * fixtures: cleanse semantics, flag filters, ÷10 temperature normalize,
  * star-schema outputs, partition layout. */
class NoaaPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rawObs = Seq(
    ("USC00011084", 20240101, "TMAX", Some(251.0), "", null.asInstanceOf[String], "S"),
    ("USC00011084", 20240101, "TMIN", Some(-30.0), "", "", "S"),
    ("USC00011084", 20240102, "PRCP", Some(25.0), "", null.asInstanceOf[String], "S"),
    ("AGE00147708", 20241231, "TMAX", Some(180.0), "", "", "S"),
    ("AGE00147708", 20241231, "TMAX", None, "", null.asInstanceOf[String], "S"),     // null value -> drop
    ("AGE00147708", 20241231, "TMIN", Some(90.0), "", "G", "S")                       // quality flag -> drop
  ).toDF("ID", "DATE", "ELEMENT", "DATA_VALUE", "M_FLAG", "Q_FLAG", "S_FLAG")

  private def stationLines = Seq(
    f"${"USC00011084"}%-11s ${"31.0583"}%8s ${"-87.0550"}%9s ${"25.9"}%6s ${"AL"}%-2s ${"EVERGREEN"}%-30s ${""}%-3s ${"HCN"}%-3s ${""}%-5s",
    f"${"AGE00147708"}%-11s ${"36.7200"}%8s ${"3.0500"}%9s ${"38.0"}%6s ${""}%-2s ${"ALGIERS-VILLE/UNIVERSITE"}%-30s ${"GSN"}%-3s ${""}%-3s ${"60369"}%-5s"
  ).toDF("value")

  private def countryLines = Seq("US United States", "AG Algeria").toDF("value")

  test("full NOAA run: silver cleanse + gold star schema") {
    val wh = Warehouse(Files.createTempDirectory("graft_noaa_").toString)
    NoaaPipeline.run(rawObs, stationLines, countryLines, wh)

    val silver = Medallion.readTable(spark, wh, Medallion.Silver, "noaa_ghcn")
    assert(silver.count() == 4) // 6 raw - null value - quality flag
    assert(silver.schema.fieldNames.contains("station_id"))

    val fact = Medallion.readTable(spark, wh, Medallion.Gold, "fact_climate")
    val tmax = fact.filter(col("station_id") === "USC00011084" &&
      col("element_type") === "TMAX").rows.head
    assert(tmax.getAs[Double]("value") == 25.1)     // 251 tenths -> 25.1 C
    assert(tmax.getAs[String]("country_code") == "US")
    val prcp = fact.filter(col("element_type") === "PRCP").rows.head
    assert(prcp.getAs[Double]("value") == 25.0)     // not temperature: unnormalized

    val dimE = Medallion.readTable(spark, wh, Medallion.Gold, "dim_element")
    val names = dimE.rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("TMAX") == "Max temperature" && names("PRCP") == "Precipitation")

    val dimD = Medallion.readTable(spark, wh, Medallion.Gold, "dim_date")
    assert(dimD.count() == 3) // 2024-01-01, 2024-01-02, 2024-12-31

    val stations = Medallion.readTable(spark, wh, Medallion.Silver, "dim_stations")
    assert(stations.filter(col("is_gsn")).count() == 1)

    // hive partition layout year=/month= on the fact
    val partDirs = new java.io.File(wh.table(Medallion.Gold, "fact_climate"))
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(partDirs.forall(_.startsWith("year=")))

    // joinable: fact -> dim_countries via the substring country code
    val countries = Medallion.readTable(spark, wh, Medallion.Silver, "dim_countries")
    val joined = fact.join(countries, Seq("country_code")).count()
    assert(joined == fact.count())
  }
}
