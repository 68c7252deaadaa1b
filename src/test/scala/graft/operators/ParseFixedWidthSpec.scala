package graft.operators

import graft.SparkSpec

/** Reference-shaped fixture (FIXTURES.md B2/B3): NOAA-style fixed-width
  * station lines, code-name files, whitespace-delimited inventory. */
class ParseFixedWidthSpec extends SparkSpec {
  import spark.implicits._

  // Exact NOAA ghcnd-stations column offsets (built with format widths so
  // every field lands on its spec offset); includes the edge cases that
  // break regex parsing: missing state, name containing digits, optional
  // GSN/HCN/WMO tails.
  private def stationLine(id: String, lat: String, lon: String, elev: String,
      state: String, name: String, gsn: String = "", hcn: String = "",
      wmo: String = ""): String =
    f"$id%-11s $lat%8s $lon%9s $elev%6s $state%-2s $name%-30s $gsn%-3s $hcn%-3s $wmo%-5s"

  private def stationLines = Seq(
    stationLine("ACW00011604", "17.1167", "-61.7833", "10.1", "", "ST JOHNS COOLIDGE FLD"),
    stationLine("AGE00147708", "36.7200", "3.0500", "38.0", "", "ALGIERS-VILLE/UNIVERSITE", gsn = "GSN", wmo = "60369"),
    stationLine("USC00011084", "31.0583", "-87.0550", "25.9", "AL", "EVERGREEN", hcn = "HCN"),
    stationLine("USC00011099", "31.0000", "-87.0000", "100.0", "AL", "CAMP 14 ROAD 7")
  ).toDF("value")

  test("parseStations: fixed offsets, flags, numeric casts") {
    val out = ParseFixedWidth.parseStations(stationLines)
      .orderBy("station_id").rows
    assert(out.size == 4)
    val first = out.head
    assert(first.getString(0) == "ACW00011604")
    assert(first.getDouble(1) == 17.1167 && first.getDouble(2) == -61.7833)
    assert(first.getString(4) == "")
    assert(first.getString(5) == "ST JOHNS COOLIDGE FLD")
    val gsn = out(1)
    assert(gsn.getAs[Boolean]("is_gsn"))
    assert(gsn.getAs[String]("wmo_id") == "60369")
    assert(out(2).getAs[Boolean]("is_hcn_crn"))
    val digits = out(3)
    assert(digits.getAs[String]("station_name") == "CAMP 14 ROAD 7")
    assert(digits.getAs[String]("state") == "AL")
  }

  test("parseCodeName: 2-char code + name remainder") {
    val lines = Seq("US United States", "BR Brazil", "").toDF("value")
    val out = ParseFixedWidth.parseCodeName(lines, "country_code", "country_name")
      .orderBy("country_code").rows
    assert(out.map(r => (r.getString(0), r.getString(1))) ==
      Seq(("BR", "Brazil"), ("US", "United States")))
  }

  test("parseInventory: whitespace-split typed fields") {
    val lines = Seq("ACW00011604  17.1167  -61.7833 TMAX 1949 1949").toDF("value")
    val r = ParseFixedWidth.parseInventory(lines).rows.head
    assert(r.getString(0) == "ACW00011604")
    assert(r.getString(3) == "TMAX")
    assert(r.getInt(4) == 1949 && r.getInt(5) == 1949)
  }

  test("empty numeric fields become null (ANSI-safe)") {
    val lines = Seq("XXXXXXXXXXX                                NO COORDS HERE").toDF("value")
    val r = ParseFixedWidth.parse(lines, ParseFixedWidth.stationLayout).rows.head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
