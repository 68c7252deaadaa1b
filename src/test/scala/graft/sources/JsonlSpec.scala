package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class JsonlSpec extends SparkSpec {

  test("explicit schema + corrupt-record capture splits valid from malformed") {
    val dir = Files.createTempDirectory("graft_jsonl_").toString
    val f = s"$dir/in.jsonl"
    Files.writeString(Paths.get(f),
      """{"doc_id": 1, "lang": "en", "text": "a b"}
        |not json at all
        |{"doc_id": 2, "lang": "es", "text": null}
        |{"doc_id": 3, "lang": "de"
        |""".stripMargin)
    val ok = Jsonl.valid(spark, f, Jsonl.docsSchema)
    val bad = Jsonl.corrupt(spark, f, Jsonl.docsSchema)
    assert(ok.count() == 2) // rows 1 and 2 (null text is valid JSON)
    assert(ok.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val badLines = bad.collect().map(_.getString(0))
    assert(badLines.length == 2)
    assert(badLines.exists(_.startsWith("not json")))
    assert(badLines.exists(_.startsWith("""{"doc_id": 3""")))
  }

  test("fixture read matches the q72 query shape") {
    val out = graft.queries.PipelineQueries
      .q72JsonlDocs(spark, "/root/testdata/sf0.001")
    assert(out.count() == 14)
    // the null-text row propagates null measures
    val nullRow = out.filter(out.col("n_chars").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.getLong(0) == 5L)
  }
}
