package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.streaming.BatchPartitionIngest
import graft.streaming.BatchPartitionIngest.StateMeta

/** The state meta is the ONLY thing standing between an on-disk sketch
  * state and a maintenance pass that folds it with the wrong grouping —
  * so its serialization must round-trip EVERY legal Spark column name,
  * not just alphanumeric ones. Spark permits quotes, commas, brackets,
  * backslashes, and arbitrary unicode in backtick-quoted column names;
  * the pre-r11 string-template writer + regex parser corrupted exactly
  * those (a `,` in a name split into two columns; a `"` or `]`
  * truncated the match). Jackson now owns both directions; these
  * properties pin that against regression. */
object StateMetaProps extends Properties("graft.statemeta") {

  // printable-ish unicode heavy on JSON metacharacters
  private val nastyChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf('"', ',', '[', ']', '{', '}', '\\', ':', ' ', '\''),
    1 -> Gen.oneOf('é', '中', 'ß', '→', '\t'))

  private val nameGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))

  private val metaGen: Gen[StateMeta] = for {
    kind <- Gen.oneOf(Gen.oneOf("kll", "theta", "hll", "cms"), nameGen)
    nCols <- Gen.choose(0, 4)
    cols <- Gen.listOfN(nCols, nameGen)
  } yield StateMeta(kind, cols)

  property("render/parse round-trips any kind and any column names") =
    Prop.forAll(metaGen) { meta =>
      val s = BatchPartitionIngest.renderStateMeta(meta)
      val back = BatchPartitionIngest.parseStateMeta(s, "prop")
      (back == meta) :| s"rendered=$s parsed=$back"
    }

  property("write/read round-trips through the filesystem (atomic " +
      "path) and refuses a DIFFERENT meta for the same dir") =
    Prop.forAll(metaGen) { meta =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_meta_prop_").toString
      try {
        BatchPartitionIngest.writeStateMeta(root, meta)
        val back = BatchPartitionIngest.readStateMeta(root)
        val rereadOk = back.contains(meta)
        // idempotent re-assert is fine; a conflicting declaration is not
        BatchPartitionIngest.writeStateMeta(root, meta)
        val conflict = meta.copy(kind = meta.kind + "_other")
        val refused =
          try { BatchPartitionIngest.writeStateMeta(root, conflict); false }
          catch { case _: IllegalArgumentException => true }
        (rereadOk :| s"reread=$back want=$meta") && (refused :| "no refuse")
      } finally graft.util.Fs.deleteRecursively(new java.io.File(root))
    }

  property("pre-r11 on-disk format (string template, simple names) " +
      "still parses — upgrade compatibility") =
    Prop.forAll(Gen.oneOf("kll", "theta", "hll", "cms"),
        Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
          Gen.choose(1, 8).flatMap(k =>
            Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))))) {
      (kind, cols) =>
        val legacy = s"""{"kind":"$kind","groupCols":${
          cols.map(c => "\"" + c + "\"").mkString("[", ",", "]")}}"""
        BatchPartitionIngest.parseStateMeta(legacy, "legacy") ==
          StateMeta(kind, cols)
    }

  property("truncations of a rendered meta never parse silently — " +
      "every strict prefix throws") =
    Prop.forAll(metaGen) { meta =>
      val s = BatchPartitionIngest.renderStateMeta(meta)
      // check a spread of prefixes (all |s| prefixes would be O(n²))
      val cuts = Seq(1, s.length / 4, s.length / 2, s.length - 1)
        .filter(c => c >= 1 && c < s.length).distinct
      cuts.forall { c =>
        val cut = s.take(c)
        try { BatchPartitionIngest.parseStateMeta(cut, "cut"); false }
        catch { case _: RuntimeException => true }
      }
    }
}
