package graft.props

import java.nio.file.{Files, Paths}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.TestSpark
import graft.pipeline.Maintenance
import graft.streaming.BatchPartitionIngest
import graft.streaming.BatchPartitionIngest.{StateMeta, StateMetaFile}

/** The nio and Hadoop-FileSystem discovery walks must agree on ANY
  * directory layout — not just the hand-built fixture in PipelineSpec.
  * Random trees mix healthy sketch states (all four kinds), unknown
  * kinds, corrupt metas, near-dup index roots, swap leftovers
  * (`.old`/`.new`), and plain nested dirs; both walks must return the
  * same (kind, dir) set, with corrupt metas surfacing as
  * `unreadable_meta` entries rather than exceptions. No Spark jobs run
  * per sample — the walk is driver-side listing only — so 40 samples
  * stay cheap. */
object DiscoveryProps extends Properties("graft.discovery") {


  private sealed trait Node
  private case class SketchState(kind: String, cols: List[String],
    corrupt: Boolean) extends Node
  private case object NearDupRoot extends Node
  private case object SwapLeftover extends Node
  private case class Plain(children: List[(String, Node)]) extends Node

  private val nameGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def nodeGen(depth: Int): Gen[Node] = {
    val leaf = Gen.frequency(
      4 -> (for {
        kind <- Gen.oneOf("kll", "theta", "hll", "cms", "mystery")
        cols <- Gen.listOfN(2, nameGen)
        corrupt <- Gen.frequency(3 -> false, 1 -> true)
      } yield SketchState(kind, cols, corrupt)),
      1 -> Gen.const(NearDupRoot),
      1 -> Gen.const(SwapLeftover))
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, nameGen.flatMap(nm =>
          nodeGen(depth - 1).map(nm -> _)))
          .map(cs => Plain(cs.distinctBy(_._1)))))
  }

  private def materialize(dir: String, node: Node): Unit = node match {
    case SketchState(kind, cols, corrupt) =>
      BatchPartitionIngest.writeStateMeta(dir, StateMeta(kind, cols))
      if (corrupt)
        Files.write(Paths.get(dir, StateMetaFile), """{"kind":"x""".getBytes)
    case NearDupRoot =>
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "_graft_meta.json"),
        """{"idCol":"id"}""".getBytes)
    case SwapLeftover =>
      // a dir whose NAME marks it as swap debris must be invisible to
      // discovery even if it contains a readable meta
      Files.createDirectories(Paths.get(dir + ".old"))
      BatchPartitionIngest.writeStateMeta(dir + ".old",
        StateMeta("kll", Nil))
    case Plain(children) =>
      Files.createDirectories(Paths.get(dir))
      children.foreach { case (nm, child) =>
        materialize(s"$dir/$nm", child)
      }
  }

  /** (kind, dir relative to root) for comparability across walks —
    * Hadoop paths come back scheme-qualified (`file:/…`). */
  private def summarize(states: Seq[Maintenance.StreamState],
      root: String): Set[(String, String)] =
    states.map(st => (st.kind,
      st.stateDir.stripPrefix("file:").stripPrefix(root))).toSet

  private def expected(node: Node, at: String): Set[(String, String)] =
    node match {
      case SketchState(_, _, true) => Set(("unreadable_meta", at))
      case SketchState("mystery", _, false) => Set.empty
      case SketchState(kind, _, false) => Set((kind, at))
      case NearDupRoot => Set(("neardup_index", at))
      case SwapLeftover => Set.empty
      case Plain(children) =>
        children.flatMap { case (nm, c) => expected(c, s"$at/$nm") }.toSet
    }

  private val treeGen: Gen[Node] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, nameGen.flatMap(nm => nodeGen(2).map(nm -> _)))
        .map(cs => Plain(cs.distinctBy(_._1))))

  property("nio and Hadoop walks agree on random trees, and both " +
      "match the constructed ground truth") =
    Prop.forAll(treeGen) { tree =>
      val root = Files.createTempDirectory("graft_dprop_").toString
      try {
        materialize(root, tree)
        val nio = summarize(Maintenance.discoverStreamStates(Seq(root)), root)
        val hadoop = summarize(Maintenance
          .discoverStreamStatesHadoop(TestSpark.spark, Seq(root)), root)
        val want = expected(tree, "")
        (nio == want) :| s"nio=$nio want=$want" &&
          (hadoop == nio) :| s"hadoop=$hadoop nio=$nio"
      } finally graft.util.Fs.deleteRecursively(new java.io.File(root))
    }

  property("healthy discovered sketch states carry the written meta's " +
      "kind and dir verbatim (round-trip through parse)") =
    Prop.forAll(Gen.oneOf("kll", "theta", "hll", "cms"),
        Gen.listOfN(2, nameGen)) { (kind, cols) =>
      val root = Files.createTempDirectory("graft_dprop2_").toString
      try {
        BatchPartitionIngest.writeStateMeta(s"$root/s", StateMeta(kind, cols))
        val found = Maintenance.discoverStreamStates(Seq(root))
        found.map(st => (st.kind, st.stateDir)) == Seq((kind, s"$root/s"))
      } finally graft.util.Fs.deleteRecursively(new java.io.File(root))
    }
}
