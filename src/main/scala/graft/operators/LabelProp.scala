package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HashMin label propagation (the Pregel-style connected-components
  * algorithm; public knowledge — Kang et al., PEGASUS, ICDM 2009) —
  * the fully-distributed graph-labeling path that complements
  * [[Components.connectedComponents]]: union-find collects edges on the
  * driver (bounded at 1M edges), star contraction converges in
  * O(log n) supersteps but rewrites edges; HashMin touches only the
  * label table and is the shape a 1000-executor job runs when the edge
  * table itself is TB-scale and iteration count can be budgeted.
  *
  * Each node starts labeled with its own id; every iteration a node
  * takes the min of its label and its in-neighbors' labels. After K
  * iterations every node within graph distance K of its component's
  * minimum carries that minimum — so with symmetric edges and K >=
  * diameter the labels ARE the connected components, and for smaller K
  * the result is still deterministic (bounded-radius communities
  * around local minima), which is what makes a fixed-iteration run
  * SQL-replayable: the oracle unrolls the same K joins and must match
  * bit-for-bit. No floats anywhere — labels are the node ids.
  *
  * Scale shape (mirrors [[PageRank.run]]): one shuffle join
  * (edges ⋈ labels on src) + one partial-aggregated min per dst per
  * iteration — min combines map-side, so the shuffle carries at most
  * one row per (map partition, dst). Labels are localCheckpointed per
  * iteration to keep lineage O(1) in iteration count. Total cost:
  * K × (|E| join + |V| agg) — no driver-side state at any size. */
object LabelProp {

  /** (node, label) after `iters` exact HashMin iterations. Pass
    * symmetric edges (both directions) for undirected semantics —
    * propagation follows edge direction src→dst.
    *
    * `broadcastMaxNodes`: same gate as [[PageRank.run]] — under it,
    * each iteration broadcasts the |V|-row label state instead of
    * exchanging the static |E|-row edge table; join strategy never
    * changes the min-label values.
    *
    * `materializePerIteration = false` (same contract as
    * [[PageRank.run]]): skip the per-iteration localCheckpoint and run
    * all K iterations as one lazy composite — identical values, and for
    * small FIXED K it removes K materialization barriers and their
    * block write/read cycles (q158 at 4 iterations measured 1.5× on the
    * post-split bench); the default keeps lineage O(1) for arbitrary K. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, broadcastMaxNodes: Long = 4000000L,
      assumeDistinct: Boolean = false,
      materializePerIteration: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // `assumeDistinct` (r17): min-label propagation is idempotent in
    // edge multiplicity, so duplicates can never change RESULTS here —
    // the defensive distinct exists only to keep iteration cost O(|E|)
    // when callers pass duplicate-heavy streams. A caller whose edge
    // construction is structurally duplicate-free (q158) skips that
    // full-|E| exchange + hash agg.
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .ckpt()
    // one explode pass, not a 2-arm union — same block-read halving as
    // PageRank.run's nodes derivation
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .ckpt()
    val fits = nodes.count() <= broadcastMaxNodes
    def state(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var labels = nodes.select(col("node"), col("node").as("label"))
    (1 to iters).foreach { _ =>
      val incoming = e.join(state(labels), e("src") === labels("node"))
        .select(col("dst").as("node"), col("label").as("nl"))
        .groupBy(col("node")).agg(min(col("nl")).as("m"))
      val next = labels.join(state(incoming), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("m"), col("label")))
            .as("label"))
      labels = if (materializePerIteration) next.ckpt() else next
    }
    labels
  }
}
