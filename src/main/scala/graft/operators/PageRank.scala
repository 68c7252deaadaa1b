package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (Brin & Page 1998 — public algorithm) for
  * authority scoring over an edge table — the influence-weighting shape
  * corpus curation uses (domain authority as a quality prior, reference
  * popularity for sampling weights) and the classic iterative-join
  * workload of a graph-capable engine, joining [[Components]] in the
  * graph family.
  *
  * Ranks are integer PPM (start 1,000,000; update
  * `base + damping·Σ contrib ÷ 100` with integer division throughout), so
  * every iteration is EXACT and engine-portable: no float summation
  * order, no libm — a SQL oracle unrolls the same iterations and must
  * match bit-for-bit. The standard float formulation converges slightly
  * differently, but fixed-point is what a determinism-gated pipeline
  * wants: rank drift can never silently reshuffle a curriculum.
  *
  * Scale shape: each iteration is one shuffle join (edges ⋈ ranks on
  * src) + one partial-aggregated sum per dst — the Pregel message-pass
  * expressed relationally. Edges/degrees are computed once and cached by
  * the caller if reused; `ranks` is localCheckpointed per iteration so
  * the plan (and its re-execution cost) stays O(1) in iteration count
  * instead of exponentiating lineage. Dangling nodes (no out-edges)
  * simply leak their mass — the conventional simplification; add
  * self-loops upstream if mass conservation matters. */
object PageRank {

  /** (node, rank_ppm) after `iters` exact fixed-point iterations.
    * `dampingPct` is the damping factor in percent (85 = the standard
    * 0.85); base = (100 − dampingPct)·10,000 ppm.
    *
    * `broadcastMaxNodes`: the rank table is |V| rows of 16 bytes while
    * the per-iteration join streams |E| edge rows — when |V| fits the
    * gate (4M nodes ≈ 100 MB hashed), each iteration BROADCASTS the
    * fresh ranks instead of exchanging the static edge table every
    * round. AQE cannot make this call: the checkpointed frames carry no
    * stats. Join strategy never changes values, so the bit-exact
    * contract holds either way; above the gate the shuffle form runs
    * and the O(K·(|E|+|V|)) story is unchanged.
    *
    * `materializePerIteration = false` skips the per-iteration
    * localCheckpoint — for plan inspection (the checkpointed form's
    * final plan is an RDD scan, hiding the iteration join) or when a
    * caller with few iterations wants one lazy composite; the default
    * keeps lineage O(1) in iteration count. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampingPct: Int = 85, broadcastMaxNodes: Long = 4000000L,
      materializePerIteration: Boolean = true,
      assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    // localCheckpoint the shared inputs: edges feed nodes, degrees, and
    // every iteration — without it the (possibly expensive) upstream
    // edge derivation re-executes once per consumer (measured 4× the
    // total time on the q142 join-derived graph; exchange reuse does
    // not survive the per-iteration plans).
    // `assumeDistinct` (r17): a caller whose edge construction is
    // provably duplicate-free (e.g. a distinct pair set unioned with
    // its disjoint-node-space reverse, the q142/q158 graph) skips the
    // operator's defensive distinct — a full |E|-row exchange + hash
    // agg that re-deduplicates an already-unique set (measured 0.5 s
    // of 3.5 s on q142 at sf0.1). Duplicate edges under
    // assumeDistinct = true would double-count contributions, so only
    // set it when uniqueness is structural.
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .ckpt()
    // one explode pass over the checkpointed edges, not a 2-arm union:
    // each union arm re-reads the full edge blocks (2 × ~96 MB at q142's
    // sf0.1 sizes); explode emits both endpoints in a single pass and
    // the distinct partial-aggregates map-side either way
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .ckpt()
    // out-degree folded onto each edge ONCE: an iteration is then one
    // shuffle join + one partial agg, not two joins
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outd")), "src")
      .ckpt()
    val base = (100L - dampingPct) * 10000L
    val fits = nodes.count() <= broadcastMaxNodes
    def state(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var ranks = nodes.withColumn("rank_ppm", lit(1000000L))
    (1 to iters).foreach { _ =>
      val contribs = withDeg
        .join(state(ranks), withDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("rank_ppm DIV outd").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nodes.join(state(contribs), Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST($base + ($dampingPct * coalesce(s, 0)) DIV 100 " +
            "AS BIGINT)").as("rank_ppm"))
      ranks = if (materializePerIteration) next.ckpt() else next
    }
    ranks
  }
}
