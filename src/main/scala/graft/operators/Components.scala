package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair edges: turns pairwise matches
  * into clusters so dedup can keep exactly one representative per cluster
  * (greedy pair-dropping mishandles chains a–b, b–c).
  *
  * Algorithm: iterative minimum-label propagation. Each round every node
  * adopts the minimum component id among itself and its neighbors; rounds
  * run until a fixed point (checked with one count per round — the label
  * table is (id, comp) longs, so each round is one join + one aggregation
  * on a tiny relation compared to the corpus). Converges in O(diameter)
  * rounds; near-dup clusters are dense, so diameter is small. */
object Components {

  /** pairs: (id_a, id_b) edges. Returns (id, comp) with comp = min node id
    * reachable; only nodes appearing in some edge are returned.
    *
    * The edge set of a near-dup graph is orders of magnitude smaller than
    * the corpus (it is already the output of LSH + verification), so below
    * `driverThreshold` edges the components are solved with driver-side
    * union-find in one pass — no iterative jobs. Above it, distributed
    * label propagation takes over. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20,
      driverThreshold: Long = 1000000L): DataFrame = {
    val cached = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .cache()
    val n = cached.count()
    val out =
      if (n <= driverThreshold) driverUnionFind(cached)
      else propagate(cached, maxIters)
    cached.unpersist()
    out
  }

  private def driverUnionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union by minimum so the representative is the smallest id
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "comp")
  }

  private def propagate(pairs: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    // localCheckpoint truncates the lineage each round — an iterative plan
    // otherwise grows exponentially (each round embeds the previous plan
    // twice: once in the update, once in the convergence check).
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val neighborMin = edges
        .join(labels.withColumnsRenamed(Map("id" -> "src", "comp" -> "nc")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("nc")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      val changed = updated
        .join(labels.withColumnsRenamed(Map("comp" -> "old")), Seq("id"))
        .filter(col("comp") =!= col("old")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Dedup survivors given near-dup pairs: every id in a cluster maps to
    * the cluster minimum; keep rows whose id IS the minimum, plus all rows
    * never seen in any pair. */
  def keepClusterRepresentatives(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val losers = comp.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
