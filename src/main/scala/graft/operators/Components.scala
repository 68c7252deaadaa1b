package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair edges: turns pairwise matches
  * into clusters so dedup can keep exactly one representative per cluster
  * (greedy pair-dropping mishandles chains a–b, b–c).
  *
  * Distributed algorithm: alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", 2014).
  * Each round rewires edges toward per-neighborhood minima, so path
  * diameter roughly halves per round — O(log n) rounds to a fixed point,
  * unlike plain min-label propagation whose round count equals the graph
  * diameter (a 1M-edge chain would silently exceed any fixed budget).
  * Non-convergence within `maxIters` throws rather than returning
  * partially-merged (wrong) labels. */
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
    val typed = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
    // Size gate and edge collection in ONE bounded action (r17): a
    // limit(threshold+1) collect pulls at most threshold+1 rows of
    // driver memory (16 MB at the 1M default) via incremental
    // executeTake — upstream shuffle stages materialize once and are
    // reused across its partition attempts — where the previous
    // cache → count → collect → unpersist shape paid two full passes
    // plus block-manager churn on EVERY near-dup query. Which rows
    // land in the overflow probe is immaterial: it only picks the
    // path, and union-find ≡ star contraction is property-pinned.
    // clamp: a Long threshold ≥ Int.MaxValue would overflow `.toInt + 1`
    // into a negative limit; past ~2^31 rows the driver path is out of
    // the question anyway, so saturating at Int.MaxValue−1 keeps the
    // probe a plain over-threshold detector
    val probe = math.min(driverThreshold, Int.MaxValue - 1L).toInt + 1
    val head = typed.limit(probe).collect()
    if (head.length <= driverThreshold)
      driverUnionFind(typed.sparkSession, head)
    else {
      // rare big-graph path: now it pays for a cache (the distributed
      // rounds rescan the edge set), exactly like before
      val cached = typed.cache()
      try starContract(cached, maxIters) finally cached.unpersist()
    }
  }

  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val edges = rows.map(r => (r.getLong(0), r.getLong(1)))
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

  /** One large-star round: every node u with minimum m over N(u) ∪ {u}
    * rewires each strictly-larger neighbor v > u to m. One small-star
    * round: rewires each smaller-or-equal neighbor (and u itself) to the
    * minimum of that smaller neighborhood. Edges are kept canonical
    * (u > v); at the fixed point every node points directly at its
    * component root. */
  private def starContract(pairs: DataFrame, maxIters: Int): DataFrame = {
    val nodes = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id"))).distinct()
      .ckpt()

    def canon(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .distinct()

    // Convergence detection: a (count, sum-of-edge-hashes) multiset
    // fingerprint — ONE partial aggregate over the checkpointed round
    // result, instead of the former symmetric-difference double `except`
    // (4 exchanges per round). Fingerprint equality can in principle
    // collide (~2^-64, non-adversarial input), so correctness never
    // rests on it: the final edge set is structurally validated as a
    // star forest below, and every round preserves connectivity, so any
    // star-forest stopping point yields exactly the true components.
    def fingerprint(e: DataFrame): (Long, BigDecimal) = {
      // Decimal accumulator: a long sum of 2^63-scale hashes overflows
      // (ANSI mode throws); decimal(38,0) holds ~10^19 edges' worth.
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    // localCheckpoint per round truncates the lineage — an iterative plan
    // otherwise grows exponentially round over round.
    var edges = canon(pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      .ckpt()
    var prev = fingerprint(edges)
    var iter = 0
    var converged = prev._1 == 0L
    while (iter < maxIters && !converged) {
      // large-star over both edge directions
      val nbrs = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val lmins = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = canon(nbrs.filter(col("v") > col("u"))
        .join(lmins, Seq("u")).select(col("v").as("a"), col("m").as("b")))
      // small-star over canonical (u > v) edges: v-side mins plus (u, m)
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = canon(
        large.join(smins, Seq("u")).select(col("v").as("a"), col("m").as("b"))
          .unionAll(smins.select(col("u").as("a"), col("m").as("b"))))
        .ckpt()
      val sig = fingerprint(small)
      edges = small
      converged = sig == prev
      prev = sig
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIters star rounds " +
        "(raise maxIters; star contraction needs ~log2(n) rounds)")
    // fixed point is a star graph: each non-root u points at its root v;
    // roots (and self-loop-only nodes) never appear as u. Validate that
    // shape outright (two small jobs over the checkpointed set, once) —
    // this, not the fingerprint, is the correctness guarantee.
    val labels = edges.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("comp"), count(lit(1)).as("__deg"))
    val maxDeg = labels.agg(coalesce(max(col("__deg")), lit(1L))).head().getLong(0)
    val rootPointsSomewhere = !labels.select(col("comp").as("id"))
      .join(labels.select("id"), Seq("id"), "left_semi").isEmpty
    if (maxDeg > 1L || rootPointsSomewhere) throw new IllegalStateException(
      "star contraction fingerprint converged on a non-star edge set " +
        "(hash collision); raise maxIters or rerun")
    nodes.join(labels.drop("__deg"), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
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

  /** Quality-aware cluster dedup (the C4/RefinedWeb keeper policy): keep
    * the highest-`scoreCol` row of each near-dup cluster (ties → lowest
    * id) instead of the lowest-id row — when duplicates differ in
    * quality, min-id throws away the good copy half the time.
    *
    * Cost over [[keepClusterRepresentatives]]: one extra semi-join-sized
    * window — cluster labels join back to the (id, score) projection
    * only (never full rows), the per-cluster rank is bounded by cluster
    * size, and survivors semi-join the input exactly as before. Rows in
    * no cluster always survive. */
  def keepClusterBest(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = df.select(col(idCol).cast("long").as("id"), col(scoreCol))
      .join(comp, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(desc(scoreCol), col("id"))
    val losers = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") =!= 1)
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
