package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin, Scale, Sessionize}
import graft.typed.TypedOps

/** Remaining surface coverage: the typed Dataset API, the literal-SQL
  * entry point (the reference's Athena surface is SQL text over catalog
  * tables — reference: README.md:245-276), sessionization, and
  * exact/approximate distinct counting. */
object SurfaceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Typed Dataset[Order] + custom Aggregator (exact BigDecimal sum). */
  def q19TypedAgg(s: SparkSession, dir: String): DataFrame =
    TypedOps.spendByCustomer(TypedOps.orders(s, dir))

  /** Gaps-and-islands sessionization (declarative batch path). */
  def q39Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.batch(t(s, dir, "events"), gapSeconds = 3600L)

  /** Literal SQL over registered views — the spark.sql entry point. */
  def q40SqlBrand(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY gross DESC
        |LIMIT 5""".stripMargin)
  }

  /** HLL++ approximate distinct, oracle-banded (q163 discipline —
    * formerly rows-only): the raw estimates are engine-specific
    * (DuckDB's sketch differs), so the exported row carries the EXACT
    * distincts (bit-for-bit oracle columns) plus flags pinning each
    * estimate inside a band of its declared precision (3× the rsd:
    * default 0.05 → 15%, explicit 0.01 → 3%). A broken sketch path —
    * lost partial, wrong merge, garbage estimate — blows a band, flips
    * its flag to 0, and hash-mismatches the oracle's constant 1. */
  def q41ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("__ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("__ao"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        when(abs(col("__ap") - col("exact_parts")) <=
            col("exact_parts") * 0.15, lit(1L)).otherwise(lit(0L))
          .as("parts_est_ok"),
        when(abs(col("__ao") - col("exact_orders")) <=
            col("exact_orders") * 0.03, lit(1L)).otherwise(lit(0L))
          .as("orders_est_ok"))
      .orderBy(col("l_returnflag"))

  /** Exact distinct counting per group. */
  def q42DistinctCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))

  /** J3-shape expression-key equi join: the join key is a computed
    * expression (cast/truncation), not a stored column — the reference's
    * country-prefix join shape (SURVEY.md §2.3 J3). */
  def q43ExprJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val dim = ev.select(to_date(col("ts")).as("date")).distinct()
      .select(col("date"), dayofweek(col("date")).as("day_of_week"))
    ev.join(dim, to_date(ev("ts")) === dim("date"))
      .groupBy(col("day_of_week"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** As-of join: every click enriched with the user's most recent
    * prior-or-simultaneous purchase value. */
  def q56AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOfJoin.leftAsOf(clicks, purchases,
        keyCols = Seq("user_id"), tsCol = "ts", valueCols = Seq("value"),
        leftTieBreak = col("event_id"), rightTieBreak = col("event_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_value").as("last_purchase_value"))
  }

  /** The as-of join reachable from PURE SQL text (the reference's
    * Athena-shaped entry point — reference: README.md:245-276): the same
    * union + single-window-pass technique as [[AsOfJoin.leftAsOf]],
    * expressed entirely in spark.sql. The struct carry keeps null-valued
    * purchases distinguishable from "no purchase yet", exactly like the
    * DataFrame operator. */
  def q69SqlAsof(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS src, event_id AS tb, event_id,
        |         CAST(NULL AS STRUCT<v: DOUBLE>) AS rv
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 0 AS src, event_id AS tb, NULL AS event_id,
        |         named_struct('v', value) AS rv
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, carried.v AS last_purchase_value
        |FROM (
        |  SELECT event_id, user_id, src,
        |         last(rv, true) OVER (PARTITION BY user_id
        |           ORDER BY ts, src, tb
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |  FROM u)
        |WHERE src = 1""".stripMargin)
  }

  /** Range join: classify each event value into a tier interval via the
    * bucketed equi-join decomposition. */
  def q65RangeJoin(s: SparkSession, dir: String): DataFrame =
    RangeJoin.byBucket(
        t(s, dir, "events").select("event_id", "value"),
        "value",
        Seq(
          RangeJoin.Interval(0.0, 50.0, "low"),
          RangeJoin.Interval(50.0, 150.0, "mid"),
          RangeJoin.Interval(150.0, 1000.0, "high")),
        bucketWidth = 64.0)
      .select(col("event_id"), col("value"), col("label"))

  /** Skewed-key join through the salting path: event_type has only 5
    * values, so EVERY key is a hot key — the adversarial case where an
    * unsalted shuffle join sends ~N/5 rows to single reducers. saltedJoin
    * spreads each key over `factor` reducers and must stay semantically
    * identical to the plain join (which is what the oracle runs). */
  def q70SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("event_id", "event_type", "value")
    val dim = ev.groupBy(col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("type_avg_value"))
    Scale.saltedJoin(ev.select("event_id", "event_type"), dim,
        "event_type", factor = 8)
      .select(col("event_id"), col("event_type"), col("type_avg_value"))
  }

  /** Set op: INTERSECT (distinct semantics). */
  def q44Intersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  /** Set op: EXCEPT (distinct semantics). */
  def q45Except(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  /** [[q56AsofJoin]] with a 24-hour tolerance window: a carried purchase
    * older than a day nulls out (pandas merge_asof `tolerance`). Same
    * one-union-one-window plan — the matched ts rides in the carried
    * struct. */
  def q96AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOfJoin.leftAsOf(clicks, purchases,
        keyCols = Seq("user_id"), tsCol = "ts", valueCols = Seq("value"),
        leftTieBreak = col("event_id"), rightTieBreak = col("event_id"),
        within = Some((lts, rts) =>
          lts.cast("long") - rts.cast("long") <= 86400L))
      .select(col("event_id"), col("user_id"),
        col("asof_value").as("recent_purchase_value"))
  }

  /** One-pass per-column profiling over the fact table (n, nulls, exact
    * distinct, min/max) — the ingest health check, all columns in one
    * aggregation over one scan. */
  def q99Profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.summary(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .withColumnRenamed("column", "col_name")

  /** Hourly gap-fill over the event stream: dense per-type series with
    * carried-forward totals (the sparse→dense step before windowed
    * consumers). */
  def q100GapFill(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.gapFillHourly(
        t(s, dir, "events"), "event_type", "ts", "value")
      .select(col("event_type"),
        unix_timestamp(col("bucket")).as("hour_ts"),
        col("n"), col("total"), col("filled_total"))

  /** Batch twin of the STREAMING interval join
    * ([[graft.streaming.StreamJoin.intervalJoin]] — watermarks no-op in
    * batch, the plan is the same interval join the streaming state store
    * runs): each click attributed to the same user's views from the
    * preceding 10 minutes. The oracle checks the exact join condition
    * that bounds the streaming state. */
  def q105StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    graft.streaming.StreamJoin.intervalJoin(views, clicks, "user_id",
        "view_ts", "click_ts", maxDelay = "10 MINUTES",
        watermarkDelay = "1 HOUR")
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Equi-width histogram of the fact table's price column: the
    * distribution profile behind q99's min/max row. Bin math is pure
    * exactly-rounded IEEE (sub, mul, div, floor), so the oracle
    * reproduces bins and edges bit-for-bit. */
  def q106Histogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.histogram(t(s, dir, "lineitem"),
      "l_extendedprice", buckets = 8)

  /** Rolling 1-hour per-user event stats over EVENT TIME — a RANGE frame
    * (value-based, whole-second bounds), not the ROWS frames of q16/q17:
    * ties on the same second all enter the frame together, which is what
    * makes the result deterministic without a unique tie-break. */
  def q107RollingRange(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3599L, org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      col("ts").cast("long").as("ts_sec"),
      count(lit(1)).over(w).as("n_1h"),
      sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
        .as("total_1h"))
  }

  /** Per-type 3σ outlier flags over event values — anomaly screening
    * from decimal-exact moments (built-in stddev is
    * parallelism-dependent in the last bits; the flag must not be). */
  def q108Outliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.outliers(
        t(s, dir, "events").select("event_id", "event_type", "value"),
        "event_type", "value", z = 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("is_outlier"))

  /** Ordered funnel per user (view → first click after it → first
    * purchase after that): three min-over-window passes that all share
    * ONE user-partitioned exchange — no self-joins, no event
    * re-scans. Stage columns are nullable epoch seconds; a stage is null
    * whenever any earlier stage is (the > comparison against null
    * propagates), which is exactly funnel semantics. */
  def q110Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val staged = t(s, dir, "events")
      .withColumn("__v",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("__c",
        min(when(col("event_type") === "click" && col("ts") > col("__v"),
          col("ts"))).over(w))
      .withColumn("__p",
        min(when(col("event_type") === "purchase" && col("ts") > col("__c"),
          col("ts"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(min(col("__v")).cast("long").as("view_ts"),
        min(col("__c")).cast("long").as("click_ts"),
        min(col("__p")).cast("long").as("purchase_ts"))
  }

  /** Event-sequence motif matching (the MATCH_RECOGNIZE use case,
    * Spark-first): each user's event history becomes one ordered
    * initials string — sort happens INSIDE the per-user array
    * (array_sort on (ts, event_id) structs after one shuffle), never a
    * global sort — and motifs are regexp counts over that string.
    * Initials are unique per event type (c,e,p,s,v), so 'vc' is exactly
    * view→click adjacency and 'v[^p]*p' is view-eventually-purchase;
    * patterns stay in the Java∩RE2 common dialect. */
  def q157EventMotifs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("__e"))
      .groupBy(col("user_id"))
      .agg(concat_ws("", transform(array_sort(collect_list(col("__e"))),
        e => e.getField("c"))).as("seq"))
      .select(col("user_id"), length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("vc")).as("n_view_click"),
        regexp_count(col("seq"), lit("v[^p]*p")).as("n_view_to_purchase"),
        regexp_count(col("seq"), lit("ee")).as("n_error_bursts"))

  /** Weekly retention cohorts: users grouped by their first signup
    * week, counted distinct per whole-week offset of later activity —
    * the cohort matrix in long form. Offsets are exact integer
    * arithmetic over epoch seconds. */
  def q111Cohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("__s"))
    ev.join(signup, Seq("user_id"))
      .filter(col("ts") >= col("__s"))
      .select(col("user_id"),
        unix_timestamp(date_trunc("week", col("__s"))).as("cohort_week"),
        expr("(CAST(ts AS LONG) - CAST(__s AS LONG)) div 604800")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Skew diagnosis over the event stream's user key: hottest 10 users
    * with exact counts and ppm share — the report read before deciding
    * whether a join needs salting. */
  def q113SkewReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.skewReport(t(s, dir, "events"), "user_id", 10)

  /** Distribution drift between the first and second half of the event
    * stream (by id): per-bin PSI terms on the reference grid — the
    * corpus-version drift check. */
  def q116Psi(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // data-derived split (max/2) so BOTH halves are non-empty at every
    // SF — the fixed 5000 cut left the current side empty below sf0.01
    val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    graft.operators.Profile.psi(
      ev.filter(col("event_id") < mid),
      ev.filter(col("event_id") >= mid),
      "value", buckets = 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_stream_join" -> (q105StreamJoin _),
    "q116_psi" -> (q116Psi _),
    "q110_funnel" -> (q110Funnel _),
    "q157_event_motifs" -> (q157EventMotifs _),
    "q111_cohorts" -> (q111Cohorts _),
    "q113_skew_report" -> (q113SkewReport _),
    "q106_histogram" -> (q106Histogram _),
    "q107_rolling_range" -> (q107RollingRange _),
    "q108_outliers" -> (q108Outliers _),
    "q43_expr_join" -> (q43ExprJoin _),
    "q56_asof_join" -> (q56AsofJoin _),
    "q96_asof_tolerance" -> (q96AsofTolerance _),
    "q99_profile" -> (q99Profile _),
    "q100_gapfill" -> (q100GapFill _),
    "q69_sql_asof" -> (q69SqlAsof _),
    "q70_salted_join" -> (q70SaltedJoin _),
    "q65_range_join" -> (q65RangeJoin _),
    "q44_intersect" -> (q44Intersect _),
    "q45_except" -> (q45Except _),
    "q19_typed_agg" -> (q19TypedAgg _),
    "q39_sessionize" -> (q39Sessionize _),
    "q40_sql_brand" -> (q40SqlBrand _),
    "q41_approx_distinct" -> (q41ApproxDistinct _),
    "q42_distinct_counts" -> (q42DistinctCounts _))

  val oracles: Map[String, String] = Map(
    "q116_psi" ->
      // reference-grid bins with two-sided clamp; identical probability
      // floor and op order; ln + 6dp only at export
      """WITH md AS (SELECT MAX(event_id) // 2 AS mid FROM events),
        |r0 AS (SELECT value FROM events, md WHERE event_id < mid),
        |c0 AS (SELECT value FROM events, md WHERE event_id >= mid),
        |b AS (SELECT MIN(CAST(value AS DOUBLE)) AS mn,
        |             MAX(CAST(value AS DOUBLE)) AS mx FROM r0),
        |bins AS (SELECT unnest(generate_series(0, 7)) AS bin),
        |br AS (
        |  SELECT least(greatest(CAST(floor((CAST(value AS DOUBLE) - b.mn)
        |      * 8 / (b.mx - b.mn)) AS BIGINT), 0), 7) AS bin,
        |    COUNT(*) AS n_ref
        |  FROM r0, b WHERE value IS NOT NULL GROUP BY 1),
        |bc AS (
        |  SELECT least(greatest(CAST(floor((CAST(value AS DOUBLE) - b.mn)
        |      * 8 / (b.mx - b.mn)) AS BIGINT), 0), 7) AS bin,
        |    COUNT(*) AS n_cur
        |  FROM c0, b WHERE value IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT bins.bin, COALESCE(n_ref, 0) AS n_ref,
        |    COALESCE(n_cur, 0) AS n_cur
        |  FROM bins LEFT JOIN br USING (bin) LEFT JOIN bc USING (bin)),
        |t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM j)
        |SELECT bin, n_ref, n_cur,
        |  ROUND((greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
        |       - greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6))
        |    * ln(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
        |       / greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)), 6) AS psi_term
        |FROM j, t""".stripMargin,
    "q113_skew_report" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT COUNT(*) AS tt FROM events)
        |SELECT user_id, n, (n * 1000000) // tt AS share_ppm
        |FROM c, t ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "q157_event_motifs" ->
      """SELECT user_id, CAST(len(seq) AS INTEGER) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'vc')) AS INTEGER)
        |    AS n_view_click,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INTEGER)
        |    AS n_view_to_purchase,
        |  CAST(len(regexp_extract_all(seq, 'ee')) AS INTEGER)
        |    AS n_error_bursts
        |FROM (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
        |      AS seq
        |  FROM events GROUP BY user_id)""".stripMargin,
    "q110_funnel" ->
      // staged mins via joins (the window formulation's relational twin);
      // null stages propagate through the > comparison identically
      """WITH v AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS v
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.v GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c GROUP BY 1)
        |SELECT u.user_id,
        |  CAST(floor(epoch(v.v)) AS BIGINT) AS view_ts,
        |  CAST(floor(epoch(c.c)) AS BIGINT) AS click_ts,
        |  CAST(floor(epoch(p.p)) AS BIGINT) AS purchase_ts
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v USING (user_id)
        |LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin,
    "q111_cohorts" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS s FROM events
        |  WHERE event_type = 'signup' GROUP BY 1)
        |SELECT
        |  CAST(floor(epoch(date_trunc('week', s.s))) AS BIGINT) AS cohort_week,
        |  (CAST(floor(epoch(e.ts)) AS BIGINT)
        |    - CAST(floor(epoch(s.s)) AS BIGINT)) // 604800 AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN s USING (user_id)
        |WHERE e.ts >= s.s
        |GROUP BY 1, 2""".stripMargin,
    "q108_outliers" ->
      // identical moment algebra: exact decimal sums cast to double at
      // the end, then IEEE ÷ × − sqrt — flags match bit-for-bit
      """WITH st AS (
        |  SELECT event_type, COUNT(value) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS s1,
        |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      AS s2
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type,
        |    CAST(s1 AS DOUBLE) / n AS mean,
        |    sqrt(CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  abs(e.value - m.mean) > 3.0 * m.std AS is_outlier
        |FROM events e JOIN m USING (event_type)""".stripMargin,
    "q106_histogram" ->
      // identical op order everywhere: (x-mn)*8/(mx-mn), floor, clamp;
      // edges mn + bin*((mx-mn)/8); top edge pinned to mx
      """WITH b AS (
        |  SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |         MAX(CAST(l_extendedprice AS DOUBLE)) AS mx
        |  FROM lineitem),
        |bins AS (SELECT unnest(generate_series(0, 7)) AS bin),
        |cnt AS (
        |  SELECT least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - b.mn)
        |      * 8 / (b.mx - b.mn)) AS BIGINT), 7) AS bin,
        |    COUNT(*) AS n
        |  FROM lineitem, b WHERE l_extendedprice IS NOT NULL GROUP BY 1)
        |SELECT bin, b.mn + bin * ((b.mx - b.mn) / 8) AS lo,
        |  CASE WHEN bin = 7 THEN b.mx
        |       ELSE b.mn + (bin + 1) * ((b.mx - b.mn) / 8) END AS hi,
        |  COALESCE(n, 0) AS n
        |FROM bins LEFT JOIN cnt USING (bin), b""".stripMargin,
    "q107_rolling_range" ->
      // whole-second RANGE frame: Spark's timestamp->long cast truncates
      // to seconds, so the oracle orders by floor(epoch) (q96 contract)
      """SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS total_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q105_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND c.ts > v.ts
        |    AND c.ts <= v.ts + INTERVAL 10 MINUTE""".stripMargin,
    "q99_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n,
           |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  MIN($c) AS mn, MAX($c) AS mx FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(one).mkString("\nUNION ALL\n")
    },
    "q100_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
        |      FROM hourly GROUP BY 1),
        |sc AS (SELECT event_type,
        |         unnest(generate_series(mn, mx, INTERVAL 1 hour)) AS h
        |       FROM b),
        |j AS (SELECT sc.event_type, sc.h, hourly.n, hourly.total
        |      FROM sc LEFT JOIN hourly
        |        ON sc.event_type = hourly.event_type AND sc.h = hourly.h)
        |SELECT event_type, CAST(epoch(h) AS BIGINT) AS hour_ts,
        |  COALESCE(n, 0) AS n, total,
        |  last_value(total IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY h ROWS UNBOUNDED PRECEDING) AS filled_total
        |FROM j""".stripMargin,
    "q43_expr_join" ->
      """SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS day_of_week,
        | COUNT(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "q56_asof_join" ->
      """SELECT c.event_id, c.user_id, p.value AS last_purchase_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q96_asof_tolerance" ->
      // whole-second floors on both engines: Spark's timestamp->long cast
      // truncates to seconds, so the oracle compares floor(epoch) too
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN CAST(floor(epoch(c.ts)) AS BIGINT)
        |         - CAST(floor(epoch(p.ts)) AS BIGINT) <= 86400
        |       THEN p.value END AS recent_purchase_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q69_sql_asof" ->
      """SELECT c.event_id, c.user_id, p.value AS last_purchase_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q70_salted_join" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |      AS type_avg_value
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, d.type_avg_value
        |FROM events e JOIN d USING (event_type)""".stripMargin,
    "q65_range_join" ->
      """WITH tiers(lo, hi, label) AS (VALUES
        |  (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), (150.0, 1000.0, 'high'))
        |SELECT event_id, value, label
        |FROM events JOIN tiers ON value >= lo AND value < hi""".stripMargin,
    "q44_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q45_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q19_typed_agg" ->
      """SELECT o_custkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q39_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |       WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |            - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT) > 3600
        |       THEN 1 ELSE 0 END AS brk
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid
        | FROM g)
        |SELECT user_id,
        | min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS session_start,
        | max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS session_end,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q40_sql_brand" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY gross DESC
        |LIMIT 5""".stripMargin,
    "q41_approx_distinct" ->
      // exact distincts + constant est-ok flags (q163 discipline): the
      // Spark side computes each flag from |estimate - exact| within
      // 3x the declared rsd, so a broken sketch path hash-mismatches
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS exact_parts,
        | COUNT(DISTINCT l_orderkey) AS exact_orders,
        | CAST(1 AS BIGINT) AS parts_est_ok,
        | CAST(1 AS BIGINT) AS orders_est_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_distinct_counts" ->
      """SELECT o_orderpriority,
        | COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
}
