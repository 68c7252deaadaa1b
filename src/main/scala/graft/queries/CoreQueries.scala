package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{Cleanse, Dedup, Dims}

/** Core relational query surface: one named query per operator family of
  * SURVEY.md §2 (scan, project/rename/cast, quality + range filters, star
  * joins, grouped/rollup aggregation, window dedup/rank/frames, distinct +
  * calendar dims, set ops, scalar functions, top-k).
  *
  * Determinism contract with the DuckDB oracle: every floating-point
  * aggregate is computed in exact DECIMAL(18,2) arithmetic and cast to
  * DOUBLE at the end, so both engines produce bit-identical values
  * regardless of summation order. Column names are aliased identically on
  * both sides (the driver's compare hashes columns by name).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum(col :: decimal(18,2)) :: double — order-insensitive exact sum. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  private val dec2 = DecimalType(18, 2)

  // ---------------------------------------------------------------- queries

  /** A3/O1: pricing-summary aggregate over lineitem (grouped agg, the
    * reference's declared revenue-report shape — reference: README.md:256-264). */
  def q01LineitemAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec2) *
          (lit(1).cast(dec2) - col("l_discount").cast(dec2)))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** J1/J2/A3/O1/O2: star join fact↔dims + grouped agg + top-k
    * (reference: README.md:256-275). nation/region are broadcast — at any
    * scale they are bounded-size dims; customer⋈orders⋈lineitem shuffle on
    * their join keys and Catalyst/AQE picks the strategy. */
  def q02StarRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast(dec2) *
          (lit(1).cast(dec2) - col("l_discount").cast(dec2)))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(desc("revenue"))
      .limit(10)
  }

  /** P1/P3/P5: cleanse = quality/range filters + project/rename/cast
    * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:76-99). */
  def q03CleanseLineitem(s: SparkSession, dir: String): DataFrame = {
    val filtered = Cleanse.rangeRules(t(s, dir, "lineitem"), Seq(
      col("l_quantity").isNotNull,
      col("l_discount").between(0.01, 0.08),
      col("l_quantity").between(5, 45)))
    Cleanse.normalize(filtered, Seq(
      Cleanse.FieldSpec("l_orderkey", "order_key"),
      Cleanse.FieldSpec("l_partkey", "part_key"),
      Cleanse.FieldSpec("l_quantity", "qty"),
      Cleanse.FieldSpec("l_extendedprice", "price"),
      Cleanse.FieldSpec("l_shipdate", "ship_date", DateType)))
  }

  /** A2: dimension via distinct projection
    * (reference: glue-jobs/noaa_ghcn_silver_to_gold.py:56-67). */
  def q04DistinctDim(s: SparkSession, dir: String): DataFrame =
    Dims.distinctDim(t(s, dir, "orders"), Seq("o_orderstatus", "o_orderpriority"))

  /** F13: calendar dimension
    * (reference: glue-jobs/noaa_ghcn_silver_to_gold.py:70-79). */
  def q05CalendarDim(s: SparkSession, dir: String): DataFrame =
    Dims.calendarDim(t(s, dir, "orders"), "o_orderdate")

  /** W1: deterministic window dedup over a composite key
    * (reference: README.md:85,95,307). */
  def q06DedupEvents(s: SparkSession, dir: String): DataFrame =
    Dedup.byKey(t(s, dir, "events"),
        keys = Seq("user_id", "event_type"),
        tieBreak = Seq(col("ts"), col("event_id")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** F5/F6/F14: CASE mapping + isin + literal division normalize
    * (reference: glue-jobs/noaa_ghcn_silver_to_gold.py:58-66,91-93). */
  def q07CaseMap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      col("event_type"),
      when(col("event_type") === "purchase", "revenue")
        .when(col("event_type").isin("click", "view"), "engagement")
        .when(col("event_type") === "signup", "growth")
        .when(col("event_type") === "error", "ops")
        .otherwise("other").as("category"),
      when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", col("value") / 10.0)
        .otherwise(col("value") / 100.0).as("norm_value"))

  /** A3: grouped agg with count / exact sum / derived avg over events. */
  def q08AggEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .withColumn("avg_value", col("total_value") / col("n_events"))

  /** Semi join: customers that have at least one order (EXISTS). */
  def q09SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi").select("c_custkey", "c_name")
  }

  /** Anti join: customers with no orders (NOT EXISTS). */
  def q10AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti").select("c_custkey", "c_name")
  }

  /** Set op: UNION ALL of two projections with a discriminator column. */
  def q11UnionAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_name").as("name"), lit("customer").as("kind"))
      .unionAll(t(s, dir, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("kind")))

  /** F2/F10: regexp_extract + cast over a semi-structured string column
    * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:70-72). */
  def q12ParseProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType).as("k"))

  /** F3/F7/F8/F15: scalar string functions — substring, trim-adjacent
    * cleanup, upper, concat, replace
    * (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:58-72,119-120,152-154). */
  def q13ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      upper(col("lang")).as("lang_uc"),
      substring(col("source"), 4, 3).as("src_suffix"),
      concat_ws("-", col("lang"), col("source")).as("tag"),
      regexp_replace(col("source"), "src", "source_").as("src_renamed"),
      col("source").rlike("^src[0-9]+$").as("is_src"),
      length(trim(col("text"))).as("trimmed_len"),
      length(col("text")).as("text_len"))

  /** A3 extension: ROLLUP grouping-sets aggregate. */
  def q14RollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))

  /** W1 extension: rank within group, top-3 orders per customer. */
  def q15WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** Window frame: running spend per customer (exact decimal accumulation). */
  def q16RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      sum(col("o_totalprice").cast(dec2)).over(w)
        .cast(DoubleType).as("running_spend"))
  }

  /** Window lag/lead across an ordered per-user event sequence. */
  def q17LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("event_type"), 1).over(w).as("next_type"))
  }

  /** O2: global top-k (TakeOrderedAndProject — no full sort at scale). */
  def q18TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  // ------------------------------------------------------------- registries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_lineitem_agg" -> (q01LineitemAgg _),
    "q02_star_revenue" -> (q02StarRevenue _),
    "q03_cleanse_lineitem" -> (q03CleanseLineitem _),
    "q04_distinct_dim" -> (q04DistinctDim _),
    "q05_calendar_dim" -> (q05CalendarDim _),
    "q06_dedup_events" -> (q06DedupEvents _),
    "q07_case_map" -> (q07CaseMap _),
    "q08_agg_events" -> (q08AggEvents _),
    "q09_semi_join" -> (q09SemiJoin _),
    "q10_anti_join" -> (q10AntiJoin _),
    "q11_union_all" -> (q11UnionAll _),
    "q12_parse_props" -> (q12ParseProps _),
    "q13_scalar_funcs" -> (q13ScalarFuncs _),
    "q14_rollup_agg" -> (q14RollupAgg _),
    "q15_window_rank" -> (q15WindowRank _),
    "q16_running_sum" -> (q16RunningSum _),
    "q17_lag_lead" -> (q17LagLead _),
    "q18_topk" -> (q18TopK _))

  val oracles: Map[String, String] = Map(
    "q01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_star_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC LIMIT 10""".stripMargin,
    "q03_cleanse_lineitem" ->
      """SELECT l_orderkey AS order_key, l_partkey AS part_key,
        | l_quantity AS qty, l_extendedprice AS price,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL
        |  AND l_discount BETWEEN 0.01 AND 0.08
        |  AND l_quantity BETWEEN 5 AND 45""".stripMargin,
    "q04_distinct_dim" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q05_calendar_dim" ->
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS date,
        | CAST(year(o_orderdate) AS INTEGER) AS year,
        | CAST(month(o_orderdate) AS INTEGER) AS month,
        | CAST(day(o_orderdate) AS INTEGER) AS day,
        | CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS day_of_week,
        | CAST(dayofyear(o_orderdate) AS INTEGER) AS day_of_year,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year
        |FROM orders""".stripMargin,
    "q06_dedup_events" ->
      """SELECT event_id, user_id, event_type, value FROM (
        | SELECT event_id, user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q07_case_map" ->
      """SELECT event_id, event_type,
        | CASE WHEN event_type = 'purchase' THEN 'revenue'
        |      WHEN event_type IN ('click','view') THEN 'engagement'
        |      WHEN event_type = 'signup' THEN 'growth'
        |      WHEN event_type = 'error' THEN 'ops'
        |      ELSE 'other' END AS category,
        | CASE WHEN event_type = 'purchase' THEN value
        |      WHEN event_type = 'error' THEN value / 10.0
        |      ELSE value / 100.0 END AS norm_value
        |FROM events""".stripMargin,
    "q08_agg_events" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q11_union_all" ->
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier""".stripMargin,
    "q12_parse_props" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |FROM events""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT doc_id, upper(lang) AS lang_uc,
        | substring(source, 4, 3) AS src_suffix,
        | concat_ws('-', lang, source) AS tag,
        | regexp_replace(source, 'src', 'source_') AS src_renamed,
        | regexp_matches(source, '^src[0-9]+$') AS is_src,
        | CAST(length(trim(text)) AS INTEGER) AS trimmed_len,
        | CAST(length(text) AS INTEGER) AS text_len
        |FROM documents""".stripMargin,
    "q14_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q15_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q16_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,
    "q17_lag_lead" ->
      """SELECT event_id, user_id, value,
        | lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        | lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)
}
