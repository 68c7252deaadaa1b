package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Breadth coverage of the relational/function surface a reference user
  * would expect to keep working: pivot/unpivot reshaping, outer joins,
  * CUBE grouping sets, ranking-function variants, and the string/date
  * scalar families. All oracle-checked. */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Pivot: order counts per priority × status (fixed value list so the
    * output schema is stable; absent combos are 0, matching FILTER aggs). */
  def q47Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)

  /** Unpivot (melt) part attributes into (attr, val) long format. */
  def q48Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "attr", "val")

  /** Left outer join: every customer with their order count (0 included). */
  def q49LeftOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  /** Full outer join with presence flags over the two nation-key sets. */
  def q50FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("ck")).distinct()
    val su = t(s, dir, "supplier").select(col("s_nationkey").as("sk")).distinct()
    c.join(su, c("ck") === su("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).as("nationkey"),
        col("ck").isNotNull.as("has_customer"),
        col("sk").isNotNull.as("has_supplier"))
  }

  /** CUBE grouping sets. */
  def q51Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** ROLLUP grouping-set hierarchy with GROUPING flags: the subtotal
    * report CUBE (q51) doesn't cover — (flag, status), (flag), () levels
    * only, each row tagged with which columns are aggregated away.
    * Decimal-exact sum exported as double (the q145 float contract). */
  def q155Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))

  /** Correlated scalar subqueries — ONE shared ANSI string is both the
    * Spark query and the DuckDB oracle (q93/q126 discipline): per-customer
    * order count and max order value via correlated aggregates (Catalyst
    * decorrelates both into left outer aggregate joins — the plan a
    * hand-written join would produce, from subquery syntax). */
  private val correlatedSql =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders o
      |     WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT max(o.o_totalprice) FROM orders o
      |     WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin

  def q156Correlated(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    s.sql(correlatedSql)
  }

  /** Ranking-function variants over one window. */
  def q52RankVariants(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderstatus"), col("o_orderkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"),
      ntile(4).over(w).as("quartile"))
  }

  /** String scalar family: pad/reverse/repeat/position/edit distance. */
  def q54StringZoo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      lpad(col("lang"), 5, "_").as("lang_pad"),
      rpad(col("lang"), 4, ".").as("lang_rpad"),
      reverse(col("source")).as("src_rev"),
      repeat(col("lang"), 2).as("lang2"),
      instr(col("source"), "rc").as("pos_rc"),
      levenshtein(col("lang"), col("source")).as("lev"))

  /** Date scalar family: arithmetic, truncation, boundaries. */
  def q55DateZoo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      last_day(col("o_orderdate")).as("month_end"),
      trunc(col("o_orderdate"), "MM").as("month_start"),
      add_months(col("o_orderdate"), 2).as("plus2m"),
      datediff(lit(java.sql.Date.valueOf("2020-01-01")),
        col("o_orderdate").cast("date")).as("days_to_2020"))

  /** JSON parsing over the semi-structured props column: both the path
    * extractor and the schema-ful from_json route. */
  def q57Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_path"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k_schema"))

  /** Array aggregation: deterministic (sorted) collect_set per group.
    * The array is exported joined to a string: parquet and DuckDB name
    * nested list fields differently ("element" vs "l"), which a strict
    * schema compare would flag even though values match. */
  def q58Collect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(sort_array(collect_set(col("user_id"))).as("users_arr"))
      .select(col("event_type"),
        array_join(col("users_arr"), ",").as("users"),
        size(col("users_arr")).as("n_users"))

  /** Exact percentiles (linear interpolation) per group. */
  def q61Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))

  /** regexp_extract_all: every digit run in the props string. */
  def q62ExtractAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      array_join(regexp_extract_all(col("props"), lit("(\\d+)"), lit(1)), ",")
        .as("nums"))

  /** Corpus-level n-gram frequency: top bigrams with deterministic
    * tie-break (codegen shingle path + hash aggregate + top-k). */
  def q63TopNgrams(s: SparkSession, dir: String): DataFrame =
    graft.operators.NearDup.shingleRows(t(s, dir, "documents"),
        "doc_id", "text", 2)
      .groupBy(col("shingle").as("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("ngram"))
      .limit(20)
      .select(col("ngram"), col("n"))

  /** IEEE-exact math scalar family (no libm-dependent fns: ln/exp differ
    * in the last bit between JVM and C runtimes). */
  def q64MathZoo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      ceil(col("l_quantity") / 7.0).as("qty_ceil"),
      floor(col("l_quantity") / 7.0).as("qty_floor"),
      round(col("l_extendedprice") / 100.0, 1).as("price_h"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      (col("l_quantity") * col("l_quantity")).as("qty_sq"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_top_ngrams" -> (q63TopNgrams _),
    "q64_math_zoo" -> (q64MathZoo _),
    "q61_percentiles" -> (q61Percentiles _),
    "q62_extract_all" -> (q62ExtractAll _),
    "q57_json" -> (q57Json _),
    "q58_collect" -> (q58Collect _),
    "q47_pivot" -> (q47Pivot _),
    "q48_unpivot" -> (q48Unpivot _),
    "q49_left_outer" -> (q49LeftOuter _),
    "q50_full_outer" -> (q50FullOuter _),
    "q51_cube" -> (q51Cube _),
    "q155_rollup" -> (q155Rollup _),
    "q156_correlated" -> (q156Correlated _),
    "q52_rank_variants" -> (q52RankVariants _),
    "q54_string_zoo" -> (q54StringZoo _),
    "q55_date_zoo" -> (q55DateZoo _))

  val oracles: Map[String, String] = Map(
    "q63_top_ngrams" ->
      """WITH t AS (SELECT regexp_split_to_array(text, '\s+') w FROM documents),
        |b AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g FROM t)
        |SELECT g AS ngram, COUNT(*) AS n FROM b
        |GROUP BY g ORDER BY n DESC, g ASC LIMIT 20""".stripMargin,
    "q64_math_zoo" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS disc_dev,
        | CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor,
        | round(l_extendedprice / 100.0, 1) AS price_h,
        | sqrt(l_quantity) AS qty_sqrt,
        | l_quantity * l_quantity AS qty_sq
        |FROM lineitem""".stripMargin,
    "q61_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_extendedprice, 0.25) AS p25_price,
        | quantile_cont(l_extendedprice, 0.75) AS p75_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q62_extract_all" ->
      """SELECT event_id,
        | array_to_string(regexp_extract_all(props, '(\d+)', 1), ',') AS nums
        |FROM events""".stripMargin,
    "q57_json" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_schema
        |FROM events""".stripMargin,
    "q58_collect" ->
      """SELECT event_type,
        | array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
        | CAST(len(list(DISTINCT user_id)) AS INTEGER) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "q47_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
        | COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
        | COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q48_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part""".stripMargin,
    "q49_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q50_full_outer" ->
      """SELECT coalesce(ck, sk) AS nationkey,
        | ck IS NOT NULL AS has_customer,
        | sk IS NOT NULL AS has_supplier
        |FROM (SELECT DISTINCT c_nationkey AS ck FROM customer) c
        |FULL JOIN (SELECT DISTINCT s_nationkey AS sk FROM supplier) s
        |  ON c.ck = s.sk""".stripMargin,
    "q51_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q155_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        | CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q156_correlated" -> correlatedSql,
    "q52_rank_variants" ->
      """SELECT o_orderstatus, o_orderkey,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | percent_rank() OVER w AS prnk,
        | cume_dist() OVER w AS cdist,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "q54_string_zoo" ->
      """SELECT doc_id,
        | lpad(lang, 5, '_') AS lang_pad,
        | rpad(lang, 4, '.') AS lang_rpad,
        | reverse(source) AS src_rev,
        | repeat(lang, 2) AS lang2,
        | CAST(instr(source, 'rc') AS INTEGER) AS pos_rc,
        | CAST(levenshtein(lang, source) AS INTEGER) AS lev
        |FROM documents""".stripMargin,
    "q55_date_zoo" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2020-01-01') AS INTEGER) AS days_to_2020
        |FROM orders""".stripMargin)
}
