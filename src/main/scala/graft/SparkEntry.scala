package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query over the TESTDATA.md fixtures, paired (where SQL-expressible) with
  * DuckDB oracle SQL in [[oracleSql]]. Column names are aliased identically
  * on both sides — the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q02_select_filter" -> ((s, d) => Relational.selectFilter(s, d)),
    "q03_join_revenue" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q04_topk_customers" -> ((s, d) => Relational.topCustomers(s, d)),
    "q05_global_sort" -> ((s, d) => Relational.globalSort(s, d)),
    "q06_wordcount" -> ((s, d) => Relational.wordCount(s, d)),
    "q07_grep" -> ((s, d) => Relational.grep(s, d)),
    "q08_distinct" -> ((s, d) => Relational.distinctByPriority(s, d)),
    "q09_join_left" -> ((s, d) => Relational.customerOrdersLeft(s, d)),
    "q10_join_override" -> ((s, d) => Relational.overrideJoinNation(s, d)),
    "q11_union" -> ((s, d) => Relational.unionParties(s, d)),
    "q12_histogram" -> ((s, d) => Relational.valueHistogram(s, d)),
    "q13_fieldselect" -> ((s, d) => Relational.fieldSelection(s, d)),
    "q14_json_extract" -> ((s, d) => Relational.jsonExtract(s, d)),
    "q15_bucket_sample" -> ((s, d) => Relational.bucketSample(s, d)),
    "q16_secondary_sort" -> ((s, d) => Relational.secondarySort(s, d)),
    "q17_chain_join" -> ((s, d) => Relational.chainJoin(s, d)),
    "q18_minmax_string" -> ((s, d) => Relational.minMaxByNation(s, d)),
    "q19_events_by_day" -> ((s, d) => Relational.eventsByDay(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_select_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q04_topk_customers" ->
      """SELECT c_custkey, c_name, total_spent, n_orders
        |FROM (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_spent,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |) t JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q05_global_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "q06_wordcount" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt DESC, word""".stripMargin,
    "q07_grep" ->
      """SELECT m, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+a[a-z]+')) AS m FROM documents)
        |GROUP BY m
        |ORDER BY cnt DESC, m""".stripMargin,
    "q08_distinct" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q09_join_left" ->
      """SELECT c_custkey, c_name,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q10_join_override" ->
      """SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
        |  COALESCE(s.n_supp, c.n_cust) AS pop,
        |  c.n_cust AS n_cust, s.n_supp AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q11_union" ->
      """SELECT name, acctbal, nationkey, kind FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal, CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_name, s_acctbal, CAST(s_nationkey AS INTEGER), 'supplier' FROM supplier
        |) ORDER BY kind, name""".stripMargin,
    "q12_histogram" ->
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(value) AS min_v, MAX(value) AS max_v,
        |  CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg_v,
        |  ROUND(SQRT((CAST(SUM(CAST(value*value AS DECIMAL(38,12))) AS DOUBLE)
        |        - CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))
        |       / (COUNT(*) - 1)), 6) AS stddev_v,
        |  ROUND(QUANTILE_CONT(value, 0.5), 4) AS median_v
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q13_fieldselect" ->
      """SELECT p_partkey,
        |  string_split(p_name, ' ')[2] AS f1,
        |  string_split(p_name, ' ')[1] AS f0
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q14_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  COUNT(*) AS cnt
        |FROM events
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    "q15_bucket_sample" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q16_secondary_sort" ->
      """SELECT o_custkey, rn, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q17_chain_join" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  COUNT(DISTINCT s_suppkey) AS n_supp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size < 20
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q18_minmax_string" ->
      """SELECT c_nationkey,
        |  MIN(c_name) AS min_name, MAX(c_name) AS max_name,
        |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q19_events_by_day" ->
      """SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg_v
        |FROM events
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin
  )
}
