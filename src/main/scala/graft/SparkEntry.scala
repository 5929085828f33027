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
    "q08_distinct" -> ((s, d) => Relational.distinctByPriority(s, d))
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
        |ORDER BY o_orderpriority""".stripMargin
  )
}
