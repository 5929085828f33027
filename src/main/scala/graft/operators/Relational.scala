package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Batch relational operators (SURVEY.md §2.2–§2.7) re-expressed Spark-first.
  *
  * Design notes for oracle parity (DuckDB differential check):
  *  - money/quantity aggregates are computed over `DecimalType` casts so the
  *    result is order-independent and bit-exact across engines (double sums
  *    are order-dependent under shuffle and would flake the hash compare);
  *  - every query ends in a total-order `orderBy` with a unique tie-break;
  *  - all computed columns carry explicit aliases matching the oracle SQL.
  *
  * Scale notes: groupBy/agg run as partial(map-side) + final HashAggregate;
  * dimension joins (nation/region) broadcast; fact-fact joins shuffle on the
  * join key and are AQE-managed. Nothing below collects to the driver.
  */
object Relational {
  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(18, 4)

  private def d2(c: org.apache.spark.sql.Column) = c.cast(D2)

  /** TPC-H Q1-shaped scan→filter→aggregate (SURVEY §2.5 A1-A3/A10-A12).
    * Reference: mapred/lib/LongSumReducer.java:32, hive GroupByOperator. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(d2($"l_quantity")).cast(D2).as("sum_qty"),
        sum(d2($"l_extendedprice")).cast(D2).as("sum_base_price"),
        sum(d2($"l_extendedprice") * (lit(1).cast(D2) - d2($"l_discount")))
          .cast(D4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + filter pushed to the parquet scan (SURVEY §2.2 P1/P10-P12).
    * Reference: hive FilterOperator.java:76, SelectOperator.java:90. */
  def selectFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "O" && $"o_totalprice" > 200000.0)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** Multi-way equi-join + aggregate: revenue per nation/region
    * (SURVEY §2.6 J1/J2/J8 — reduce-side join; here broadcast for dims).
    * Reference: hive exec/JoinOperator.java:43, contrib/data_join. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = broadcast(Tables.nation(spark, dir))
    val region = broadcast(Tables.region(spark, dir))
    orders
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .join(region, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum(d2($"o_totalprice")).cast(D2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  /** Top-K by aggregate — TakeOrderedAndProject, the Spark-native form of the
    * reference's bounded-heap reducer (SURVEY §2.4 O7, examples/TopK.java:88). */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    orders
      .groupBy($"o_custkey")
      .agg(sum(d2($"o_totalprice")).cast(D2).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(customer, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"total_spent", $"n_orders")
      .orderBy($"total_spent".desc, $"c_custkey")
      .limit(k)
  }

  /** Global total-order sort (SURVEY §2.4 O3, examples/Sort.java:79;
    * TotalOrderPartitioner ≙ Spark's sampling RangePartitioner). */
  def globalSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
  }

  /** WordCount: tokenize → groupBy → count (SURVEY §2.2 P6,
    * mapred/lib/TokenCountMapper.java:34; the M1 spine of §7.4). */
  def wordCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word")
  }

  /** Grep: regex extraction → count → sort desc (SURVEY §2.2 P7,
    * mapred/lib/RegexMapper.java:35; examples/Grep.java). */
  def grep(spark: SparkSession, dir: String,
      pattern: String = "[a-z]+a[a-z]+"): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(regexp_extract_all($"text", lit(pattern), lit(0))).as("m"))
      .groupBy($"m")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"m")
  }

  /** Exact distinct aggregation (SURVEY §2.5 A7/A13 — UniqValueCount,
    * count(DISTINCT) of hive groupby2.q). */
  def distinctByPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }
}
