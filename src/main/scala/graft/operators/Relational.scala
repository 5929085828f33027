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
  // Money/measure sums run over decimal casts so the aggregate is
  // order-independent (double sums flake under shuffle), then the FINAL
  // result converts to double exactly once: decimal→double is the same
  // correctly-rounded IEEE division in Spark and DuckDB, and double is the
  // only fractional type whose driver-side rendering is engine-independent
  // (DECIMAL outputs hash-mismatched in round 1 — trailing-zero rendering).
  private val D12 = DecimalType(28, 12)
  private val D12W = DecimalType(38, 12)

  private def d2(c: org.apache.spark.sql.Column) = c.cast(D2)

  /** TPC-H Q1-shaped scan→filter→aggregate (SURVEY §2.5 A1-A3/A10-A12).
    * Reference: mapred/lib/LongSumReducer.java:32, hive GroupByOperator. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(d2($"l_quantity")).cast("double").as("sum_qty"),
        sum(d2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(d2($"l_extendedprice") * (lit(1).cast(D2) - d2($"l_discount")))
          .cast("double").as("sum_disc_price"),
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
        sum(d2($"o_totalprice")).cast("double").as("revenue"),
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
      .agg(sum(d2($"o_totalprice")).cast("double").as("total_spent"),
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

  /** Left outer join preserving unmatched build rows (SURVEY §2.6 J3/J8,
    * hive JoinOperator.joinObjectsLeftOuterJoin :228). */
  def customerOrdersLeft(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(sum(d2($"o_totalprice")).cast("double"), lit(0.0))
          .as("total_spent"))
      .orderBy($"c_custkey")
  }

  /** Override-join (SURVEY §2.6 J4, mapred/join/OverrideRecordReader.java:36):
    * full outer across N keyed sources, value taken from the rightmost source
    * that has the key — i.e. full_outer + coalesce(right..left). */
  def overrideJoinNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byCust = Tables.customer(spark, dir)
      .groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val bySupp = Tables.supplier(spark, dir)
      .groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    byCust.as("c")
      .join(bySupp.as("s"), $"c.nationkey" === $"s.nationkey", "full_outer")
      .select(
        coalesce($"s.nationkey", $"c.nationkey").as("nationkey"),
        // override semantics: rightmost source wins when both present
        coalesce($"s.n_supp", $"c.n_cust").as("pop"),
        $"c.n_cust".as("n_cust"),
        $"s.n_supp".as("n_supp"))
      .orderBy($"nationkey")
  }

  /** N-source override join (SURVEY §2.6 J4 general form,
    * mapred/join/OverrideRecordReader.java:36 + package.html:61-63): full
    * outer across all keyed sources; for each key the value comes from the
    * RIGHTMOST source that has it. Each input is (frame, value column);
    * frames must share `keyCol`. */
  def overrideJoin(inputs: Seq[(DataFrame, String)],
      keyCol: String): DataFrame = {
    require(inputs.size >= 2, "override join needs at least 2 sources")
    val aliased = inputs.zipWithIndex.map { case ((df, v), i) =>
      df.select(col(keyCol).as(s"k$i"), col(v).as(s"v$i"))
    }
    val joined = aliased.zipWithIndex.reduceLeft[(DataFrame, Int)] {
      case ((acc, _), (next, i)) =>
        val accKey = coalesce((0 until i).reverse.map(j => col(s"k$j")): _*)
        (acc.join(next, accKey === col(s"k$i"), "full_outer"), i)
    }._1
    val n = inputs.size
    joined.select(
      coalesce((n - 1 to 0 by -1).map(i => col(s"k$i")): _*).as(keyCol),
      coalesce((n - 1 to 0 by -1).map(i => col(s"v$i")): _*).as("value"))
      .orderBy(col(keyCol))
  }

  /** Heterogeneous UNION ALL after schema normalization (SURVEY §2.7 U1-U3,
    * mapred/lib/MultipleInputs.java:34; hive TOK_UNION). */
  def unionParties(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select(
      $"c_name".as("name"), $"c_acctbal".as("acctbal"),
      $"c_nationkey".cast("int").as("nationkey"), lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir).select(
      $"s_name".as("name"), $"s_acctbal".as("acctbal"),
      $"s_nationkey".cast("int").as("nationkey"), lit("supplier").as("kind"))
    c.unionByName(s).orderBy($"kind", $"name")
  }

  /** ValueHistogram-style per-key stats report (SURVEY §2.5 A8,
    * mapred/lib/aggregate/ValueHistogram.java:33 — count/min/median/max/
    * avg/stddev of value frequencies). */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val n: Column = count(lit(1))
    val sumD: Column = sum($"value".cast(D12)).cast("double")
    val sumSqD: Column = sum(($"value" * $"value").cast(D12W)).cast("double")
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        n.as("n"),
        min($"value").as("min_v"),
        max($"value").as("max_v"),
        (sumD / n).as("avg_v"),
        round(sqrt((sumSqD - sumD * sumD / n) / (n - lit(1))), 6)
          .as("stddev_v"),
        round(expr("percentile(value, 0.5)"), 4).as("median_v"))
      .orderBy($"event_type")
  }

  /** Field-selection projection (SURVEY §2.2 P8,
    * mapred/lib/FieldSelectionMapReduce.java:64 — cut(1)-style field specs)
    * + JSON attribute extraction from the props payload column. */
  def fieldSelection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        split($"p_name", " ").getItem(1).as("f1"),
        split($"p_name", " ").getItem(0).as("f0"))
      .orderBy($"p_partkey")
  }

  /** JSON field extraction over the events payload (schema-on-read). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"k")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"k")
  }

  /** Deterministic bucket sampling (SURVEY §2.8 — hive
    * TABLESAMPLE(BUCKET x OUT OF y ON col), parse/Hive.g:499;
    * SequenceFileInputFilter percent sampling S5). */
  def bucketSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" % 7 === 0)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(d2($"l_quantity")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** Content-deterministic MD5 record sampling (SURVEY §2.1 S5 —
    * SequenceFileInputFilter.MD5Filter, the split-layout-independent
    * sampling mode) feeding an aggregate: the same keys survive on any
    * cluster layout, so the sample is reproducible and joinable. */
  def md5Sample(spark: SparkSession, dir: String,
      frequency: Int = 7): DataFrame = {
    import spark.implicits._
    graft.sources.IO.md5KeyFilter(
      Tables.lineitem(spark, dir), "l_orderkey", frequency)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(d2($"l_quantity")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** Deterministic stratified sampling — per-stratum rates with a
    * content-derived hash bucket instead of RNG state, so the SAME rows
    * are kept on any cluster, any partitioning, any rerun (the property
    * `df.stat.sampleBy` lacks). Bucket = md5(source:doc_id) mod 1000;
    * keep while bucket < 10 × rate%(stratum). Training pipelines use this
    * shape to rebalance source mixes reproducibly. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-source rate: 5% .. 50% derived from the numeric source suffix
    val rate = (substring($"source", 4, 10).cast("int") % 10 + 1) * 50
    val bucket = expr(
      "cast(conv(substring(md5(concat(source, ':', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 1000")
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket)
      .filter($"bucket" < rate)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Secondary sort: per-group ordering with a grouping comparator coarser
    * than the sort (SURVEY §2.3 H8, JobConf.java:657) — first 3 orders per
    * customer by date, via a ranked window. */
  def secondarySort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_orderdate",
        $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** Chained multi-way fact⋈dim⋈dim join (SURVEY §2.6 J8 — hive join2.q
    * shape); dims broadcast. */
  def chainJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter($"p_size" < 20)),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum(d2($"l_quantity")).cast("double").as("sum_qty"),
        countDistinct($"s_suppkey").as("n_supp"))
      .orderBy($"p_brand")
  }

  /** Lexicographic + numeric min/max (SURVEY §2.5 A6 — StringValueMax/Min,
    * LongValueMax/Min). */
  def minMaxByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .groupBy($"c_nationkey")
      .agg(
        min($"c_name").as("min_name"),
        max($"c_name").as("max_name"),
        min($"c_acctbal").as("min_bal"),
        max($"c_acctbal").as("max_bal"))
      .orderBy($"c_nationkey")
  }

  /** Sessionization: per-user event sessions with a 5-minute inactivity gap
    * (SURVEY §2.9 C13 — session windows, the strict superset of the
    * reference's tumbling-only windows; also the standard training-data
    * user-journey operator). Batch form via `session_window`; the same
    * expression works on a stream. */
  def sessionize(spark: SparkSession, dir: String,
      gap: String = "5 minutes"): DataFrame =
    sessionizeOf(Tables.events(spark, dir), gap)

  /** [[sessionize]] over an arbitrary `(user_id, ts, value)` frame.
    * Boundary semantics (spec-asserted): two events EXACTLY `gap` apart
    * MERGE into one session — `session_window` extends a session whenever
    * the next event is within a closed `gap` of the last, so the oracle's
    * new-session predicate must be the strict `ts - lag(ts) > gap`. */
  def sessionizeOf(events: DataFrame, gap: String): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy($"user_id", session_window($"ts", gap).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(d2($"value")).cast("double").as("sum_v"))
      .select($"user_id", $"w.start".as("s_start"), $"n", $"sum_v")
      .orderBy($"user_id", $"s_start")
  }

  /** Sliding-window aggregation (SURVEY §2.9 C13 superset): 10-minute
    * windows sliding every 5 — each event contributes to 2 windows. Same
    * expression works on a stream with a watermark. */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"event_type", $"n")
      .orderBy($"w_start", $"event_type")
  }

  /** HLL approximate distinct (SURVEY §2.5 A7's capped/approx flavor —
    * UniqValueCount beyond maxNumItems degrades to approximate counting;
    * the scalable form is an HLL sketch, mergeable at any fan-in). No
    * DuckDB oracle: sketch implementations differ across engines; the spec
    * asserts relative error against the exact count instead. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        approx_count_distinct($"o_custkey", 0.02).as("approx_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** KMV (k-minimum-values) approximate distinct count — the oracle-exact
    * counterpart of [[approxDistinct]]: unlike HLL registers, the k smallest
    * md5 values of a group are engine-independent, so DuckDB reproduces the
    * estimate bit-for-bit. Estimator (Bar-Yossef et al. 2002): with U(h) =
    * h / 2^60 the normalized k-th smallest 60-bit hash, distinct ≈
    * (k−1) / U(h_k); groups with fewer than k distinct hashes report the
    * exact count (the sketch IS the value set there).
    *
    * Scale shape: distinct-project hashes first (one shuffle), then the
    * same two-stage salted top-k as [[Curation.sourceCapOf]] — a partial
    * per-(group, salt) rank bounds every task at k survivors, the exact
    * rank runs on ≤ salts·k rows per group, so a billion-member group never
    * lands on one task. Any global k-minimum is its salt bucket's
    * k-minimum, so two-stage equals one-stage exactly. */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64,
      salts: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hv = Tables.orders(spark, dir)
      .select($"o_orderpriority",
        conv(substring(md5($"o_custkey".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val partial = Window.partitionBy($"o_orderpriority", $"h" % salts)
      .orderBy($"h")
    val exact = Window.partitionBy($"o_orderpriority").orderBy($"h")
    val kth = hv
      .withColumn("prn", row_number().over(partial)).filter($"prn" <= k)
      .withColumn("rn", row_number().over(exact)).filter($"rn" === k)
      .select($"o_orderpriority", $"h".as("hk"))
    hv.groupBy($"o_orderpriority").agg(count(lit(1)).as("exact_distinct"))
      .join(kth, Seq("o_orderpriority"), "left")
      .select($"o_orderpriority", $"exact_distinct",
        round(when($"hk".isNull, $"exact_distinct".cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / $"hk".cast("double")), 6).as("kmv_distinct"))
      .orderBy($"o_orderpriority")
  }

  /** Skew-resistant two-stage aggregation — the reference's 2MR group-by
    * plan (SURVEY §2.5 A11, SemanticAnalyzer.genGroupByPlan2MR:1348): stage
    * 1 aggregates on (key, salt) so a hot key spreads over `buckets`
    * reducers, stage 2 merges partials on the key alone. Functionally
    * identical to a direct groupBy; use when one key dominates (AQE's skew
    * handling covers joins, not aggregations over pathological keys). */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_n").as("n"), sum("_s").as("s"))
  }

  /** Successive-snapshot top-K comparison (SURVEY §2.4 O8,
    * examples/TopK.java:332-343): diff two ranked top-K frames — which keys
    * entered, exited, or moved between snapshots. Inputs carry `keyCol` +
    * `rankCol` (1-based); output one row per key present in either
    * snapshot with both ranks (null when absent) and the transition
    * status. Pairs with [[graft.streaming.Continuous]] online-aggregation
    * snapshots for the reference's streaming TopK monitor. */
  def topKDelta(prev: DataFrame, cur: DataFrame, keyCol: String,
      rankCol: String): DataFrame = {
    val p = prev.select(col(keyCol).as("key"), col(rankCol).as("prev_rank"))
    val c = cur.select(col(keyCol).as("key"), col(rankCol).as("cur_rank"))
    p.join(c, Seq("key"), "full_outer")
      .select(col("key"), col("prev_rank"), col("cur_rank"),
        when(col("prev_rank").isNull, "entered")
          .when(col("cur_rank").isNull, "exited")
          .when(col("prev_rank") === col("cur_rank"), "stable")
          .otherwise("moved").as("status"))
      .orderBy(col("cur_rank").asc_nulls_last, col("prev_rank"))
  }

  /** Batch shape of the CQ monitoring query (SURVEY §2.9 C11,
    * examples/CQ.java:53 — per-key per-time-bucket aggregate). */
  def eventsByDay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        (sum($"value".cast(D12)).cast("double") / count(lit(1))).as("avg_v"))
      .orderBy($"event_type", $"day")
  }
}
