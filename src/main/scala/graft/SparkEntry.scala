package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from SURVEY §2
  * (labels in comments) against the driver's star-schema testdata; the
  * matching [[oracleSql]] is ANSI SQL DuckDB runs on the same parquet.
  * Column names/aliases are kept identical on both sides (the driver's
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a9_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++
      graft.queries.CoverageQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.LmQueries.queries

  def oracleSql: Map[String, String] =
    relationalOracles ++
      graft.queries.CoverageQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.LmQueries.oracles

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2/A9/A13 (TPC-H Q1 shape): multi-key group, exact sums, conditional
    // aggregation — reference analog: dashboard group-counts
    // (backend/app/main.py:227-241) + accuracy aggs (experiment_stats.py:31-35).
    "a9_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          Num.sumExact($"l_quantity").as("sum_qty"),
          Num.sumExact($"l_extendedprice").as("sum_base_price"),
          sum(Num.dec($"l_extendedprice") * (lit(java.math.BigDecimal.ONE) - Num.dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          Num.avgExact($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // A3: two-key group-count (main.py:342-344 course×area etc.)
    "a3_group_two_keys" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    }),

    // J1 + F1 + A8: inner equi-join + conjunctive filter + top-K by
    // revenue (main.py:81 join; main.py:538-543 top-10).
    "j1_top_orders_by_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .where($"c_mktsegment" === "BUILDING")
        .groupBy($"o_orderkey")
        .agg(sum(Num.dec($"l_extendedprice") * (lit(java.math.BigDecimal.ONE) - Num.dec($"l_discount")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), $"o_orderkey")
        .limit(10)
    }),

    // J5: left-anti dedup join (services/judging.py:41-52 skip-judged).
    "j5_customers_without_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).where($"o_orderstatus" === "P")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    }),

    // J4/J6: left-semi join — EXISTS (main.py:107-112 search EXISTS;
    // main.py:320-337 IN-subqueries).
    "j4_orders_with_heavy_items" -> ((s, dir) => {
      val o  = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir).where($"l_quantity" > 45)
      o.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    }),

    // S2: first-writer-wins via row_number (seed.py:87-109).
    "s2_first_order_per_customer" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("first_orderkey"))
        .orderBy($"o_custkey")
    }),

    // A4: pivot to wide rows (main.py:347-355 year×area pivot).
    "a4_pivot_year_status" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("o_year", year($"o_orderdate"))
        .groupBy($"o_year")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .withColumn("total", $"F" + $"O" + $"P")
        .orderBy($"o_year")
    }),

    // A5: exact COUNT(DISTINCT) (main.py:382-385 split distinct counts).
    "a5_distinct_parts_per_flag" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
             countDistinct($"l_suppkey").as("n_supps"))
        .orderBy($"l_returnflag")
    }),

    // A7: facet distinct values, ordered (main.py:117-132,462-495).
    "a7_facet_mktsegment" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select($"c_mktsegment").distinct()
        .orderBy($"c_mktsegment")
    }),

    // A8: top-K by count desc with deterministic tiebreak (main.py:538-543).
    "a8_top_parts_by_lines" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"l_partkey")
        .limit(10)
    }),

    // A12: fixed-bin histogram with clamped last bucket
    // (experiment_stats.py:54-61 score buckets).
    "a12_histogram_totalprice" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("bucket",
          least(floor($"o_totalprice" / 50000).cast("int"), lit(10)))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    }),

    // A10/A11: avg + min/max over a join (main.py:431-449 word stats).
    "a10_acctbal_stats_by_nation" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          Num.avgExact($"c_acctbal").as("avg_bal"),
          Num.dec(min($"c_acctbal")).cast("double").as("min_bal"),
          Num.dec(max($"c_acctbal")).cast("double").as("max_bal"),
          count(lit(1)).as("n_cust"))
        .orderBy($"n_name")
    }),

    // O2/O3: dynamic sort + offset/limit pagination (main.py:195-206).
    "o3_orders_page" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(desc("o_orderdate"), $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .offset(100).limit(50)
    }),

    // F1/F3: multi-dimension conjunctive filter incl. IN-lists
    // (main.py:58-99 _apply_filters).
    "f1_filtered_lineitems" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .where($"l_returnflag".isin("A", "R") &&
               $"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
               $"l_quantity" >= 10 && $"l_quantity" <= 20)
        .groupBy($"l_returnflag", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), Num.sumExact($"l_quantity").as("qty"))
        .orderBy($"l_returnflag", $"o_orderpriority")
    }),

    // A15: self-consistency — per-group distinct==1 rate
    // (experiment_stats.py:262-284).
    "a15_single_supplier_orders" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(countDistinct($"l_suppkey").as("n_supp"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when($"n_supp" === 1, 1).otherwise(0)).as("n_single"),
          (sum(when($"n_supp" === 1, 1).otherwise(0)).cast("double") /
            count(lit(1))).as("single_rate"))
    }),

    // U2: full-outer merge of two aggregates (Dashboard.jsx:595-629).
    "u2_nation_customer_supplier" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val sup = Tables.supplier(s, dir)
        .groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(sup, Seq("nationkey"), "full_outer")
        .na.fill(0, Seq("n_customers", "n_suppliers"))
        .orderBy($"nationkey")
    })
  )

  // -------------------------------------------------------------- oracles

  private def relationalOracles: Map[String, String] = Map(
    "a9_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Num.sqlSumExact("l_quantity")} AS sum_qty,
         |  ${Num.sqlSumExact("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |  ${Num.sqlAvgExact("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a3_group_two_keys" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "j1_top_orders_by_revenue" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "j5_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "j4_orders_with_heavy_items" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "s2_first_order_per_customer" ->
      """SELECT o_custkey, o_orderkey AS first_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "a4_pivot_year_status" ->
      """SELECT YEAR(o_orderdate) AS o_year,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P",
        |  COUNT(*) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a5_distinct_parts_per_flag" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a7_facet_mktsegment" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "a8_top_parts_by_lines" ->
      """SELECT l_partkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_partkey ORDER BY n DESC, l_partkey LIMIT 10""".stripMargin,

    "a12_histogram_totalprice" ->
      """SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS INT), 10) AS bucket,
        |       COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a10_acctbal_stats_by_nation" ->
      s"""SELECT n_name,
         |  ${Num.sqlAvgExact("c_acctbal")} AS avg_bal,
         |  CAST(CAST(MIN(c_acctbal) AS DECIMAL(18,2)) AS DOUBLE) AS min_bal,
         |  CAST(CAST(MAX(c_acctbal) AS DECIMAL(18,2)) AS DOUBLE) AS max_bal,
         |  COUNT(*) AS n_cust
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "o3_orders_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey LIMIT 50 OFFSET 100""".stripMargin,

    "f1_filtered_lineitems" ->
      s"""SELECT l_returnflag, o_orderpriority, COUNT(*) AS n,
         |  ${Num.sqlSumExact("l_quantity")} AS qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_returnflag IN ('A','R')
         |  AND o_orderpriority IN ('1-URGENT','2-HIGH')
         |  AND l_quantity BETWEEN 10 AND 20
         |GROUP BY l_returnflag, o_orderpriority
         |ORDER BY l_returnflag, o_orderpriority""".stripMargin,

    "a15_single_supplier_orders" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
        |  CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS single_rate
        |FROM (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
        |      FROM lineitem GROUP BY l_orderkey) t""".stripMargin,

    "u2_nation_customer_supplier" ->
      """SELECT nationkey,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY 1) s USING (nationkey)
        |ORDER BY nationkey""".stripMargin
  )

  // Scala 2.13 shorthand used above
  private implicit class ColSyntax(val sc: StringContext) extends AnyVal {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
