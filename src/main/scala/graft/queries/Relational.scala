package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface over the TPC-H-ish tables: scans,
  * filters with pushdown, hash aggregation, broadcast + shuffle joins,
  * semi/anti joins, window functions, distinct, rollup, top-k.
  *
  * The reference delegates its ad-hoc analytics to PostgreSQL (reference
  * README.md:227-252); here the same shapes run in Spark SQL over parquet,
  * where Catalyst's pushdown/pruning replaces the B-tree indexes the
  * reference creates (reference src/database/DatabaseLoader.cpp:122-125).
  *
  * Every query: deterministic ORDER BY on a unique key, doubles rounded, all
  * output columns aliased to match the DuckDB oracle exactly.
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(Tables.configure(s), dir, name)

  // TPC-H money/quantity columns are fixed-point values stored as doubles;
  // rounding their sums/products as doubles is nondeterministic across
  // engines exactly at the (systematically common) half-way points, because
  // Spark rounds the exact BigDecimal while DuckDB rounds via a double
  // multiply. Casting to decimal first makes +,* and round() exact decimal
  // arithmetic with the same half-away-from-zero rule on both engines.
  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  // Exact-decimal mean: numerator summed exactly in decimal, division done
  // in IEEE doubles (bit-identical given identical inputs), then the
  // quotient re-anchored at scale 10 before the visible rounding — both
  // engines resolve the final round in exact decimal.
  private def decAvg(c: Column, scale: Int): Column =
    round((sum(dec(c)).cast("double") / count(lit(1)))
      .cast("decimal(38,10)"), scale).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7: full-scan count (reference README.md:229).
    "q01_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))),

    // A1/A8: hash group-by aggregation, TPC-H Q1 shape
    // (reference README.md:232-235). Partial aggregation (map-side combine)
    // is automatic; one shuffle on the two grouping keys.
    "q02_groupagg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
          round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base"),
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
            .cast("double").as("sum_disc"),
          decAvg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // P5/P3: filter + projection; both reach the parquet scan
    // (PushedFilters + pruned ReadSchema).
    "q03_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 2)
            .cast("double").as("disc_price"))
        // (l_orderkey, l_linenumber) is NOT unique in this dataset;
        // disc_price completes a total order so row order is deterministic.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"))),

    // O2: ORDER BY ... DESC LIMIT k -> TakeOrderedAndProject (top-k without
    // a global sort; reference README.md:238-245).
    "q04_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(
          col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"))),

    // Broadcast join chain: nation (25 rows) and region (5 rows) are
    // classic broadcast dims — no shuffle of the customer side beyond the
    // final aggregation.
    "q05_broadcast_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          decAvg(col("c_acctbal"), 4).as("avg_bal"))
        .orderBy(col("r_name"), col("n_name"))),

    // Shuffle join on the fact keys + aggregation; AQE handles skew.
    // Revenue is pre-aggregated per l_orderkey BEFORE the join: the naive
    // form (join the raw fact, then countDistinct(o_orderkey) + sum) plans
    // an Expand that doubles every row through the final exchange; here the
    // join output is one row per order, so n_orders is a plain count and the
    // expand disappears. Decimal sums are associative, so the two-level sum
    // is bit-identical to the single-level one.
    "q06_join_agg" -> ((s, dir) => {
      val revPerOrder = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("order_rev"))
      t(s, dir, "orders")
        .join(revPerOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("order_rev")), 2).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    }),

    // EXISTS -> left semi join (no row multiplication, no distinct needed).
    "q07_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))),

    // NOT EXISTS -> left anti join.
    "q08_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))),

    // Ranking window: top-3 orders per customer.
    "q09_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // W1/A2: trailing row-frame rolling mean (the reference's SMA frame,
    // reference src/indicators/TechnicalIndicators.hpp:204-224) as a full
    // window column over the fact table. (l_orderkey, l_linenumber) is NOT
    // unique here, so l_extendedprice joins the sort key — ties then carry
    // equal prices and the averaged sequence is deterministic; sma joins the
    // output ORDER BY for a total output order.
    "q10_rolling_sma" -> ((s, dir) =>
      graft.operators.Indicators.rollingSma(
          t(s, dir, "lineitem"),
          groupCols = Seq("l_returnflag"),
          priceCol = "l_extendedprice",
          orderBy = Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"),
          period = 5)
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round(col("sma"), 4).as("sma"))
        .orderBy(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("sma"))),

    // Exact quantiles (percentile with linear interpolation — same
    // definition as the oracle's quantile_cont).
    "q32_quantiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)")
            .cast("decimal(38,10)"), 4).cast("double").as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)")
            .cast("decimal(38,10)"), 4).cast("double").as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)")
            .cast("decimal(38,10)"), 4).cast("double").as("p99"))
        .orderBy(col("l_returnflag"))),

    // Set operations: customers with orders vs suppliers' nations etc. —
    // INTERSECT / EXCEPT / UNION over key sets.
    "q33_setops" -> ((s, dir) => {
      val custNations = t(s, dir, "customer")
        .select(col("c_nationkey").as("nk")).distinct()
      val suppNations = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nk")).distinct()
      custNations.intersect(suppNations).withColumn("op", lit("both"))
        .unionByName(
          custNations.except(suppNations).withColumn("op", lit("cust_only")))
        .unionByName(
          suppNations.except(custNations).withColumn("op", lit("supp_only")))
        .orderBy(col("op"), col("nk"))
    }),

    // Pivot: order priority x status counts as a wide table (conditional
    // aggregation under the hood — the oracle states it explicitly).
    "q34_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(
          col("o_orderpriority"),
          col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
        .orderBy(col("o_orderpriority"))),

    // CUBE grouping sets (all four combinations of the two keys).
    "q37_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(dec(col("o_totalprice"))), 2).cast("double").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))),

    // Distinct aggregation (expand + two-phase agg under the hood).
    "q11_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_pairs"))),

    // ROLLUP grouping sets; NULL grouping keys coalesced to a sentinel so
    // ordering is total and engine-independent.
    "q12_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status")))
  )

  val oracles: Map[String, String] = Map(
    "q01_count" -> "SELECT COUNT(*) AS n_rows FROM lineitem",
    "q02_groupagg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc,
         CAST(round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_disc,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS disc_price
         FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber, disc_price""",
    "q04_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q05_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
         CAST(round(CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q06_join_agg" ->
      """SELECT o_orderpriority, o_orderstatus,
         count(DISTINCT o_orderkey) AS n_orders,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority, o_orderstatus
         ORDER BY o_orderpriority, o_orderstatus""",
    "q07_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q09_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
           FROM orders) ranked
         WHERE rnk <= 3 ORDER BY o_custkey, rnk""",
    "q10_rolling_sma" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
         round(avg(l_extendedprice) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS sma
         FROM lineitem
         ORDER BY l_returnflag, l_orderkey, l_linenumber, sma""",
    "q32_quantiles" ->
      """SELECT l_returnflag,
         CAST(round(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(38,10)), 4) AS DOUBLE) AS p50,
         CAST(round(CAST(quantile_cont(l_extendedprice, 0.9) AS DECIMAL(38,10)), 4) AS DOUBLE) AS p90,
         CAST(round(CAST(quantile_cont(l_extendedprice, 0.99) AS DECIMAL(38,10)), 4) AS DOUBLE) AS p99
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q33_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
         SELECT nk, 'both' AS op FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
         UNION ALL
         SELECT nk, 'cust_only' FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
         UNION ALL
         SELECT nk, 'supp_only' FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
         ORDER BY op, nk""",
    "q34_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (o_orderstatus = 'F') AS n_f,
         count(*) FILTER (o_orderstatus = 'O') AS n_o,
         count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q11_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT (l_partkey, l_suppkey)) AS n_pairs
         FROM lineitem""",
    "q37_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q12_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
         coalesce(l_linestatus, 'ALL') AS status,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY flag, status"""
  )
}
