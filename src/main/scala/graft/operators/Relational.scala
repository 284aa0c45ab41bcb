package graft.operators

import graft.{GraftQuery, Help, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.1 Core relational query surface (SURVEY.md).
  *
  * Every query is declared via the DataFrame API (or Spark SQL where the
  * DataFrame API lacks the construct, e.g. GROUPING SETS) so Catalyst picks
  * the physical strategy: predicate/column pushdown to the parquet scan,
  * broadcast joins for dims, partial aggregation map-side. Dims
  * (region/nation/supplier/part/customer at TPC-H ratios) are explicitly
  * broadcast-hinted where a 100 TB fact table would otherwise shuffle.
  */
object Relational {
  import Help._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  // Revenue expression shared by several queries.
  private def revenue: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val revenueSql = "l_extendedprice*(1-l_discount)"

  def queries: Seq[GraftQuery] = Seq(
    // q01: TPC-H Q1 shape — filter + groupBy multi-agg + sort.
    GraftQuery(
      "q01_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            r4(dsum(col("l_quantity"))).as("sum_qty"),
            r4(dsum(col("l_extendedprice"))).as("sum_base_price"),
            r4(dsum(revenue)).as("sum_disc_price"),
            r4(dsum(revenue * (lit(1) + col("l_tax")))).as("sum_charge"),
            r4(dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            r4(dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            r4(dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum(revenueSql)} AS sum_disc_price,
        ${sqlDsum(s"$revenueSql*(1+l_tax)")} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // q02: predicate + column pruning pushed to the parquet scan.
    GraftQuery(
      "q02_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01") &&
              col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
        ORDER BY l_orderkey, l_linenumber""")),

    // q03: 3-table join + agg + top-N (customer is a dim at lineitem scale
    // but large in absolute terms → shuffle join; AQE handles skew).
    GraftQuery(
      "q03_join_agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("c_custkey", "c_name")
          .agg(r4(dsum(revenue)).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, ${sqlDsum(revenueSql)} AS revenue,
        COUNT(*) AS n_items
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // q04: fact ⋈ small-dim broadcast hash join (explicit hint: at 100 TB
    // part fits in executor memory per-brand; never shuffle the fact side).
    GraftQuery(
      "q04_broadcast_join",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_brand") === "Brand#1")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy("p_type")
          .agg(
            r4(dsum(col("l_quantity"))).as("sum_qty"),
            r4(dsum(revenue)).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("p_type")
      },
      Some(s"""SELECT p_type, ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum(revenueSql)} AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
        GROUP BY p_type ORDER BY p_type""")),

    // q05: 5-table star-schema join; all dims broadcast.
    GraftQuery(
      "q05_multi_join",
      (s, dir) => {
        val r = t(s, dir, "region")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(r4(dsum(revenue)).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, ${sqlDsum(revenueSql)} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // q06: EXISTS via left_semi (never materializes the right side rows).
    GraftQuery(
      "q06_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // q07: NOT EXISTS via left_anti.
    GraftQuery(
      "q07_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // q08: left outer join with null-side agg (COUNT skips nulls).
    GraftQuery(
      "q08_outer_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy("c_custkey", "c_name")
          .agg(
            count(col("o_orderkey")).as("order_count"),
            r4(dsum(coalesce(col("o_totalprice"), lit(0.0)))).as("total_spent"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count,
        ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS total_spent
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // q09: row_number partitioned window, top-3 orders per customer.
    GraftQuery(
      "q09_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) x
        WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // q10: running sum over an ordered window frame (exact decimal sum so
    // the cumulative value is identical however the frame is accumulated).
    GraftQuery(
      "q10_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("running_total",
            r4(sum(col("o_totalprice").cast(Dec)).over(w).cast("double")))
          .select(
            col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_totalprice"), col("running_total"))
          .orderBy("o_custkey", "o_date", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
          round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE), 4) AS running_total
        FROM orders ORDER BY o_custkey, o_date, o_orderkey""")),

    // q11: exact count-distinct per group.
    GraftQuery(
      "q11_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps"),
            count(lit(1)).as("n_items"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
        COUNT(DISTINCT l_suppkey) AS distinct_supps, COUNT(*) AS n_items
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // q12: UNION (distinct) then EXCEPT.
    GraftQuery(
      "q12_set_ops",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = o.filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("c_custkey"))
        val x = c.filter(col("c_nationkey") < 5).select("c_custkey")
        a.union(b).distinct().except(x).orderBy("c_custkey")
      },
      Some("""(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_nationkey < 5
        ORDER BY c_custkey""")),

    // q13: ROLLUP grouping-sets agg (subtotal rows surfaced via COALESCE so
    // the output keys are non-null and totally orderable on both sides).
    GraftQuery(
      "q13_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(r4(dsum(col("l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
            col("sum_qty"), col("n_items"))
          .orderBy("rflag", "lstatus"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        COALESCE(l_linestatus, 'ALL') AS lstatus,
        ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_items
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rflag, lstatus""")),

    // q14: CASE WHEN conditional aggregation.
    GraftQuery(
      "q14_conditional_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
            r4(dsum(when(col("o_orderstatus") === "O", col("o_totalprice"))
              .otherwise(lit(0.0)))).as("open_value"))
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        ${sqlDsum("CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0.0 END")}
          AS open_value
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q15: scalar + correlated subquery, decorrelated to broadcast joins.
    // Averages are exact (decimal sum / count) so the > comparison is
    // engine-order-independent.
    GraftQuery(
      "q15_subquery",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val globalAvg = c.agg(
          (dsum(col("c_acctbal")) / count(lit(1))).as("g_avg"))
        val nationAvg = c.groupBy("c_nationkey").agg(
          (dsum(col("c_acctbal")) / count(lit(1))).as("n_avg"))
        c.join(broadcast(nationAvg), "c_nationkey")
          .crossJoin(broadcast(globalAvg))
          .filter(col("c_acctbal") > col("n_avg") &&
            col("c_acctbal") > col("g_avg"))
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*)
            FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*)
            FROM customer)
        ORDER BY c_custkey""")),

    // q16: per-group top-k via rank (ties kept, deterministic tiebreak).
    GraftQuery(
      "q16_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 2)
          .select("p_brand", "p_partkey", "p_retailprice", "rk")
          .orderBy("p_brand", "rk", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, rk FROM (
          SELECT p_brand, p_partkey, p_retailprice,
            RANK() OVER (PARTITION BY p_brand
              ORDER BY p_retailprice DESC, p_partkey) AS rk
          FROM part) x
        WHERE rk <= 2 ORDER BY p_brand, rk, p_partkey""")),

    // q17: like/substring/concat/upper/trim (all codegen'd built-ins).
    GraftQuery(
      "q17_string_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_name").like("%widget%"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_name"), 1, 5).as("name_pre"),
            concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
            length(trim(col("p_name"))).cast("long").as("name_len"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
        substr(p_name, 1, 5) AS name_pre,
        p_brand || ':' || p_type AS brand_type,
        CAST(length(trim(p_name)) AS BIGINT) AS name_len
        FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey""")),

    // q18: date extraction/arithmetic buckets.
    GraftQuery(
      "q18_date_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("long").as("o_year"),
            quarter(col("o_orderdate")).cast("long").as("o_quarter"))
          .agg(count(lit(1)).as("n_orders"),
            r4(dsum(col("o_totalprice"))).as("q_value"))
          .orderBy("o_year", "o_quarter"),
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
        COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS q_value
        FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""")),

    // q19: pivot — order status counts per priority.
    GraftQuery(
      "q19_pivot",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .count()
          .select(
            col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q20: exact percentile / median per group (continuous interpolation on
    // both engines).
    GraftQuery(
      "q20_percentile",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            r4(expr("percentile(o_totalprice, 0.5)")).as("med_price"),
            r4(expr("percentile(o_totalprice, 0.9)")).as("p90_price"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        round(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q21: JSON field extraction from events.props.
    GraftQuery(
      "q21_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events ORDER BY event_id""")),

    // q22: small cartesian + range predicate (nation pairs within a region).
    GraftQuery(
      "q22_cross_join",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val a = n.select(col("n_nationkey").as("a_key"),
          col("n_name").as("n1"), col("n_regionkey").as("region_key"))
        val b = n.select(col("n_nationkey").as("b_key"),
          col("n_name").as("n2"), col("n_regionkey").as("b_region"))
        a.join(b, col("region_key") === col("b_region") &&
            col("a_key") < col("b_key"))
          .select("region_key", "n1", "n2")
          .orderBy("region_key", "n1", "n2")
      },
      Some("""SELECT a.n_regionkey AS region_key, a.n_name AS n1,
        b.n_name AS n2
        FROM nation a, nation b
        WHERE a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        ORDER BY region_key, n1, n2""")),

    // q23: HAVING / filtered aggregate.
    GraftQuery(
      "q23_exists_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            r4(dsum(col("o_totalprice"))).as("spent"))
          .filter(col("n_orders") >= 12)
          .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
        ${sqlDsum("o_totalprice")} AS spent
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
        ORDER BY o_custkey""")),

    // q25: AS-OF join — for each purchase, the most recent prior (or
    // simultaneous) view by the same user. Spark lacks the operator;
    // composed per the preference order (built-ins first): union both
    // sides with a marker, one shuffle on the key, and an ordered-window
    // last(ignoreNulls) carries the latest view time forward. This is the
    // canonical distributed as-of shape — shuffle once, sort within
    // partition, no per-key driver logic. Oracle: DuckDB's native ASOF.
    GraftQuery(
      "q25_asof_join",
      (s, dir) => {
        val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        val e = t(s, dir, "events")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("ets"),
            lit(null).cast("long").as("p_event_id"),
            col("ts").as("v_ts"), lit(0).as("is_p"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("ets"),
            col("event_id").as("p_event_id"),
            lit(null).cast("timestamp").as("v_ts"), lit(1).as("is_p"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ets"), col("is_p")) // ties: the view counts
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        views.unionByName(purchases)
          .withColumn("last_v_ts",
            last(col("v_ts"), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1)
          .select(
            col("p_event_id").as("event_id"), col("user_id"),
            date_format(col("ets"), fmt).as("p_ts"),
            coalesce(date_format(col("last_v_ts"), fmt), lit("-")).as("v_ts"))
          .orderBy("event_id")
      },
      Some("""WITH v AS (
          SELECT user_id, ts FROM events WHERE event_type = 'view'),
        p AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id,
          strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts,
          COALESCE(strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS v_ts
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY event_id""")),

    // q24: explicit GROUPING SETS (via Spark SQL — the construct is not in
    // the DataFrame API; Catalyst expands before the shuffle either way).
    GraftQuery(
      "q24_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_q24")
        s.sql(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
          COALESCE(l_linestatus, 'ALL') AS lstatus,
          round(CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE), 4)
            AS sum_qty,
          COUNT(*) AS n_items
          FROM li_q24
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
            (l_returnflag, l_linestatus))
          ORDER BY rflag, lstatus""")
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        COALESCE(l_linestatus, 'ALL') AS lstatus,
        ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          (l_returnflag, l_linestatus))
        ORDER BY rflag, lstatus"""))
  )
}
