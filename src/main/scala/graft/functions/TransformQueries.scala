package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** §2.3 transform-function queries. t_bucket is rows-only (no DuckDB
  * equivalent of the spec murmur3) and pinned by Appendix-B vectors in
  * TransformSpec; the calendar/truncate transforms have exact SQL oracles.
  */
object TransformQueries {
  import transforms._

  def queries: Seq[GraftQuery] = Seq(
    // bucket[N] distribution over long + string inputs (spec hash).
    GraftQuery(
      "t_bucket",
      (s, dir) =>
        Tables.tbl(s, dir, "lineitem")
          .groupBy(
            bucket(16, col("l_orderkey")).as("b_key"),
            bucket(8, col("l_returnflag")).as("b_flag"))
          .agg(count(lit(1)).as("n"))
          .orderBy("b_key", "b_flag"),
      None),

    GraftQuery(
      "t_truncate",
      (s, dir) =>
        Tables.tbl(s, dir, "part")
          .select(
            col("p_partkey"),
            truncateInt(10, col("p_partkey")).as("trunc_key"),
            truncateString(4, col("p_name")).as("trunc_name"),
            round(truncateDecimal(10,
              col("p_retailprice").cast(org.apache.spark.sql.types
                .DecimalType(12, 2))).cast("double"), 2).as("trunc_price"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_partkey - (p_partkey % 10) AS trunc_key,
        substr(p_name, 1, 4) AS trunc_name,
        round(CAST(CAST(p_retailprice AS DECIMAL(12,2))
          - (CAST(p_retailprice AS DECIMAL(12,2)) % 10) AS DOUBLE), 2)
          AS trunc_price
        FROM part ORDER BY p_partkey""")),

    GraftQuery(
      "t_year",
      (s, dir) =>
        Tables.tbl(s, dir, "orders")
          .groupBy(years(col("o_orderdate")).cast("long").as("ty"))
          .agg(count(lit(1)).as("n"))
          .orderBy("ty"),
      Some("""SELECT CAST(year(o_orderdate) - 1970 AS BIGINT) AS ty,
        COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY ty""")),

    GraftQuery(
      "t_month",
      (s, dir) =>
        Tables.tbl(s, dir, "orders")
          .groupBy(months(col("o_orderdate")).cast("long").as("tm"))
          .agg(count(lit(1)).as("n"))
          .orderBy("tm"),
      Some("""SELECT CAST((year(o_orderdate) - 1970) * 12
          + month(o_orderdate) - 1 AS BIGINT) AS tm,
        COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY tm""")),

    GraftQuery(
      "t_day",
      (s, dir) =>
        Tables.tbl(s, dir, "lineitem")
          .groupBy(days(col("l_shipdate")).cast("long").as("td"))
          .agg(count(lit(1)).as("n"))
          .orderBy("td"),
      Some("""SELECT CAST(date_diff('day', DATE '1970-01-01',
          CAST(l_shipdate AS DATE)) AS BIGINT) AS td,
        COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY td""")),

    GraftQuery(
      "t_hour",
      (s, dir) =>
        Tables.tbl(s, dir, "events")
          .groupBy(hours(col("ts")).cast("long").as("th"))
          .agg(count(lit(1)).as("n"))
          .orderBy("th"),
      Some("""SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS th,
        COUNT(*) AS n FROM events GROUP BY 1 ORDER BY th""")),

    GraftQuery(
      "t_identity_void",
      (s, dir) =>
        Tables.tbl(s, dir, "customer")
          .select(
            identityT(col("c_custkey")).as("c_custkey"),
            voidT(col("c_nationkey")).as("v"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, CAST(NULL AS INTEGER) AS v
        FROM customer ORDER BY c_custkey"""))
  )
}
