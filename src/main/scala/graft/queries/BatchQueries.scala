package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Relational operator surface (SURVEY.md §2.4–§2.6 completion): hash
  * aggregation, broadcast/shuffle/semi/anti/range/as-of joins, window
  * functions, set ops, rollup/cube, sessionization, time windows.
  *
  * Float policy: double measures are summed through DECIMAL(18,6) casts
  * (exact, order-independent — the distributed sum is then reproducible
  * bit-for-bit against any engine) and converted back to double only at
  * the end; divisions happen after the exact sum.
  */
object BatchQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Exact money/measure aggregation: sum in DECIMAL (exact and
  // order-independent, so the distributed sum is reproducible against
  // any engine), then emit integer micro-units. Never emit raw double
  // sums (non-deterministic across partition orders) nor decimals
  // (DuckDB's decimal->double bridge is not correctly rounded).
  private def decSum(c: org.apache.spark.sql.Column) =
    floor(sum(c.cast("decimal(18,6)")) * 1000000).cast("long")

  // Same, for columns that are ALREADY exact decimals (e.g. decimal
  // products) — no per-row recast, matching an oracle that sums the
  // full-scale product.
  private def decSumRaw(c: org.apache.spark.sql.Column) =
    floor(sum(c) * 1000000).cast("long")

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------ q01 agg
    QueryDef(
      "q01_agg",
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_price_micros"),
            decSumRaw(col("l_extendedprice").cast("decimal(18,6)") *
              (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
              .as("revenue_micros"),
            count(lit(1)).as("n_rows"))
          .withColumn("avg_qty", col("sum_qty").cast("double") / col("n_rows"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000) AS BIGINT) AS sum_price_micros,
             |  CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) * 1000000) AS BIGINT) AS revenue_micros,
             |  COUNT(*) AS n_rows,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ----------------------------------------------- q02 filter + project
    QueryDef(
      "q02_filter_project",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
            col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_shipdate"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --------------------------------------- q03 multi-join + aggregation
    QueryDef(
      "q03_join_agg",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            decSumRaw(col("l_extendedprice").cast("decimal(18,6)") *
              (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
              .as("revenue_micros"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) * 1000000) AS BIGINT) AS revenue_micros,
             |  COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------- q04 sort + limit
    QueryDef(
      "q04_topk",
      (s, d) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // --------------------------------------------- q05 ranking window fn
    QueryDef(
      "q05_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // -------------------------------------------- q06 running-sum window
    QueryDef(
      "q06_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, d, "lineitem")
          .filter(col("l_suppkey") % 10 === 0)
          .withColumn("running_qty", sum(col("l_quantity").cast("long")).over(w))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_qty
             |FROM lineitem WHERE l_suppkey % 10 = 0
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // ----------------------------------------------------- q07 semi join
    QueryDef(
      "q07_semi_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ----------------------------------------------------- q08 anti join
    QueryDef(
      "q08_anti_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------- q09 set ops
    QueryDef(
      "q09_union",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)),
    QueryDef(
      "q10_intersect",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)),
    QueryDef(
      "q11_except",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)),

    // ------------------------------------------------ q12 rollup  q13 cube
    QueryDef(
      "q12_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("sum_qty"))
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),
    QueryDef(
      "q13_cube",
      (s, d) =>
        t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"))
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // ------------------------------------------------ q14 exact distinct
    QueryDef(
      "q14_distinct_count",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---------------------------------------------- q15 range (band) join
    QueryDef(
      "q15_range_join",
      (s, d) => {
        val bands = s.range(0, 10).select(
          (col("id") * 100.0 + 500.0).as("lo"),
          ((col("id") + 1) * 100.0 + 500.0).as("hi"))
        Joins.rangeBandJoin(t(s, d, "part"), "p_retailprice", bands, "lo", "hi")
          .groupBy(col("lo"))
          .agg(count(lit(1)).as("n_parts"),
            decSum(col("p_retailprice")).as("sum_price_micros"))
          .orderBy(col("lo"))
      },
      Some("""SELECT lo, COUNT(*) AS n_parts,
             |  CAST(floor(SUM(CAST(p_retailprice AS DECIMAL(18,6))) * 1000000) AS BIGINT) AS sum_price_micros
             |FROM (SELECT i * 100.0 + 500.0 AS lo, (i + 1) * 100.0 + 500.0 AS hi FROM range(0, 10) t(i))
             |JOIN part ON p_retailprice >= lo AND p_retailprice < hi
             |GROUP BY lo ORDER BY lo""".stripMargin)),

    // ------------------------------------------------------ q16 as-of join
    QueryDef(
      "q16_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id").as("custkey"), col("ts"))
        val o = t(s, d, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        Joins.asofJoinBackward(ev, o, "custkey", "ts", "o_orderdate",
          "o_orderkey", Seq("o_orderkey", "o_totalprice"))
          .select(col("event_id"), col("custkey"),
            col("r_o_orderdate").as("asof_orderdate"),
            col("r_o_orderkey").as("asof_orderkey"),
            col("r_o_totalprice").as("asof_totalprice"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id AS custkey,
             |  o.o_orderdate AS asof_orderdate, o.o_orderkey AS asof_orderkey,
             |  o.o_totalprice AS asof_totalprice
             |FROM events e LEFT JOIN LATERAL (
             |  SELECT o_orderdate, o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
             |ORDER BY e.event_id""".stripMargin)),

    // ------------------------------------------- q17 batch sessionization
    QueryDef(
      "q17_session_batch",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        t(s, d, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
              col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""WITH f AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |g AS (SELECT user_id, ts,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // --------------------------------------------- q18 tumbling time window
    QueryDef(
      "q18_tumbling_window",
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value_micros"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), col("sum_value_micros"))
          .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(floor(SUM(CAST(value AS DECIMAL(18,6))) * 1000000) AS BIGINT) AS sum_value_micros
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --------------------------------------------- q19 sliding time window
    QueryDef(
      "q19_sliding_window",
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"), col("event_type"), col("n"))
          .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT make_timestamp(((epoch_us(ts) // 86400000000) - o.o) * 86400000000) AS window_start,
             |  event_type, COUNT(*) AS n
             |FROM events, (SELECT unnest([0, 1]) AS o) o
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------- q20 pivot
    QueryDef(
      "q20_pivot",
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0)
          .withColumnsRenamed(Map(
            "click" -> "n_click", "error" -> "n_error", "purchase" -> "n_purchase",
            "signup" -> "n_signup", "view" -> "n_view"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
             |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
             |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)))
}
