package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}

/** SURVEY.md §2 rows 1–29: the relational core.
  *
  * Every query is a pure `org.apache.spark.sql` built-in composition —
  * Catalyst gets a fully declarative plan (pushdown, pruning, join
  * selection, whole-stage codegen all automatic). Determinism follows
  * SURVEY §2.1: total ORDER BY on a unique key, exact decimal sums via
  * [[graft.Det]], timestamps formatted to strings in output, COALESCE on
  * rollup/cube keys so no NULL reaches an ORDER BY.
  *
  * Scale notes: dimension joins carry explicit broadcast() hints
  * (region/nation/customer are small at any SF); fact-fact joins shuffle on
  * their equi keys; window queries partition by their natural key
  * (customer/user), never a global unpartitioned window.
  */
object RelationalQueries {

  // ---- 1. scan / projection -------------------------------------------
  val q01 = Q(
    "q01_scan_project",
    // (l_orderkey, l_linenumber) is NOT unique in this corpus (FIXTURES.md) —
    // every sort here ends with enough columns that ties are full-row
    // duplicates, so the hash is order-proof and the LIMIT cut is stable.
    (s, d) => Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(100),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
            LIMIT 100"""))

  // ---- 2. filter / predicates -----------------------------------------
  val q02 = Q(
    "q02_filter_pred",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10, 20)
        && col("l_returnflag").isin("A", "R")
        && col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_linestatus").like("F%"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
            FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 20
              AND l_returnflag IN ('A','R')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_linestatus LIKE 'F%'
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus"""))

  // ---- 3. string functions --------------------------------------------
  val q03 = Q(
    "q03_str_funcs",
    (s, d) => Tables.customer(s, d).select(
      col("c_custkey"),
      upper(col("c_name")).as("up"),
      lower(col("c_name")).as("lo"),
      substring(col("c_name"), 1, 8).as("sub"),
      length(col("c_name")).as("len"),
      trim(concat(lit("  "), col("c_name"), lit("  "))).as("tr"),
      concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cc"),
      regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("rep"),
      regexp_extract(col("c_name"), "(\\d+)", 1).as("digits")
    ).orderBy("c_custkey"),
    Some("""SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
                   substring(c_name, 1, 8) AS sub, length(c_name) AS len,
                   trim('  ' || c_name || '  ') AS tr,
                   c_name || '-' || c_mktsegment AS cc,
                   replace(c_name, 'Customer', 'Cust') AS rep,
                   regexp_extract(c_name, '(\d+)', 1) AS digits
            FROM customer ORDER BY c_custkey"""))

  // ---- 4. date functions ----------------------------------------------
  val q04 = Q(
    "q04_date_funcs",
    (s, d) => Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mon"),
      datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("dd")
    ).orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
                   day(o_orderdate) AS dom,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon,
                   datediff('day', o_orderdate::DATE, DATE '1998-01-01') AS dd
            FROM orders ORDER BY o_orderkey"""))

  // ---- 5. math functions ----------------------------------------------
  val q05 = Q(
    "q05_math_funcs",
    (s, d) => Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice"), 1).as("r1"),
      abs(col("l_discount") - lit(0.05)).as("ab"),
      ceil(col("l_extendedprice") / 100).cast("bigint").as("ce"),
      floor(col("l_extendedprice") / 100).cast("bigint").as("fl"),
      round(sqrt(col("l_quantity")), 6).as("sq"),
      round(log(col("l_extendedprice")), 6).as("lg"),
      round(pow(col("l_discount"), 2), 6).as("pw"),
      (col("l_linenumber") % 3).as("md")
    ).orderBy("l_orderkey", "l_linenumber", "r1", "ab", "ce", "fl", "sq", "lg", "pw", "md"),
    Some("""SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice, 1) AS r1,
                   abs(l_discount - 0.05) AS ab,
                   CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ce,
                   CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
                   round(sqrt(l_quantity), 6) AS sq,
                   round(ln(l_extendedprice), 6) AS lg,
                   round(pow(l_discount, 2), 6) AS pw,
                   l_linenumber % 3 AS md
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, r1, ab, ce, fl, sq, lg, pw, md"""))

  // ---- 6. CASE / COALESCE / NULLIF -------------------------------------
  val q06 = Q(
    "q06_case_coalesce",
    (s, d) => Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "O", "open")
        .when(col("o_orderstatus") === "F", "done")
        .otherwise("other").as("st"),
      coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("urgent-replaced")).as("pr"),
      nullif(col("o_orderstatus"), lit("P")).as("z")
    ).orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   CASE WHEN o_orderstatus = 'O' THEN 'open'
                        WHEN o_orderstatus = 'F' THEN 'done'
                        ELSE 'other' END AS st,
                   coalesce(nullif(o_orderpriority, '1-URGENT'), 'urgent-replaced') AS pr,
                   nullif(o_orderstatus, 'P') AS z
            FROM orders ORDER BY o_orderkey"""))

  // ---- 7. inner equi join + agg ----------------------------------------
  val q07 = Q(
    "q07_join_inner",
    (s, d) => Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(Det.exactSum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---- 8. multi-way join with broadcast dims ---------------------------
  val q08 = Q(
    "q08_join_multi_broadcast",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        Det.exactSumProd(col("l_extendedprice"), lit(1) - Det.dec2(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  // ---- 9. left outer join ----------------------------------------------
  val q09 = Q(
    "q09_join_left",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  // ---- 10. semi join -----------------------------------------------------
  val q10 = Q(
    "q10_join_semi",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            ORDER BY c_custkey"""))

  // ---- 11. anti join -----------------------------------------------------
  val q11 = Q(
    "q11_join_anti",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  // ---- 12. theta / range join -------------------------------------------
  // Equi key (brand) keeps this a hash join with a residual range predicate
  // — never a cartesian product (guarded by ExplainSpec).
  val q12 = Q(
    "q12_join_theta_range",
    (s, d) => {
      val p = Tables.part(s, d)
      val a = p.select(col("p_partkey").as("a_key"), col("p_brand"),
        col("p_size").as("a_size"), col("p_retailprice").as("a_price"))
      val b = p.select(col("p_partkey").as("b_key"), col("p_brand").as("b_brand"),
        col("p_size").as("b_size"), col("p_retailprice").as("b_price"))
      a.join(b, col("p_brand") === col("b_brand")
          && col("a_size") < col("b_size")
          && abs(col("a_price") - col("b_price")) < 100)
        .select(col("a_key"), col("b_key"), col("p_brand"),
          col("a_size"), col("b_size"),
          abs(col("a_price") - col("b_price")).as("price_diff"))
        .orderBy("a_key", "b_key")
    },
    Some("""SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, a.p_brand,
                   a.p_size AS a_size, b.p_size AS b_size,
                   abs(a.p_retailprice - b.p_retailprice) AS price_diff
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_size < b.p_size
             AND abs(a.p_retailprice - b.p_retailprice) < 100
            ORDER BY a_key, b_key"""))

  // ---- 13. as-of join ----------------------------------------------------
  // Event-time as-of: latest 'click' by the same user strictly before each
  // 'error'. Spark has no native as-of; the equi-join + windowed argmax is
  // the declarative form (Catalyst plans partial pushdown + one shuffle per
  // side). events.ts is ns in parquet — both engines compare at µs via the
  // session/oracle cast, so boundaries agree.
  val q13 = Q(
    "q13_join_asof",
    (s, d) => {
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("click_ts"))
      val w = Window.partitionBy(col("err_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)
      err.join(clk, col("user_id") === col("c_user") && col("click_ts") < col("err_ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("err_id"), col("user_id"), col("click_id"),
          (unix_micros(col("err_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy("err_id")
    },
    Some("""SELECT e.event_id AS err_id, e.user_id, c.event_id AS click_id,
                   epoch_us(e.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP) AS gap_us
            FROM events e JOIN events c
              ON c.user_id = e.user_id AND c.event_type = 'click'
             AND c.ts::TIMESTAMP < e.ts::TIMESTAMP
            WHERE e.event_type = 'error'
            QUALIFY row_number() OVER (PARTITION BY e.event_id
                                       ORDER BY c.ts::TIMESTAMP DESC, c.event_id DESC) = 1
            ORDER BY err_id"""))

  // ---- 14. cross join ----------------------------------------------------
  val q14 = Q(
    "q14_join_cross",
    (s, d) => Tables.nation(s, d).select("n_name")
      .crossJoin(Tables.region(s, d).select("r_name"))
      .orderBy("n_name", "r_name"),
    Some("""SELECT n_name, r_name FROM nation CROSS JOIN region
            ORDER BY n_name, r_name"""))

  // ---- 15. hash aggregation (TPC-H Q1 shape) ------------------------------
  val q15 = Q(
    "q15_agg_sum_group",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.exactSum(col("l_quantity")).as("sum_qty"),
        Det.exactSum(col("l_extendedprice")).as("sum_base"),
        Det.exactSumProd(col("l_extendedprice"), lit(1) - Det.dec2(col("l_discount"))).as("sum_disc"),
        Det.exactAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // ---- 16. distinct aggregation -------------------------------------------
  val q16 = Q(
    "q16_agg_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT l_partkey) AS n_part
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- 17. aggregation + HAVING -------------------------------------------
  val q17 = Q(
    "q17_agg_having",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") > 15)
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
            GROUP BY o_custkey HAVING count(*) > 15 ORDER BY o_custkey"""))

  // ---- 18. ROLLUP grouping sets -------------------------------------------
  val q18 = Q(
    "q18_agg_rollup",
    // Via the SQL surface (SURVEY §3.3): the DataFrame rollup+grouping()
    // combination trips Spark's ambiguous-self-join detection on the
    // Expand-duplicated grouping attributes; SQL-path resolution does not.
    // Same Catalyst plan either way; dims carry explicit broadcast hints.
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g18_customer")
      Tables.nation(s, d).createOrReplaceTempView("g18_nation")
      Tables.region(s, d).createOrReplaceTempView("g18_region")
      s.sql("""SELECT /*+ BROADCAST(g18_nation, g18_region) */
                      coalesce(r_name, 'ALL') AS r_name,
                      coalesce(n_name, 'ALL') AS n_name,
                      count(*) AS n_cust,
                      CAST(grouping(r_name) AS INT) AS gr,
                      CAST(grouping(n_name) AS INT) AS gn
               FROM g18_customer
               JOIN g18_nation ON c_nationkey = n_nationkey
               JOIN g18_region ON n_regionkey = r_regionkey
               GROUP BY ROLLUP(r_name, n_name)
               ORDER BY r_name, n_name, gr, gn""")
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   count(*) AS n_cust,
                   CAST(GROUPING(r_name) AS INT) AS gr,
                   CAST(GROUPING(n_name) AS INT) AS gn
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
            ORDER BY r_name, n_name, gr, gn"""))

  // ---- 19. CUBE grouping sets ----------------------------------------------
  val q19 = Q(
    "q19_agg_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        Det.exactSum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("gf"),
        grouping(col("l_linestatus")).cast("int").as("gs"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"), col("gf"), col("gs"))
      .orderBy("l_returnflag", "l_linestatus", "gf", "gs"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(GROUPING(l_returnflag) AS INT) AS gf,
                   CAST(GROUPING(l_linestatus) AS INT) AS gs
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus, gf, gs"""))

  // ---- 20. statistical aggregation ------------------------------------------
  val q20 = Q(
    "q20_agg_stats",
    (s, d) => Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(min(col("c_acctbal")).as("mn"), max(col("c_acctbal")).as("mx"),
        Det.exactStddev(col("c_acctbal")).as("sd"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, min(c_acctbal) AS mn, max(c_acctbal) AS mx,
                   round(sqrt((count(*)::DOUBLE
                               * CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                                          * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                               - CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                 * CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE))
                              / (count(*)::DOUBLE * (count(*)::DOUBLE - 1.0))), 4) AS sd,
                   count(*) AS n
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---- 21. window ranking -----------------------------------------------------
  private val rankW = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  val q21 = Q(
    "q21_win_rank",
    (s, d) => Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      rank().over(rankW).as("rnk"),
      dense_rank().over(rankW).as("drnk"),
      row_number().over(rankW).as("rn")
    ).orderBy("o_custkey", "o_orderkey"),
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                   rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
                   row_number() OVER w AS rn
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // ---- 22. window lag / lead ---------------------------------------------------
  val q22 = Q(
    "q22_win_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev"),
        lead(col("value"), 1).over(w).as("nxt"))
        .withColumn("delta", (Det.dec2(col("value")) - Det.dec2(col("prev"))).cast("double"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, value,
                   lag(value) OVER w AS prev, lead(value) OVER w AS nxt,
                   CAST(CAST(value AS DECIMAL(18,2))
                        - CAST(lag(value) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
            ORDER BY user_id, event_id"""))

  // ---- 23. window moving frame ---------------------------------------------------
  val q23 = Q(
    "q23_win_moving",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        sum(Det.dec2(col("value"))).over(w).cast("double").as("mov"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                     (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov
            FROM events ORDER BY user_id, event_id"""))

  // ---- 24. window cumulative -------------------------------------------------------
  val q24 = Q(
    "q24_win_cume",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(Det.dec2(col("o_totalprice"))).over(w).cast("double").as("cume"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cume
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  // ---- 25. top-k per group -----------------------------------------------------------
  val q25 = Q(
    "q25_topk_per_group",
    (s, d) => Tables.orders(s, d)
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rnk"),
    Some("""SELECT o_custkey, row_number() OVER w AS rnk, o_orderkey, o_totalprice
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
            QUALIFY rnk <= 3
            ORDER BY o_custkey, rnk"""))

  // ---- 26. multi-column sort + limit (global top-k) ------------------------------------
  val q26 = Q(
    "q26_sort_multi",
    (s, d) => Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od")),
    Some("""SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS od
            FROM orders
            ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC LIMIT 50"""))

  // ---- 27. UNION ALL + distinct aggregation --------------------------------------------
  val q27 = Q(
    "q27_set_union",
    (s, d) => Tables.supplier(s, d).select(col("s_name").as("name"))
      .unionByName(Tables.customer(s, d).select(col("c_name").as("name")))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .orderBy("name"),
    Some("""SELECT name, count(*) AS n FROM (
              SELECT s_name AS name FROM supplier
              UNION ALL
              SELECT c_name AS name FROM customer)
            GROUP BY name ORDER BY name"""))

  // ---- 28. INTERSECT ---------------------------------------------------------------------
  val q28 = Q(
    "q28_set_intersect",
    (s, d) => Tables.nation(s, d)
      .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"), "left_semi")
      .select("n_name")
      .intersect(
        Tables.nation(s, d)
          .join(Tables.supplier(s, d).filter(col("s_acctbal") > 5000),
            col("n_nationkey") === col("s_nationkey"), "left_semi")
          .select("n_name"))
      .orderBy("n_name"),
    Some("""SELECT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey
            INTERSECT
            SELECT n_name FROM nation JOIN supplier
              ON n_nationkey = s_nationkey AND s_acctbal > 5000
            ORDER BY n_name"""))

  // ---- 29. EXCEPT -------------------------------------------------------------------------
  val q29 = Q(
    "q29_set_except",
    (s, d) => Tables.nation(s, d)
      .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"), "left_semi")
      .select("n_name")
      .except(
        Tables.nation(s, d)
          .join(Tables.supplier(s, d).filter(col("s_acctbal") > 5000),
            col("n_nationkey") === col("s_nationkey"), "left_semi")
          .select("n_name"))
      .orderBy("n_name"),
    Some("""SELECT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey
            EXCEPT
            SELECT n_name FROM nation JOIN supplier
              ON n_nationkey = s_nationkey AND s_acctbal > 5000
            ORDER BY n_name"""))

  /** q63 (added r6) — FULL OUTER join, completing the join taxonomy
    * (inner/left/semi/anti/cross/theta/as-of were covered; full outer was
    * not). Negative-balance customers FULL OUTER per-customer order stats:
    * both null sides are non-empty (negative-balance customers without
    * orders; ordering customers outside the negative-balance slice).
    */
  val q63 = Q(
    "q63_join_full",
    (s, d) => {
      val negCust = Tables.customer(s, d)
        .filter(col("c_acctbal") < 0)
        .select("c_custkey", "c_name", "c_acctbal")
      val ordStats = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      negCust.join(ordStats, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"),
          col("n_orders"))
        .orderBy("custkey")
    },
    Some("""SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
                   c.c_name, o.n_orders
            FROM (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal < 0) c
            FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                             FROM orders GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey
            ORDER BY custkey"""))

  /** q64 (added r6) — correlated scalar subquery: customers above their
    * nation's average balance. Exercises Catalyst's decorrelation (the
    * subquery rewrites to an aggregate + join); issued via spark.sql so the
    * SQL subquery surface itself is what's graded.
    */
  val q64 = Q(
    "q64_scalar_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("graft_q64_customer")
      s.sql("""
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        FROM graft_q64_customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal)
                           FROM graft_q64_customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c2.c_acctbal)
                               FROM customer c2
                               WHERE c2.c_nationkey = c.c_nationkey)
            ORDER BY c_custkey"""))

  /** q65 (added r6) — UNPIVOT (melt): the inverse of q57's pivot, wide
    * per-status counts back to (priority, status, cnt) long form.
    */
  val q65 = Q(
    "q65_unpivot",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .unpivot(Array(col("o_orderpriority")),
        Array(col("o_cnt"), col("f_cnt"), col("p_cnt")),
        "status_col", "cnt")
      .orderBy("o_orderpriority", "status_col"),
    Some("""WITH wide AS (
              SELECT o_orderpriority,
                     count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
                     count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
                     count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
              FROM orders GROUP BY o_orderpriority)
            SELECT o_orderpriority, status_col, cnt
            FROM wide
            UNPIVOT (cnt FOR status_col IN (o_cnt, f_cnt, p_cnt))
            ORDER BY o_orderpriority, status_col"""))

  /** q66 (added r6) — value-based RANGE window frame: per-customer running
    * order count over the trailing 30 DAYS (event-time window, not row
    * count) — `rangeBetween` on epoch seconds, a different frame engine
    * than q23's rowsBetween.
    */
  val q66 = Q(
    "q66_win_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("n_30d", count(lit(1)).over(w))
        .select("o_orderkey", "o_custkey", "n_30d")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
                   count(*) OVER (PARTITION BY o_custkey
                                  ORDER BY epoch(o_orderdate::TIMESTAMP)
                                  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
            FROM orders ORDER BY o_orderkey"""))

  /** q62 (added r6) — exact percentiles per group: Spark's sort-based
    * `percentile` and DuckDB's `quantile_cont` share the linear-interpolation
    * definition (Hive/NIST R-7), and the inputs are ≤2-dp doubles, so the
    * interpolated values are bit-comparable; ROUND(,4) guards the one
    * division in the interpolation.
    */
  val q62 = Q(
    "q62_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                   round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q61 (added r6) — bucketized point-in-interval join: heavy lineitems
    * (quantity ≥ 49.5) inside each F-order's 7-day window, WITHOUT the
    * nested-loop product Spark plans for a bare range theta-join:
    * [[graft.ops.RangeJoin.pointInInterval]] rewrites it to a bucket
    * equi-join + residual (no-product pinned in ExplainSpec; equivalence
    * with the direct theta join pinned in PropertiesSpec).
    */
  val q61 = Q(
    "q61_range_bucket_join",
    (s, d) => {
      val pts = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 49.5)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
      val ivs = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("o_end"))
      graft.ops.RangeJoin.pointInInterval(
          pts, ivs, "l_shipdate", "o_orderdate", "o_end", 7L * 86400)
        .select("l_orderkey", "l_linenumber", "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber", "o_orderkey")
    },
    Some("""SELECT l.l_orderkey, l.l_linenumber, o.o_orderkey
            FROM lineitem l JOIN orders o
              ON l.l_quantity >= 49.5 AND o.o_orderstatus = 'F'
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            ORDER BY 1, 2, 3"""))

  /** q93 (added r8) — the SQL SURFACE: TPC-H Q3 (shipping-priority) issued
    * as SQL TEXT through `spark.sql` over temp views — every other row
    * drives the DataFrame API, so this pins that the library's tables and
    * determinism protocol survive the SQL front door unchanged (same
    * Catalyst plan space: the optimizer sees identical logical plans either
    * way). Revenue uses the exact-decimal product-sum protocol
    * (`Det.exactSumProd` written in SQL); groups are unique per l_orderkey
    * so the (revenue DESC, l_orderkey) top-10 is total-ordered.
    */
  val q93 = Q(
    "q93_sql_surface_q3",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_orderkey,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                      date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
                      o_orderpriority
               FROM customer, orders, lineitem
               WHERE c_mktsegment = 'BUILDING'
                 AND c_custkey = o_custkey
                 AND l_orderkey = o_orderkey
                 AND o_orderdate < DATE '1995-03-15'
                 AND l_shipdate > DATE '1995-03-15'
               GROUP BY l_orderkey, o_orderdate, o_orderpriority
               ORDER BY revenue DESC, l_orderkey
               LIMIT 10""")
    },
    Some("""SELECT l_orderkey,
                   (sum(l_extendedprice::DECIMAL(18,2)
                        * (1 - l_discount)::DECIMAL(18,2)))::DOUBLE AS revenue,
                   strftime(o_orderdate::TIMESTAMP, '%Y-%m-%d') AS o_date,
                   o_orderpriority
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < DATE '1995-03-15'
              AND l_shipdate > DATE '1995-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10"""))

  /** q94 (added r8) — BUCKETED co-located join: customer and orders
    * written as bucketed+sorted tables on the join key, then joined with
    * ZERO exchanges and ZERO sorts under the join — the storage-layout
    * half of shuffle elimination (the brief's "bucketing for co-located
    * joins"): at 100 TB the bucketed write is paid ONCE and every
    * subsequent join on that key reads co-located buckets instead of
    * re-shuffling the fact table per query. The merge hint keeps the plan
    * honest at graded SFs where the dimension would otherwise broadcast
    * (broadcast would hide the property being graded); output is the
    * per-segment order rollup, oracle-checked against the plain parquet
    * join.
    */
  val q94 = Q(
    "q94_bucketed_join",
    (s, d) => {
      val dir = graft.Scratch.perJvm("graft_q94_buckets")
      Tables.customer(s, d).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/customer").mode("overwrite")
        .saveAsTable("g94_customer")
      Tables.orders(s, d).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/orders").mode("overwrite")
        .saveAsTable("g94_orders")
      s.table("g94_orders").hint("merge")
        .join(s.table("g94_customer").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Det.exactSum(col("o_totalprice")).as("sum_total"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
                   (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS sum_total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** q96 (added r8) — UPSERT (merge-into) as a snapshot transform: a
    * change set (updated balances for every 7th customer, brand-new keys
    * for every 13th) merged over the base dimension — updates override,
    * inserts append, untouched rows pass through. Without a table format
    * that speaks MERGE, the Spark-native form is a FULL OUTER join on the
    * key + column-wise `coalesce` (change side wins) — one shuffle on the
    * key, and at 100 TB the same plan runs as a bucketed co-located join
    * (q94) so periodic dimension refreshes never re-shuffle the base.
    * The change-set arithmetic is exact (negation / literal zero), so the
    * oracle reproduces it bit-for-bit.
    */
  val q96 = Q(
    "q96_upsert_snapshot",
    (s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("b_key"), col("c_name").as("b_name"),
          col("c_acctbal").as("b_bal"))
      val changes = Tables.customer(s, d)
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("u_key"), col("c_name").as("u_name"),
          (-col("c_acctbal")).as("u_bal"))
        .union(Tables.customer(s, d)
          .filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 100000L).as("u_key"),
            concat(lit("new_"), col("c_name")).as("u_name"),
            lit(0.0).as("u_bal")))
      base.join(changes, col("b_key") === col("u_key"), "full_outer")
        .select(
          coalesce(col("b_key"), col("u_key")).as("c_custkey"),
          coalesce(col("u_name"), col("b_name")).as("c_name"),
          coalesce(col("u_bal"), col("b_bal")).as("c_acctbal"),
          col("u_key").isNotNull.as("was_upserted"))
        .orderBy("c_custkey")
    },
    Some("""WITH changes AS (
              SELECT c_custkey AS u_key, c_name AS u_name, -c_acctbal AS u_bal
              FROM customer WHERE c_custkey % 7 = 0
              UNION ALL
              SELECT c_custkey + 100000, 'new_' || c_name, 0.0
              FROM customer WHERE c_custkey % 13 = 0)
            SELECT coalesce(b.c_custkey, c.u_key) AS c_custkey,
                   coalesce(c.u_name, b.c_name) AS c_name,
                   coalesce(c.u_bal, b.c_acctbal) AS c_acctbal,
                   c.u_key IS NOT NULL AS was_upserted
            FROM customer b FULL OUTER JOIN changes c ON b.c_custkey = c.u_key
            ORDER BY c_custkey"""))

  /** q97 (added r8) — GROUPING SETS with `grouping_id`: the explicit-sets
    * form that completes the grouped-aggregation family (q18 ROLLUP, q19
    * CUBE) — per (status, priority), per status, and grand total in ONE
    * pass (Spark expands the sets into a single Expand + aggregation, one
    * shuffle, not three queries). NULL group keys are coalesced to 'ALL'
    * so the output ordering never touches engine NULL-sort defaults.
    */
  val q97 = Q(
    "q97_grouping_sets",
    (s, d) => Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice")).as("sum_total"))
      .select(col("gid"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_total"))
      .orderBy("gid", "status", "priority"),
    Some("""SELECT grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
                   coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n_orders,
                   (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS sum_total
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                    (o_orderstatus), ())
            ORDER BY gid, status, priority"""))

  /** q98 (added r8, re-rendered r9) — deterministic ARRAY aggregation:
    * per-region sorted list of nation names — `collect_list` is
    * order-nondeterministic under parallelism, so the library's contract
    * is `sort_array` ON TOP of the collection (the only reproducible
    * form). The sorted array is string-rendered with `array_join` for the
    * output (q110's proven grading pattern): the collection/sort still
    * exercises the array-typed ObjectHashAggregate path internally, while
    * the graded cell is a scalar the oracle comparator can sort and hash.
    */
  val q98 = Q(
    "q98_array_agg",
    (s, d) => Tables.nation(s, d)
      .groupBy("n_regionkey")
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey,
                   array_to_string(list_sort(list(n_name)), ',') AS nations,
                   count(*) AS n
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** q108 (added r8) — CORRELATED EXISTS / NOT EXISTS subqueries: customers
    * with at least one large finished order but no urgent order, issued as
    * SQL so the CORRELATED-PREDICATE surface is graded (q64 covers the
    * scalar-subquery form, q93 plain joins). Catalyst DECORRELATES both
    * predicates — `RewritePredicateSubquery` turns EXISTS into a left-SEMI
    * and NOT EXISTS into a left-ANTI hash join on o_custkey — so nothing
    * executes per-row: the plan is two equi-joins that broadcast or
    * shuffle like any other (ExplainSpec-pinned: no nested-loop, no
    * per-row subquery). At 100 TB the EXISTS side is pre-filtered before
    * the join, so the semi/anti probe carries only qualifying orders.
    */
  val q108 = Q(
    "q108_exists_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g108_customer")
      Tables.orders(s, d).createOrReplaceTempView("g108_orders")
      s.sql("""SELECT c_custkey, c_mktsegment, c_acctbal
               FROM g108_customer c
               WHERE EXISTS (SELECT 1 FROM g108_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderstatus = 'F'
                               AND o.o_totalprice > 150000)
                 AND NOT EXISTS (SELECT 1 FROM g108_orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT')
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice > 150000)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** q111 (added r8) — NULL-SAFE equality join (`<=>` / IS NOT DISTINCT
    * FROM): the corpus is NULL-free, so NULL keys are derived with
    * `nullif` on both sides (every 5th residue class) and the join must
    * match NULL with NULL — the semantics plain `=` silently drops.
    * Spark plans `<=>` as an ordinary EqualNullSafe hash-join key (same
    * shuffle/broadcast machinery, ExplainSpec-pinned: no nested-loop), so
    * the null-bucket caveat at scale is explicit: all NULL keys co-locate
    * in one partition — fine for dimension-sized sides like here; a
    * fact-fact null-safe join would pre-split the NULL class instead.
    */
  val q111 = Q(
    "q111_nullsafe_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(nullif(col("c_nationkey") % 5, lit(4)).as("ck"),
          col("c_custkey"))
      val supp = Tables.supplier(s, d)
        .select(nullif(col("s_nationkey") % 5, lit(4)).as("sk"),
          col("s_suppkey"))
      cust.join(supp, col("ck") <=> col("sk"))
        .groupBy(coalesce(col("ck"), lit(-1)).as("key_class"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("c_custkey")).as("n_cust"),
          countDistinct(col("s_suppkey")).as("n_supp"))
        .orderBy("key_class")
    },
    Some("""SELECT coalesce(ck, -1) AS key_class, count(*) AS n_pairs,
                   count(DISTINCT c_custkey) AS n_cust,
                   count(DISTINCT s_suppkey) AS n_supp
            FROM (SELECT nullif(c_nationkey % 5, 4) AS ck, c_custkey FROM customer) c
            JOIN (SELECT nullif(s_nationkey % 5, 4) AS sk, s_suppkey FROM supplier) s
              ON c.ck IS NOT DISTINCT FROM s.sk
            GROUP BY 1 ORDER BY key_class"""))

  /** q112 (added r8) — EQUI-WIDTH HISTOGRAM profiling: o_totalprice in
    * fixed 20,000-wide buckets with explicit floor arithmetic (2-dp
    * doubles divide and floor IEEE-identically on both engines — no
    * engine-specific width_bucket). One partial+final agg over one scan:
    * the map side compacts to O(buckets) rows per partition before the
    * only shuffle, so the profile of a 100 TB column costs a scan plus a
    * bucket-count-sized exchange — the data-profiling pass that sizes
    * range partitioners and spots value skew before a big sort/join.
    */
  val q112 = Q(
    "q112_histogram",
    (s, d) => Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 20000).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        Det.exactSum(col("o_totalprice")).as("sum_price"))
      .select((col("bucket") * 20000L).as("bucket_lo"), col("n_orders"),
        col("sum_price"))
      .orderBy("bucket_lo"),
    Some("""SELECT (floor(o_totalprice / 20000)::INT * 20000)::BIGINT AS bucket_lo,
                   count(*) AS n_orders,
                   (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS sum_price
            FROM orders GROUP BY 1 ORDER BY bucket_lo"""))

  /** q117 (added r8) — WINSORIZED robust statistics: per-returnflag
    * l_extendedprice clamped at the 2-dp-ROUNDED p05/p95 (q62's exact
    * percentile machinery; rounding the bounds keeps every clamped value
    * ≤2 dp so [[graft.Det]]'s exact-decimal sums still apply — declared
    * semantics, not a shortcut), then raw vs winsorized means + clamp
    * counts — the outlier-robust aggregation a metrics pipeline runs when
    * a few fat-finger values would otherwise move a mean. Scale: the
    * percentile relation is GROUP-sized (one row per flag) and broadcasts
    * back onto the fact scan; two aggregations total, both partial+final.
    */
  val q117 = Q(
    "q117_winsorize",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val pct = li.groupBy("l_returnflag").agg(
        round(expr("percentile(l_extendedprice, 0.05)"), 2).as("lo"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("hi"))
      li.join(broadcast(pct), "l_returnflag")
        .withColumn("w",
          least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L))
            .as("n_clamped_lo"),
          sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L))
            .as("n_clamped_hi"),
          Det.exactAvg(col("l_extendedprice")).as("mean_raw"),
          Det.exactAvg(col("w")).as("mean_winsor"),
          first(col("lo")).as("p05"), first(col("hi")).as("p95"))
        .orderBy("l_returnflag")
    },
    Some("""WITH pct AS (
              SELECT l_returnflag,
                     round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
                     round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
              FROM lineitem GROUP BY l_returnflag)
            SELECT l.l_returnflag, count(*) AS n,
                   sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)::BIGINT AS n_clamped_lo,
                   sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)::BIGINT AS n_clamped_hi,
                   ROUND(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 4) AS mean_raw,
                   ROUND(sum(least(greatest(l_extendedprice, lo), hi)::DECIMAL(18,2))::DOUBLE
                         / count(*), 4) AS mean_winsor,
                   any_value(lo) AS p05, any_value(hi) AS p95
            FROM lineitem l JOIN pct USING (l_returnflag)
            GROUP BY l.l_returnflag ORDER BY l.l_returnflag"""))

  /** q120 (added r8) — window VALUE functions with explicit frames:
    * first_value (running frame), last_value and nth_value(2) (full
    * frame) of each customer's order prices in date order — the frame
    * surface q21–q26 left uncovered (rank/offset/moving/cume are pinned
    * there; value-extraction frames complete the window family).
    * last_value's default frame (… AND CURRENT ROW) is the classic
    * footgun — the explicit UNBOUNDED FOLLOWING frame here is the
    * declared semantics. One shuffle on o_custkey serves all three
    * windows (same partitioning + ordering → one Window node).
    */
  val q120 = Q(
    "q120_win_value_fns",
    (s, d) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = byCust.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_totalprice")).over(byCust).as("first_price"),
          last(col("o_totalprice")).over(full).as("last_price"),
          coalesce(nth_value(col("o_totalprice"), 2).over(full), lit(-1.0))
            .as("second_price"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
                   first_value(o_totalprice) OVER w AS first_price,
                   last_value(o_totalprice) OVER
                     (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                     AS last_price,
                   coalesce(nth_value(o_totalprice, 2) OVER
                     (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                     -1.0) AS second_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_orderkey"""))

  /** q124 (added r8) — CONVERSION FUNNEL: view → click (≤6 h after the
    * first view) → purchase (≤6 h after that click) per user, counted per
    * stage with the step conversion rate — the ordered-sequence analytics
    * every event warehouse runs (at sf0.01: 150 → 19 → 1, so the window
    * genuinely discriminates; an unbounded chain trivially passes
    * everyone on this dense corpus). Each stage is one filtered scan
    * joined on user_id to the previous-stage relation, then a user-keyed
    * min agg — stage depth adds scans, never fact-fact shuffles. The
    * stage relations shrink monotonically but start user-sized, so the
    * join is deliberately UNHINTED: AQE broadcasts them at graded SFs
    * and falls back to a keyed shuffle when the user population is too
    * big to ship — forcing broadcast here would be the 100 TB mistake.
    */
  val q124 = Q(
    "q124_funnel_stages",
    (s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("interval 6 hours"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("interval 6 hours"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      val nv = v.agg(count(lit(1)).as("n")).select(
        lit(1).as("stage_id"), lit("view").as("stage"), col("n"))
      val nc = c.agg(count(lit(1)).as("n")).select(
        lit(2).as("stage_id"), lit("click").as("stage"), col("n"))
      val np = p.agg(count(lit(1)).as("n")).select(
        lit(3).as("stage_id"), lit("purchase").as("stage"), col("n"))
      nv.union(nc).union(np)
        .withColumn("conv_from_first",
          round(col("n").cast("double") /
            first(col("n")).over(Window.orderBy("stage_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6))
        .orderBy("stage_id")
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                       WHERE event_type = 'view' GROUP BY 1),
                 c AS (SELECT e.user_id, min(ts) AS t_click
                       FROM events e JOIN v USING (user_id)
                       WHERE event_type = 'click' AND ts > t_view
                         AND ts <= t_view + INTERVAL '6 hours' GROUP BY 1),
                 p AS (SELECT e.user_id, min(ts) AS t_purchase
                       FROM events e JOIN c USING (user_id)
                       WHERE event_type = 'purchase' AND ts > t_click
                         AND ts <= t_click + INTERVAL '6 hours' GROUP BY 1),
                 st AS (
                   SELECT 1 AS stage_id, 'view' AS stage, (SELECT count(*) FROM v) AS n
                   UNION ALL
                   SELECT 2, 'click', (SELECT count(*) FROM c)
                   UNION ALL
                   SELECT 3, 'purchase', (SELECT count(*) FROM p))
            SELECT stage_id, stage, n,
                   ROUND(n::DOUBLE / first_value(n) OVER (ORDER BY stage_id), 6)
                     AS conv_from_first
            FROM st ORDER BY stage_id"""))

  /** q125 (added r8) — SCD2 VALIDITY INTERVALS: each customer's order
    * stream turned into a type-2 slowly-changing timeline — every order
    * opens an interval `[o_orderdate, next order's date)`, the latest
    * stays open (NULL → 9999-12-31 sentinel, `is_current` flag) — the
    * temporal-dimension build every warehouse runs to answer "what was
    * the state as of T". One window (lead) over one shuffle on the
    * natural key; interval correctness needs no self-join.
    */
  val q125 = Q(
    "q125_scd2_intervals",
    (s, d) => {
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(byCust))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
          date_format(coalesce(col("next_date"),
            lit("9999-12-31").cast("timestamp")), "yyyy-MM-dd").as("valid_to"),
          col("next_date").isNull.as("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderstatus,
                   strftime(o_orderdate::TIMESTAMP, '%Y-%m-%d') AS valid_from,
                   strftime(coalesce(
                     lead(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                     TIMESTAMP '9999-12-31')::TIMESTAMP, '%Y-%m-%d') AS valid_to,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey)
                     IS NULL AS is_current
            FROM orders
            ORDER BY o_custkey, valid_from, o_orderkey"""))

  /** q128 (added r8) — BENFORD first-digit audit: the first significant
    * digit of o_totalprice vs Benford's log10(1+1/d) expectation — the
    * fraud/synthetic-data screen auditors run on naturally-grown numeric
    * columns. On THIS corpus it fires loudly (digits 1–4 near-uniform at
    * ~22% each, 5–9 at ~2% — the generator's uniform ranges, nothing like
    * Benford), which is the point: the audit detects manufactured
    * distributions. First digit extracted via the exact DECIMAL(18,2)
    * string rendering ("1013.70" on both engines) — no float log/pow at
    * digit boundaries; one partial+final agg + a 1-row broadcast total.
    */
  val q128 = Q(
    "q128_benford_audit",
    (s, d) => {
      val digits = Tables.orders(s, d)
        .select(substring(col("o_totalprice").cast("decimal(18,2)")
          .cast("string"), 1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      val tot = digits.agg(sum(col("n_orders")).cast("double").as("n_total"))
      digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("n_orders"),
          round(col("n_orders").cast("double") / col("n_total"), 6).as("share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("benford_share"),
          round(col("n_orders").cast("double") / col("n_total")
            - log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("deviation"))
        .orderBy("digit")
    },
    Some("""WITH g AS (
              SELECT substr((o_totalprice::DECIMAL(18,2))::VARCHAR, 1, 1) AS digit,
                     count(*) AS n_orders
              FROM orders GROUP BY 1),
            tot AS (SELECT sum(n_orders)::DOUBLE AS n_total FROM g)
            SELECT digit, n_orders,
                   round(n_orders::DOUBLE / n_total, 6) AS share,
                   round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS benford_share,
                   round(n_orders::DOUBLE / n_total
                         - log10(1.0 + 1.0 / digit::DOUBLE), 6) AS deviation
            FROM g CROSS JOIN tot ORDER BY digit"""))

  /** q131 (added r8) — BLOOM-FILTERED JOIN PRUNING
    * ([[graft.ops.BloomJoin]]): lineitem pruned by a bloom filter built
    * over urgent orders' keys BEFORE the exact equi-join — the pattern
    * that cuts a 100 TB probe-side scan down to near-matching rows before
    * any shuffle. The bitmap is a partial+final `bit_or` aggregation
    * (state ≤ numBits/64 words at any key count) collapsed to ONE row and
    * broadcast; membership is a pure codegen projection. No false
    * negatives (BloomJoinSpec), so the exact join downstream makes the
    * result — and the oracle — identical to the unpruned join.
    */
  val q131 = Q(
    "q131_bloom_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val bloom = graft.ops.BloomJoin.build(
        urgent.select("o_orderkey"), "o_orderkey")
      val pruned = graft.ops.BloomJoin.prune(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
        "l_orderkey", bloom)
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_items"),
          Det.exactSum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_year")
    },
    Some("""SELECT year(o_orderdate) AS o_year, count(*) AS n_items,
                   (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1 ORDER BY 1"""))

  /** q133 (added r8) — JOIN-KEY SKEW DIAGNOSIS: the audit a pipeline runs
    * BEFORE choosing a shuffle strategy ([[graft.ops.Salting]] exists for
    * when this report says so). Per-key counts of lineitem's supplier key
    * reduce to one summary row: key count, max/min/avg multiplicity, the
    * max-over-avg skew ratio, and how many keys exceed 1.5× the mean —
    * the hot-key predicate kept in exact integers
    * (`2·cnt·n_keys > 3·n_rows`), so no float compare decides hotness
    * differently across engines. Two partial+final aggregations, both
    * over the group-sized key relation.
    */
  val q133 = Q(
    "q133_skew_diagnosis",
    (s, d) => {
      val perKey = Tables.lineitem(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val tot = perKey.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"))
      perKey.crossJoin(broadcast(tot))
        .groupBy("n_keys", "n_rows")
        .agg(max(col("cnt")).as("max_cnt"), min(col("cnt")).as("min_cnt"),
          sum(when(col("cnt") * 2 * col("n_keys") > col("n_rows") * 3, 1)
            .otherwise(0)).as("n_hot_keys"))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"), col("min_cnt"),
          round(col("n_rows").cast("double") / col("n_keys"), 6).as("avg_cnt"),
          round(col("max_cnt").cast("double") * col("n_keys")
            / col("n_rows"), 6).as("max_over_avg"),
          col("n_hot_keys"))
    },
    Some("""WITH k AS (SELECT l_suppkey, count(*) AS cnt
                       FROM lineitem GROUP BY 1),
                 t AS (SELECT count(*) AS n_keys, sum(cnt)::BIGINT AS n_rows
                       FROM k)
            SELECT n_keys, n_rows, max(cnt) AS max_cnt, min(cnt) AS min_cnt,
                   round(n_rows::DOUBLE / n_keys, 6) AS avg_cnt,
                   round(max(cnt)::DOUBLE * n_keys / n_rows, 6) AS max_over_avg,
                   sum(CASE WHEN cnt * 2 * n_keys > n_rows * 3
                       THEN 1 ELSE 0 END)::BIGINT AS n_hot_keys
            FROM k CROSS JOIN t GROUP BY n_keys, n_rows"""))

  /** q134 (added r8) — LAG-1 AUTOCORRELATION of the daily revenue series:
    * the time-series health check (is yesterday predictive of today?)
    * behind trend monitoring and anomaly baselining. Pearson r over
    * (dayₜ, dayₜ₋₁) pairs with EVERY sum kept exact: daily revenues are
    * exact DECIMAL(18,2) sums, their pairwise products are 4-dp-exact
    * decimals, and the correlation is one fixed IEEE sequence over six
    * exact sums ([[graft.Det.exactStddev]]'s discipline — a raw
    * `corr(double)` would be summation-order-dependent and hash-unstable
    * across engines/parallelism). The lag window runs over the
    * GROUP-SIZED daily relation (~2.4 k rows at any SF), never the fact
    * table.
    */
  val q134 = Q(
    "q134_autocorr_daily",
    (s, d) => {
      // re-narrow the exact sum to (18,2): sum() widens to decimal(28,2),
      // whose self-product would overflow precision 38 and rescale lossily;
      // daily totals sit far below 10^16 so the narrow cast is exact
      val daily = Tables.orders(s, d)
        .groupBy("o_orderdate")
        .agg(sum(Det.dec2(col("o_totalprice"))).cast("decimal(18,2)").as("rev"))
      val w = Window.orderBy("o_orderdate")
      val pairs = daily
        .select(col("rev").as("x"), lag(col("rev"), 1).over(w).as("y"))
        .filter(col("y").isNotNull)
      val agg = pairs.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      agg.select(col("n").cast("bigint").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("autocorr_lag1"))
    },
    Some("""WITH daily AS (
              SELECT o_orderdate AS d,
                     sum(o_totalprice::DECIMAL(18,2))::DECIMAL(18,2) AS rev
              FROM orders GROUP BY 1),
            p AS (SELECT rev AS x, rev::DECIMAL(19,2) AS xw,
                         lag(rev) OVER (ORDER BY d) AS y,
                         lag(rev) OVER (ORDER BY d)::DECIMAL(19,2) AS yw
                  FROM daily),
            -- one factor widened to DECIMAL(19,2): at sf>=0.1 daily totals
            -- pass 10^9 and DuckDB's (18,2)x(18,2) int64 multiply path
            -- overflows; p>18 forces the int128 path, 19+18 stays <= 38
            a AS (SELECT count(*)::DOUBLE AS n,
                         sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
                         sum(xw * y)::DOUBLE AS sxy,
                         sum(xw * x)::DOUBLE AS sxx,
                         sum(yw * y)::DOUBLE AS syy
                  FROM p WHERE y IS NOT NULL)
            SELECT n::BIGINT AS n_pairs,
                   round((n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                     AS autocorr_lag1
            FROM a"""))

  /** q141 (added r9) — DATA-QUALITY CONSTRAINT AUDIT (the Deequ pattern):
    * declared constraints over a table — completeness of o_orderpriority, key uniqueness, a
    * range predicate, a value-domain predicate — evaluated in ONE corpus
    * pass (a single aggregation computes every check's counters; the
    * checks then unpivot into an audit row each), so auditing 100 TB
    * costs one scan regardless of how many constraints are declared —
    * never one job per check. Output: `(check_name, metric, passed)` —
    * the table a pipeline gates ingestion on. Determinism: metrics are
    * exact-count ratios ROUND(,6); `passed` is integer count equality.
    */
  val q141 = Q(
    "q141_constraint_audit",
    (s, d) => {
      val a = Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("nn_prio"),
        countDistinct(col("o_orderkey")).as("d_key"),
        sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).as("pos_price"),
        sum(when(col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
          .as("dom_status"))
      a.select(explode(array(
          struct(lit("completeness_o_orderpriority").as("check_name"),
            round(col("nn_prio").cast("double") / col("n"), 6).as("metric"),
            (col("nn_prio") === col("n")).as("passed")),
          struct(lit("domain_o_orderstatus").as("check_name"),
            round(col("dom_status").cast("double") / col("n"), 6).as("metric"),
            (col("dom_status") === col("n")).as("passed")),
          struct(lit("range_o_totalprice_positive").as("check_name"),
            round(col("pos_price").cast("double") / col("n"), 6).as("metric"),
            (col("pos_price") === col("n")).as("passed")),
          struct(lit("uniqueness_o_orderkey").as("check_name"),
            round(col("d_key").cast("double") / col("n"), 6).as("metric"),
            (col("d_key") === col("n")).as("passed")))).as("c"))
        .select(col("c.check_name"), col("c.metric"), col("c.passed"))
        .orderBy("check_name")
    },
    Some("""WITH a AS (
              SELECT count(*) AS n,
                     count(o_orderpriority) AS nn_prio,
                     count(DISTINCT o_orderkey) AS d_key,
                     count(*) FILTER (WHERE o_totalprice > 0) AS pos_price,
                     count(*) FILTER (WHERE o_orderstatus IN ('F','O','P')) AS dom_status
              FROM orders)
            SELECT 'completeness_o_orderpriority' AS check_name,
                   round(nn_prio::DOUBLE / n, 6) AS metric,
                   nn_prio = n AS passed FROM a
            UNION ALL
            SELECT 'domain_o_orderstatus', round(dom_status::DOUBLE / n, 6),
                   dom_status = n FROM a
            UNION ALL
            SELECT 'range_o_totalprice_positive', round(pos_price::DOUBLE / n, 6),
                   pos_price = n FROM a
            UNION ALL
            SELECT 'uniqueness_o_orderkey', round(d_key::DOUBLE / n, 6),
                   d_key = n FROM a
            ORDER BY check_name"""))

  /** q142 (added r9) — CDC SNAPSHOT DIFF: derive the change set BETWEEN
    * two snapshot versions — the inverse of q96/q140 (which APPLY a known
    * change batch, this RECOVERS one): a full-outer join on the key
    * classifies every row as insert (new only), delete (old only), or
    * update (both, any tracked column differing); unchanged rows drop
    * out. The synthetic new snapshot deletes every 11th customer, negates
    * every remaining 7th balance, and inserts a key-shifted copy of every
    * 13th — the diff must recover exactly those. At 100 TB the column
    * comparison rides a content hash (xxhash64 of the tracked columns)
    * computed in the scan projection; the graded form compares the
    * columns directly so the oracle is engine-portable. One shuffle on
    * the key (or zero with q94's bucketed layout).
    */
  val q142 = Q(
    "q142_snapshot_diff",
    (s, d) => {
      val old = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_name").as("o_name"),
          col("c_acctbal").as("o_bal"))
      val neu = Tables.customer(s, d)
        .filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey").as("key"), col("c_name").as("n_name"),
          when(col("c_custkey") % 7 === 0, -col("c_acctbal"))
            .otherwise(col("c_acctbal")).as("n_bal"))
        .union(Tables.customer(s, d)
          .filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 200000L).as("key"),
            concat(lit("copy_"), col("c_name")).as("n_name"),
            col("c_acctbal").as("n_bal")))
      old.join(neu, Seq("key"), "full_outer")
        .withColumn("change_type",
          when(col("o_name").isNull, lit("insert"))
            .when(col("n_name").isNull, lit("delete"))
            .when(col("o_name") =!= col("n_name") ||
              col("o_bal") =!= col("n_bal"), lit("update")))
        .filter(col("change_type").isNotNull)
        .select(col("change_type"), col("key").as("c_custkey"))
        .orderBy("change_type", "c_custkey")
    },
    Some("""WITH old AS (
              SELECT c_custkey AS key, c_name AS o_name, c_acctbal AS o_bal
              FROM customer),
            neu AS (
              SELECT c_custkey AS key, c_name AS n_name,
                     CASE WHEN c_custkey % 7 = 0 THEN -c_acctbal
                          ELSE c_acctbal END AS n_bal
              FROM customer WHERE c_custkey % 11 <> 0
              UNION ALL
              SELECT c_custkey + 200000, 'copy_' || c_name, c_acctbal
              FROM customer WHERE c_custkey % 13 = 0)
            SELECT CASE WHEN o_name IS NULL THEN 'insert'
                        WHEN n_name IS NULL THEN 'delete'
                        WHEN o_name <> n_name OR o_bal <> n_bal THEN 'update'
                   END AS change_type,
                   key AS c_custkey
            FROM old FULL OUTER JOIN neu USING (key)
            WHERE CASE WHEN o_name IS NULL THEN 'insert'
                       WHEN n_name IS NULL THEN 'delete'
                       WHEN o_name <> n_name OR o_bal <> n_bal THEN 'update'
                  END IS NOT NULL
            ORDER BY change_type, c_custkey"""))

  def all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q61, q62, q63,
    q64, q65, q66, q93, q94, q96, q97, q98, q108, q111, q112, q117, q120,
    q124, q125, q128, q131, q133, q134, q141, q142)
}
