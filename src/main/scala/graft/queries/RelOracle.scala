package graft.queries

/** DuckDB oracle SQL for [[Rel]] — ANSI SQL the driver runs on the same
  * parquet tables. Column names/aliases and ORDER BY mirror the Spark side
  * exactly (the driver sorts columns by name before hashing).
  *
  * Dialect parity notes (verified against DuckDB 1.0):
  *  - `epoch_us(ts)` ≡ Spark `ts div 1000` on the nanosAsLong long (both
  *    truncate ns → µs);
  *  - `sum(INTEGER)` is HUGEINT in DuckDB → always CAST to BIGINT;
  *  - DuckDB default null ordering is NULLS LAST; Spark ASC is NULLS
  *    FIRST → final ORDER BY uses only non-null key columns;
  *  - both engines `round()` doubles half-away-from-zero and emit
  *    lowercase `md5`/`hex`.
  */
object RelOracle {

  val all: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "agg_count_distinct" ->
      """SELECT o_orderpriority,
         count(DISTINCT o_custkey) AS n_cust,
         count(DISTINCT o_orderstatus) AS n_status,
         count(*) AS n_orders,
         count(DISTINCT o_custkey) * count(DISTINCT o_orderstatus) AS complexity
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_stats" ->
      """SELECT l_returnflag,
         round(stddev_samp(l_extendedprice), 4) AS sd_price,
         round(var_samp(l_quantity), 4) AS var_qty,
         round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the sketch side carries the exact count plus a pinned accuracy
    // boolean (|HLL − exact| <= 10% · exact) — the oracle asserts the
    // bound holds by expecting true, the recall-gate pattern
    "agg_approx_distinct" ->
      """SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
         true AS within_10pct
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_exists" ->
      """WITH flags AS (
           SELECT l_orderkey, max(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS has_big
           FROM lineitem GROUP BY l_orderkey)
         SELECT o_orderpriority,
         CAST(sum(coalesce(has_big, 0)) AS BIGINT) AS n_with_big,
         count(*) AS n_orders
         FROM orders LEFT JOIN flags ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_forall" ->
      """WITH f AS (
           SELECT l_orderkey, min(CASE WHEN l_discount < 0.08 THEN 1 ELSE 0 END) AS all_low_disc
           FROM lineitem GROUP BY l_orderkey)
         SELECT o_orderstatus,
         CAST(sum(all_low_disc) AS BIGINT) AS n_all_low,
         count(*) AS n_orders
         FROM orders JOIN f ON o_orderkey = l_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "agg_sorted_collect" ->
      """SELECT l_orderkey,
         string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS parts_in_line_order,
         count(*) AS n_items
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",

    "agg_distinct" ->
      """SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
         FROM customer ORDER BY c_mktsegment, c_nationkey""",

    "agg_dedup_rows" ->
      """SELECT user_id, event_type, first_event FROM (
           SELECT user_id, event_type, event_id AS first_event,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts), event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",

    "proj_filter" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
         round(l_extendedprice * 0.9, 3) AS discounted,
         'R' AS tag
         FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",

    "proj_case_when" ->
      """SELECT CASE WHEN p_size < 10 THEN 'small'
                     WHEN p_size < 30 THEN 'medium'
                     ELSE 'large' END AS size_class,
         p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
         FROM part GROUP BY size_class, p_brand ORDER BY size_class, p_brand""",

    "proj_null_fill" ->
      """SELECT o_orderstatus,
         count(CASE WHEN o_totalprice > 200000 THEN o_totalprice END) AS n_big,
         round(sum(coalesce(CASE WHEN o_totalprice > 200000 THEN o_totalprice END, 0)), 2) AS sum_big,
         count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "proj_isin_compound" ->
      """SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS c_acctbal
         FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
           AND (c_acctbal > 9000 OR c_nationkey = 3 OR c_custkey % 100 = 0)
         ORDER BY c_custkey""",

    "fn_datetime" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS reparsed_us,
         CAST(hour(ts) AS BIGINT) AS h,
         strftime(ts, '%Y-%m-%d') AS day
         FROM events ORDER BY event_id""",

    "fn_concat" ->
      """SELECT o_orderkey,
         concat_ws('_', o_custkey, o_orderstatus, o_orderpriority) AS composite_key
         FROM orders ORDER BY o_orderkey""",

    "fn_haversine" ->
      """WITH c AS (SELECT c_custkey,
             (c_custkey % 120) * 0.5 - 30 AS clat,
             (c_custkey % 300) * 0.6 - 90 AS clng, c_nationkey FROM customer),
         s AS (SELECT s_suppkey,
             (s_suppkey % 120) * 0.7 - 30 AS slat,
             (s_suppkey % 300) * 0.9 - 90 AS slng, s_nationkey FROM supplier)
         SELECT c_custkey, s_suppkey,
         round(2 * 6371000 * asin(least(1.0, sqrt(
           pow(sin(radians(slat - clat) / 2), 2) +
           cos(radians(clat)) * cos(radians(slat)) * pow(sin(radians(slng - clng) / 2), 2)
         ))) / 1000.0, 1) AS dist_km
         FROM c JOIN s ON c_nationkey = s_nationkey
         ORDER BY c_custkey, s_suppkey""",

    "join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 49)
         ORDER BY o_orderkey""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q5_multi_join" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "join_broadcast_dims" ->
      """SELECT r_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "join_left_outer" ->
      """WITH oc AS (SELECT o_custkey, count(*) AS cnt,
                     round(sum(o_totalprice), 2) AS spent
                     FROM orders GROUP BY o_custkey)
         SELECT c_custkey, coalesce(cnt, 0) AS n_orders,
         coalesce(spent, 0.0) AS total_spent
         FROM customer LEFT JOIN oc ON c_custkey = o_custkey
         ORDER BY c_custkey""",

    "join_composite_key" ->
      """WITH last_line AS (SELECT l_orderkey, max(l_linenumber) AS l_linenumber
                            FROM lineitem GROUP BY l_orderkey)
         SELECT li.l_orderkey, CAST(li.l_linenumber AS BIGINT) AS last_linenumber,
         round(li.l_extendedprice, 2) AS last_price
         FROM lineitem li JOIN last_line ll
           ON li.l_orderkey = ll.l_orderkey AND li.l_linenumber = ll.l_linenumber
         ORDER BY li.l_orderkey""",

    "join_theta_pairs" ->
      """SELECT CAST(a.s_nationkey AS BIGINT) AS nationkey,
         a.s_suppkey AS k1, b.s_suppkey AS k2,
         round(abs(a.s_acctbal - b.s_acctbal), 2) AS bal_gap
         FROM supplier a JOIN supplier b
           ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
         ORDER BY nationkey, k1, k2""",

    "win_lag_lead" ->
      """SELECT event_id, user_id, value,
         coalesce(lag(value) OVER w, -1.0) AS prev_value,
         coalesce(lead(value) OVER w, -1.0) AS next_value,
         coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY event_id""",

    "win_argmax" ->
      """SELECT user_id, top_event, top_value FROM (
           SELECT user_id, event_id AS top_event, value AS top_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",

    "win_running_sum" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER w, 2) AS running_value,
         count(*) OVER w AS running_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // time-based RANGE frame: trailing-hour count per user; peers share
    // the frame by RANGE semantics in both engines, outputs all integer
    "win_rolling_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         count(*) OVER w AS n_1h,
         min(event_id) OVER w AS first_in_frame
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "win_fill" ->
      """SELECT event_id, user_id,
         coalesce(last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS ffill,
         coalesce(first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), -1.0) AS bfill
         FROM (SELECT *, CASE WHEN event_type <> 'error' THEN value END AS v
               FROM events)
         ORDER BY event_id""",

    "win_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT *, CAST(sum(brk) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
         max(ts_us) - min(ts_us) AS duration_us,
         round(sum(value), 2) AS session_value
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    // hopping windows: L = 600s, S = 300s, epoch-aligned — every event's
    // two covering windows start at floor(t/S)*S and floor(t/S)*S - S
    "win_hopping" ->
      """WITH w AS (
           SELECT ((epoch_us(ts) // 300000000) - k) * 300000000
                    AS window_start_us,
             user_id, value
           FROM events, unnest([0, 1]) t(k))
         SELECT window_start_us, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS value_sum
         FROM w GROUP BY window_start_us ORDER BY window_start_us""",

    "win_session_window" ->
      """WITH g AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
         sess AS (
           SELECT *, sum(brk) OVER (
             PARTITION BY user_id ORDER BY ts_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events
         FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_us""",

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
         coalesce(l_linestatus, 'ALL') AS l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",

    "fn_json" ->
      """SELECT event_type,
         CAST(sum(k) AS BIGINT) AS sum_k,
         CAST(sum(k) AS BIGINT) AS sum_k_path,
         max(k) AS max_k,
         count(k) AS n_parsed
         FROM (SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
         GROUP BY event_type ORDER BY event_type""",

    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
         coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
         count(*) AS n,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus, o_orderpriority""",

    "agg_pivot" ->
      """SELECT user_id,
         count(*) FILTER (event_type = 'click') AS click,
         count(*) FILTER (event_type = 'error') AS error,
         count(*) FILTER (event_type = 'purchase') AS purchase,
         count(*) FILTER (event_type = 'signup') AS signup,
         count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "agg_unpivot" ->
      """SELECT p_partkey, measure, value FROM (
           SELECT p_partkey, 'size' AS measure,
             CAST(p_size AS DOUBLE) AS value FROM part
           UNION ALL
           SELECT p_partkey, 'retailprice', round(p_retailprice, 2) FROM part)
         WHERE p_partkey % 40 = 0 ORDER BY p_partkey, measure""",

    "scalar_subquery" ->
      """SELECT l_returnflag, count(*) AS n_above
         FROM lineitem
         WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "win_range_frame" ->
      """SELECT event_id, user_id,
           count(*) OVER w AS n_30m,
           max(value) OVER w AS max_30m
         FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "win_rank_ntile" ->
      """SELECT user_id, event_id, rnk, drnk, quartile FROM (
           SELECT user_id, event_id,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w AS quartile
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id))
         WHERE rnk <= 8 ORDER BY user_id, rnk, event_id""",

    "gen_explode" ->
      """SELECT o_orderkey, CAST(i - 1 AS BIGINT) AS pos, i
         FROM orders, unnest(range(1, o_orderkey % 5 + 2)) AS t(i)
         WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey, pos""",

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
         count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""",

    "sql_text_rollup" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // the same correlated-subquery text DuckDB de-correlates identically
    "sql_correlated_exists" ->
      """SELECT o_orderstatus,
         CASE WHEN EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey
                             AND l_discount > 0.09)
              THEN 'deep' ELSE 'shallow' END AS discount_band,
         NOT EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_returnflag = 'R') AS return_free,
         count(*) AS n_orders,
         round(sum((SELECT coalesce(max(l_discount), 0.0)
                    FROM lineitem
                    WHERE l_orderkey = o_orderkey)), 2) AS sum_max_disc
         FROM orders
         GROUP BY o_orderstatus, discount_band, return_free
         ORDER BY o_orderstatus, discount_band, return_free""",

    "win_change_points" ->
      """WITH f AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
           FROM events),
         cp AS (
           SELECT *, CASE WHEN is_err = 1 AND
               coalesce(lag(is_err) OVER (PARTITION BY user_id ORDER BY ts_us, event_id), 0) = 0
             THEN 1 ELSE 0 END AS rising
           FROM f),
         seg AS (
           SELECT *, CAST(sum(rising) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS err_burst_id
           FROM cp)
         SELECT user_id, err_burst_id, count(*) AS burst_len,
         min(ts_us) AS burst_start_us
         FROM seg WHERE is_err = 1
         GROUP BY user_id, err_burst_id ORDER BY user_id, err_burst_id""",

    "sort_limit" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         round(l_extendedprice, 2) AS l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "set_ops" ->
      """SELECT nk, 'both' AS which FROM
           (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
         UNION ALL
         SELECT nk, 'customer_only' AS which FROM
           (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
            EXCEPT
            SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
         ORDER BY which, nk""",
  )
}
