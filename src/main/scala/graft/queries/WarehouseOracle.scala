package graft.queries

/** DuckDB oracle SQL for [[Warehouse]]. Parity rules as [[RelOracle]]:
  * `epoch_us(ts)` ≡ the engine's exact integer-µs event time, `//` ≡
  * Spark `div` on non-negative longs, long sums are order-invariant, and
  * carried doubles (LOCF, merge deltas) hash bit-exact because neither
  * engine recomputes them. `agg_incremental_merge`'s oracle is the FULL
  * recompute — the merge-equals-recompute proof is the oracle itself. */
object WarehouseOracle {

  private val DayUs = "86400000000"

  /** Shared by the batch query AND the streaming EWMA sink (same
    * integer num/den contract, same read-back shape). */
  private[queries] val tsEwmaSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         f AS (SELECT user_id, ts_us, event_id, cents,
             list(cents) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS frame
           FROM e)
         SELECT user_id, ts_us, event_id, cents,
           CAST(list_sum(list_transform(frame,
             (x, i) -> x * ((CAST(1 AS BIGINT) << (i - 1))))) AS BIGINT)
             AS num,
           (CAST(1 AS BIGINT) << len(frame)) - 1 AS den,
           CAST(list_sum(list_transform(frame,
             (x, i) -> x * ((CAST(1 AS BIGINT) << (i - 1))))) AS DOUBLE)
             / ((CAST(1 AS BIGINT) << len(frame)) - 1) AS ewma
         FROM f ORDER BY user_id, ts_us, event_id"""

  val all: Map[String, String] = Map(

    // Maximum-spanning-forest summary, pinned to the sf0.01 literal
    // captured after LearnSpec's two-scale Kruskal-twin parity (the
    // pattern-modes stability-pin playbook: forest CORRECTNESS is the
    // MstRef twin's job; this literal pins the engine output for the
    // driver's sf0.01 gate).
    "graph_mst" ->
      """SELECT CAST(component AS BIGINT) AS component,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(total_w AS BIGINT) AS total_w,
           CAST(edge_digest AS BIGINT) AS edge_digest,
           converged
         FROM (VALUES
           (0, 1860, 1859, 3783, 801348813815, TRUE),
           (34, 2, 1, 2, 34191291, TRUE),
           (147, 2, 1, 2, 147176401, TRUE),
           (304, 5, 4, 8, 1583322529, TRUE),
           (366, 2, 1, 2, 366144854, TRUE),
           (516, 2, 1, 2, 516151997, TRUE),
           (575, 3, 2, 4, 1150250222, TRUE),
           (676, 2, 1, 2, 676137442, TRUE),
           (794, 2, 1, 2, 794124410, TRUE))
           AS t(component, n_nodes, n_edges, total_w, edge_digest, converged)
         ORDER BY component""",

    "merge_upsert" ->
      """WITH upd AS (
           SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice, 'U' AS src
           FROM orders WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice, 'N'
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT o_orderkey, o_totalprice, src FROM upd
         UNION ALL
         SELECT o_orderkey, o_totalprice, 'B' AS src FROM orders
         WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         ORDER BY o_orderkey""",

    "merge_cdc" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         log AS (
           SELECT o_orderkey, o_totalprice + 10.0 AS price, 'U' AS op, 1 AS seq
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice + 20.0, 'U', 2
           FROM base WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, 0.0, 'D', 2 FROM base WHERE o_orderkey % 11 = 0
           UNION ALL
           SELECT o_orderkey + 20000000, o_totalprice, 'I', 1
           FROM base WHERE o_orderkey % 97 = 0),
         latest AS (
           SELECT * FROM (SELECT *, row_number() OVER
               (PARTITION BY o_orderkey ORDER BY seq DESC, op ASC) AS rn
             FROM log) WHERE rn = 1)
         SELECT b.o_orderkey, b.o_totalprice, 'B' AS src FROM base b
         WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
         UNION ALL
         SELECT o_orderkey, price, op FROM latest WHERE op <> 'D'
         ORDER BY o_orderkey""",

    "diff_snapshots" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         nxt AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 50.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
           FROM base WHERE o_orderkey % 17 <> 0
           UNION ALL
           SELECT o_orderkey + 30000000, o_totalprice, o_orderstatus
           FROM base WHERE o_orderkey % 89 = 0),
         j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             a.o_totalprice AS old_price, a.o_orderstatus AS old_status,
             b.o_totalprice AS new_price, b.o_orderstatus AS new_status
           FROM base a FULL JOIN nxt b ON a.o_orderkey = b.o_orderkey)
         SELECT o_orderkey,
           CASE WHEN old_price IS NULL THEN 'A'
                WHEN new_price IS NULL THEN 'R'
                WHEN old_price <> new_price OR old_status <> new_status THEN 'C'
           END AS change,
           old_price, new_price
         FROM j
         WHERE old_price IS NULL OR new_price IS NULL
            OR old_price <> new_price OR old_status <> new_status
         ORDER BY o_orderkey""",

    // integer cents end to end: round(price*100) is the same nearest
    // integer in both engines, cent sums are exact longs, cumulative
    // share in parts-per-100k via integral division
    "win_pareto_abc" ->
      """WITH rev AS (
           SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
           FROM lineitem GROUP BY l_partkey),
         c AS (SELECT l_partkey, rev_cents,
             CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cents,
             CAST(sum(rev_cents) OVER () AS BIGINT) AS total
           FROM rev)
         SELECT l_partkey, rev_cents, cum_cents,
           (cum_cents * 100000) // total AS share_p100k,
           CASE WHEN (cum_cents * 100000) // total <= 80000 THEN 'A'
                WHEN (cum_cents * 100000) // total <= 95000 THEN 'B'
                ELSE 'C' END AS abc
         FROM c ORDER BY l_partkey""",

    // integer ppm vs literal Benford constants — no transcendental runs
    "profile_benford" ->
      """WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
             AS digit
           FROM c WHERE cents > 0),
         g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
         o AS (SELECT digit, n,
             CAST((n * 1000000) // CAST(sum(n) OVER () AS BIGINT)
               AS BIGINT) AS obs_ppm FROM g),
         e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
             (9, 45757)) AS t(digit, exp_ppm))
         SELECT o.digit, o.n, o.obs_ppm, CAST(e.exp_ppm AS BIGINT)
             AS exp_ppm,
           CAST(o.obs_ppm - e.exp_ppm AS BIGINT) AS delta_ppm
         FROM o JOIN e ON o.digit = e.digit ORDER BY o.digit""",

    // Shapley over the 2^4 exposure-subset conversion table; the phi
    // fold runs in pinned subset-mask order so the doubles are exact
    "events_attribution_shapley" ->
      """WITH fc AS (SELECT user_id, min(epoch_us(ts)) AS conv_ts,
             count(*) AS n_purch
           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         u AS (SELECT e.user_id,
             bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
               WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask,
             max(CASE WHEN fc.n_purch >= 14 THEN 1 ELSE 0 END) AS conv
           FROM events e LEFT JOIN fc ON e.user_id = fc.user_id
           WHERE fc.conv_ts IS NULL OR epoch_us(e.ts) < fc.conv_ts
           GROUP BY e.user_id),
         sub AS (SELECT mask, count(*) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_conv
           FROM u GROUP BY mask),
         v AS (SELECT m.mask,
             coalesce(CAST(s.n_conv AS DOUBLE) / s.n_users,
               CAST(0.0 AS DOUBLE)) AS v
           FROM (SELECT CAST(unnest(range(0, 16)) AS INT) AS mask) m
           LEFT JOIN sub s USING (mask)),
         ch AS (SELECT * FROM (VALUES ('click', 0), ('error', 1),
             ('signup', 2), ('view', 3)) AS t(channel, cbit)),
         terms AS (SELECT ch.channel, vs.mask AS smask,
             CAST(CASE bit_count(vs.mask) WHEN 0 THEN 1 WHEN 1 THEN 1
                 WHEN 2 THEN 2 WHEN 3 THEN 6 END *
               CASE bit_count(vs.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
                 WHEN 2 THEN 1 WHEN 3 THEN 1 END AS DOUBLE) / 24.0
               * (vu.v - vs.v) AS term
           FROM ch
           JOIN v vs ON (vs.mask & (1 << ch.cbit)) = 0
           JOIN v vu ON vu.mask = (vs.mask | (1 << ch.cbit))),
         folded AS (SELECT channel,
             list_sort(list({'smask': smask, 'term': term})) AS es
           FROM terms GROUP BY channel)
         SELECT channel,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(es, e -> e.term)), (a, b) -> a + b) AS phi
         FROM folded ORDER BY channel""",

    // rebuild-then-diff: both histories from the one run-detection
    // pattern, the delta via null-safe full-outer compare
    "scd2_backfill" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             event_id FROM events),
         late AS (SELECT user_id, 'backfill' AS event_type,
             (min(ts_us) + max(ts_us)) // 2 AS ts_us,
             user_id + 1000000000 AS event_id
           FROM ev WHERE user_id % 13 = 0 GROUP BY user_id),
         src1 AS (SELECT * FROM ev UNION ALL SELECT * FROM late),
         ch0 AS (SELECT user_id, event_type, ts_us, event_id,
             lag(event_type) OVER w AS prev_type FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         r0 AS (SELECT user_id, event_type, ts_us, event_id FROM ch0
           WHERE prev_type IS NULL OR prev_type <> event_type),
         h0 AS (SELECT user_id, event_type AS t0,
             ts_us AS valid_from_us,
             lead(ts_us) OVER w AS old_valid_to_us,
             CAST(row_number() OVER w AS BIGINT) AS old_version
           FROM r0 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ch1 AS (SELECT user_id, event_type, ts_us, event_id,
             lag(event_type) OVER w AS prev_type FROM src1
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         r1 AS (SELECT user_id, event_type, ts_us, event_id FROM ch1
           WHERE prev_type IS NULL OR prev_type <> event_type),
         h1 AS (SELECT user_id, event_type AS t1,
             ts_us AS valid_from_us,
             lead(ts_us) OVER w AS new_valid_to_us,
             CAST(row_number() OVER w AS BIGINT) AS new_version
           FROM r1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         j AS (SELECT coalesce(h0.user_id, h1.user_id) AS user_id,
             coalesce(h0.valid_from_us, h1.valid_from_us) AS valid_from_us,
             t0, t1, old_valid_to_us, new_valid_to_us,
             old_version, new_version
           FROM h0 FULL OUTER JOIN h1
             ON h0.user_id = h1.user_id
             AND h0.valid_from_us = h1.valid_from_us)
         SELECT user_id, valid_from_us, coalesce(t1, t0) AS event_type,
           CASE WHEN t0 IS NULL THEN 'A'
                WHEN old_valid_to_us IS NOT DISTINCT FROM new_valid_to_us
                  AND old_version = new_version THEN NULL
                ELSE 'C' END AS change,
           old_valid_to_us, new_valid_to_us, old_version, new_version
         FROM j
         WHERE NOT (t0 IS NOT NULL
             AND old_valid_to_us IS NOT DISTINCT FROM new_valid_to_us
             AND old_version = new_version)
         ORDER BY user_id, valid_from_us""",

    "scd2_history" ->
      """WITH ch AS (
           SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             lag(event_type) OVER w AS prev_type
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         runs AS (
           SELECT user_id, event_type, ts_us, event_id FROM ch
           WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type,
           ts_us AS valid_from_us,
           lead(ts_us) OVER w AS valid_to_us,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts_us) OVER w IS NULL) AS is_current
         FROM runs
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, version""",

    // cohort LTV: first-active-day cohorts, floor-cents revenue summed
    // cumulatively over day offsets
    "events_cohort_ltv" ->
      """WITH base AS (SELECT user_id, event_type,
           epoch_us(ts) // 86400000000 AS day,
           CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
         cohort AS (SELECT user_id, min(day) AS cohort_day
           FROM base GROUP BY user_id),
         rev AS (SELECT cohort_day, b.day - cohort_day AS day_offset,
             CAST(sum(cents) AS BIGINT) AS cents,
             count(DISTINCT b.user_id) AS n_buyers
           FROM base b JOIN cohort USING (user_id)
           WHERE event_type = 'purchase'
           GROUP BY 1, 2)
         SELECT cohort_day, day_offset, n_buyers, cents,
           CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents
         FROM rev ORDER BY cohort_day, day_offset""",

    // growth accounting: lag/lead per user, day rollup; churn(d) counts
    // users active d-1 with no activity at d
    "events_lifecycle" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day FROM events),
         f AS (SELECT user_id, day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
           FROM ud),
         st AS (SELECT day,
           CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(sum(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - 1
             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
           FROM f GROUP BY day),
         ch AS (SELECT day + 1 AS day, count(*) AS n_churned FROM f
           WHERE next IS NULL OR next > day + 1 GROUP BY day + 1)
         SELECT coalesce(st.day, ch.day) AS day,
           CAST(coalesce(n_new, 0) + coalesce(n_retained, 0)
             + coalesce(n_resurrected, 0) AS BIGINT) AS dau,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
           CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
           coalesce(ch.n_churned, 0) AS n_churned
         FROM st FULL JOIN ch ON ch.day = st.day ORDER BY day""",

    // exact global p50/p90 of first-view -> first-purchase latency:
    // the value at rank ceil(p*n) (integer cross-mult selection)
    "events_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         v1 AS (SELECT user_id, min(ts_us) AS v_us FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         p1 AS (SELECT e.user_id, v_us, min(ts_us) AS p_us
           FROM ev e JOIN v1 USING (user_id)
           WHERE event_type = 'purchase' AND ts_us > v_us
           GROUP BY e.user_id, v_us),
         lat AS (SELECT user_id, p_us - v_us AS latency_us FROM p1),
         rk AS (SELECT latency_us,
             CAST(row_number() OVER (ORDER BY latency_us, user_id)
               AS BIGINT) AS rn,
             count(*) OVER () AS n
           FROM lat)
         SELECT (SELECT count(*) FROM lat) AS n_users,
           min(CASE WHEN rn * 2 >= n THEN latency_us END)
             AS p50_latency_us,
           min(CASE WHEN rn * 10 >= n * 9 THEN latency_us END)
             AS p90_latency_us
         FROM rk""",

    // lang x source contingency with ppm-scaled integer expectation/lift
    "profile_contingency" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
         cells AS (SELECT lang, source, count(*) AS o
           FROM documents GROUP BY 1, 2),
         r AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
         c AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1)
         SELECT source, lang, o, rt, ct,
           (rt * ct * 1000000) // n AS e_ppm,
           (o * n * 1000000) // (rt * ct) AS lift_ppm
         FROM cells JOIN r USING (lang) JOIN c USING (source), n
         ORDER BY source, lang""",

    // DAU anomaly: trailing-7 sum via day self-join (|days| rows), the
    // deviation test is the same integer cross-mult as the engine
    "events_anomaly_days" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day FROM events),
         raw AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
         b AS (SELECT min(day) AS lo, max(day) AS hi FROM raw),
         spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
         dau AS (SELECT spine.day,
             CAST(coalesce(raw.dau, 0) AS BIGINT) AS dau
           FROM spine LEFT JOIN raw ON raw.day = spine.day),
         t7 AS (SELECT a.day, CAST(sum(b.dau) AS BIGINT) AS t7_sum,
             count(*) AS n_hist
           FROM dau a JOIN dau b ON b.day BETWEEN a.day - 7 AND a.day - 1
           GROUP BY a.day)
         SELECT a.day, a.dau, t7.t7_sum,
           100 * abs(7 * a.dau - t7.t7_sum) >= 50 * t7.t7_sum AS anomaly
         FROM dau a JOIN t7 ON t7.day = a.day
         WHERE t7.n_hist = 7
         ORDER BY a.day""",

    // GDPR delete cascade: per-table erasure audit with order-free
    // bit_xor digests of the SURVIVING keys (60-bit md5 prefix)
    "merge_delete_cascade" ->
      """WITH forget AS (SELECT c_custkey FROM customer
           WHERE c_custkey % 97 = 0),
         del_o AS (SELECT o_orderkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM forget)),
         c_s AS (SELECT c_custkey FROM customer
           WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)),
         o_s AS (SELECT o_orderkey FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM forget)),
         l_s AS (SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_o))
         SELECT 'customer' AS tbl,
           (SELECT count(*) FROM customer) AS n_before,
           (SELECT count(*) FROM customer) - (SELECT count(*) FROM c_s)
             AS n_deleted,
           (SELECT count(*) FROM c_s) AS n_after,
           (SELECT bit_xor(CAST('0x' ||
              substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT))
            FROM c_s) AS survivor_xor
         UNION ALL
         SELECT 'lineitem',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM l_s),
           (SELECT count(*) FROM l_s),
           (SELECT bit_xor(CAST('0x' ||
              substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
                CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT))
            FROM l_s)
         UNION ALL
         SELECT 'orders',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders) - (SELECT count(*) FROM o_s),
           (SELECT count(*) FROM o_s),
           (SELECT bit_xor(CAST('0x' ||
              substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT))
            FROM o_s)
         ORDER BY tbl""",

    // ordered type-initial string per user + RE2 leftmost-non-overlapping
    // scan — same match semantics as the engine's java.util.regex on the
    // backtracking-unambiguous pattern
    "events_pattern_regex" ->
      """WITH seq AS (SELECT user_id,
           string_agg(substr(event_type, 1, 1), ''
             ORDER BY epoch_us(ts), event_id) AS s
           FROM events GROUP BY user_id)
         SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'v[cs]*p')) AS BIGINT)
             AS n_vp_runs,
           regexp_matches(s, 'ep') AS err_then_purchase
         FROM seq ORDER BY user_id""",

    // first-touch order per user collapsed to an initials signature
    "events_journey_signature" ->
      """WITH ft AS (SELECT user_id, substr(event_type, 1, 1) AS ini,
           min(epoch_us(ts)) AS first_us
           FROM events GROUP BY user_id, substr(event_type, 1, 1)),
         sig AS (SELECT user_id,
           string_agg(ini, '' ORDER BY first_us, ini) AS signature
           FROM ft GROUP BY user_id)
         SELECT signature, count(*) AS n_users FROM sig
         GROUP BY signature ORDER BY n_users DESC, signature""",

    // fixed-band RFM: floor-cents monetary (exact integer fold), recency
    // as integer days vs the corpus max purchase time
    "events_rfm" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         mx AS (SELECT max(ts_us) AS now_us FROM p),
         per AS (SELECT user_id, max(ts_us) AS last_us,
             count(*) AS freq, CAST(sum(cents) AS BIGINT) AS cents
           FROM p GROUP BY user_id),
         sc AS (SELECT
             (now_us - last_us) // 86400000000 AS rec_days, freq, cents,
             CASE WHEN (now_us - last_us) // 86400000000 <= 2 THEN 5
                  WHEN (now_us - last_us) // 86400000000 <= 5 THEN 4
                  WHEN (now_us - last_us) // 86400000000 <= 10 THEN 3
                  WHEN (now_us - last_us) // 86400000000 <= 20 THEN 2
                  ELSE 1 END AS r_score,
             CASE WHEN freq >= 20 THEN 5 WHEN freq >= 15 THEN 4
                  WHEN freq >= 10 THEN 3 WHEN freq >= 5 THEN 2
                  ELSE 1 END AS f_score,
             CASE WHEN cents >= 90000 THEN 5 WHEN cents >= 70000 THEN 4
                  WHEN cents >= 50000 THEN 3 WHEN cents >= 30000 THEN 2
                  ELSE 1 END AS m_score
           FROM per, mx)
         SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS segment_cents
         FROM sc GROUP BY r_score, f_score, m_score
         ORDER BY r_score, f_score, m_score""",

    // dbt-style expectation audit: one aggregate per table exploded into
    // rule rows + the referential anti-join
    "profile_expectations" ->
      """WITH o AS (SELECT count(*) AS n,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS nulls,
           count(DISTINCT o_orderkey) AS dk,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1
             ELSE 0 END) AS BIGINT) AS badstat
           FROM orders),
         l AS (SELECT count(*) AS n,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1
             ELSE 0 END) AS BIGINT) AS badqty,
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1
             ELSE 0 END) AS BIGINT) AS baddisc
           FROM lineitem),
         refv AS (SELECT count(*) AS v FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
         rules AS (
           SELECT 'not_null:o_custkey' AS rule, 'orders' AS tbl,
             n AS n_checked, nulls AS n_violations FROM o
           UNION ALL SELECT 'unique:o_orderkey', 'orders', n, n - dk FROM o
           UNION ALL SELECT 'accepted_values:o_orderstatus[O,F]', 'orders',
             n, badstat FROM o
           UNION ALL SELECT 'range:l_quantity[1,45]', 'lineitem', n,
             badqty FROM l
           UNION ALL SELECT 'range:l_discount[0,0.08]', 'lineitem', n,
             baddisc FROM l
           UNION ALL SELECT 'ref:l_orderkey->o_orderkey', 'lineitem',
             (SELECT n FROM l), v FROM refv)
         SELECT rule, tbl, n_checked, n_violations,
           n_violations = 0 AS pass
         FROM rules ORDER BY rule""",

    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         u AS (SELECT DISTINCT user_id FROM ev),
         s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us FROM ev e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s1.t1_us
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us FROM ev e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2_us
                GROUP BY e.user_id)
         SELECT u.user_id, t1_us, t2_us, t3_us,
           CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                     WHEN t2_us IS NOT NULL THEN 2
                     WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
         FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)
         ORDER BY u.user_id""",

    // funnel with a 7-day conversion window per step, rolled up by depth
    "events_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         u AS (SELECT DISTINCT user_id FROM ev),
         s1 AS (SELECT user_id, min(ts_us) AS t1_us FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us FROM ev e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s1.t1_us
                  AND e.ts_us <= s1.t1_us + 604800000000
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us FROM ev e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2_us
                  AND e.ts_us <= s2.t2_us + 604800000000
                GROUP BY e.user_id),
         d AS (SELECT CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                     WHEN t2_us IS NOT NULL THEN 2
                     WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS depth
           FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                  LEFT JOIN s3 USING (user_id))
         SELECT depth, count(*) AS n_users FROM d
         GROUP BY depth ORDER BY depth""",

    // DAU / rolling-28-day MAU, full-history days only, ppm integer
    "win_mau_stickiness" ->
      s"""WITH ud AS (
           SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
         m AS (SELECT DISTINCT user_id, day + k AS rday
           FROM ud, unnest(range(0, 28)) t(k)),
         mau AS (SELECT rday AS day, count(*) AS mau FROM m GROUP BY rday),
         f AS (SELECT min(day) AS d0 FROM ud)
         SELECT day, dau, mau, (dau * 1000000) // mau AS stickiness_ppm
         FROM dau JOIN mau USING (day), f
         WHERE day >= d0 + 27
         ORDER BY day""",

    "events_retention" ->
      s"""WITH ud AS (
           SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
         cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
         SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
         FROM ud JOIN cohort USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // selection-based quantile normalization: within-group rank maps to
    // the global order statistic at ceil(r*N/n_g) — no interpolation
    "mix_quantile_normalize" ->
      """WITH ev AS (SELECT event_type, value, event_id FROM events),
         g AS (SELECT *,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_g,
             CAST((SELECT count(*) FROM ev) AS BIGINT) AS n
           FROM ev),
         ranked AS (SELECT *, (r * n + n_g - 1) // n_g AS pos FROM g),
         gord AS (SELECT CAST(row_number() OVER (ORDER BY value, event_id)
               AS BIGINT) AS pos,
             value AS norm_value
           FROM ev)
         SELECT event_id, event_type, ranked.value, norm_value
         FROM ranked JOIN gord USING (pos)
         ORDER BY event_id""",

    // the win_sessionize session CTE + a strictly-prior last-touch window
    "events_attribution" ->
      """WITH g AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT *, CAST(sum(brk) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
           FROM g),
         t AS (
           SELECT *,
             last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN event_type END IGNORE NULLS) OVER p AS touch_type,
             last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN event_id END IGNORE NULLS) OVER p AS touch_id
           FROM sess
           WINDOW p AS (PARTITION BY user_id, session_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, session_id, event_id AS purchase_id,
           coalesce(touch_type, 'none') AS touch_type, touch_id
         FROM t WHERE event_type = 'purchase'
         ORDER BY purchase_id""",

    // clamped running sum via the closed form cum - min(0, prefix-min cum)
    // — two stacked windows, all integer cents
    "win_clamped_balance" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) - 5000 AS delta
           FROM events),
         c AS (SELECT *,
             CAST(sum(delta) OVER w AS BIGINT) AS cum
           FROM d
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id, ts_us, delta,
           cum - least(0, CAST(min(cum) OVER w AS BIGINT)) AS balance
         FROM c
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_us, event_id""",

    "win_drawdown" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) - 5000 AS delta
           FROM events),
         c AS (SELECT *,
             CAST(sum(delta) OVER w AS BIGINT) AS cum
           FROM d
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         p AS (SELECT *, CAST(max(cum) OVER w AS BIGINT) AS peak
           FROM c
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak) AS BIGINT) AS peak_cents,
           CAST(sum(delta) AS BIGINT) AS final_cents
         FROM p GROUP BY user_id ORDER BY user_id""",

    // decile cuts are exact order statistics of the old snapshot (integer
    // predicates), shares are integer ppm division — PSI's log stays out
    // (not bit-portable); zero tolerance
    "profile_drift" ->
      """WITH e AS (SELECT event_id, value,
             epoch_us(ts) // 86400000000 AS day FROM events),
         lim AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
         t AS (SELECT e.event_id, e.value, e.day < lim.mid AS is_old
           FROM e, lim),
         o AS (SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS rn,
             count(*) OVER () AS n
           FROM t WHERE is_old),
         cuts AS (SELECT
             max(CASE WHEN rn*10 <= n*1+9 THEN value END) AS c1,
             max(CASE WHEN rn*10 <= n*2+9 THEN value END) AS c2,
             max(CASE WHEN rn*10 <= n*3+9 THEN value END) AS c3,
             max(CASE WHEN rn*10 <= n*4+9 THEN value END) AS c4,
             max(CASE WHEN rn*10 <= n*5+9 THEN value END) AS c5,
             max(CASE WHEN rn*10 <= n*6+9 THEN value END) AS c6,
             max(CASE WHEN rn*10 <= n*7+9 THEN value END) AS c7,
             max(CASE WHEN rn*10 <= n*8+9 THEN value END) AS c8,
             max(CASE WHEN rn*10 <= n*9+9 THEN value END) AS c9
           FROM o),
         b AS (SELECT is_old, CAST(
             CASE WHEN value > c1 THEN 1 ELSE 0 END +
             CASE WHEN value > c2 THEN 1 ELSE 0 END +
             CASE WHEN value > c3 THEN 1 ELSE 0 END +
             CASE WHEN value > c4 THEN 1 ELSE 0 END +
             CASE WHEN value > c5 THEN 1 ELSE 0 END +
             CASE WHEN value > c6 THEN 1 ELSE 0 END +
             CASE WHEN value > c7 THEN 1 ELSE 0 END +
             CASE WHEN value > c8 THEN 1 ELSE 0 END +
             CASE WHEN value > c9 THEN 1 ELSE 0 END AS BIGINT) AS bucket
           FROM t, cuts),
         a AS (SELECT bucket,
             CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
             CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS n_new
           FROM b GROUP BY bucket),
         s AS (SELECT *, CAST(sum(n_old) OVER () AS BIGINT) AS t_old,
             CAST(sum(n_new) OVER () AS BIGINT) AS t_new FROM a)
         SELECT bucket, n_old, n_new,
           (1000000 * n_old) // t_old AS share_old_ppm,
           (1000000 * n_new) // t_new AS share_new_ppm,
           (1000000 * n_new) // t_new - (1000000 * n_old) // t_old
             AS delta_ppm,
           abs((1000000 * n_new) // t_new - (1000000 * n_old) // t_old)
             > 20000 AS drifted
         FROM s ORDER BY bucket""",

    // two-proportion two-sigma test cross-multiplied into BIGINTs —
    // no sqrt or float division is ever evaluated in either engine
    "events_ab_lift" ->
      """WITH pu AS (SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
             user_id % 2 AS variant, user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
           FROM events GROUP BY 1, 2, 3),
         co AS (SELECT dow, variant, count(*) AS n,
             CAST(sum(converted) AS BIGINT) AS c FROM pu GROUP BY 1, 2),
         a AS (SELECT dow, n AS n_a, c AS c_a FROM co WHERE variant = 0),
         b AS (SELECT dow, n AS n_b, c AS c_b FROM co WHERE variant = 1)
         SELECT dow, n_a, c_a, n_b, c_b,
           CASE WHEN c_a * n_b = 0 THEN NULL
                ELSE (1000000 * c_b * n_a) // (c_a * n_b) - 1000000
           END AS lift_ppm,
           (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a)
             * (n_a + n_b)
           > 4 * n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b)
             AS significant
         FROM a JOIN b USING (dow) ORDER BY dow""",

    "events_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
           FROM events),
         p AS (SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n
           FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
         FROM p ORDER BY from_type, to_type""",

    // dow from pure epoch arithmetic — each engine's dayofweek() counts
    // differently (Spark 1=Sun, DuckDB 0=Sun), the classic divergence
    "agg_seasonality" ->
      s"""SELECT (epoch_us(ts) // $DayUs + 4) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         count(*) AS n, round(sum(value), 2) AS sum_v
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // median and MAD as DISCRETE selections (the percentile_disc
    // position predicate), deviations/threshold as identical IEEE ops
    "agg_robust_outliers" ->
      """WITH ev AS (SELECT event_type, value, event_id FROM events),
         r1 AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM ev),
         med AS (SELECT event_type,
             max(CASE WHEN rn * 2 <= n + 1 THEN value END) AS median
           FROM r1 GROUP BY event_type),
         dv AS (SELECT e.event_type, e.value, e.event_id, m.median,
             abs(e.value - m.median) AS dev
           FROM ev e JOIN med m USING (event_type)),
         r2 AS (SELECT event_type, dev,
             row_number() OVER (PARTITION BY event_type
               ORDER BY dev, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM dv),
         mad AS (SELECT event_type,
             max(CASE WHEN rn * 2 <= n + 1 THEN dev END) AS mad
           FROM r2 GROUP BY event_type)
         SELECT d.event_type, count(*) AS n,
           max(d.median) AS median, max(m.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > m.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
         FROM dv d JOIN mad m USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",

    // gaps-and-islands on the day axis: day - row_number() is constant
    // within a consecutive run
    "win_streak" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts) // $DayUs AS day FROM events),
         g AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           FROM ud),
         st AS (SELECT user_id, grp, count(*) AS len, min(day) AS start_day
           FROM g GROUP BY 1, 2),
         m AS (SELECT *, max(len) OVER (PARTITION BY user_id) AS max_len FROM st)
         SELECT user_id, count(*) AS n_streaks, max(len) AS best_len,
           min(CASE WHEN len = max_len THEN start_day END) AS best_start_day
         FROM m GROUP BY user_id ORDER BY user_id""",

    // same window + integer position predicates as the engine — the
    // discrete percentile is a SELECTED value, no interpolation, no
    // tolerance
    "agg_percentile_disc" ->
      """WITH r AS (SELECT event_type, value, event_id,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events
           WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
         SELECT event_type,
           max(CASE WHEN rn * 2 <= n + 1 THEN value END) AS p50_disc,
           max(CASE WHEN rn * 10 <= n * 9 + 9 THEN value END) AS p90_disc,
           CAST(max(n) AS BIGINT) AS n
         FROM r GROUP BY event_type ORDER BY event_type""",

    "agg_winsorize" ->
      """WITH r AS (SELECT event_type, value, event_id,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events
           WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)),
         b AS (SELECT event_type,
             max(CASE WHEN rn * 20 <= n + 19 THEN value END) AS p05,
             max(CASE WHEN rn * 20 <= n * 19 + 19 THEN value END) AS p95
           FROM r GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value < b.p05 THEN b.p05
                WHEN e.value > b.p95 THEN b.p95
                ELSE e.value END AS value_w
         FROM events e JOIN b USING (event_type)
         ORDER BY e.event_id""",

    // as-of read over the SCD2 intervals at the span midpoint
    "scd2_asof" ->
      """WITH ch AS (
           SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             lag(event_type) OVER w AS prev_type
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         runs AS (
           SELECT user_id, event_type, ts_us, event_id FROM ch
           WHERE prev_type IS NULL OR prev_type <> event_type),
         hist AS (
           SELECT user_id, event_type, ts_us AS valid_from_us,
             lead(ts_us) OVER w AS valid_to_us,
             CAST(row_number() OVER w AS BIGINT) AS version
           FROM runs
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         t AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t_at
           FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           min(valid_from_us) AS earliest_from_us,
           CAST(sum(version) AS BIGINT) AS sum_version
         FROM hist, t
         WHERE valid_from_us <= t_at
           AND (valid_to_us IS NULL OR valid_to_us > t_at)
         GROUP BY event_type ORDER BY event_type""",

    // rolling 7-day distinct actives via the contribute-ahead rewrite
    "win_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day FROM events),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
           FROM ud GROUP BY day),
         sp AS (SELECT DISTINCT user_id, day + o AS rday
           FROM ud, (SELECT unnest(range(0, 7)) AS o)),
         wau AS (SELECT rday AS day, CAST(count(*) AS BIGINT) AS wau
           FROM sp GROUP BY rday)
         SELECT d.day, d.dau, w.wau
         FROM dau d JOIN wau w USING (day)
         ORDER BY d.day""",

    // skew diagnostic: histogram-of-group-sizes selections, all integer
    "profile_skew" ->
      """WITH counts AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
         h AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM counts GROUP BY c),
         t AS (SELECT CAST(sum(nk) AS BIGINT) AS n_keys,
                 CAST(sum(c * nk) AS BIGINT) AS n_rows,
                 max(c) AS max_size FROM h),
         cu AS (SELECT c, CAST(sum(nk) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ck
               FROM h)
         SELECT t.n_keys, t.n_rows, t.max_size,
           (SELECT min(cu.c) FROM cu, t WHERE cu.ck * 2 >= t.n_keys) AS p50_size,
           (SELECT min(cu.c) FROM cu, t WHERE cu.ck * 100 >= t.n_keys * 99) AS p99_size,
           CAST(t.max_size * 1000000 // t.n_rows AS BIGINT) AS top1_share_ppm
         FROM t""",

    // exact join-size pre-flight off the two per-key count tables
    "profile_join_card" ->
      """WITH a AS (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
         b AS (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS matched_keys,
           CAST(sum(ca * cb) AS BIGINT) AS join_rows,
           CAST(max(ca * cb) AS BIGINT) AS max_key_rows
         FROM a JOIN b USING (k)""",

    // z-order: the bit-interleave fragment is the SAME text the engine
    // parses (Warehouse.spreadBits10) — only the scaling's int-div
    // syntax differs (// here, div in Spark SQL)
    "layout_zorder" -> {
      val zx = Warehouse.spreadBits10("sx")
      val zy = Warehouse.spreadBits10("sy")
      s"""WITH b AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
             min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
         g AS (SELECT l_partkey, l_suppkey,
             ((l_partkey - pmin) * 1024) // (pmax - pmin + 1) AS sx,
             ((l_suppkey - smin) * 1024) // (smax - smin + 1) AS sy
           FROM lineitem, b),
         z AS (SELECT l_partkey, l_suppkey, ($zx | ($zy * 2)) AS zval FROM g)
         SELECT zval // 16384 AS zbucket, CAST(count(*) AS BIGINT) AS n,
           min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
           min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
         FROM z GROUP BY zbucket ORDER BY zbucket"""
    },

    "agg_mode" ->
      """WITH c AS (
           SELECT event_type, user_id, count(*) AS n_events
           FROM events GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY event_type ORDER BY n_events DESC, user_id ASC) AS rn
           FROM c)
         SELECT event_type, user_id AS modal_user, n_events FROM r
         WHERE rn = 1 ORDER BY event_type""",

    "profile_columns" ->
      """WITH li AS (SELECT *, epoch_us(l_shipdate) AS ship_us FROM lineitem)
         SELECT * FROM (
           SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
             count(*) - count(l_quantity) AS n_null,
             count(DISTINCT l_quantity) AS n_distinct,
             min(l_quantity) AS min_num, max(l_quantity) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           FROM li
           UNION ALL
           SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
             count(DISTINCT l_extendedprice),
             min(l_extendedprice), max(l_extendedprice), NULL, NULL FROM li
           UNION ALL
           SELECT 'l_discount', count(*), count(*) - count(l_discount),
             count(DISTINCT l_discount),
             min(l_discount), max(l_discount), NULL, NULL FROM li
           UNION ALL
           SELECT 'l_shipdate_us', count(*), count(*) - count(ship_us),
             count(DISTINCT ship_us),
             CAST(min(ship_us) AS DOUBLE), CAST(max(ship_us) AS DOUBLE),
             NULL, NULL FROM li
           UNION ALL
           SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag), NULL, NULL,
             min(l_returnflag), max(l_returnflag) FROM li
           UNION ALL
           SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
             count(DISTINCT l_linestatus), NULL, NULL,
             min(l_linestatus), max(l_linestatus) FROM li)
         ORDER BY column_name""",

    "agg_incremental_merge" ->
      s"""SELECT event_type, epoch_us(ts) // $DayUs AS day,
         count(*) AS n, round(sum(value), 2) AS sum_v,
         min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "join_fuzzy_names" ->
      """WITH probes AS (
           SELECT p_partkey AS probe_key,
             substr(p_name, 1, 2) || substr(p_name, 4) AS probe_name
           FROM part WHERE p_partkey % 5 = 0 AND length(p_name) >= 4),
         cands AS (
           SELECT probe_key, probe_name, p.p_partkey,
             levenshtein(probe_name, p.p_name) AS dist
           FROM probes JOIN part p
             ON substr(probe_name, 1, 2) = substr(p.p_name, 1, 2)
            AND abs(length(p.p_name) - length(probe_name)) <= 2
           WHERE levenshtein(probe_name, p.p_name) <= 2),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY probe_key ORDER BY dist, p_partkey) AS rn,
             count(*) OVER (PARTITION BY probe_key) AS n_candidates
           FROM cands)
         SELECT probe_key, probe_name, p_partkey AS match_key,
           CAST(dist AS BIGINT) AS dist, n_candidates
         FROM r WHERE rn = 1 ORDER BY probe_key""",

    // exact count + pinned accuracy boolean (the agg_approx_distinct
    // pattern): the engine asserts its merged-sketch estimate lands
    // within 5%, the oracle pins that claim TRUE
    "agg_hll_incremental" ->
      """SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
         true AS within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",

    "profile_histogram" ->
      """WITH v AS (SELECT value FROM events),
         b AS (SELECT min(value) AS mn, max(value) AS mx FROM v)
         SELECT CAST(least(floor(((value - mn) * 10) / (mx - mn)), 9) AS BIGINT) AS bin,
           count(*) AS n_events,
           min(mn) + CAST(least(floor(((value - mn) * 10) / (mx - mn)), 9) AS BIGINT)
             * (max(mx) - min(mn)) / 10.0 AS bin_lo
         FROM v, b GROUP BY 1 ORDER BY 1""",

    // per-user union of padded intervals: islands on strict start >
    // running max end, all integer microseconds
    "win_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id,
           epoch_us(ts) - 900000000 AS st, epoch_us(ts) + 900000000 AS en
           FROM events),
         g AS (SELECT user_id, st, en,
             CASE WHEN max(en) OVER (PARTITION BY user_id
                 ORDER BY st, en, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR st > max(en) OVER (PARTITION BY user_id
                 ORDER BY st, en, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS brk,
             event_id
           FROM iv),
         isl AS (SELECT user_id, st, en,
             CAST(sum(brk) OVER (PARTITION BY user_id
               ORDER BY st, en, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS island
           FROM g),
         per AS (SELECT user_id, island, min(st) AS i_st, max(en) AS i_en
           FROM isl GROUP BY user_id, island)
         SELECT user_id, count(*) AS n_islands,
           CAST(sum(i_en - i_st) AS BIGINT) AS active_us
         FROM per GROUP BY user_id ORDER BY user_id""",

    // sweep line: ends (-1) before starts (+1) at equal t; peak and its
    // earliest attaining boundary instant
    "events_concurrency_peak" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
         b AS (SELECT event_id, ts_us - 900000000 AS t, 1 AS d FROM ev
               UNION ALL
               SELECT event_id, ts_us + 900000000, -1 FROM ev),
         r AS (SELECT t, CAST(sum(d) OVER (ORDER BY t, d, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS c
           FROM b),
         p AS (SELECT max(c) AS peak FROM r)
         SELECT (SELECT count(*) FROM ev) AS n_intervals, peak,
           (SELECT min(t) FROM r, p WHERE c = peak) AS at_t_us
         FROM p""",

    // sequence support: "some a then later some b" per user <=>
    // min ts(a) < max ts(b), strict
    "events_seq_support" ->
      """WITH bounds AS (SELECT user_id, event_type,
           min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
           FROM events GROUP BY 1, 2)
         SELECT a.event_type AS a, b.event_type AS b,
           count(*) AS support
         FROM bounds a JOIN bounds b ON a.user_id = b.user_id
         WHERE a.first_us < b.last_us
         GROUP BY 1, 2 ORDER BY a, b""",

    // connected components of the repeat-co-purchase graph: min-label
    // reach, the same recursive CTE form dedup_apply uses (fine at gate
    // scale; the engine's hybrid union-find/label-prop is the scale form)
    "graph_components" ->
      """WITH RECURSIVE
         op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e0 AS (SELECT a.p AS id1, b.p AS id2 FROM op a JOIN op b
                ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT id1 AS src, id2 AS dst FROM e0
               UNION ALL SELECT id2, id1 FROM e0),
         reach(v, label) AS (
           SELECT DISTINCT src, src FROM e
           UNION
           SELECT e.src, r.label FROM e JOIN reach r ON e.dst = r.v)
         SELECT v AS part_key, min(label) AS component
         FROM reach GROUP BY v ORDER BY part_key""",

    // min hop distance <= 3 from the 5 lowest-id nodes; the recursive
    // CTE enumerates paths and min-folds — fine at gate scale, where the
    // engine's visited-set BFS is the linear form
    "graph_bfs_levels" ->
      """WITH RECURSIVE e AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         seeds AS (SELECT src AS node FROM e GROUP BY src
           ORDER BY src LIMIT 5),
         walk(node, level) AS (
           SELECT node, 0 FROM seeds
           UNION ALL
           SELECT e.dst, w.level + 1 FROM walk w JOIN e ON e.src = w.node
           WHERE w.level < 3)
         SELECT node AS part_key, CAST(min(level) AS BIGINT) AS level
         FROM walk GROUP BY node ORDER BY part_key""",

    // bounded k-core peel (k = 2, 8 rounds) replayed as unrolled EDGE
    // rounds — each round drops edges whose endpoint window-degree < k,
    // which equals the node peel (E_i = E ∩ R_i²) but references the
    // previous round ONCE: DuckDB inlines CTEs per reference, so the
    // node form's two references per round would expand 2⁸-fold.
    // converged = round-8 edge count == round-7 (monotone peel)
    "graph_kcore" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         p0 AS (SELECT a.p AS id1, b.p AS id2 FROM op a JOIN op b
                ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
         e0 AS (SELECT id1 AS src, id2 AS dst FROM p0
               UNION ALL SELECT id2, id1 FROM p0),
         e1 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e0)
                WHERE ds >= 2 AND dd >= 2),
         e2 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e1)
                WHERE ds >= 2 AND dd >= 2),
         e3 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e2)
                WHERE ds >= 2 AND dd >= 2),
         e4 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e3)
                WHERE ds >= 2 AND dd >= 2),
         e5 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e4)
                WHERE ds >= 2 AND dd >= 2),
         e6 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e5)
                WHERE ds >= 2 AND dd >= 2),
         e7 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e6)
                WHERE ds >= 2 AND dd >= 2),
         e8 AS (SELECT src, dst FROM (SELECT src, dst,
                count(*) OVER (PARTITION BY src) AS ds,
                count(*) OVER (PARTITION BY dst) AS dd FROM e7)
                WHERE ds >= 2 AND dd >= 2),
         deg AS (SELECT src AS node, count(*) AS core_deg FROM e8
                GROUP BY src),
         conv AS (SELECT (SELECT count(*) FROM e8) = (SELECT count(*) FROM e7)
                  AS converged)
         SELECT d.node AS part_key, CAST(d.core_deg AS BIGINT) AS core_deg,
           conv.converged
         FROM deg d, conv ORDER BY part_key""",

    // endpoint-degree Pearson over the directed edge list: exact integer
    // moments, one fixed double expression (the profile_correlation form)
    "graph_assortativity" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         p AS (SELECT ds.d AS x, dd.d AS y FROM e
           JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src),
         m AS (SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x * y) AS BIGINT) AS sum_xy,
             CAST(sum(x * x) AS BIGINT) AS sum_x2,
             CAST(sum(y * y) AS BIGINT) AS sum_y2
           FROM p)
         SELECT n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
             / sqrt((CAST(n AS DOUBLE) * sum_x2
                 - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n AS DOUBLE) * sum_y2
                 - CAST(sum_y AS DOUBLE) * sum_y)) AS assortativity
         FROM m""",

    "graph_pagerank" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         n AS (SELECT src AS node FROM deg),
         r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM n),
         r1 AS (SELECT n.node, 150000000 + (85 * COALESCE(s.m, 0)) // 100 AS rank
           FROM n LEFT JOIN (SELECT e.dst, SUM(r.rank // d.d) AS m FROM e
             JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst) s ON s.dst = n.node),
         r2 AS (SELECT n.node, 150000000 + (85 * COALESCE(s.m, 0)) // 100 AS rank
           FROM n LEFT JOIN (SELECT e.dst, SUM(r.rank // d.d) AS m FROM e
             JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst) s ON s.dst = n.node),
         r3 AS (SELECT n.node, 150000000 + (85 * COALESCE(s.m, 0)) // 100 AS rank
           FROM n LEFT JOIN (SELECT e.dst, SUM(r.rank // d.d) AS m FROM e
             JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst) s ON s.dst = n.node),
         r4 AS (SELECT n.node, 150000000 + (85 * COALESCE(s.m, 0)) // 100 AS rank
           FROM n LEFT JOIN (SELECT e.dst, SUM(r.rank // d.d) AS m FROM e
             JOIN r3 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst) s ON s.dst = n.node),
         r5 AS (SELECT n.node, 150000000 + (85 * COALESCE(s.m, 0)) // 100 AS rank
           FROM n LEFT JOIN (SELECT e.dst, SUM(r.rank // d.d) AS m FROM e
             JOIN r4 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst) s ON s.dst = n.node)
         SELECT node AS part_key, CAST(rank AS BIGINT) AS rank FROM r5 ORDER BY part_key""",

    "graph_triangles" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
         o AS (SELECT e.src AS a, e.dst AS b FROM e
           JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
           WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)),
         tri AS (SELECT x.a, x.b, y.b AS c FROM o x JOIN o y ON x.b = y.a
                 JOIN o z ON z.a = x.a AND z.b = y.b),
         cnt AS (SELECT node, count(*) AS n_tri FROM (
             SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri)
           GROUP BY node)
         SELECT node, d AS deg, COALESCE(n_tri, 0) AS n_tri,
           CASE WHEN d >= 2 THEN
             round((COALESCE(n_tri, 0) * 2) / CAST(d * (d - 1) AS DOUBLE), 6)
           ELSE 0.0 END AS clustering
         FROM deg LEFT JOIN cnt USING (node) ORDER BY node""",

    "ts_interpolate" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE value END AS v
           FROM events),
         n AS (SELECT user_id, ts_us, event_id, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER wb AS pt,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER wf AS nt
           FROM ev
           WINDOW
             wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, event_id, ts_us,
           CASE WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) *
                  (CAST(ts_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
           END AS v_interp
         FROM n WHERE v IS NULL
         ORDER BY user_id, ts_us, event_id""",

    // exact integer moments, one fixed-order float combination
    // open/close are rank selections, high/low min/max — every value an
    // actual data value, tolerance-free; volume exact floor-cents
    "ts_ohlc" ->
      """WITH e AS (SELECT event_type,
             epoch_us(ts) // 3600000000 AS hour,
             epoch_us(ts) AS ts_us, event_id, value,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         r AS (SELECT *, row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type, hour) AS nn
           FROM e
           WINDOW w AS (PARTITION BY event_type, hour
             ORDER BY ts_us, event_id))
         SELECT event_type, hour,
           max(CASE WHEN rn = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn = nn THEN value END) AS close,
           count(*) AS n, CAST(sum(cents) AS BIGINT) AS volume_cents
         FROM r GROUP BY event_type, hour
         ORDER BY event_type, hour""",

    // LTTB walk replayed as a recursive CTE over MATERIALIZED bucket
    // sums with a quantified argmax (the geo_simplify_dp construction);
    // areas are n-scaled BIGINTs so the bucket mean's division never
    // happens — every selection is integer-exact
    "ts_lttb" ->
      """WITH RECURSIVE
         pts AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS seq
           FROM events),
         xy AS MATERIALIZED (SELECT p.user_id, p.seq, p.event_id,
             p.ts_us - f.ts0 AS x, p.cents AS y
           FROM pts p JOIN (SELECT user_id, min(ts_us) AS ts0
             FROM pts GROUP BY user_id) f USING (user_id)),
         nn AS MATERIALIZED (SELECT user_id, max(seq) AS n
           FROM xy GROUP BY user_id),
         bk AS MATERIALIZED (SELECT x.user_id, x.seq, x.x, x.y,
             ((x.seq - 2) * 8) // (mx.n - 2) AS b
           FROM xy x JOIN nn mx USING (user_id)
           WHERE mx.n > 10 AND x.seq >= 2 AND x.seq <= mx.n - 1),
         bs AS (SELECT user_id, b, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, count(*) AS c
           FROM bk GROUP BY user_id, b),
         nxt AS MATERIALIZED (
           SELECT user_id, b - 1 AS b, sx, sy, c FROM bs WHERE b >= 1
           UNION ALL
           SELECT x.user_id, 7, x.x, x.y, 1
           FROM xy x JOIN nn mx USING (user_id)
           WHERE x.seq = mx.n AND mx.n > 10),
         walk(user_id, b, sel) AS (
           SELECT user_id, -1, CAST(1 AS BIGINT) FROM nn WHERE n > 10
           UNION ALL
           SELECT w.user_id, w.b + 1, c.seq
           FROM walk w
           JOIN xy a ON a.user_id = w.user_id AND a.seq = w.sel
           JOIN nxt t ON t.user_id = w.user_id AND t.b = w.b + 1
           JOIN bk c ON c.user_id = w.user_id AND c.b = w.b + 1
           WHERE w.b < 7
             AND NOT EXISTS (SELECT 1 FROM bk q
               WHERE q.user_id = w.user_id AND q.b = w.b + 1
                 AND (abs((a.x - q.x) * (t.sy - t.c * q.y)
                        - (a.y - q.y) * (t.sx - t.c * q.x))
                      > abs((a.x - c.x) * (t.sy - t.c * c.y)
                        - (a.y - c.y) * (t.sx - t.c * c.x))
                   OR (abs((a.x - q.x) * (t.sy - t.c * q.y)
                         - (a.y - q.y) * (t.sx - t.c * q.x))
                       = abs((a.x - c.x) * (t.sy - t.c * c.y)
                         - (a.y - c.y) * (t.sx - t.c * c.x))
                     AND q.seq < c.seq)))),
         kept AS (
           SELECT user_id, sel AS seq FROM walk
           UNION ALL SELECT user_id, n FROM nn WHERE n > 10
           UNION ALL SELECT x.user_id, x.seq
             FROM xy x JOIN nn mx USING (user_id) WHERE mx.n <= 10)
         SELECT k.user_id, k.seq, x.event_id,
           x.x AS x_rel_us, x.y AS y_cents
         FROM kept k JOIN xy x
           ON x.user_id = k.user_id AND x.seq = k.seq
         ORDER BY k.user_id, k.seq""",

    // rolling median/MAD over the trailing fixed-7 window, everything
    // 2-scaled so both engines compare the same BIGINTs
    "ts_mad_anomaly" ->
      """WITH daily AS (SELECT event_type,
             epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         win AS (SELECT event_type, day, cnt,
             list_sort(list(cnt) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
           FROM daily),
         st AS (SELECT event_type, day, cnt, arr, 2 * arr[4] AS med2
           FROM win WHERE len(arr) = 7),
         st2 AS (SELECT event_type, day, cnt, med2,
             list_sort(list_transform(arr, v -> abs(2 * v - med2)))[4] AS mad2,
             abs(2 * cnt - med2) AS dev2
           FROM st)
         SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
           CAST(med2 AS BIGINT) AS med2, CAST(mad2 AS BIGINT) AS mad2,
           CAST(dev2 AS BIGINT) AS dev2, dev2 > 3 * mad2 AS anomaly
         FROM st2 ORDER BY event_type, day""",

    // 24-hour OLS slope: hour index shifted per type, five integer
    // window moments, one double division
    "win_rolling_regression" ->
      """WITH hourly AS (SELECT event_type,
             epoch_us(ts) // 3600000000 AS h,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         sh AS (SELECT event_type, h, y,
             h - min(h) OVER (PARTITION BY event_type) AS x
           FROM hourly),
         m AS (SELECT event_type, h, y,
             count(*) OVER w AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sx2
           FROM sh WINDOW w AS (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
         SELECT event_type, h, y,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sx2 - sx * sx AS BIGINT) AS den,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE) AS slope_cents_per_hour
         FROM m WHERE n = 24 ORDER BY event_type, h""",

    // CUSUM via the prefix identity S_i = P_i - min(0, min_{j<=i} P_j);
    // deviations 2-scaled against the per-type global median, alarm
    // threshold 4-scaled MAD
    "win_cusum" ->
      """WITH daily AS (SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, list_sort(list(cents)) AS arr,
             count(*) AS n
           FROM daily GROUP BY event_type),
         st2 AS (SELECT event_type,
             arr[CAST((n + 1) // 2 AS INT)]
               + arr[CAST(n // 2 + 1 AS INT)] AS med2, n, arr
           FROM st),
         st3 AS (SELECT event_type, med2,
             list_sort(list_transform(arr, v -> abs(2 * v - med2))) AS devs,
             n FROM st2),
         st4 AS (SELECT event_type, med2,
             devs[CAST((n + 1) // 2 AS INT)]
               + devs[CAST(n // 2 + 1 AS INT)] AS mad4
           FROM st3),
         p AS (SELECT d.event_type, d.day, d.cents,
             CAST(2 * d.cents - s.med2 AS BIGINT) AS d2, s.mad4
           FROM daily d JOIN st4 s ON d.event_type = s.event_type),
         q AS (SELECT event_type, day, cents, d2, mad4,
             CAST(sum(d2) OVER w AS BIGINT) AS p2
           FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         r AS (SELECT *, CAST(min(p2) OVER w AS BIGINT) AS minp2
           FROM q WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_type, day, cents, d2,
           CAST(p2 - least(0, minp2) AS BIGINT) AS s2,
           p2 - least(0, minp2) > 6 * mad4 AS alarm
         FROM r ORDER BY event_type, day""",

    // seasonal (lag-7) vs naive (lag-1) absolute-error backtest over
    // observed daily counts; exact integer error sums
    "ts_seasonal_naive" ->
      """WITH daily AS (SELECT event_type,
             epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, day, cnt,
             lag(cnt, 1) OVER w AS lag1, lag(cnt, 7) OVER w AS lag7
           FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         m AS (SELECT event_type, count(*) AS n,
             CAST(sum(abs(cnt - lag7)) AS BIGINT) AS ae_seasonal,
             CAST(sum(abs(cnt - lag1)) AS BIGINT) AS ae_naive
           FROM l WHERE lag7 IS NOT NULL GROUP BY event_type)
         SELECT event_type, n, ae_seasonal, ae_naive,
           ae_seasonal < ae_naive AS seasonal_wins,
           CASE WHEN ae_naive > 0 THEN
             CAST(ae_seasonal AS DOUBLE) / CAST(ae_naive AS DOUBLE) END AS mase
         FROM m ORDER BY event_type""",

    // classical decomposition in 7x-units on the dense day spine; the
    // +2^40 shift makes the seasonal floor-mean's numerator positive so
    // // matches Spark's div on negative detrended values
    "ts_decompose" ->
      """WITH daily AS (SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1, 2),
         spine AS (SELECT event_type, unnest(generate_series(min(day), max(day)))
               AS day
           FROM daily GROUP BY event_type),
         dense AS (SELECT s.event_type, s.day,
             coalesce(d.cents, 0) AS cents
           FROM spine s LEFT JOIN daily d
             ON s.event_type = d.event_type AND s.day = d.day),
         det AS (SELECT event_type, day, cents,
             CAST(sum(cents) OVER w7 AS BIGINT) AS trend7,
             count(*) OVER w7 AS nw
           FROM dense
           WINDOW w7 AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         dd AS (SELECT event_type, day, day % 7 AS weekday,
             cents * 7 - trend7 AS det7
           FROM det WHERE nw = 7),
         seas AS (SELECT event_type, weekday, count(*) AS n_days,
             CAST((sum(det7) + count(*) * 1099511627776) // count(*)
               - 1099511627776 AS BIGINT) AS seasonal7
           FROM dd GROUP BY event_type, weekday)
         SELECT dd.event_type, dd.weekday, s.n_days, s.seasonal7,
           CAST(sum(abs(dd.det7 - s.seasonal7)) AS BIGINT) AS sum_abs_rem7,
           CAST(max(abs(dd.det7 - s.seasonal7)) AS BIGINT) AS max_abs_rem7
         FROM dd JOIN seas s
           ON dd.event_type = s.event_type AND dd.weekday = s.weekday
         GROUP BY dd.event_type, dd.weekday, s.n_days, s.seasonal7
         ORDER BY dd.event_type, dd.weekday""",

    // hash-seeded deterministic walks: at step t the walk at v (from s)
    // takes v's neighbor of rank (s*31 + t*17 + v) mod deg(v)
    "graph_rw_sample" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         p0 AS (SELECT a.p AS id1, b.p AS id2 FROM op a JOIN op b
                ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT id1 AS src, id2 AS dst FROM p0
               UNION ALL SELECT id2, id1 FROM p0),
         -- MATERIALIZED: referenced once per step; DuckDB would otherwise
         -- inline and recompute the rank window per reference (the
         -- graph_kcore / staypoint hop2 lesson)
         r AS MATERIALIZED (SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rank,
             count(*) OVER (PARTITION BY src) AS deg
           FROM e),
         w0 AS (SELECT DISTINCT src AS start, src AS node FROM e),
         w1 AS (SELECT w.start, r.dst AS node FROM w0 w JOIN r
                ON r.src = w.node
                AND r.rank = (w.start * 31 + 1 * 17 + w.node) % r.deg),
         w2 AS (SELECT w.start, r.dst AS node FROM w1 w JOIN r
                ON r.src = w.node
                AND r.rank = (w.start * 31 + 2 * 17 + w.node) % r.deg),
         w3 AS (SELECT w.start, r.dst AS node FROM w2 w JOIN r
                ON r.src = w.node
                AND r.rank = (w.start * 31 + 3 * 17 + w.node) % r.deg),
         w4 AS (SELECT w.start, r.dst AS node FROM w3 w JOIN r
                ON r.src = w.node
                AND r.rank = (w.start * 31 + 4 * 17 + w.node) % r.deg)
         SELECT start, step, node FROM (
           SELECT start, 0 AS step, node FROM w0
           UNION ALL SELECT start, 1, node FROM w1
           UNION ALL SELECT start, 2, node FROM w2
           UNION ALL SELECT start, 3, node FROM w3
           UNION ALL SELECT start, 4, node FROM w4)
         ORDER BY start, step""",

    // four synchronous LPA rounds unrolled; argmax = row_number over
    // (count DESC, label ASC)
    "graph_label_prop" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         p0 AS (SELECT a.p AS id1, b.p AS id2 FROM op a JOIN op b
                ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT id1 AS src, id2 AS dst FROM p0
               UNION ALL SELECT id2, id1 FROM p0),
         l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         v1 AS (SELECT e.src AS node, l.lbl, count(*) AS c
                FROM e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
                OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
                FROM v1) WHERE rk = 1),
         v2 AS (SELECT e.src AS node, l.lbl, count(*) AS c
                FROM e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
                OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
                FROM v2) WHERE rk = 1),
         v3 AS (SELECT e.src AS node, l.lbl, count(*) AS c
                FROM e JOIN l2 l ON e.dst = l.node GROUP BY 1, 2),
         l3 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
                OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
                FROM v3) WHERE rk = 1),
         v4 AS (SELECT e.src AS node, l.lbl, count(*) AS c
                FROM e JOIN l3 l ON e.dst = l.node GROUP BY 1, 2),
         l4 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
                OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
                FROM v4) WHERE rk = 1)
         SELECT node AS part_key, lbl AS community
         FROM l4 ORDER BY part_key""",

    // per-edge triangle support via the same degree-oriented wedge
    // enumeration as graph_triangles; ppm score by integer division
    "graph_edge_jaccard" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
         o AS (SELECT e.src AS a, e.dst AS b FROM e
           JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
           WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)),
         tri AS (SELECT x.a, x.b, y.b AS c FROM o x JOIN o y ON x.b = y.a
                 JOIN o z ON z.a = x.a AND z.b = y.b),
         sup AS (SELECT u, v, count(*) AS common FROM (
             SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
             UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
             UNION ALL SELECT least(a, c), greatest(a, c) FROM tri)
           GROUP BY u, v),
         scored AS (SELECT e.src, e.dst,
             COALESCE(s.common, 0) AS common,
             (COALESCE(s.common, 0) * 1000000)
               // (ds.d + dd.d - COALESCE(s.common, 0)) AS jaccard_ppm
           FROM e JOIN deg ds ON e.src = ds.node
             JOIN deg dd ON e.dst = dd.node
             LEFT JOIN sup s ON least(e.src, e.dst) = s.u
               AND greatest(e.src, e.dst) = s.v),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY src
             ORDER BY jaccard_ppm DESC, common DESC, dst) AS rk
           FROM scored)
         SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v,
           CAST(common AS BIGINT) AS common,
           CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm
         FROM ranked WHERE rk <= 2 ORDER BY u, v""",

    // lag-1 pairs feed the same exact-moments-then-combine pattern as
    // profile_correlation: integer sums, one fixed double expression
    "ts_autocorr" ->
      """WITH e AS (SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS y,
             lag(CAST(floor(value * 100) AS BIGINT)) OVER
               (PARTITION BY event_type
                ORDER BY epoch_us(ts), event_id) AS x
           FROM events),
         m AS (SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x * y) AS BIGINT) AS sum_xy,
             CAST(sum(x * x) AS BIGINT) AS sum_x2,
             CAST(sum(y * y) AS BIGINT) AS sum_y2
           FROM e WHERE x IS NOT NULL GROUP BY event_type)
         SELECT event_type, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
             / sqrt((CAST(n AS DOUBLE) * sum_x2
                 - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n AS DOUBLE) * sum_y2
                 - CAST(sum_y AS DOUBLE) * sum_y)) AS autocorr_lag1
         FROM m ORDER BY event_type""",

    "profile_correlation" ->
      """WITH e AS (SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS x,
             (epoch_us(ts) % 86400000000) // 3600000000 AS y
           FROM events),
         m AS (SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x * y) AS BIGINT) AS sum_xy,
             CAST(sum(x * x) AS BIGINT) AS sum_x2,
             CAST(sum(y * y) AS BIGINT) AS sum_y2
           FROM e GROUP BY event_type)
         SELECT event_type, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
             / sqrt((CAST(n AS DOUBLE) * sum_x2
                 - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n AS DOUBLE) * sum_y2
                 - CAST(sum_y AS DOUBLE) * sum_y)) AS corr_xy
         FROM m ORDER BY event_type""",

    // exact integer num/den of the 16-tap binary-decay EWMA; the only
    // float op is the final correctly-rounded division
    "ts_ewma" ->
      tsEwmaSql,

    "ts_resample_grid" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, value, event_id
           FROM events),
         b AS (SELECT min(ts_us) // 21600000000 AS c0,
                      max(ts_us) // 21600000000 AS c1 FROM ev),
         grid AS (
           SELECT user_id, unnest(range(c0, c1 + 1)) AS cell_idx
           FROM (SELECT DISTINCT user_id FROM ev), b),
         un AS (
           SELECT user_id, ts_us, value, 0 AS is_grid, event_id FROM ev
           UNION ALL
           SELECT user_id, (cell_idx + 1) * 21600000000 - 1,
             CAST(NULL AS DOUBLE), 1, CAST(NULL AS BIGINT) FROM grid),
         f AS (
           SELECT user_id, ts_us, is_grid,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts_us, is_grid, coalesce(event_id, -1)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
           FROM un)
         SELECT user_id, ts_us // 21600000000 AS cell_idx,
           ts_us AS sample_us, locf_value
         FROM f WHERE is_grid = 1
         ORDER BY user_id, cell_idx""",
  )
}
