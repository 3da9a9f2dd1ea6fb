package graft.queries

/** DuckDB oracle SQL for [[Learn]] — exact replays of the integer
  * semantics (same fixed-point scales, same floor divisions on
  * nonnegative operands, same tie-breaks). HUGEINT stands in where the
  * engine widens through DECIMAL(38,0). */
object LearnOracle {

  val all: Map[String, String] = Map(

    // leave-one-out smoothed target encoding, m = 10 — the exact
    // integer formula from Learn.mlTargetEncode
    "ml_target_encode" ->
      """WITH oc AS (
           SELECT c_mktsegment AS segment,
                  CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cat AS (
           SELECT segment, count(*) AS n_cat,
                  CAST(sum(y) AS BIGINT) AS pos_cat
           FROM oc GROUP BY segment),
         prior AS (
           SELECT CAST((1000000 * sum(pos_cat)) // sum(n_cat) AS BIGINT)
             AS prior_ppm
           FROM cat)
         SELECT segment, y, count(*) AS n_rows, n_cat, pos_cat, prior_ppm,
           CAST((1000000 * (pos_cat - y) + 10 * prior_ppm) // (n_cat + 9)
             AS BIGINT) AS enc_ppm
         FROM oc JOIN cat USING (segment) CROSS JOIN prior
         GROUP BY segment, y, n_cat, pos_cat, prior_ppm, enc_ppm
         ORDER BY segment, y""",

    // exact Mann-Whitney AUC with average-rank tie correction
    "ml_auc_exact" ->
      """WITH ev AS (
           SELECT event_type, value,
                  CAST(user_id % 10 < 3 AS BIGINT) AS y, event_id
           FROM events),
         r AS (
           SELECT *,
             CAST(row_number() OVER
               (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM ev),
         pv AS (
           SELECT event_type, value, sum(y) AS pos_v,
                  min(rn) AS lo, max(rn) AS hi, max(n) AS n
           FROM r GROUP BY event_type, value),
         st AS (
           SELECT event_type, CAST(sum(pos_v * (lo + hi)) AS BIGINT) AS rs2,
                  CAST(sum(pos_v) AS BIGINT) AS npos, max(n) AS n
           FROM pv GROUP BY event_type)
         SELECT event_type, n, npos, n - npos AS nneg,
           CAST((CAST(rs2 - npos * (npos + 1) AS HUGEINT) * 1000000)
                // (2 * npos * (n - npos)) AS BIGINT) AS auc_ppm
         FROM st ORDER BY event_type""",

    // histogram split finding with the exact two-level rational
    // comparator (quotient first, cross-multiplied remainders second)
    "ml_stump_split" ->
      """WITH li AS (
           SELECT CAST(floor(l_quantity) AS BIGINT) AS qty,
                  CAST(floor(l_discount * 100) AS BIGINT) AS disc,
                  CAST(l_returnflag = 'R' AS BIGINT) AS y
           FROM lineitem),
         stacked AS (
           SELECT 'qty' AS feature, qty AS bin, y FROM li
           UNION ALL
           SELECT 'disc' AS feature, disc AS bin, y FROM li),
         hist AS (
           SELECT feature, bin, count(*) AS cnt, sum(y) AS pos
           FROM stacked GROUP BY feature, bin),
         cum AS (
           SELECT feature, bin AS threshold,
             CAST(sum(cnt) OVER w AS BIGINT) AS nl,
             CAST(sum(pos) OVER w AS BIGINT) AS posl,
             CAST(sum(cnt) OVER wt AS BIGINT) AS n,
             CAST(sum(pos) OVER wt AS BIGINT) AS post
           FROM hist
           WINDOW w AS (PARTITION BY feature ORDER BY bin),
                  wt AS (PARTITION BY feature)),
         cand AS (
           SELECT feature, threshold, nl, posl,
             n - nl AS nr, post - posl AS posr,
             (CAST(posl AS HUGEINT) * posl) // nl
               + (CAST(posr AS HUGEINT) * posr) // nr AS q,
             ((CAST(posl AS HUGEINT) * posl) % nl) * (n - nl)
               + ((CAST(posr AS HUGEINT) * posr) % nr) * nl AS a,
             CAST(nl AS HUGEINT) * (n - nl) AS d
           FROM cum WHERE nl < n),
         beaten_in_feature AS (
           SELECT DISTINCT a.feature, a.threshold
           FROM cand a JOIN cand b ON a.feature = b.feature
           WHERE (b.q - a.q >= 2)
              OR (b.q - a.q BETWEEN -1 AND 1
                  AND ((b.q - a.q) * a.d * b.d + b.a * a.d - a.a * b.d > 0
                       OR ((b.q - a.q) * a.d * b.d + b.a * a.d - a.a * b.d = 0
                           AND (b.feature, b.threshold) < (a.feature, a.threshold))))),
         per_feature AS (
           SELECT * FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM beaten_in_feature x
             WHERE x.feature = c.feature AND x.threshold = c.threshold)),
         beaten_global AS (
           SELECT DISTINCT a.feature
           FROM per_feature a JOIN per_feature b ON a.feature <> b.feature
           WHERE (b.q - a.q >= 2)
              OR (b.q - a.q BETWEEN -1 AND 1
                  AND ((b.q - a.q) * a.d * b.d + b.a * a.d - a.a * b.d > 0
                       OR ((b.q - a.q) * a.d * b.d + b.a * a.d - a.a * b.d = 0
                           AND (b.feature, b.threshold) < (a.feature, a.threshold)))))
         SELECT feature, threshold, nl AS n_left, posl AS pos_left,
           nr AS n_right, posr AS pos_right,
           NOT EXISTS (SELECT 1 FROM beaten_global g
             WHERE g.feature = per_feature.feature) AS is_best
         FROM per_feature ORDER BY feature""",

    // reliability-diagram deciles over the price percentile rank
    "ml_calibration_bins" ->
      """WITH r AS (
           SELECT CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y,
             CAST(row_number() OVER
               (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
             count(*) OVER () AS n
           FROM orders),
         scored AS (
           SELECT y, ((rn - 1) * 1000000) // greatest(n - 1, 1) AS score_ppm
           FROM r),
         b AS (
           SELECT least(score_ppm // 100000, 9) AS bucket, y, score_ppm
           FROM scored)
         SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
           CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS obs_ppm,
           CAST(sum(score_ppm) // count(*) AS BIGINT) AS avg_score_ppm,
           CAST((1000000 * sum(y)) // count(*)
             - sum(score_ppm) // count(*) AS BIGINT) AS gap_ppm
         FROM b GROUP BY bucket ORDER BY bucket""",

    // PR sweep over decile thresholds on the percentile-rank score;
    // cumulative-from-above sums over the 11-bucket histogram
    "ml_pr_curve" ->
      """WITH r AS (
           SELECT CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y,
             CAST(row_number() OVER
               (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
             count(*) OVER () AS n
           FROM orders),
         b AS (
           SELECT (((rn - 1) * 1000000) // greatest(n - 1, 1)) // 100000
               AS bucket, y
           FROM r),
         h AS (
           SELECT bucket, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
           FROM b GROUP BY bucket),
         c AS (
           SELECT bucket,
             CAST(sum(cnt) OVER wa AS BIGINT) AS pred_n,
             CAST(sum(pos) OVER wa AS BIGINT) AS tp,
             CAST(sum(cnt) OVER wall AS BIGINT) AS n_all,
             CAST(sum(pos) OVER wall AS BIGINT) AS pos_all
           FROM h
           WINDOW wa AS (ORDER BY bucket DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wall AS ())
         SELECT bucket * 100000 AS threshold_ppm, tp, pred_n - tp AS fp,
           pos_all - tp AS fn, n_all - pred_n - pos_all + tp AS tn,
           (1000000 * tp) // pred_n AS precision_ppm,
           (1000000 * tp) // greatest(pos_all, 1) AS recall_ppm
         FROM c WHERE bucket <= 9 ORDER BY threshold_ppm""",

    // deterministic Poisson-style bootstrap: Binomial(3, 1/3) weights
    // from portable integer hashing, 32 replicates, CI = [2nd, 31st]
    // order statistic of the replicate means
    "ml_bootstrap_ci" ->
      """WITH ev AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                  event_id % 1048576 AS hid
           FROM events),
         reps AS (
           SELECT event_type, b.b,
             CAST(sum(((CASE WHEN (hid * 2654435761 + b.b * 1000003) % 1024 < 341
                    THEN 1 ELSE 0 END)
                + (CASE WHEN (hid * 2654435761 + b.b * 1000003 + 97) % 1024 < 341
                    THEN 1 ELSE 0 END)
                + (CASE WHEN (hid * 2654435761 + b.b * 1000003 + 194) % 1024 < 341
                    THEN 1 ELSE 0 END)) * cents) AS BIGINT) AS swc,
             CAST(sum((CASE WHEN (hid * 2654435761 + b.b * 1000003) % 1024 < 341
                    THEN 1 ELSE 0 END)
                + (CASE WHEN (hid * 2654435761 + b.b * 1000003 + 97) % 1024 < 341
                    THEN 1 ELSE 0 END)
                + (CASE WHEN (hid * 2654435761 + b.b * 1000003 + 194) % 1024 < 341
                    THEN 1 ELSE 0 END)) AS BIGINT) AS sw
           FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
           GROUP BY event_type, b.b),
         m AS (
           SELECT event_type, b,
             (1000 * swc) // greatest(sw, 1) AS mean_milli
           FROM reps),
         r AS (
           SELECT event_type, mean_milli,
             row_number() OVER (PARTITION BY event_type
               ORDER BY mean_milli, b) AS rk
           FROM m),
         ci AS (
           SELECT event_type,
             CAST(max(CASE WHEN rk = 2 THEN mean_milli END) AS BIGINT)
               AS ci_lo_milli,
             CAST(max(CASE WHEN rk = 31 THEN mean_milli END) AS BIGINT)
               AS ci_hi_milli
           FROM r GROUP BY event_type)
         SELECT ev.event_type, count(*) AS n,
           CAST((1000 * sum(cents)) // count(*) AS BIGINT) AS mean_milli,
           ci_lo_milli, ci_hi_milli
         FROM ev JOIN ci ON ev.event_type = ci.event_type
         GROUP BY ev.event_type, ci_lo_milli, ci_hi_milli
         ORDER BY ev.event_type""",

    // integer nearest-centroid lifecycle: fixed-point quantize, exact
    // integer centroid means (+2^30 shift), integer squared distance,
    // lowest-label tie-break
    "ml_centroid_classify" ->
      """WITH v AS (
           SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 16777216) AS BIGINT)) AS v
           FROM embeddings
           WHERE embedding IS NOT NULL AND len(embedding) = 64
             AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         tr AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
         te AS (SELECT * FROM v WHERE vec_id % 5 = 0),
         comp AS (
           SELECT label, g.pos,
             (sum(tr.v[g.pos + 1]) + count(*) * 1073741824) // count(*)
               - 1073741824 AS c
           FROM tr CROSS JOIN generate_series(0, 63) AS g(pos)
           GROUP BY label, g.pos),
         d AS (
           SELECT te.vec_id, te.label AS true_label, comp.label AS pred_label,
             sum((te.v[comp.pos + 1] - comp.c) * (te.v[comp.pos + 1] - comp.c)) AS d2
           FROM te CROSS JOIN comp
           GROUP BY te.vec_id, te.label, comp.label),
         best AS (
           SELECT true_label, pred_label,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY d2, pred_label) AS rk
           FROM d)
         SELECT true_label, pred_label, count(*) AS n
         FROM best WHERE rk = 1
         GROUP BY true_label, pred_label
         ORDER BY true_label, pred_label""",

    // Flesch reading ease, single-division integer milli form
    "text_readability" ->
      """WITH c AS (
           SELECT doc_id,
             greatest(CAST(len(list_filter(string_split(text, ' '),
               t -> t <> '')) AS BIGINT), 1) AS w,
             greatest(CAST(length(regexp_replace(text, '[.!?]+', '#', 'g'))
               - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT),
               1) AS s,
             CAST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
               - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
               AS BIGINT) AS syl
           FROM documents),
         f AS (
           SELECT doc_id, w AS n_words, s AS n_sents, syl AS n_syllables,
             greatest(206835 * s * w - 1015 * w * w - 84600 * syl * s,
               0) // (s * w) AS fre_milli
           FROM c)
         SELECT doc_id, n_words, n_sents, n_syllables, fre_milli,
           CASE WHEN fre_milli >= 90000 THEN 'very_easy'
                WHEN fre_milli >= 70000 THEN 'easy'
                WHEN fre_milli >= 50000 THEN 'medium'
                WHEN fre_milli >= 30000 THEN 'hard'
                ELSE 'very_hard' END AS band
         FROM f ORDER BY doc_id""",
  )
}
