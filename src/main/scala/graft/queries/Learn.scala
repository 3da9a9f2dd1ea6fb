package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Model-adjacent operators — the evaluation and feature-engineering
  * steps that sit between a curated corpus and a trainer: target
  * encoding, exact ROC AUC, histogram-based split finding, probability
  * calibration, nearest-centroid classification, and readability
  * scoring. The reference's pipeline stops at feature extraction
  * (reference: src/query/feature.rs — per-record derived columns); this
  * family carries the same data onward to the model-facing steps a
  * production pipeline runs next.
  *
  * Conventions follow [[Warehouse]]: every output value is either an
  * actual data value, an exact integer, or an integer fixed-point
  * quantity (`_ppm` / `_milli`), so every query here is hash-exact
  * against its DuckDB oracle with zero tolerance. Division is always
  * nonnegative-by-construction (shifted where needed) so Spark's `div`
  * (truncation) and DuckDB's `//` (floor) agree.
  */
object Learn {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.eventsTsUs(s, dir)

  // ===== feature engineering =====

  /** LEAVE-ONE-OUT TARGET ENCODING of a categorical feature — the
    * high-cardinality-categorical workhorse (market segment → urgency
    * rate): each row's encoding is its category's smoothed positive
    * rate computed WITHOUT the row's own label (the leakage guard), so
    * train-time features match what a fold-honest trainer may see.
    *
    * Exact integer semantics (the defined encoding, not a float
    * approximation): with per-category (n_c, pos_c), global prior
    * `prior_ppm = (10⁶·gpos) div gn`, and smoothing mass m = 10,
    *   enc_ppm = (10⁶·(pos_c − y) + m·prior_ppm) div (n_c − 1 + m).
    * Every term is a nonnegative long (10⁶·pos_c ≤ 10⁶·|rows|, exact
    * to ~9·10¹² rows), so the oracle replays it digit-for-digit.
    *
    * Scale: one |categories|-row groupBy (map-side partials), the
    * category table and the 1-row prior broadcast back onto the scan —
    * the row-level transform is scan-local, and the report rolls up to
    * |categories|×2 rows. The LOO subtraction needs no second pass:
    * the row's own label is subtracted algebraically. */
  def mlTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val oc = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
    val cat = oc.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_cat"), sum(col("y")).as("pos_cat"))
    val prior = cat.agg(
      expr("(1000000 * sum(pos_cat)) div sum(n_cat)").as("prior_ppm"))
    oc.join(broadcast(cat), Seq("segment"))
      .crossJoin(broadcast(prior))
      .withColumn("enc_ppm",
        expr("(1000000 * (pos_cat - y) + 10 * prior_ppm) div (n_cat + 9)"))
      .groupBy(col("segment"), col("y"), col("n_cat"), col("pos_cat"),
        col("prior_ppm"), col("enc_ppm"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("segment"), col("y"), col("n_rows"), col("n_cat"),
        col("pos_cat"), col("prior_ppm"), col("enc_ppm"))
      .orderBy(col("segment"), col("y"))
  }

  // ===== evaluation =====

  /** EXACT ROC AUC per group via the Mann-Whitney rank-sum — the
    * standard offline-eval metric, computed exactly (average ranks on
    * ties) instead of by trapezoid approximation over thresholded
    * points. Score = `value`, label = a deterministic treatment cohort
    * (user_id % 10 < 3 — the stand-in for a model target the synthetic
    * corpus lacks; a real deployment plugs its label column in here).
    *
    * Rank algebra, all integers: with ascending ranks rn (ties broken
    * by event_id only to make the ranking total — the tie CORRECTION
    * restores average ranks), each distinct score's tied block spans
    * [lo, hi], so twice the positives' rank-sum is Σ pos_v·(lo+hi),
    * U₂ = 2R − npos(npos+1), auc_ppm = (10⁶·U₂) div (2·npos·nneg).
    * The 10⁶·U₂ product is widened through DECIMAL(38,0) (long
    * overflows past ~3·10⁹ rows/group; decimal is exact to 10³⁸).
    *
    * Scale: the ranking is [[Warehouse.groupedRank]]'s two-phase
    * distributed selection (range-partition + per-partition window +
    * broadcast offsets — no one-task-per-group sort funnel); the
    * tie-block rollup is a (group, score) groupBy with map-side
    * partials; the final relation is |groups| rows. */
  def mlAucExact(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(
      col("event_type"), col("value"),
      when(col("user_id") % 10 < 3, 1L).otherwise(0L).as("y"),
      col("event_id"))
    val ranked = Warehouse.groupedRank("auc", s, dir, ev,
      Seq("event_type"), Seq(col("value").asc, col("event_id").asc))
    ranked
      .groupBy(col("event_type"), col("value"))
      .agg(sum(col("y")).as("pos_v"), min(col("rn")).as("lo"),
        max(col("rn")).as("hi"), max(col("n")).as("n"))
      .groupBy(col("event_type"))
      .agg(sum(col("pos_v") * (col("lo") + col("hi"))).as("rs2"),
        sum(col("pos_v")).as("npos"), max(col("n")).as("n"))
      .select(col("event_type"), col("n"), col("npos"),
        (col("n") - col("npos")).as("nneg"),
        expr("""CAST((CAST(rs2 - npos * (npos + 1) AS DECIMAL(38,0)) * 1000000)
                div (2 * npos * (n - npos)) AS BIGINT)""").as("auc_ppm"))
      .orderBy(col("event_type"))
  }

  /** HISTOGRAM-BASED BEST-SPLIT FINDING — one boosting round of a
    * regression stump on a binary label (returnflag = 'R'), the
    * LightGBM/XGBoost histogram trick distribution-first: the corpus
    * collapses to a ≤ |bins| histogram of (count, positives) per
    * feature in ONE map-side-combinable groupBy, and every split
    * decision happens on that bounded relation — the corpus is
    * touched exactly once regardless of how many candidates exist.
    *
    * The split criterion is variance reduction for a 0/1 label:
    * maximize g = posL²/nL + posR²/nR. Candidates are compared
    * EXACTLY over the rationals by a two-level quotient/remainder
    * comparator: writing posL² = qL·nL + rL (decimal-widened squaring,
    * long quotients), g = Q + (rL·nR + rR·nL)/(nL·nR) with Q = qL+qR
    * and the fraction in [0, 2) — so ΔQ ≥ 2 decides outright, and the
    * residual case cross-multiplies A = rL·nR + rR·nL over the two
    * denominators in DECIMAL(38,0) (bounded by n⁴/8: exact past 10⁹
    * rows, where the naive num·den cross product would already
    * overflow 38 digits at ~6·10⁷). Ties break to the lexicographically
    * smallest (feature, threshold) — a total, engine-independent order.
    *
    * Scale: histogram groupBy is the only corpus-scale op; the
    * cumulative windows and the O(|bins|²) comparator join run on a
    * ≤ 61-row relation. Deeper trees iterate this per node on the
    * filtered corpus — same shape, same cost model. */
  def mlStumpSplit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"),
      expr("CAST(floor(l_discount * 100) AS BIGINT)").as("disc"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val hist = li
      .select(explode(array(
        struct(lit("qty").as("feature"), col("qty").as("bin")),
        struct(lit("disc").as("feature"), col("disc").as("bin")))).as("fb"),
        col("y"))
      .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"), col("y"))
      .groupBy(col("feature"), col("bin"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    // cumulative prefix per feature: ≤ 51 bins per feature — the windows
    // run on the histogram, never the corpus
    val wf = Window.partitionBy(col("feature")).orderBy(col("bin"))
    val wt = Window.partitionBy(col("feature"))
    val cand = hist
      .withColumn("nl", sum(col("cnt")).over(wf))
      .withColumn("posl", sum(col("pos")).over(wf))
      .withColumn("n", sum(col("cnt")).over(wt))
      .withColumn("post", sum(col("pos")).over(wt))
      .filter(col("nl") < col("n")) // right side must be nonempty
      .select(col("feature"), col("bin").as("threshold"),
        col("nl"), col("posl"),
        (col("n") - col("nl")).as("nr"), (col("post") - col("posl")).as("posr"))
      // quotient/remainder decomposition of posL²/nL and posR²/nR
      .withColumn("ql", expr("CAST(posl AS DECIMAL(38,0)) * posl div nl"))
      .withColumn("rl",
        expr("CAST(CAST(posl AS DECIMAL(38,0)) * posl % nl AS BIGINT)"))
      .withColumn("qr", expr("CAST(posr AS DECIMAL(38,0)) * posr div nr"))
      .withColumn("rr",
        expr("CAST(CAST(posr AS DECIMAL(38,0)) * posr % nr AS BIGINT)"))
      .withColumn("q", col("ql") + col("qr"))
      .withColumn("a", col("rl") * col("nr") + col("rr") * col("nl"))
      .withColumn("d", col("nl") * col("nr"))
    // b strictly beats a over the rationals (or ties with a smaller
    // (feature, threshold)): ΔQ ≥ 2 decides outright; |ΔQ| ≤ 1 compares
    // ΔQ·Da·Db + Ab·Da − Aa·Db exactly in decimal
    def diffExpr = expr(
      """CAST(b.q - a.q AS DECIMAL(38,0)) * a.d * b.d
         + CAST(b.a AS DECIMAL(38,0)) * a.d - CAST(a.a AS DECIMAL(38,0)) * b.d""")
    def beats = (col("b.q") - col("a.q") >= 2) ||
      ((col("b.q") - col("a.q")).between(-1, 1) &&
        (diffExpr > 0 ||
          (diffExpr === 0 &&
            struct(col("b.feature"), col("b.threshold")) <
              struct(col("a.feature"), col("a.threshold")))))
    val a = cand.alias("a")
    val b = cand.alias("b")
    // per-feature best: no same-feature candidate beats it
    val beatenInFeature = a.join(b,
        col("a.feature") === col("b.feature") && beats, "left_semi")
      .select(col("a.feature").as("feature"), col("a.threshold").as("threshold"))
    val perFeature = cand.join(beatenInFeature,
      Seq("feature", "threshold"), "left_anti")
    // global best among the per-feature winners (≤ 2 rows)
    val pa = perFeature.alias("a")
    val pb = perFeature.alias("b")
    val beatenGlobal = pa.join(pb,
        col("a.feature") =!= col("b.feature") && beats, "left_semi")
      .select(col("a.feature").as("feature"), lit(true).as("beaten"))
    perFeature.join(beatenGlobal, Seq("feature"), "left")
      .select(col("feature"), col("threshold"),
        col("nl").as("n_left"), col("posl").as("pos_left"),
        col("nr").as("n_right"), col("posr").as("pos_right"),
        coalesce(!col("beaten"), lit(true)).as("is_best"))
      .orderBy(col("feature"))
  }

  /** PROBABILITY CALIBRATION BINS (reliability diagram) — the
    * observed-vs-predicted decile table an eval pipeline prints for a
    * scored population. The score is the o_totalprice percentile rank
    * in ppm ((rn−1)·10⁶ div (n−1) — a deterministic stand-in for a
    * model probability; a real deployment feeds its score column), the
    * outcome is priority = '1-URGENT', and each decile reports count,
    * positives, observed rate, mean score, and the calibration gap —
    * all exact integers.
    *
    * Scale: the percentile rank is [[Warehouse.groupedRank]]'s
    * distributed selection (no global one-task sort); the decile
    * rollup is a 10-row groupBy with map-side partials. */
  def mlCalibrationBins(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      lit(1L).as("g"), col("o_totalprice"), col("o_orderkey"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
    val ranked = Warehouse.groupedRank("calib", s, dir, o,
      Seq("g"), Seq(col("o_totalprice").asc, col("o_orderkey").asc))
    ranked
      .withColumn("score_ppm",
        expr("((rn - 1) * 1000000) div greatest(n - 1, 1)"))
      .withColumn("bucket", least(expr("score_ppm div 100000"), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("score_ppm")).as("ssum"))
      .select(col("bucket"), col("n"), col("pos"),
        expr("(1000000 * pos) div n").as("obs_ppm"),
        expr("ssum div n").as("avg_score_ppm"),
        (expr("(1000000 * pos) div n") - expr("ssum div n")).as("gap_ppm"))
      .orderBy(col("bucket"))
  }

  /** PRECISION/RECALL SWEEP over decile thresholds — the PR-curve table
    * next to [[mlCalibrationBins]]'s reliability diagram, on the same
    * score (o_totalprice percentile rank, ppm) and outcome (priority =
    * '1-URGENT'). "Predict positive at score ≥ t" for t = 0, 0.1, …,
    * 0.9: per threshold the exact confusion counts and integer-ppm
    * precision/recall.
    *
    * Scale: shares the STAGED "calib" rank relation with
    * [[mlCalibrationBins]] verbatim (whichever runs first pays the
    * landing — the [[Warehouse.aggWinsorize]] reuse story); the corpus
    * rolls up to an 11-bucket histogram and every threshold's counts
    * are cumulative sums over that bounded relation, so the sweep costs
    * one corpus pass regardless of how many thresholds it reports. */
  def mlPrCurve(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      lit(1L).as("g"), col("o_totalprice"), col("o_orderkey"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
    val ranked = Warehouse.groupedRank("calib", s, dir, o,
      Seq("g"), Seq(col("o_totalprice").asc, col("o_orderkey").asc))
    val buckets = ranked
      .withColumn("score_ppm",
        expr("((rn - 1) * 1000000) div greatest(n - 1, 1)"))
      .withColumn("bucket", expr("score_ppm div 100000")) // 0..10
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    // cumulative-from-above over the <=11-row histogram: rows predicted
    // positive at threshold t = buckets >= t
    val wAbove = Window.partitionBy(lit(1)).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    buckets
      .withColumn("pred_n", sum(col("cnt")).over(wAbove))
      .withColumn("tp", sum(col("pos")).over(wAbove))
      .withColumn("n_all", sum(col("cnt")).over(wAll))
      .withColumn("pos_all", sum(col("pos")).over(wAll))
      .filter(col("bucket") <= 9)
      .select(
        (col("bucket") * 100000).as("threshold_ppm"),
        col("tp"), (col("pred_n") - col("tp")).as("fp"),
        (col("pos_all") - col("tp")).as("fn"),
        (col("n_all") - col("pred_n") - col("pos_all") + col("tp")).as("tn"),
        expr("(1000000 * tp) div pred_n").as("precision_ppm"),
        expr("(1000000 * tp) div greatest(pos_all, 1)").as("recall_ppm"))
      .orderBy(col("threshold_ppm"))
  }

  /** BOOTSTRAP CONFIDENCE INTERVAL for the per-type mean — the
    * uncertainty quantification an eval pipeline attaches to every
    * reported metric, as a DETERMINISTIC Poisson-style bootstrap (the
    * dataset-pipeline requirement: re-running must reproduce the
    * interval bit-for-bit): replicate b resamples each row with weight
    * w = #{j ∈ 0..2 : ((id mod 2²⁰)·2654435761 + b·1000003 + j·97)
    * mod 1024 < 341} — Binomial(3, ⅓), mean ≈ 1, pure integer
    * arithmetic both engines evaluate identically (no engine RNG, no
    * xxhash dependency in the oracle). 32 replicates; the CI is the
    * [2nd, 31st] order statistic of the replicate means (≈ 90 %
    * central), every mean an exact integer milli-cent floor division.
    *
    * Scale: the 32 replicates FUSE into one corpus pass — the explode
    * inflates rows scan-side but the partial aggregation combines
    * map-side, so the shuffle carries |types|·32 rows; the order
    * statistics run on that bounded relation. This is the
    * one-pass-B-replicates bootstrap a 100 TB metric job runs, vs B
    * full passes. */
  def mlBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      (col("event_id") % 1048576L).as("hid"))
    val reps = ev
      .select(col("event_type"), col("cents"), col("hid"),
        explode(sequence(lit(0L), lit(31L))).as("b"))
      .withColumn("w", (0 to 2).map(j =>
        when((col("hid") * 2654435761L + col("b") * 1000003L + j * 97L)
          % 1024 < 341, 1L).otherwise(0L)).reduce(_ + _))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("cents")).as("swc"), sum(col("w")).as("sw"))
      .withColumn("mean_milli", expr("(1000 * swc) div greatest(sw, 1)"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("mean_milli"), col("b"))
    val ci = reps
      .withColumn("rk", row_number().over(wRank))
      .groupBy(col("event_type"))
      .agg(max(when(col("rk") === 2, col("mean_milli"))).as("ci_lo_milli"),
        max(when(col("rk") === 31, col("mean_milli"))).as("ci_hi_milli"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("(1000 * sum(cents)) div count(1)").as("mean_milli"))
      .join(broadcast(ci), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  // ===== classification =====

  /** NEAREST-CENTROID CLASSIFICATION over the embedding corpus —
    * train/test split by vec_id % 5, per-label centroids trained on
    * the 80 %, the held-out 20 % classified to the nearest centroid,
    * and the label × prediction confusion matrix reported.
    *
    * INTEGER END-TO-END (the [[graft.ext.Similarity]] MeanScale
    * playbook, pushed one step further): vectors quantize to
    * floor(x·2²⁴) — a float×2²⁴ is an exponent shift, exact in IEEE —
    * so centroid training is per-dimension LONG sums (exact in any
    * partial-agg merge order; the mean divides once at publication,
    * floor-shifted by +2³⁰ to keep the division nonnegative), and the
    * distance argmin compares INTEGER squared distances with a
    * lowest-label tie-break. No float ever enters an aggregation, so
    * the whole lifecycle is hash-exact against a pure-SQL DuckDB
    * oracle — no captured-literal gate needed where the float k-means
    * family ([[Ext]] ivf64) required one.
    *
    * Scale: training shuffles (label, dim) partial sums — k·64 rows of
    * state regardless of corpus size; the trained model folds into ONE
    * broadcast row and inference is scan-local (zip_with + aggregate
    * inside codegen, argmin via array_min's struct order) — zero
    * shuffle until the k² confusion rollup. */
  def mlCentroidClassify(s: SparkSession, dir: String): DataFrame = {
    val vecs = t(s, dir, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64 &&
        !exists(col("embedding"), _.isNull))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16777216) AS BIGINT))")
          .as("v"))
    val train = vecs.filter(col("vec_id") % 5 =!= 0)
    val test = vecs.filter(col("vec_id") % 5 === 0)
    val comp = train
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      // +2³⁰ shift keeps the numerator positive (|x_int| < 2²⁵), so
      // div (truncation) == floor in both engines; the shift divides out
      // exactly: (sx + cnt·K) div cnt = K + floor(sx/cnt)
      .withColumn("c", expr("(sx + cnt * 1073741824) div cnt - 1073741824"))
    val cent = comp.groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), p -> p.c)")
        .as("carr"))
    val model = cent.agg(
      expr("sort_array(collect_list(struct(label AS l, carr AS c)))").as("cents"))
    test.crossJoin(broadcast(model))
      .withColumn("best", expr(
        """array_min(transform(cents, ce -> struct(
             aggregate(zip_with(v, ce.c, (a, b) -> (a - b) * (a - b)),
                       CAST(0 AS BIGINT), (acc, e) -> acc + e) AS d,
             ce.l AS pred)))"""))
      .groupBy(col("label").as("true_label"), col("best.pred").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  // ===== text =====

  /** FLESCH READING-EASE SCORING per document — the readability
    * heuristic quality pipelines bucket corpora by. Counts are regex
    * group counts computed by the replace-and-measure trick (length
    * with each group collapsed to one char minus length with groups
    * removed — the same expression both engines evaluate on identical
    * strings): syllables ≈ [aeiouy]+ groups of the lowercased text,
    * sentences = [.!?]+ groups (min 1), words = whitespace tokens
    * ([[graft.ext.Text.tokens]] convention, min 1).
    *
    * The score is the single-division integer form of
    * 206.835 − 1.015·(w/s) − 84.6·(syl/w), in milli-points over the
    * common denominator s·w and clamped at 0:
    *   fre_milli = max(206835·s·w − 1015·w² − 84600·syl·s, 0) div (s·w)
    * — longs throughout (w ≤ 10⁶-token docs stay under 10¹⁸), so the
    * gate is zero-tolerance. Scale: scan-local, zero shuffle but the
    * driver-facing ORDER BY. */
  def textReadability(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        greatest(size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long"), lit(1L)).as("w"),
        greatest((length(regexp_replace(col("text"), "[.!?]+", "#")) -
          length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long"),
          lit(1L)).as("s"),
        (length(regexp_replace(lower(col("text")), "[aeiouy]+", "#")) -
          length(regexp_replace(lower(col("text")), "[aeiouy]+", "")))
          .cast("long").as("syl"))
      .select(col("doc_id"), col("w").as("n_words"), col("s").as("n_sents"),
        col("syl").as("n_syllables"),
        expr("""greatest(206835 * s * w - 1015 * w * w - 84600 * syl * s,
                CAST(0 AS BIGINT)) div (s * w)""").as("fre_milli"))
      .withColumn("band",
        when(col("fre_milli") >= 90000, "very_easy")
          .when(col("fre_milli") >= 70000, "easy")
          .when(col("fre_milli") >= 50000, "medium")
          .when(col("fre_milli") >= 30000, "hard")
          .otherwise("very_hard"))
      .orderBy(col("doc_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_target_encode" -> mlTargetEncode _,
    "ml_auc_exact" -> mlAucExact _,
    "ml_stump_split" -> mlStumpSplit _,
    "ml_calibration_bins" -> mlCalibrationBins _,
    "ml_pr_curve" -> mlPrCurve _,
    "ml_bootstrap_ci" -> mlBootstrapCi _,
    "ml_centroid_classify" -> mlCentroidClassify _,
    "text_readability" -> textReadability _,
  )
}
