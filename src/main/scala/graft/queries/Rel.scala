package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Geo, Quantifiers, Sessionize, Tables}

/** Relational operator coverage (SURVEY.md §2.2–§2.7), each shape the
  * reference exercises re-expressed over the driver's TPC-H-ish tables.
  *
  * Conventions for DuckDB-oracle hash parity:
  *  - every query ends in a deterministic ORDER BY on non-null key columns;
  *  - integer outputs are widened to BIGINT on both sides;
  *  - floating aggregates are rounded (2–4 dp) on both sides;
  *  - event time is exact integer microseconds, adaptive to the source's
  *    ts storage (see [[graft.core.Tables.tsMicros]]) ≡ DuckDB
  *    `epoch_us(ts)` on either generation.
  */
object Rel {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** events with ts as exact integer microseconds (see class doc). */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.eventsTsUs(s, dir)

  // ===== aggregation =====

  /** Flagship: TPC-H Q1 shape — multi-agg groupBy (A-series, P9). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A1/A2: countDistinct ×2 + derived product (reference complexity stat,
    * `Parallel/Trajectory Clustering.py:62–68`). */
  def aggCountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n_orders"))
      .withColumn("complexity", col("n_cust") * col("n_status"))
      .orderBy(col("o_orderpriority"))

  /** A3: exact percentile per group (reference uses percentile_approx for
    * per-vehicle gap thresholds, `Parallel/Pattern Extraction.scala:124`;
    * exact form here so the oracle can match bit-for-bit).
    *
    * r12 OPTIMIZATION (guide §1.2/§5 — per-task state): the `percentile`
    * UDAF buffers EVERY group value in one ObjectHashAggregate buffer
    * (boxed OpenHashMap appends, ~6 µs/row measured; an OOM funnel at a
    * real corpus — the r12 agg_approx de-pessimization note). The exact
    * interpolated value needs only the TWO order statistics around
    * pos = p·(n−1), so this now rides [[Warehouse.groupedRank]]'s
    * two-phase distributed selection (staged range partitioning, fully
    * parallel) and reproduces Spark's Percentile.getPercentile formula
    * — `lowerKey·(higher − pos) + higherKey·(pos − lower)` with
    * pos = p·(n−1) — as the identical IEEE expression tree; any ulp-level
    * reassociation is absorbed by the 6 dp round (true values have ≤4
    * decimals, so no 6 dp half-way boundary is reachable). Values
    * verified hash-identical against the unchanged DuckDB oracle at all
    * three SFs. Warm sf0.1: 2.6 s / 3.9 CPU-s → ~0.6 s.
    * (lineitem carries no null prices at any SF — checked — so ranking
    * all rows equals the UDAF's ignore-nulls contract here.) */
  def aggPercentile(s: SparkSession, dir: String): DataFrame = {
    val ranked = Warehouse.groupedRank("a3pct", s, dir,
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber")),
      Seq("l_returnflag"),
      Seq(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc))
    def interp(p: String): Column = {
      val pos = expr(s"$p * cast(n - 1 as double)")
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = max(when(col("rn") === lo.cast("long") + 1, col("l_extendedprice")))
      val vHi = max(when(col("rn") === hi.cast("long") + 1, col("l_extendedprice")))
      // aggregate the two order statistics, then interpolate outside the
      // agg (pos/lo/hi are group-constant: they only read n)
      struct(vLo.as("vlo"), vHi.as("vhi"))
    }
    ranked
      .groupBy(col("l_returnflag"))
      .agg(
        interp("0.95").as("s95"),
        interp("0.5").as("s50"),
        max(col("n")).as("n"))
      .select(
        col("l_returnflag"),
        round(expr(
          """CASE WHEN floor(0.95 * cast(n - 1 as double)) = ceil(0.95 * cast(n - 1 as double))
                  THEN s95.vlo
                  ELSE s95.vlo * (ceil(0.95 * cast(n - 1 as double)) - 0.95 * cast(n - 1 as double))
                     + s95.vhi * (0.95 * cast(n - 1 as double) - floor(0.95 * cast(n - 1 as double)))
             END"""), 6).as("p95_price"),
        round(expr(
          """CASE WHEN floor(0.5 * cast(n - 1 as double)) = ceil(0.5 * cast(n - 1 as double))
                  THEN s50.vlo
                  ELSE s50.vlo * (ceil(0.5 * cast(n - 1 as double)) - 0.5 * cast(n - 1 as double))
                     + s50.vhi * (0.5 * cast(n - 1 as double) - floor(0.5 * cast(n - 1 as double)))
             END"""), 6).as("median_price"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Statistical-aggregate completeness (absent in the reference, core
    * analytics surface): sample stddev/variance + bivariate corr/covar.
    * Definitions are the ANSI ones in both engines; rounding at 4 dp
    * absorbs accumulation-order fp drift (values O(10⁴), relative error
    * ~1e-12 — nowhere near a half-way boundary). */
  def aggStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Sketch-based distinct counting under a pinned accuracy gate — the
    * 100 TB path for A1's countDistinct: exact distinct shuffles every
    * distinct value; HyperLogLog++ (rsd 0.02 → 2⁄√m ≈ 2% std error)
    * reduces per group to a fixed-size sketch merged map-side. The gate
    * follows the ANN/SimHash recall-gate pattern: the output carries the
    * EXACT count (hash-matched against DuckDB's count DISTINCT) plus a
    * boolean pinning |approx − exact| ≤ 10 % · exact — the sketch is
    * deterministic for given data, so once green the bound is a fact of
    * the dataset, and a sketch regression flips a hash-checked value.
    *
    * The exact and sketch sides run as SEPARATE aggregations joined
    * over |types| broadcast rows: combined, `countDistinct` plans an
    * Expand whose first-phase grouping is per (type, user_id) — and
    * every intermediate group then carries its own HLL register array
    * (the distinct×sketch aggregation trap measured at 102 s vs 2.5 s
    * on [[graft.queries.Ext.aggApprox]]'s percentile variant; here the
    * buffer is the rsd-0.02 HLL's 4 KB registers × |users|). */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("_a"))
      .join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("_a") - col("n_exact")) <= col("n_exact") * 0.10)
          .as("within_10pct"))
      .orderBy(col("event_type"))
  }

  /** A4: EXISTS-per-group via max(when) (`Standalone/Pattern
    * Extraction.scala:106–116`). */
  def aggExists(s: SparkSession, dir: String): DataFrame = {
    val flags = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(Quantifiers.existsFlag(col("l_quantity") > 45).as("has_big"))
    t(s, dir, "orders")
      .join(flags, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(coalesce(col("has_big"), lit(0))).as("n_with_big"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** A5: FORALL via two-level agg — the reference's ∀∃ quantifier
    * (`Standalone/Blind Zone Detection.scala:112–143`). */
  def aggForall(s: SparkSession, dir: String): DataFrame = {
    val f = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(Quantifiers.forallFlag(col("l_discount") < 0.08).as("all_low_disc"))
    t(s, dir, "orders")
      .join(f, col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("all_low_disc")).as("n_all_low"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  /** A6: order-explicit trajectory assembly. The reference's bare
    * `collect_list(struct(lng,lat))` (`Parallel/Trajectory
    * Clustering.py:143–145`) silently depends on read order; here the
    * collected array is sorted on an explicit key before use. */
  def aggSortedCollect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
            x => x.getField("l_partkey").cast("string")),
          ",").as("parts_in_line_order"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_orderkey"))

  /** A7: distinct projection. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  /** A8 made deterministic: dedup on a subset keeping the earliest row.
    * (`dropDuplicates(subset)` keeps an arbitrary row — a latent
    * nondeterminism in the reference (`Parallel/Pattern
    * Extraction.scala:81`) fixed here with an explicit tie-break.) */
  def aggDedupRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Hierarchical rollup (absent in the reference — API completeness):
    * per (returnflag, linestatus) + per returnflag + grand total. */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Full cube with grouping() markers (distinguishes subtotal rows from
    * genuine null keys). */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("g_status"), col("g_prio"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Pivot: event-type counts as columns per user (wide-format rollup). */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .pivot(col("event_type"),
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Unpivot/melt: wide per-part measures to long (column, value) rows. */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") % 40 === 0)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        round(col("p_retailprice"), 2).as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "measure", "value")
      .orderBy(col("p_partkey"), col("measure"))

  /** Scalar-subquery threshold — the reference computes a driver-side
    * scalar and embeds it as a literal (`Standalone/Blind Zone
    * Detection.scala:58–59`, a two-pass plan with a collect between);
    * here the scalar stays in-plan via a broadcast cross join, so one job
    * covers both passes. Integral-valued quantities make the avg
    * bit-deterministic for the oracle. */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val thr = li.agg(avg(col("l_quantity")).as("avg_qty"))
    li.crossJoin(broadcast(thr))
      .filter(col("l_quantity") > col("avg_qty"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("l_returnflag"))
  }

  /** Range-based window frame (absent in the reference): sum of events
    * within the last 30 minutes of each row, per user — value-range frame,
    * not row count. */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-1800L * 1000000L, 0L)
    // count/max only: engines disagree on fp addition order inside
    // range-frame sums (DuckDB uses segment trees), so keep the frame
    // aggregates order-insensitive for exact parity
    events(s, dir)
      .withColumn("n_30m", count(lit(1)).over(w))
      .withColumn("max_30m", max(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("n_30m"), col("max_30m"))
      .orderBy(col("event_id"))
  }

  // ===== projection / filter / scalar =====

  /** P1/P5/P13/P14: projection, predicate, cast, literal. */
  def projFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        floor(col("l_quantity")).as("qty_floor"),
        // 2-decimal prices × 0.9 have exactly 3 decimals — rounding at 3
        // keeps both engines off the half-way boundary (dialect parity).
        round(col("l_extendedprice") * lit(0.9), 3).as("discounted"),
        lit("R").as("tag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P9/P10: when/otherwise chain (reference signal grading shape,
    * `Standalone/Blind Zone Detection.scala:156–160`). */
  def projCaseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("size_class",
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large"))
      .groupBy(col("size_class"), col("p_brand"))
      .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 2).as("avg_price"))
      .orderBy(col("size_class"), col("p_brand"))

  /** P11/P12: null default + coalesce (`Parallel/Pattern
    * Extraction.scala:85–86`). */
  def projNullFill(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("big_price", when(col("o_totalprice") > 200000, col("o_totalprice")))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(col("big_price")).as("n_big"),
        round(sum(coalesce(col("big_price"), lit(0.0))), 2).as("sum_big"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** P6/P7: IN-list + compound boolean filter (`Parallel/Pattern
    * Extraction.scala:50`, `Standalone/Pattern Extraction.scala:157–161`). */
  def projIsinCompound(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(
        col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY") &&
          (col("c_acctbal") > 9000 || col("c_nationkey") === 3 ||
            col("c_custkey") % 100 === 0))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))

  // ===== scalar functions =====

  /** F1–F3: timestamp parse/format/epoch round-trip. */
  def fnDatetime(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .select(
        col("event_id"),
        col("ts_us"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        unix_micros(try_to_timestamp(
          date_format(col("t"), "yyyy-MM-dd HH:mm:ss"),
          lit("yyyy-MM-dd HH:mm:ss"))).as("reparsed_us"),
        hour(col("t")).cast("long").as("h"),
        date_format(col("t"), "yyyy-MM-dd").as("day"))
      .orderBy(col("event_id"))

  /** JSON functions: typed `from_json` parse + path extraction over the
    * events `props` payload (semi-structured column surface). */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("parsed", from_json(col("props"), lit("k BIGINT")))
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("parsed.k")).as("sum_k"),
        sum(col("k_path")).as("sum_k_path"),
        max(col("parsed.k")).as("max_k"),
        count(col("parsed.k")).as("n_parsed"))
      .orderBy(col("event_type"))

  /** F4: concat_ws composite key (`Parallel/Trajectory
    * Clustering.py:227–228`). */
  def fnConcat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        concat_ws("_", col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
          .as("composite_key"))
      .orderBy(col("o_orderkey"))

  /** F5: haversine as pure column math (codegen-fused, no UDF) over
    * synthetic coordinates; J2-style dim join underneath. */
  def fnHaversine(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_custkey"),
      (col("c_custkey") % 120 * 0.5 - 30).as("clat"),
      (col("c_custkey") % 300 * 0.6 - 90).as("clng"),
      col("c_nationkey"))
    val sup = t(s, dir, "supplier").select(
      col("s_suppkey"),
      (col("s_suppkey") % 120 * 0.7 - 30).as("slat"),
      (col("s_suppkey") % 300 * 0.9 - 90).as("slng"),
      col("s_nationkey"))
    c.join(sup, col("c_nationkey") === col("s_nationkey"))
      .select(
        col("c_custkey"), col("s_suppkey"),
        round(Geo.haversineMeters(col("clat"), col("clng"), col("slat"), col("slng"))
          / 1000.0, 1).as("dist_km"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  // ===== joins =====

  /** J1: left-semi — the honest form of the reference's
    * inner-join-on-distinct-keys (`Standalone/Blind Zone
    * Detection.scala:68`). */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        t(s, dir, "lineitem").filter(col("l_quantity") > 49).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  /** Anti join (absent in the reference — API completeness). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J2/J3: chained broadcast dim joins — star-schema rollup. At 100 TB
    * the fact side streams; every dim is broadcast, zero fact shuffles
    * before the final agg. */
  def joinBroadcastDims(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))

  /** TPC-H Q5 shape — the canonical six-table join-order test: local
    * supplier revenue per nation inside one region and one order-date
    * year, with the supplier-customer co-nationality predicate that
    * makes naive join orders explode. The fact table (lineitem) joins
    * orders on its key; every dimension chain (customer→nation→region,
    * supplier) broadcasts — the plan the optimizer should find anyway,
    * pinned here so the one big shuffle is lineitem⋈orders and nothing
    * else (`PlanSpec`). Revenue rounding parity follows `q1_agg`. */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val custNation = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    t(s, dir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") === col("c_nationkey")) // local supplier
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** J4: left outer join with agg side + null backfill. */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame = {
    val oc = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("spent"))
    t(s, dir, "customer")
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("spent"), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** J5: composite-key join (`Parallel/Trajectory Clustering.py:326`). */
  def joinCompositeKey(s: SparkSession, dir: String): DataFrame = {
    val lastLine = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_linenumber")).as("l_linenumber"))
    t(s, dir, "lineitem")
      .join(lastLine, Seq("l_orderkey", "l_linenumber"))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("last_linenumber"),
        round(col("l_extendedprice"), 2).as("last_price"))
      .orderBy(col("l_orderkey"))
  }

  /** J6: theta self-join — equi key + `<` inequality, the reference's
    * per-line trajectory pair generator (`Parallel/Trajectory
    * Clustering.py:232–236`). Equi part shuffles; `<` applied post-match. */
  def joinThetaPairs(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "supplier")
      .select(col("s_suppkey").as("k1"), col("s_nationkey").as("n1"), col("s_acctbal").as("b1"))
    val b = t(s, dir, "supplier")
      .select(col("s_suppkey").as("k2"), col("s_nationkey").as("n2"), col("s_acctbal").as("b2"))
    a.join(b, col("n1") === col("n2") && col("k1") < col("k2"))
      .select(
        col("n1").cast("long").as("nationkey"),
        col("k1"), col("k2"),
        round(abs(col("b1") - col("b2")), 2).as("bal_gap"))
      .orderBy(col("nationkey"), col("k1"), col("k2"))
  }

  // ===== windows =====

  /** W1/W2: lag + lead + exact µs gap (`Standalone/Pattern
    * Extraction.scala:76–81`). Null sentinels keep the oracle hash exact. */
  def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events(s, dir)
      .withColumn("prev_value", coalesce(lag(col("value"), 1).over(w), lit(-1.0)))
      .withColumn("next_value", coalesce(lead(col("value"), 1).over(w), lit(-1.0)))
      .withColumn("gap_us", coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w), lit(-1L)))
      .select(col("event_id"), col("user_id"), col("value"),
        col("prev_value"), col("next_value"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** W3/W4: argmax row per group via row_number over desc (`Standalone/
    * Blind Zone Detection.scala:105–108`). */
  def winArgmax(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("top_event"), col("value").as("top_value"))
      .orderBy(col("user_id"))
  }

  /** W5: running sum over unbounded-preceding frame (`Standalone/Pattern
    * Extraction.scala:128–129`). */
  def winRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("running_value", round(sum(col("value")).over(w), 2))
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("running_value"), col("running_n"))
      .orderBy(col("event_id"))
  }

  /** TIME-based RANGE frame — events in the trailing hour per user
    * (`rangeBetween` on the µs axis, the frame kind the rows-frame
    * family can't express: the window widens and narrows with event
    * DENSITY, not position — rate limiting, burst detection, trailing
    * activity features). Peers (equal ts) share one frame by RANGE
    * semantics in both engines; all outputs are integers (a trailing
    * count and the id of the frame-opening event), so the parity is
    * tolerance-free. One exchange on user_id serves the window. */
  def winRollingRange(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-(hourUs - 1), Window.currentRow)
    events(s, dir)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("first_in_frame", min(col("event_id")).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("n_1h"), col("first_in_frame"))
      .orderBy(col("event_id"))
  }

  /** W6–W8: forward/backward fill with ignoreNulls frames (`Parallel/
    * Pattern Extraction.scala:117–122`, `Standalone/Pattern
    * Extraction.scala:140–147`). Nulls synthesized on error events. */
  def winFill(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .withColumn("v", when(col("event_type") =!= "error", col("value")))
    val keys = Seq("user_id")
    val order = Seq(col("ts_us"), col("event_id"))
    val filled = Sessionize.backwardFill(
      Sessionize.forwardFill(base, keys, order, col("v"), "ffill"),
      keys, order, col("v"), "bfill")
    filled
      .select(
        col("event_id"), col("user_id"),
        coalesce(col("ffill"), lit(-1.0)).as("ffill"),
        coalesce(col("bfill"), lit(-1.0)).as("bfill"))
      .orderBy(col("event_id"))
  }

  /** W9/W10: gap sessionization + per-session rollup — the reference's
    * core signal-loss pattern logic as one reusable transform. */
  def winSessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.withSessionId(
        events(s, dir), Seq("user_id"), col("ts_us"),
        gapMicros = 1800L * 1000000L, tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))

  /** Native session_window (Structured-Streaming-compatible form of W10;
    * semantics: gap ≥ 30 min starts a new session). */
  def winSessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Hopping (sliding) time-window rollup: 10-minute windows every
    * 5 minutes, so each event lands in exactly len/slide = 2 windows —
    * the overlapping twin of the tumbling form. The oracle reproduces
    * Spark's epoch-aligned window-assignment arithmetic explicitly. */
  def winHopping(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(window(col("t"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("n_users"), col("value_sum"))
      .orderBy(col("window_start_us"))

  /** Ranking-window completeness (absent in the reference — rank /
    * dense_rank / ntile over a total order). */
  def winRankNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .filter(col("rnk") <= 8)
      .select(col("user_id"), col("event_id"), col("rnk").cast("long").as("rnk"),
        col("drnk").cast("long").as("drnk"), col("quartile").cast("long").as("quartile"))
      .orderBy(col("user_id"), col("rnk"), col("event_id"))
  }

  /** U7 generator surface: sequence + posexplode (UDTF-style row
    * generation). */
  def genExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        posexplode(sequence(lit(1L), col("o_orderkey") % 5 + 1)))
      .select(col("o_orderkey"), col("pos").cast("long").as("pos"), col("col").as("i"))
      .orderBy(col("o_orderkey"), col("pos"))

  /** SQL-text entry path: the same engine surface through `spark.sql`
    * over registered temp views (the reference drove everything through
    * `expr()` strings; this is the full-statement form). */
  def sqlTextRollup(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "customer").createOrReplaceTempView("v_customer")
    s.sql("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM v_orders JOIN v_customer ON o_custkey = c_custkey
      WHERE o_orderstatus = 'O'
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")
  }

  /** SQL-text CORRELATED SUBQUERIES — the EXISTS / NOT EXISTS / scalar
    * forms a SQL-first user writes daily, proven through the `spark.sql`
    * front door: orders split by whether any line discounts deeper than
    * 9 %, flagged when NO line was returned, with the per-order max
    * discount from a correlated scalar subquery. Catalyst de-correlates
    * all three into joins (EXISTS → semi, NOT EXISTS → anti, scalar →
    * aggregated left join), so the executed plan is the same join family
    * the DataFrame queries pin — this query exists to prove the SQL
    * surface compiles to it. */
  def sqlCorrelatedExists(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql("""
      SELECT o_orderstatus,
             CASE WHEN EXISTS (SELECT 1 FROM v_lineitem
                               WHERE l_orderkey = o_orderkey
                                 AND l_discount > 0.09)
                  THEN 'deep' ELSE 'shallow' END AS discount_band,
             NOT EXISTS (SELECT 1 FROM v_lineitem
                         WHERE l_orderkey = o_orderkey
                           AND l_returnflag = 'R') AS return_free,
             count(*) AS n_orders,
             round(sum((SELECT coalesce(max(l_discount), 0.0)
                        FROM v_lineitem
                        WHERE l_orderkey = o_orderkey)), 2) AS sum_max_disc
      FROM v_orders
      GROUP BY o_orderstatus, discount_band, return_free
      ORDER BY o_orderstatus, discount_band, return_free""")
  }

  /** Explicit GROUPING SETS (the general form behind cube/rollup):
    * per-returnflag totals, per-linestatus totals, and the grand total in
    * one pass — `grouping()` markers disambiguate the null slots and
    * make the ORDER BY total (null keys never sort against non-null). */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             grouping(l_returnflag) AS g_rf,
             grouping(l_linestatus) AS g_ls,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM v_lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
  }

  /** W9 exact: change-point segmentation on a derived 0/1 flag. */
  def winChangePoints(s: SparkSession, dir: String): DataFrame =
    Sessionize.withChangePointId(
        events(s, dir).withColumn("is_err",
          when(col("event_type") === "error", 1).otherwise(0)),
        Seq("user_id"), Seq(col("ts_us"), col("event_id")),
        col("is_err"), "err_burst_id")
      .filter(col("is_err") === 1)
      .groupBy(col("user_id"), col("err_burst_id"))
      .agg(count(lit(1)).as("burst_len"), min(col("ts_us")).as("burst_start_us"))
      .orderBy(col("user_id"), col("err_burst_id"))

  // ===== sorts / limits / set ops =====

  /** O1/O5: global top-k with total tie-break. */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"))

  /** O6: intersect + except + union. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nk"))
    val sn = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("nk"))
    cn.intersect(sn).withColumn("which", lit("both"))
      .union(cn.except(sn).withColumn("which", lit("customer_only")))
      .orderBy(col("which"), col("nk"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _,
    "agg_count_distinct" -> aggCountDistinct _,
    "agg_percentile" -> aggPercentile _,
    "agg_stats" -> aggStats _,
    "agg_approx_distinct" -> aggApproxDistinct _,
    "agg_exists" -> aggExists _,
    "agg_forall" -> aggForall _,
    "agg_sorted_collect" -> aggSortedCollect _,
    "agg_distinct" -> aggDistinct _,
    "agg_dedup_rows" -> aggDedupRows _,
    "agg_rollup" -> aggRollup _,
    "agg_cube" -> aggCube _,
    "agg_pivot" -> aggPivot _,
    "agg_unpivot" -> aggUnpivot _,
    "scalar_subquery" -> scalarSubquery _,
    "win_range_frame" -> winRangeFrame _,
    "proj_filter" -> projFilter _,
    "proj_case_when" -> projCaseWhen _,
    "proj_null_fill" -> projNullFill _,
    "proj_isin_compound" -> projIsinCompound _,
    "fn_datetime" -> fnDatetime _,
    "fn_json" -> fnJson _,
    "fn_concat" -> fnConcat _,
    "fn_haversine" -> fnHaversine _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "join_broadcast_dims" -> joinBroadcastDims _,
    "q5_multi_join" -> q5MultiJoin _,
    "join_left_outer" -> joinLeftOuter _,
    "join_composite_key" -> joinCompositeKey _,
    "join_theta_pairs" -> joinThetaPairs _,
    "win_lag_lead" -> winLagLead _,
    "win_argmax" -> winArgmax _,
    "win_rolling_range" -> winRollingRange _,
    "win_running_sum" -> winRunningSum _,
    "win_fill" -> winFill _,
    "win_sessionize" -> winSessionize _,
    "win_session_window" -> winSessionWindow _,
    "win_hopping" -> winHopping _,
    "win_change_points" -> winChangePoints _,
    "win_rank_ntile" -> winRankNtile _,
    "gen_explode" -> genExplode _,
    "sql_text_rollup" -> sqlTextRollup _,
    "sql_correlated_exists" -> sqlCorrelatedExists _,
    "agg_grouping_sets" -> aggGroupingSets _,
    "sort_limit" -> sortLimit _,
    "set_ops" -> setOps _,
  )
}
