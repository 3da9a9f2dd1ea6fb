package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming re-expressions of the batch sessionization kit
  * (`core.Sessionize`) — the reference is batch-only (SURVEY.md §2.9), so
  * this is the forward-looking surface: the same gaps-and-islands semantics
  * as an incremental, watermarked, stateful stream.
  *
  * Scale design: state is one small record per active key; watermark +
  * event-time timeout bound state size (no unbounded session buffers —
  * aggregates are folded incrementally, events are never retained).
  */
object StreamOps {

  /** One keyed event on the stream; `t` must be an event-time timestamp
    * column for watermarking, `ts_us` its exact integer form. */
  case class KeyedEvent(user_id: Long, t: java.sql.Timestamp, ts_us: Long, value: Double)

  /** Completed (or force-flushed) session. */
  case class Session(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      start_us: Long,
      end_us: Long,
      value_sum: Double)

  /** Per-key incremental session state (one record per active key). */
  case class SessState(
      sessionId: Long, n: Long, startUs: Long, lastUs: Long, sum: Double)

  /** Streaming sessionization: same semantics as
    * `Sessionize.withSessionId` + per-session rollup — a session closes
    * when `gapMicros` passes with no event (decided by the event-time
    * watermark, so late data within the watermark still extends sessions).
    *
    * Emits each session once, on close (Append mode). State per key is a
    * single [[SessState]] — O(active keys), not O(events).
    *
    * Session-id scope: ids are per-key ordinals that restart at 1 after a
    * timeout clears the key's state (keeping a counter alive forever would
    * make state O(all keys ever seen), defeating watermark expiry), and
    * session id 0 is RESERVED for out-of-band islands — late-but-in-
    * watermark events gap-disjoint from the open session even after
    * transitive backward extension, emitted immediately as single-event
    * sessions (batch gaps-and-islands would renumber, and would merge two
    * gap-close islands). So `(user_id, session_id)` is NOT a unique key:
    * consumers needing one should use `(user_id, start_us)`.
    */
  def sessionize(
      events: Dataset[KeyedEvent],
      gapMicros: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    // late-but-in-watermark events may precede the stored session's start:
    // within the gap they extend it backwards (min the start). Gap-disjoint
    // BEFORE the start they must not merge — callers emit those immediately
    // as out-of-band islands (see below), they never reach fold.
    def fold(st: SessState, e: KeyedEvent): SessState =
      if (e.ts_us - st.lastUs > gapMicros)
        SessState(st.sessionId + 1, 1L, e.ts_us, e.ts_us, e.value)
      else
        SessState(st.sessionId, st.n + 1, math.min(st.startUs, e.ts_us),
          math.max(st.lastUs, e.ts_us), st.sum + e.value)

    events
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[KeyedEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(key, st.sessionId, st.n, st.startUs, st.lastUs, st.sum))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us))
            var closed = List.empty[Session]
            var cur = state.getOption
            // late-but-in-watermark events BEFORE the stored session's
            // start first try to extend it backwards TRANSITIVELY
            // (descending walk: each event within the gap of the current
            // start joins and moves the start down — an 850 can bridge in
            // through a 950). Only events that fail the chain emit as
            // out-of-band single-event islands (reserved session id 0 —
            // in-order ids are already assigned). Documented deviation:
            // batch gaps-and-islands would renumber, and would merge two
            // gap-close islands into one.
            val (early, tail) = cur match {
              case Some(st) => sorted.partition(_.ts_us < st.startUs)
              case None => (Seq.empty[KeyedEvent], sorted)
            }
            early.reverseIterator.foreach { e =>
              val st = cur.get
              if (st.startUs - e.ts_us <= gapMicros) cur = Some(fold(st, e))
              else closed ::= Session(key, 0L, 1L, e.ts_us, e.ts_us, e.value)
            }
            tail.foreach { e =>
              cur match {
                case None =>
                  cur = Some(SessState(1L, 1L, e.ts_us, e.ts_us, e.value))
                case Some(st) =>
                  val next = fold(st, e)
                  if (next.sessionId != st.sessionId)
                    closed ::= Session(key, st.sessionId, st.n, st.startUs, st.lastUs, st.sum)
                  cur = Some(next)
              }
            }
            cur.foreach { st =>
              state.update(st)
              // close the open session once the watermark passes its gap.
              // A late-but-in-watermark event can extend a session whose
              // gap already elapsed, putting lastUs+gap at-or-before the
              // watermark — GroupState rejects such timeouts, so clamp to
              // watermark+1 (the session then closes next microbatch).
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1L,
                (st.lastUs + gapMicros) / 1000L + 1L))
            }
            closed.reverseIterator
          }
      }
  }

  /** One CDC changelog record. `op` ∈ {"u" upsert, "d" delete, "x"
    * sentinel (close marker — no content)}; `(ts_us, event_id)` is the
    * record's VERSION. */
  case class CdcOp(user_id: Long, t: java.sql.Timestamp, ts_us: Long,
      event_id: Long, value: Double, op: String)

  /** Per-key CDC state: the max-version record seen + op count. O(1). */
  case class CdcState(tsUs: Long, eventId: Long, value: Double, op: String,
      n: Long)

  /** Final materialized row for a live (non-deleted) key. */
  case class CdcRow(user_id: Long, last_ts_us: Long, last_event_id: Long,
      last_value: Double, n_ops: Long)

  /** STREAMING CDC UPSERT MATERIALIZATION — the streaming complement of
    * the batch `merge_scd1`: consume a keyed changelog and emit, once
    * the watermark passes the feed, each key's last-writer-wins row
    * (deleted keys emit nothing). "Apply only if strictly newer by
    * (ts, event_id)" makes the fold ORDER-INDEPENDENT: any delivery
    * permutation of the same records converges to the max-version
    * record, so reordered/late-but-in-watermark delivery cannot corrupt
    * the table (property-pinned in the spec). State is one record per
    * live key — never a buffer of the changelog; the final emission
    * rides the same watermark-clamped event-time timer discipline as
    * [[sessionize]]. */
  def cdcStream(
      ops: Dataset[CdcOp],
      watermarkDelay: String = "10 minutes"): Dataset[CdcRow] = {
    import ops.sparkSession.implicits._
    ops
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, CdcRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[CdcOp], state: GroupState[CdcState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.op == "d") Iterator.empty
            else Iterator.single(CdcRow(key, st.tsUs, st.eventId, st.value, st.n))
          } else {
            var st = state.getOption
            var sawSentinel = false
            it.foreach { e =>
              if (e.op == "x") sawSentinel = true
              else {
                val newer = st.forall(s =>
                  e.ts_us > s.tsUs ||
                    (e.ts_us == s.tsUs && e.event_id > s.eventId))
                st = Some(
                  if (newer) CdcState(e.ts_us, e.event_id, e.value, e.op,
                    st.map(_.n).getOrElse(0L) + 1)
                  else st.get.copy(n = st.get.n + 1))
              }
            }
            // the close timer arms ONLY on the key's end-of-feed sentinel:
            // a watermark-relative timer armed per batch would emit a key
            // early whenever a later batch still carried its (in-
            // watermark) records, and Append mode cannot retract. A key's
            // records after its sentinel are a feed-contract violation
            // (that key stays unemitted rather than emitting twice).
            st.foreach { s =>
              state.update(s)
              if (sawSentinel)
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
            }
            Iterator.empty
          }
      }
  }

  /** Watermarked tumbling-window count/sum — the streaming form of a
    * time-bucketed groupBy (Append mode: a window emits once, when the
    * watermark passes its end). */
  def tumblingCounts(
      events: DataFrame, // needs (t: timestamp, user_id, value)
      windowLen: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("t", watermarkDelay)
      .groupBy(col("user_id"), window(col("t"), windowLen))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("user_id"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("value_sum"))

  /** Tumbling per-event-type counts — [[tumblingCounts]] keyed on the
    * TYPE dimension instead of the user: the leaderboard feed a
    * sink-side rank turns into "top event types per finalized hour"
    * (see `queries.Ext.streamTopkSink`). Append mode: a window emits
    * exactly once, when the watermark passes its end. */
  def tumblingTypeCounts(
      events: DataFrame, // needs (t: timestamp, event_type)
      windowLen: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("t", watermarkDelay)
      .groupBy(col("event_type"), window(col("t"), windowLen))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"))

  /** Tumbling OHLC candles per event type — the streaming twin of
    * `queries.Warehouse.tsOhlc`: open/close are `min_by`/`max_by` on the
    * (ts_us, event_id) struct — declarative, merge-safe aggregates
    * whose total order (event time, id-disambiguated) matches the batch
    * row-number selection exactly — high/low are plain min/max, and
    * volume folds exact floor-cents. Append mode: each (type, window)
    * candle emits exactly once when the watermark passes the window
    * end. State is one fixed-width row per open (type, window) — no
    * value buffering, unlike a sort-based open/close. */
  def tumblingOhlc(
      events: DataFrame, // needs (t: timestamp, event_type, ts_us, event_id, value)
      windowLen: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("t", watermarkDelay)
      .groupBy(col("event_type"), window(col("t"), windowLen))
      .agg(
        min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("volume_cents"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("open"), col("high"), col("low"), col("close"),
        col("n"), col("volume_cents"))

  /** [[sessionize]] on the `transformWithState` API (Spark 4's arbitrary
    * stateful processing v2): explicit `ValueState` + event-time timers
    * instead of `GroupState` — state lives in the (RocksDB-backed) store,
    * timers replace the single timeout slot, and state schema can evolve.
    * Same semantics as [[sessionize]].
    */
  class SessionProcessor(gapMicros: Long)
    extends StatefulProcessor[Long, KeyedEvent, Session] {

    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState](
        "sess", Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[KeyedEvent],
        tv: TimerValues): Iterator[Session] = {
      var closed = List.empty[Session]
      var cur = if (state.exists()) Option(state.get()) else None
      val sorted = rows.toSeq.sortBy(_.ts_us)
      // transitive backward extension, then islands — see the
      // flatMapGroupsWithState twin for the rationale
      val (early, tail) = cur match {
        case Some(st) => sorted.partition(_.ts_us < st.startUs)
        case None => (Seq.empty[KeyedEvent], sorted)
      }
      early.reverseIterator.foreach { e =>
        val st = cur.get
        if (st.startUs - e.ts_us <= gapMicros)
          cur = Some(SessState(st.sessionId, st.n + 1,
            math.min(st.startUs, e.ts_us),
            math.max(st.lastUs, e.ts_us), st.sum + e.value))
        else closed ::= Session(key, 0L, 1L, e.ts_us, e.ts_us, e.value)
      }
      tail.foreach { e =>
        cur match {
          case None =>
            cur = Some(SessState(1L, 1L, e.ts_us, e.ts_us, e.value))
          case Some(st) =>
            if (e.ts_us - st.lastUs > gapMicros) {
              closed ::= Session(key, st.sessionId, st.n, st.startUs, st.lastUs, st.sum)
              cur = Some(SessState(st.sessionId + 1, 1L, e.ts_us, e.ts_us, e.value))
            } else {
              cur = Some(SessState(st.sessionId, st.n + 1,
                math.min(st.startUs, e.ts_us),
                math.max(st.lastUs, e.ts_us), st.sum + e.value))
            }
        }
      }
      cur.foreach { st =>
        state.update(st)
        getHandle.registerTimer(st.lastUs / 1000L + gapMicros / 1000L + 1L)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val st = state.get()
        // stale timers from superseded sessions fire too — only close if
        // this expiry really covers the current session's gap
        if (st.lastUs / 1000L + gapMicros / 1000L < info.getExpiryTimeInMs()) {
          state.clear()
          Iterator.single(Session(key, st.sessionId, st.n, st.startUs, st.lastUs, st.sum))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** [[sessionize]] via [[SessionProcessor]] (requires the RocksDB state
    * store provider — see the spec for the session config). */
  def sessionizeTws(
      events: Dataset[KeyedEvent],
      gapMicros: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMicros), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming exact dedup: drop rows whose key was already seen, with
    * state expired by the watermark — the incremental twin of the batch
    * `Dedup.exact` pass (at 100 TB of events/day, dedup happens on the
    * stream, not in a nightly batch). */
  def dedupStream(
      events: DataFrame, // needs (t: timestamp) + key cols
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("t", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: pair each left event with right events
    * of the same key within ±`window` — the streaming twin of the batch
    * bucketized range join (`queries.Ext.joinRangeBucketed`). Watermarks
    * on BOTH sides + the time-range join condition let Spark bound the
    * buffered state to the interval, so state is O(events per window),
    * not O(stream).
    *
    * `joinType = "leftOuter"` adds watermark-proven null emission: an
    * unmatched left row emits its null-padded result only once the
    * event-time watermark passes `l_t + window` — the point after which
    * any matching right row would itself be behind the watermark and
    * dropped — so each left row emits exactly once (matched pairs
    * in-batch, outer nulls on eviction), the streaming twin of
    * `joinRangeBucketed`'s `"left"` join. */
  def intervalJoin(
      left: DataFrame, // (l_user, l_t: timestamp, l_id)
      right: DataFrame, // (r_user, r_t: timestamp, r_id)
      window: String,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    left.withWatermark("l_t", watermarkDelay)
      .join(
        right.withWatermark("r_t", watermarkDelay),
        expr(s"""l_user = r_user AND
                 r_t BETWEEN l_t - INTERVAL $window AND l_t + INTERVAL $window"""),
        joinType)

  /** Tagged input event for [[asofJoinStream]]: side 0 = build,
    * side 1 = probe; `ref_id` is the caller's row id. */
  case class AsOfEvent(
      user_id: Long, t: java.sql.Timestamp, ts_us: Long, side: Int, ref_id: Long)

  /** One as-of match: the latest build at-or-before the probe
    * (−1/−1 when none — left-outer semantics). */
  case class AsOfMatched(
      user_id: Long, probe_id: Long, probe_us: Long, build_id: Long, build_us: Long)

  /** Per-key as-of state: builds sorted ascending by time; probes waiting
    * for the watermark to pass their event time. */
  case class AsOfBuffer(builds: List[(Long, Long)], probes: List[(Long, Long)])

  /** STREAM-STREAM AS-OF JOIN — Spark has stream-stream equi/interval
    * joins but no as-of; this is the streaming twin of
    * `plans.AsOfJoin` / `queries.Ext.joinAsof`.
    *
    * Correctness under disorder: a probe at time p is final only once the
    * event-time watermark passes p — any build that could still arrive
    * with time ≤ p would itself be behind the watermark and dropped. So
    * probes buffer until `watermark > p`, then emit exactly once with the
    * latest build ≤ p (Append mode).
    *
    * State bound per key: pending probes within the watermark window,
    * plus builds within the window and ONE older build (the latest
    * at-or-before the watermark — still the potential match for a future
    * probe); everything older is evicted each invocation. No timers when
    * nothing is pending.
    */
  /** One state-machine step of [[asofJoinStream]], PURE — `(batch
    * events, prior state, watermark)` in, `(emitted matches, next state
    * or None=remove, next timer in MILLIS or None)` out. Extracted so
    * the watermark/eviction/timer contract is property-testable without
    * a streaming harness (round-4 verdict stretch #8): the spec drives
    * watermark advances past an idle key and asserts the build list
    * shrinks to the one-behind-watermark floor with the timer chain
    * ending there. */
  private[graft] def asofStep(
      key: Long, evs: Seq[AsOfEvent], st0: AsOfBuffer, wmUs: Long)
      : (Seq[AsOfMatched], Option[AsOfBuffer], Option[Long]) = {
    val allBuilds = (st0.builds ++
      evs.filter(_.side == 0).map(e => (e.ts_us, e.ref_id)))
      .sortBy(identity)
    val allProbes = st0.probes ++
      evs.filter(_.side == 1).map(e => (e.ts_us, e.ref_id))
    val (ready, pending) = allProbes.partition(_._1 < wmUs)
    val out = ready.sortBy(identity).map { case (pUs, pid) =>
      val m = allBuilds.takeWhile(_._1 <= pUs).lastOption
      AsOfMatched(key, pid, pUs,
        m.map(_._2).getOrElse(-1L), m.map(_._1).getOrElse(-1L))
    }
    // evict: keep the latest build at-or-before the watermark + all after
    val (behind, ahead) = allBuilds.partition(_._1 <= wmUs)
    val kept = behind.lastOption.toList ++ ahead
    if (kept.isEmpty && pending.isEmpty) (out, None, None)
    else {
      val nextProbe = pending.map(_._1).minOption.map(us =>
        math.max(wmUs / 1000L + 1L, us / 1000L + 1L))
      // an idle key (no pending probes) with builds still AHEAD of
      // the watermark must get re-invoked as the watermark advances
      // or those builds are never evicted (event-time timeouts are
      // cleared on every invocation, so a key that stops receiving
      // events otherwise keeps its full build list forever). Once
      // only the single behind-watermark build remains — the
      // potential match for a future probe, the documented state
      // floor — no timer: that state is O(1) per key by design.
      val shrink =
        if (ahead.nonEmpty) Some(wmUs / 1000L + 1L) else None
      (out, Some(AsOfBuffer(kept, pending)), nextProbe.orElse(shrink))
    }
  }

  def asofJoinStream(
      probes: DataFrame, // (user_id, t: timestamp, ts_us, ref_id)
      builds: DataFrame, // same shape
      watermarkDelay: String = "10 minutes"): Dataset[AsOfMatched] = {
    import probes.sparkSession.implicits._
    val tagged = probes.withColumn("side", lit(1))
      .unionByName(builds.withColumn("side", lit(0)))
      .select(col("user_id"), col("t"), col("ts_us"), col("side"), col("ref_id"))
      .as[AsOfEvent]
    tagged
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBuffer, AsOfMatched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfEvent], state: GroupState[AsOfBuffer]) =>
          val (out, next, timer) = asofStep(key, it.toSeq,
            state.getOption.getOrElse(AsOfBuffer(Nil, Nil)),
            state.getCurrentWatermarkMs() * 1000L)
          next match {
            case None => state.remove()
            case Some(b) =>
              state.update(b)
              timer.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }

  /** Tagged input event for [[funnelStream]]: `kind` 1 = view,
    * 2 = click, 3 = purchase (0 = sentinel, ignored). */
  case class FunnelEvent(
      user_id: Long, t: java.sql.Timestamp, ts_us: Long, event_id: Long, kind: Int)

  /** One funnel-stage completion, emitted exactly once as it happens. */
  case class FunnelHit(user_id: Long, stage: Long, ts_us: Long)

  /** Per-key funnel state: events waiting for the watermark to pass
    * their time, plus the machine's progress (stage reached and the
    * strictly-increasing stage timestamps). Progress alone is O(1); the
    * pending buffer is bounded by the watermark window. */
  case class FunnelState(
      pending: List[(Long, Long, Int)], // (ts_us, event_id, kind)
      stage: Int, t1: Long, t2: Long, t3: Long)

  /** One PURE step of [[funnelStream]] (the [[asofStep]] contract):
    * buffered + new events with time < watermark are FINAL — sorted by
    * `(ts, event_id)` they feed the stage machine (first view sets t1,
    * first click with ts > t1 sets t2, first purchase with ts > t2 sets
    * t3 — greedy-on-sorted ≡ the batch funnel's chained conditional
    * minimums, because the first qualifying event in time order IS the
    * minimum). Completed-stage state persists as an O(1) tombstone so a
    * user's later events can never re-emit a stage.
    *
    * GENUINELY LATE arrivals (ts already behind the watermark when the
    * row shows up) are DROPPED at entry: Spark does not pre-filter late
    * rows for flatMapGroupsWithState, so without the explicit filter a
    * late event would be consumed in ARRIVAL order and could emit
    * transitions the batch oracle's time order never would. Dropping
    * pins the same contract windowed aggregations have — an emitted
    * transition is final, and late data is discarded, never reordered. */
  private[graft] def funnelStep(
      key: Long, evs: Seq[FunnelEvent], st0: FunnelState, wmUs: Long)
      : (Seq[FunnelHit], Option[FunnelState], Option[Long]) = {
    val all = st0.pending ++
      evs.filter(e => e.kind > 0 && e.ts_us >= wmUs)
        .map(e => (e.ts_us, e.event_id, e.kind))
    val (ready, pending) = all.partition(_._1 < wmUs)
    var (stage, t1, t2, t3) = (st0.stage, st0.t1, st0.t2, st0.t3)
    val hits = ready.sortBy(e => (e._1, e._2)).flatMap { case (ts, _, kind) =>
      (stage, kind) match {
        case (0, 1) => stage = 1; t1 = ts; Some(FunnelHit(key, 1L, ts))
        case (1, 2) if ts > t1 => stage = 2; t2 = ts; Some(FunnelHit(key, 2L, ts))
        case (2, 3) if ts > t2 => stage = 3; t3 = ts; Some(FunnelHit(key, 3L, ts))
        case _ => None
      }
    }
    val next = FunnelState(pending, stage, t1, t2, t3)
    // re-invoke once the watermark passes the earliest pending event;
    // with nothing pending the O(1) progress record just sits (a real
    // deployment TTLs long-idle users, trading only re-emission safety)
    val timer = pending.map(_._1).minOption
      .map(us => math.max(wmUs / 1000L + 1L, us / 1000L + 1L))
    (hits, Some(next), timer)
  }

  /** STREAMING FUNNEL — the ordered view→click→purchase stage machine as
    * an incremental stateful stream, emitting each user's stage
    * completions exactly once (Append mode). Event-time correctness
    * under disorder follows the as-of argument: an event is only fed to
    * the machine once the watermark passes its time, so no
    * earlier-but-late event can invalidate an emitted transition —
    * and an event already LATE on arrival is explicitly dropped in
    * [[funnelStep]] (Spark does not pre-filter late rows for this API),
    * so the contract holds for genuinely late data too. */
  def funnelStream(
      events: Dataset[FunnelEvent],
      watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val (out, next, timer) = funnelStep(key, it.toSeq,
            state.getOption.getOrElse(FunnelState(Nil, 0, -1L, -1L, -1L)),
            state.getCurrentWatermarkMs() * 1000L)
          next.foreach { st =>
            state.update(st)
            timer.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }

  /** [[funnelStream]] on the `transformWithState` API — the same
    * [[funnelStep]] state machine driven by explicit `ValueState` +
    * event-time timers (the dual-API pattern [[SessionProcessor]] set):
    * input rows and expired timers both route through the ONE pure step,
    * so the two APIs cannot diverge semantically. */
  class FunnelProcessor
    extends StatefulProcessor[Long, FunnelEvent, FunnelHit] {

    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

    private def step(key: Long, evs: Seq[FunnelEvent], wmUs: Long)
        : Iterator[FunnelHit] = {
      val st0 = if (state.exists()) state.get()
        else FunnelState(Nil, 0, -1L, -1L, -1L)
      val (out, next, timer) = funnelStep(key, evs, st0, wmUs)
      next.foreach { st =>
        state.update(st)
        timer.foreach(ms => getHandle.registerTimer(ms))
      }
      out.iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[FunnelHit] =
      step(key, rows.toSeq, tv.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelHit] =
      step(key, Nil, tv.getCurrentWatermarkInMs() * 1000L)
  }

  /** [[funnelStream]] via [[FunnelProcessor]] (requires the RocksDB state
    * store provider, like [[sessionizeTws]]). */
  def funnelStreamTws(
      events: Dataset[FunnelEvent],
      watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** One GPS ping on the stream, its geofence membership already folded
    * to a bitmask (bit f = inside fence f) by the scan-local ray cast
    * upstream — the stateful operator never re-touches geometry. */
  case class GeoPing(user_id: Long, t: java.sql.Timestamp, ts_us: Long,
      event_id: Long, mask: Int)

  /** Per-vehicle detector state: pings still inside the watermark
    * window (bounded by rate × delay, NEVER corpus-sized) plus the O(1)
    * last-processed membership mask (`lastMask` = -1 before the first
    * processed ping). */
  case class GeoState(pending: Seq[(Long, Long, Int)],
      lastTs: Long, lastEid: Long, lastMask: Int)

  case class GeoTransition(user_id: Long, ts_us: Long, event_id: Long,
      f: Long, direction: String)

  /** Pure step of the geofence ENTER/EXIT detector (the [[funnelStep]]
    * discipline: buffer in-watermark pings, process — in (ts, event_id)
    * order — only those the watermark has passed, drop genuinely-late
    * arrivals). A processed ping whose mask differs from the previous
    * one emits one transition row per flipped bit. */
  private[graft] def geoStep(
      key: Long, evs: Seq[GeoPing], st0: GeoState, wmUs: Long)
      : (Seq[GeoTransition], GeoState, Option[Long]) = {
    val all = st0.pending ++
      evs.filter(_.ts_us >= wmUs).map(e => (e.ts_us, e.event_id, e.mask))
    val (ready, pending) = all.partition(_._1 < wmUs)
    var (lt, le, lm) = (st0.lastTs, st0.lastEid, st0.lastMask)
    val hits = ready.sortBy(p => (p._1, p._2)).flatMap { case (ts, eid, m) =>
      val out: Seq[GeoTransition] =
        if (lm >= 0 && m != lm) {
          val diff = m ^ lm
          (0 until 6).collect { case f if ((diff >> f) & 1) == 1 =>
            GeoTransition(key, ts, eid, f.toLong,
              if (((m >> f) & 1) == 1) "enter" else "exit")
          }
        } else Seq.empty
      lt = ts; le = eid; lm = m
      out
    }
    val timer = pending.map(_._1).minOption
      .map(us => math.max(wmUs / 1000L + 1L, us / 1000L + 1L))
    (hits, GeoState(pending, lt, le, lm), timer)
  }

  /** STREAMING GEOFENCE TRANSITIONS — enter/exit rows per (vehicle,
    * fence), emitted exactly once (Append), event-time-correct under
    * disorder by the funnel's watermark-gating argument: a ping reaches
    * the mask-compare only once the watermark passes its time, so no
    * earlier-but-late ping can invalidate an emitted transition. */
  def geofenceStream(
      pings: Dataset[GeoPing],
      watermarkDelay: String = "10 minutes"): Dataset[GeoTransition] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GeoState, GeoTransition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[GeoPing], state: GroupState[GeoState]) =>
          val (out, next, timer) = geoStep(key, it.toSeq,
            state.getOption.getOrElse(GeoState(Nil, -1L, -1L, -1)),
            state.getCurrentWatermarkMs() * 1000L)
          state.update(next)
          timer.foreach(state.setTimeoutTimestamp)
          out.iterator
      }
  }

  /** [[geofenceStream]] on the `transformWithState` API — the dual-API
    * pattern [[SessionProcessor]]/[[FunnelProcessor]] set: input rows
    * and expired timers both route through the ONE pure [[geoStep]], so
    * the two APIs cannot diverge semantically. */
  class GeofenceProcessor
    extends StatefulProcessor[Long, GeoPing, GeoTransition] {

    @transient private var state: ValueState[GeoState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GeoState](
        "geofence", Encoders.product[GeoState], TTLConfig.NONE)

    private def step(key: Long, evs: Seq[GeoPing], wmUs: Long)
        : Iterator[GeoTransition] = {
      val st0 = if (state.exists()) state.get()
        else GeoState(Nil, -1L, -1L, -1)
      val (out, next, timer) = geoStep(key, evs, st0, wmUs)
      state.update(next)
      timer.foreach(ms => getHandle.registerTimer(ms))
      out.iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[GeoPing],
        tv: TimerValues): Iterator[GeoTransition] =
      step(key, rows.toSeq, tv.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[GeoTransition] =
      step(key, Nil, tv.getCurrentWatermarkInMs() * 1000L)
  }

  /** [[geofenceStream]]'s transformWithState form. */
  def geofenceStreamTws(
      pings: Dataset[GeoPing],
      watermarkDelay: String = "10 minutes"): Dataset[GeoTransition] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new GeofenceProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  case class EwmaPing(user_id: Long, t: java.sql.Timestamp, ts_us: Long,
      event_id: Long, cents: Long)

  /** Detector state: in-watermark pings (rate × delay-bounded) plus the
    * last ≤15 PROCESSED cents, oldest first — the 16-tap frame tail. */
  case class EwmaState(pending: Seq[(Long, Long, Long)], tail: Seq[Long])

  case class EwmaOut(user_id: Long, ts_us: Long, event_id: Long,
      cents: Long, num: Long, den: Long, ewma: Double)

  /** Pure step of the STREAMING 16-tap binary-decay EWMA (batch twin:
    * `Warehouse.tsEwma`, same integer num/den contract): watermark-gated
    * like [[funnelStep]], processing ready pings in (ts, event_id)
    * order; each emits Σ frameⱼ·2ʲ over its trailing ≤16 frame. */
  private[graft] def ewmaStep(
      key: Long, evs: Seq[EwmaPing], st0: EwmaState, wmUs: Long)
      : (Seq[EwmaOut], EwmaState, Option[Long]) = {
    val all = st0.pending ++
      evs.filter(_.ts_us >= wmUs).map(e => (e.ts_us, e.event_id, e.cents))
    val (ready, pending) = all.partition(_._1 < wmUs)
    var tail = st0.tail
    val outs = ready.sortBy(p => (p._1, p._2)).map { case (ts, eid, c) =>
      val frame = (tail :+ c).takeRight(16)
      var num = 0L
      var j = 0
      while (j < frame.length) { num += frame(j) << j; j += 1 }
      val den = (1L << frame.length) - 1L
      tail = frame.takeRight(15)
      EwmaOut(key, ts, eid, c, num, den, num.toDouble / den)
    }
    val timer = pending.map(_._1).minOption
      .map(us => math.max(wmUs / 1000L + 1L, us / 1000L + 1L))
    (outs, EwmaState(pending, tail), timer)
  }

  /** STREAMING EWMA — the time-series smoother as an incremental
    * stateful stream; O(16) state per key, emission exactly once. */
  def ewmaStream(
      pings: Dataset[EwmaPing],
      watermarkDelay: String = "10 minutes"): Dataset[EwmaOut] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[EwmaPing], state: GroupState[EwmaState]) =>
          val (out, next, timer) = ewmaStep(key, it.toSeq,
            state.getOption.getOrElse(EwmaState(Nil, Nil)),
            state.getCurrentWatermarkMs() * 1000L)
          state.update(next)
          timer.foreach(state.setTimeoutTimestamp)
          out.iterator
      }
  }

  case class CusumState(pending: Seq[(Long, Long, Long)], s: Long)

  case class CusumOut(user_id: Long, ts_us: Long, event_id: Long,
      cents: Long, cusum: Long, alarm: Boolean)

  /** Pure step of the STREAMING one-sided CUSUM drift detector (batch
    * cousin: `Warehouse.winCusum`; here the reference `kCents` and
    * threshold `hCents` are PINNED constants — the classic control-chart
    * form, since a stream cannot know its own global median): processes
    * ready pings in (ts, event_id) order, carrying the single
    * running-sum long S = max(0, S + (cents − k)) per key. */
  private[graft] def cusumStep(
      key: Long, evs: Seq[EwmaPing], st0: CusumState, wmUs: Long,
      kCents: Long, hCents: Long)
      : (Seq[CusumOut], CusumState, Option[Long]) = {
    val all = st0.pending ++
      evs.filter(_.ts_us >= wmUs).map(e => (e.ts_us, e.event_id, e.cents))
    val (ready, pending) = all.partition(_._1 < wmUs)
    var s = st0.s
    val outs = ready.sortBy(p => (p._1, p._2)).map { case (ts, eid, c) =>
      s = math.max(0L, s + (c - kCents))
      CusumOut(key, ts, eid, c, s, s > hCents)
    }
    val timer = pending.map(_._1).minOption
      .map(us => math.max(wmUs / 1000L + 1L, us / 1000L + 1L))
    (outs, CusumState(pending, s), timer)
  }

  /** STREAMING CUSUM — the change/drift detector as an incremental
    * stateful stream; O(1) state per key past the watermark buffer,
    * emission exactly once per ping. */
  def cusumStream(
      pings: Dataset[EwmaPing],
      kCents: Long, hCents: Long,
      watermarkDelay: String = "10 minutes"): Dataset[CusumOut] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("t", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[EwmaPing], state: GroupState[CusumState]) =>
          val (out, next, timer) = cusumStep(key, it.toSeq,
            state.getOption.getOrElse(CusumState(Nil, 0L)),
            state.getCurrentWatermarkMs() * 1000L, kCents, hCents)
          state.update(next)
          timer.foreach(state.setTimeoutTimestamp)
          out.iterator
      }
  }

  /** Stream-static enrichment join: each streaming event picks up its
    * key's static dimension row — the streaming twin of the batch
    * broadcast dim join (J2/J3). Stateless: the static side is (re)read
    * and broadcast per micro-batch, so a dim refresh (new parquet files)
    * is picked up without restarting the query, and no watermark or
    * join state accumulates. */
  def enrichStream(
      events: DataFrame, // streaming side, carries `keys`
      dim: DataFrame, // static side (batch DataFrame)
      keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Native streaming session_window agg — the built-in twin of
    * [[sessionize]] for when per-session custom state isn't needed. */
  def sessionWindowCounts(
      events: DataFrame, // needs (t: timestamp, user_id)
      gap: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("t", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("t"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
}
