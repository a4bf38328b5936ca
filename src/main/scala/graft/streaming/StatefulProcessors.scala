package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** The deep `transformWithState` surface (VERDICT r3 next-round #5):
  * event-time timers, ListState/MapState, and initial-state bootstrap.
  * These are the StatefulProcessor capabilities a meepo user's replay
  * and session stories exercise beyond the plain fold (EventStreams
  * op 61). Each processor is equivalence-tested in EventStreamSpec
  * against a batch rendering — the SURVEY §5.2.3 contract for
  * streaming-only semantics.
  *
  * 100 TB notes: every processor keys by `user_id`, so state shards
  * across executors with the shuffle; per-key state is O(1) (session
  * agg, bounded error list, per-type counters) — nothing grows with
  * history length; timers live in the state store next to their key.
  */
object StatefulProcessors {
  import EventStreams.{FoldEvent, UserFold, UserState}

  /** Typed event carrying a real timestamp field so a watermark can be
    * declared ON the Dataset (`ds.withWatermark("ts", ...)`) — the
    * event-time timer mode requires one. */
  case class TimedEvent(event_id: Long, user_id: Long, ts: java.time.Instant,
      event_type: String, value: Double)

  case class SessionAgg(start_us: Long, last_us: Long, n_events: Long,
      total_value: Double)
  case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long,
      total_value: Double)

  /** Session close via EVENT-TIME TIMERS: a session is the same
    * 30-minute-gap grouping as `EventStreams.sessionized`, but emission
    * is driven by the watermark passing `last_event + gap` — the timer
    * fires in the no-data batch too, so a session closes even if its
    * user never sends another event. In-batch gaps close sessions
    * inline (the timer only has to catch the tail session).
    *
    * Timer discipline: exactly one live timer per key — re-registering
    * on every input batch after deleting the old one. Expiry clears
    * state, so a later event starts a fresh session (never resurrects
    * a closed one).
    */
  class SessionTimerProcessor(gapUs: Long = 30L * 60 * 1000 * 1000)
      extends StatefulProcessor[Long, TimedEvent, SessionOut] {
    @transient private var session: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionAgg]("session",
        Encoders.product[SessionAgg], TTLConfig.NONE)

    // full microsecond precision — Timestamp.getTime would floor to ms
    private def tsUs(e: TimedEvent): Long =
      e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000L

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toVector.sortBy(e => (tsUs(e), e.event_id))
      var cur: Option[SessionAgg] =
        if (session.exists()) Some(session.get()) else None
      val closed = Vector.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = tsUs(e)
        cur match {
          case Some(s) if t - s.last_us < gapUs =>
            cur = Some(SessionAgg(s.start_us, t, s.n_events + 1,
              s.total_value + e.value))
          case Some(s) =>
            closed += SessionOut(key, s.start_us, s.n_events, s.total_value)
            cur = Some(SessionAgg(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionAgg(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        session.update(s)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        // ceil to ms (ADVICE r4): floor division could fire the timer
        // up to ~1 ms BEFORE last_event + gap, prematurely closing a
        // session that a sub-ms boundary event should still extend
        getHandle.registerTimer((s.last_us + gapUs + 999L) / 1000L)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator.single(SessionOut(key, s.start_us, s.n_events, s.total_value))
      } else Iterator.empty
  }

  def sessionsWithTimers(ds: Dataset[TimedEvent],
      gapUs: Long = 30L * 60 * 1000 * 1000): Dataset[SessionOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    EventStreams.requireRocksDb(spark, ds.isStreaming)
    ds.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ── ListState + MapState: per-user profile ────────────────────────
  case class ProfileOut(user_id: Long, n_total: Long, n_types: Long,
      top_type: String, recent_error_ids: Seq[Long])

  /** Per-user profile over the event history: MapState counts events
    * per type (point lookups — only touched keys are read, the win
    * over a ValueState[Map] that deserializes the whole map per
    * update); ListState keeps the last `errKeep` error positions as a
    * bounded buffer (append-only in the common case, rebuilt only on
    * overflow). Emits the updated profile once per key per batch.
    * Ties on top_type break toward the lexicographically smallest
    * type, so the output is deterministic and batch-oracle-able.
    */
  class ProfileProcessor(errKeep: Int = 3)
      extends StatefulProcessor[Long, FoldEvent, ProfileOut] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recentErrors: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recentErrors = getHandle.getListState[Long]("recentErrors",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[FoldEvent],
        timerValues: TimerValues): Iterator[ProfileOut] = {
      rows.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val n = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, n + 1L)
        if (e.event_type == "error") {
          recentErrors.appendValue(e.event_id)
          val ids = recentErrors.get().toVector
          if (ids.size > errKeep) recentErrors.put(ids.takeRight(errKeep).toArray)
        }
      }
      val m = counts.iterator().toVector
      val total = m.map(_._2).sum
      val top = m.minBy { case (tpe, n) => (-n, tpe) }._1
      Iterator.single(ProfileOut(key, total, m.size.toLong, top,
        recentErrors.get().toVector))
    }
  }

  def userProfiles(ds: Dataset[FoldEvent], errKeep: Int = 3): Dataset[ProfileOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    EventStreams.requireRocksDb(spark, ds.isStreaming)
    ds.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(errKeep),
        TimeMode.None(), OutputMode.Update())
  }

  // ── initial-state bootstrap: resume the fold from a snapshot ──────
  /** [[EventStreams.FoldProcessor]] plus bootstrap: state seeds from a
    * snapshot Dataset[UserFold] (e.g. yesterday's fold output, or a
    * table materialized by cdc_apply_upsert) BEFORE the first batch —
    * the event-sourcing "replay from snapshot, then tail the log"
    * story. handleInitialState runs once per snapshot key.
    */
  class FoldBootstrapProcessor extends StatefulProcessorWithInitialState[
      Long, FoldEvent, UserFold, UserFold] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("userState",
        Encoders.product[UserState], TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: UserFold,
        timerValues: TimerValues): Unit =
      state.update(UserState(initial.n_events, initial.balance,
        initial.last_seen_us))

    override def handleInputRows(key: Long, rows: Iterator[FoldEvent],
        timerValues: TimerValues): Iterator[UserFold] = {
      var s = if (state.exists()) state.get() else UserState(0L, 0.0, Long.MinValue)
      rows.foreach { e =>
        s = UserState(s.n_events + 1, s.balance + e.value,
          math.max(s.last_seen_us, e.ts_us))
      }
      state.update(s)
      Iterator.single(UserFold(key, s.n_events, s.balance, s.last_seen_us))
    }
  }

  def statefulFoldFrom(ds: Dataset[FoldEvent],
      snapshot: Dataset[UserFold]): Dataset[UserFold] = {
    val spark = ds.sparkSession
    import spark.implicits._
    EventStreams.requireRocksDb(spark, ds.isStreaming)
    ds.groupByKey(_.user_id)
      .transformWithState(new FoldBootstrapProcessor,
        TimeMode.None(), OutputMode.Update(),
        snapshot.groupByKey(_.user_id))
  }
}
