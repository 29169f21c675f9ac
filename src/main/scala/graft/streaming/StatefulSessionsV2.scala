package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** The sessionizer re-expressed on Spark 4's transformWithState — the
  * arbitrary-state API that supersedes flatMapGroupsWithState
  * ([[StatefulSessions]] keeps the legacy surface; this file covers the
  * modern one and pins the two equal where they overlap).
  *
  * What the new API adds over fMGWS, exercised here:
  *   - named TYPED state variables via the handle (`getValueState`)
  *     instead of one opaque state blob — production jobs evolve state
  *     by ADDING variables, not by versioning a monolith;
  *   - first-class EVENT-TIME timers: `registerTimer` +
  *     `handleExpiredTimer` emit a session-close row when the watermark
  *     passes the user's quiet gap — fMGWS could only approximate this
  *     with processing-time timeouts that fire on wall clock, not data;
  *   - per-variable TTL (TTLConfig) for state hygiene at scale.
  *
  * Scale: state shards by the grouping key across executors exactly as
  * fMGWS does (RocksDB state store in production); timers are stored
  * alongside and fire in watermark order, so a quiet key costs one
  * timer entry, not a periodic scan.
  */
object StatefulSessionsV2 {

  /** Event-time inactivity gap that closes a session. */
  val SESSION_GAP_MS: Long = 30L * 60L * 1000L

  final case class EventT(userId: Long, eventId: Long, ts: Timestamp, value: Double)
  /** kind = "update" per touched user per batch (the fMGWS-parity rows)
    * or "closed" when the event-time timer fires after the quiet gap.
    */
  final case class SessionOut(userId: Long, kind: String, nEvents: Long,
    total: Double, lastEventId: Long)

  final case class RunningState(nEvents: Long, total: Double,
    lastEventId: Long, lastTsMs: Long)

  class SessionProcessor extends StatefulProcessor[Long, EventT, SessionOut] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[RunningState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningState]("running",
        Encoders.product[RunningState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EventT],
        timers: TimerValues): Iterator[SessionOut] = {
      val evs = rows.toSeq.sortBy(_.eventId) // shuffle-order-independent
      if (evs.isEmpty) Iterator.empty
      else {
        val prev = Option(state.get()).getOrElse(RunningState(0L, 0.0, -1L, 0L))
        val next = RunningState(
          prev.nEvents + evs.size,
          prev.total + evs.map(_.value).sum,
          math.max(prev.lastEventId, evs.map(_.eventId).max),
          math.max(prev.lastTsMs, evs.map(_.ts.getTime).max))
        state.update(next)
        // one live timer per key: re-arm the close at last-seen + gap
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(next.lastTsMs + SESSION_GAP_MS)
        Iterator.single(SessionOut(userId, "update", next.nEvents,
          next.total, next.lastEventId))
      }
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      val s = state.get()
      if (s == null) Iterator.empty
      else {
        state.clear()
        Iterator.single(SessionOut(userId, "closed", s.nEvents, s.total,
          s.lastEventId))
      }
    }
  }

  /** Running per-user accounting + event-time session closes. The input
    * must carry a watermark on `ts` for the timers to fire.
    */
  def sessions(spark: SparkSession, events: Dataset[EventT]): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
