package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Extras

/** Streaming maintenance of q75's WITHIN-SESSION transition matrix —
  * the online face of the session-scoped journey monitor.
  *
  * The round-13 review expected this to need per-user session STATE
  * (the q29 StatefulSessions machinery), because a session can span
  * batch boundaries. It does not, and the reason is worth pinning: q75
  * counts transitions between CONSECUTIVE same-user events that share a
  * session, sessions break exactly at inactivity gaps ≥ 12 h, and
  * therefore a consecutive pair is same-session IFF ITS OWN gap is
  * under the threshold. Session membership of a transition factorizes
  * over the pair — no running session id, no state store. So the q73
  * log design carries q75 unchanged: per-batch within rollups keep only
  * pairs under the gap, and the read applies the SAME predicate to each
  * stitched boundary pair (whose gap is first_us − p_us, available from
  * the boundary rows alone). A mapGroupsWithState design would maintain
  * per-user state and its checkpoint lifecycle to recompute a predicate
  * the log already answers.
  *
  * What state WOULD buy is per-session aggregates (session ids, session
  * lengths — q29's output); for the transition MATRIX it buys nothing.
  *
  * Everything else is inherited verbatim from [[StreamingTransitions]]:
  * exactly-once landing, batch-split invariance, out-of-order repair
  * with the disjoint-window audit, compaction. The spec pins streamed ≡
  * batch q75 on splits that cut a session mid-stream and on a pair at
  * exactly the 12-hour boundary (the q29 half-open-interval semantics).
  */
object StreamingSessionTransitions {

  private val GAP = Some(Extras.SESSION_GAP_US)

  /** One batch's delta: within-session rollup + per-user boundary rows. */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit =
    StreamingTransitions.absorb(batch, batchId, path, GAP)

  /** Start maintaining the session-transition log from an event stream. */
  def start(events: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => absorb(b, id, path))
      .trigger(trigger)
      .start()

  /** The folded within-session matrix ≡ batch q75 on ordered splits. */
  def transitions(s: SparkSession, path: String): DataFrame =
    StreamingTransitions.transitions(s, path, GAP)

  /** Ordering audit — same stitch frame, same zero-iff-trustworthy. */
  def orderViolations(s: SparkSession, path: String): DataFrame =
    StreamingTransitions.orderViolations(s, path)

  /** Fold aged logs (within-session sums fold like q73's). */
  def compact(s: SparkSession, path: String): Unit =
    StreamingTransitions.compact(s, path)
}
