package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState (SURVEY §2.6 "custom
  * state" surface): per-user running session accounting that survives
  * across micro-batches — the Spark-native replacement for hand-rolled
  * consumer-side state the reference cannot express at all.
  *
  * State is per-key and checkpointed; at 100 TB the state store shards by
  * the grouping key across executors (RocksDB state store in production).
  */
object StatefulSessions {

  final case class Event(userId: Long, eventId: Long, value: Double)
  final case class UserState(nEvents: Long, total: Double, lastEventId: Long)
  final case class UserUpdate(userId: Long, nEvents: Long, total: Double, lastEventId: Long)

  /** Fold each micro-batch's events into per-user running state, emitting
    * one update row per touched user per batch.
    */
  def updates(spark: SparkSession, events: Dataset[Event]): Dataset[UserUpdate] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, -1L))
          // deterministic in-batch order regardless of shuffle arrival
          val evs = batch.toSeq.sortBy(_.eventId)
          if (evs.isEmpty) Iterator.empty
          else {
            val next = UserState(
              prev.nEvents + evs.size,
              prev.total + evs.map(_.value).sum,
              math.max(prev.lastEventId, evs.map(_.eventId).max))
            state.update(next)
            Iterator.single(UserUpdate(userId, next.nEvents, next.total, next.lastEventId))
          }
      }
  }
}
