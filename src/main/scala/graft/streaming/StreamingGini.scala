package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Extras

/** Streaming maintenance of q76's revenue-concentration Gini — the
  * ONLINE inequality dashboard. The sufficient state is the per-
  * (event_type, user_id) cent rollup, and cents are component-wise SUMS
  * (the q71/histogram merge law), so the sketch-log design carries q76
  * with no new machinery: a batch lands ≤ its own (type, user) delta
  * rows, and the read folds the log and replays the BATCH operator's
  * decomposed Lorenz kernel ([[Extras.giniOfUserCents]]) over the folded
  * rollup. The rank decomposition, the hot-bin stance, the int64→
  * DECIMAL(38,0) envelope dispatch and the ppm chain all live once, in
  * the batch kernel — the StreamingPitFeatures inheritance pattern: the
  * streaming face maintains state, never re-derives semantics.
  *
  * Why no per-user ordering state: ranks are a property of the FOLDED
  * totals, not of arrival order — any split of the stream sums to the
  * same (type, user, cents) frame (associativity), and the kernel ranks
  * that frame from scratch at read time in O(|users|), never O(|events|).
  * History is never rescanned; events are never stored.
  *
  *   - exactly-once: [[SketchLog.land]]'s per-writer dynamic overwrite
  *     (a replayed batch replaces its own partition; sums of the same
  *     rows land identically);
  *   - batch-split invariance: cent sums are associative/commutative,
  *     so any partition of the stream folds to the one-pass rollup —
  *     including a user's spend split across batches, and sign-mixed
  *     splits (refund-only batches land negative deltas);
  *   - null-value events are dropped at absorb time, exactly the batch
  *     operator's ingest-defect stance — a user with only null-value
  *     events never acquires a rollup row on either face;
  *   - [[compact]]: the same groupBy-sum under the snapshot-scoped swap.
  */
object StreamingGini {

  /** One batch's per-(type, user) cent delta, landed idempotently. */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit = {
    val delta = batch
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(Extras.centsOf(col("value"))).as("cents"))
      .withColumn("batch_id", lit(batchId))
    if (!delta.isEmpty) SketchLog.land(delta, path)
  }

  /** Start maintaining the rollup log from an event stream. */
  def start(events: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => absorb(b, id, path))
      .trigger(trigger)
      .start()

  /** The folded per-(type, user) rollup: component-wise cent sums over
    * the delta log (a user split across batches folds to one row).
    */
  def currentRollup(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("cents"))

  /** The Gini read: the batch kernel over the folded rollup — identical
    * output schema and values to batch q76 on the same events
    * (spec-pinned), including the envelope dispatch (`int64SafeMax`
    * forces an arm in specs, exactly as on the batch face).
    */
  def gini(s: SparkSession, path: String,
      int64SafeMax: Double = Extras.GINI_INT64_SAFE): DataFrame =
    Extras.giniOfUserCents(currentRollup(s, path).localCheckpoint(true),
      int64SafeMax)

  /** Fold the aged delta log into one partition (cent sums are linear). */
  def compact(s: SparkSession, path: String): Unit =
    SketchLog.compact(s, path, delta =>
      delta.groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("cents")).as("cents")))
}
