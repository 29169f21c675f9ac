package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TimeWindows

/** Streaming maintenance of q71's point-in-time-correct features — the
  * ONLINE feature store: as events land, per-(user, day) rollups accrete
  * in the shared sketch log (merge law = component-wise SUM, the
  * histogram law), and the feature read replays q71's strictly-prior
  * window over the folded rollup. History is never rescanned: a batch
  * lands ≤ its own (user, day) rollup rows, and the feature frame costs
  * |rollup|, not |events|.
  *
  * Leakage safety is inherited, not re-implemented: the read applies the
  * SAME `rowsBetween(unboundedPreceding, -1)` frame as the batch
  * operator, so training rows materialized from the stream carry only
  * strictly-prior state — and the spec pins streamed ≡ batch q71
  * row-for-row on identical events.
  *
  *   - exactly-once: [[SketchLog.land]]'s per-writer dynamic overwrite
  *     (a replayed batch replaces its own partition; sums of the same
  *     rows land identically);
  *   - batch-split invariance: component sums are associative, so any
  *     partition of the stream folds to the one-pass rollup;
  *   - [[compact]]: the same groupBy-sum under the snapshot-scoped swap.
  */
object StreamingPitFeatures {

  /** One batch's per-(user, day) rollup delta, landed idempotently. */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit = {
    val delta = batch
      .select(col("user_id"),
        datediff(to_date(TimeWindows.eventTime),
          lit("1992-01-01").cast("date")).cast("long").as("day"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_p"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("day_cents"),
        sum(col("is_p")).as("label_purchases"))
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

  /** The folded per-(user, day) rollup: component-wise sums over the
    * delta log (a day split across batches folds to one row).
    */
  def currentRollup(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("day_cents")).as("day_cents"),
        sum(col("label_purchases")).as("label_purchases"))

  /** The feature read: q71's strictly-prior window over the rollup —
    * identical output schema and values to the batch operator on the
    * same events (spec-pinned).
    */
  def features(s: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    currentRollup(s, path)
      .select(col("user_id"), col("day"),
        count(lit(1)).over(prior).as("prior_days"),
        coalesce(sum(col("n_events")).over(prior), lit(0L)).as("prior_events"),
        coalesce(sum(col("day_cents")).over(prior), lit(0L)).as("prior_cents"),
        coalesce(col("day") - lag(col("day"), 1).over(w), lit(-1L))
          .as("days_since_prev"),
        col("label_purchases"))
      .orderBy("user_id", "day")
  }

  /** Fold the aged delta log into one partition (sums are linear). */
  def compact(s: SparkSession, path: String): Unit =
    SketchLog.compact(s, path, delta =>
      delta.groupBy(col("user_id"), col("day"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("day_cents")).as("day_cents"),
          sum(col("label_purchases")).as("label_purchases")))
}
