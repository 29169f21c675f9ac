package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.expressions.KmvSketch
import graft.operators.{Dedup, Extras, TimeWindows}

/** Streaming maintenance of q68's KMV audience sketches — continuous
  * distinct/overlap dashboards without rescanning history. The exact
  * shape StreamingHistogram gives q66, under a different merge law:
  * histograms fold by bin-wise SUM, KMV sketches fold by k-min of the
  * DISTINCT union — which is why the log stores each batch's sketch
  * VALUES (≤ k hash rows per day per batch, exploded) and `current`
  * re-aggregates them through the same [[KmvSketch]] kernel the batch
  * query uses (shared code, can't drift; the kernel dedups and re-caps).
  *
  *   - exactly-once: dynamic-partition OVERWRITE of the batch's own
  *     `batch_id` partition — a replayed batch replaces its previous
  *     attempt (KMV is a set function, so even a DIFFERENT successful
  *     landing of the same data folds identically);
  *   - `current` costs |batches|·|days|·k rows, never event-proportional;
  *   - [[compact]] folds the aged log to one partition via the same
  *     k-min re-aggregation, swap-safe like compactExactIndex.
  */
object StreamingKmv {

  /** Per-batch delta sketch + idempotent landing: each day's batch-local
    * k minima, exploded to rows. Public so the spec drives replay.
    */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit = {
    val delta = batch
      .select(date_format(to_date(TimeWindows.eventTime), "yyyy-MM-dd").as("day"),
        Dedup.baseHash(col("user_id").cast("string")).as("hv"))
      .groupBy(col("day"))
      .agg(KmvSketch.sketch(col("hv"), Extras.KMV_K).as("sk"))
      .select(col("day"), explode(col("sk")).as("hv"))
      .withColumn("batch_id", lit(batchId))
    if (!delta.isEmpty) SketchLog.land(delta, path)
  }

  /** Start maintaining the sketch log from an event stream. */
  def start(events: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => absorb(b, id, path))
      .trigger(trigger)
      .start()

  /** The current per-day sketch: k-min over the delta log. */
  def current(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(col("day"))
      .agg(KmvSketch.sketch(col("hv"), Extras.KMV_K).as("sk"))

  /** Current per-day distinct-audience estimates — the dashboard read,
    * through the identical estimator the oracle-checked q68 uses.
    */
  def estimates(s: SparkSession, path: String): DataFrame =
    current(s, path)
      .select(col("day"), Extras.kmvEst(col("sk")).as("est_distinct"))
      .orderBy("day")

  /** Fold the aged delta log into a single partition via [[SketchLog
    * .compact]]: only snapshot-enumerated partitions fold and swap out,
    * so a batch landed by a concurrent absorb survives in place (KMV is
    * a set function — k-min over folded ∪ later deltas is still the
    * k-min of the union).
    */
  def compact(s: SparkSession, path: String): Unit =
    SketchLog.compact(s, path, delta =>
      delta.groupBy(col("day"))
        .agg(KmvSketch.sketch(col("hv"), Extras.KMV_K).as("sk"))
        .select(col("day"), explode(col("sk")).as("hv")))
}
