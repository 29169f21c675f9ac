package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Extras

/** Streaming maintenance of q66's mergeable histogram sketch — the
  * percentile dashboard kept continuously current without ever rescanning
  * history. Each micro-batch reduces to its own delta histogram
  * (per-key 128-bin vectors, the same geometry as the batch sketch via
  * Extras.binOfCents — shared code, can't drift) and lands it as an
  * append-only log partition keyed by batch_id:
  *
  *   - exactly-once: the write is dynamic-partition OVERWRITE of the
  *     batch's OWN batch_id partition, so a replayed batch replaces its
  *     previous attempt instead of double-counting — idempotent absorb
  *     without a manifest;
  *   - the CURRENT sketch is the bin-wise SUM over the log (vector
  *     addition — the mergeability q66's spec pins), folded at read
  *     time at log-size cost: |batches| × |keys| × ≤128 rows, never
  *     event-proportional;
  *   - [[compact]] folds the log back to one partition when it ages
  *     (the compactExactIndex motivation: footer/scheduler overhead
  *     grows with index AGE, not size).
  *
  * Quantiles come from Extras.histEstimates — the identical read half
  * the oracle-checked q66 uses.
  */
object StreamingHistogram {

  /** Per-batch delta histogram + idempotent landing. Public so the spec
    * can drive the replay case directly.
    */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit = {
    val delta = batch
      .select(col("event_type").as("key"), Extras.centsOf(col("value")).as("cents"))
      .withColumn("bin", Extras.binOfCents(col("cents")))
      .groupBy(col("key"), col("bin"))
      .agg(count(lit(1)).as("n"))
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

  /** The current sketch: bin-wise sum over the delta log. */
  def current(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(col("key"), col("bin"))
      .agg(sum(col("n")).as("n"))

  /** Current p50/p90 estimates per key — the dashboard read. */
  def estimates(s: SparkSession, path: String): DataFrame =
    Extras.histEstimates(current(s, path)).orderBy("key")

  /** Fold the aged delta log into a single partition via [[SketchLog
    * .compact]]: only the partitions enumerated at snapshot time are
    * folded and swapped out, so a batch landed by a concurrent absorb
    * survives in place (histograms fold by addition, so folded + later
    * deltas still sum to the truth).
    */
  def compact(s: SparkSession, path: String): Unit =
    SketchLog.compact(s, path, delta =>
      delta.groupBy(col("key"), col("bin")).agg(sum(col("n")).as("n")))
}
