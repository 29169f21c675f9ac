package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, TimeWindows}

/** Streaming maintenance of a count-min sketch over per-day event keys —
  * the continuous heavy-hitter / frequency dashboard t14 runs in batch
  * over documents, kept fresh without rescanning history. Third member of
  * the sketch-log family, under its own merge law: histograms fold by
  * bin-wise sum, KMV by k-min of the distinct union, count-min by
  * CELL-WISE SUM — the linearity that makes CMS the canonical streaming
  * sketch (Cormode & Muthukrishnan 2005).
  *
  * The sketch is stored as nonzero CELL ROWS (day, r, cell, cnt), not a
  * binary blob: the fold is then a plain distributed groupBy-sum (no
  * driver-side merge, no binary-codec coupling to Spark's internal
  * CountMinSketch layout), landing is delta-proportional (≤ depth ×
  * batch-distinct-keys rows per day), and `current` costs
  * |log rows|, never event-proportional. Row hashes are the cross-engine
  * md5 family with the row index salted into the key, so the depth
  * functions are pairwise-independent-enough in the standard md5-truncate
  * sense and IDENTICAL across batch/stream re-derivations.
  *
  * One-sidedness is structural: each of the [[DEPTH]] per-key cells sums
  * every event whose hash collides there, so each cell ≥ the key's true
  * count and the min over rows is an upper-bound estimate — never under.
  *
  *   - exactly-once: [[SketchLog.land]]'s per-writer dynamic-partition
  *     overwrite — a replayed batch replaces its own partition, and
  *     cell-count sums of the same rows land identically;
  *   - batch-split invariance: cell sums are associative/commutative, so
  *     ANY partition of the stream folds to the one-pass sketch;
  *   - [[compact]] folds the aged log under the same groupBy-sum via
  *     [[SketchLog.compact]]'s snapshot-scoped swap.
  */
object StreamingCms {

  /** Sketch geometry: depth 5 rows (error prob ~e^-5 per Chernoff) over
    * 4096 cells (eps ≈ 2/4096 of the day's event mass added per cell).
    */
  val DEPTH = 5
  val WIDTH = 4096L

  /** The DEPTH (r, cell) coordinates of each keyed row — shared by the
    * absorb (count) and estimate (probe) sides so they cannot drift.
    * Input needs (day, key); every other column is carried through.
    */
  private[streaming] def cells(keyed: DataFrame): DataFrame =
    keyed
      .select(col("*"), explode(sequence(lit(0), lit(DEPTH - 1))).as("r"))
      .withColumn("cell",
        pmod(Dedup.baseHash(concat_ws(":", col("r"), col("key"))), lit(WIDTH)))

  /** Per-day event keys for the corpus events stream: the user id (the
    * "which accounts dominate today's traffic" dashboard).
    */
  private[streaming] def keyedOf(batch: DataFrame): DataFrame =
    batch.select(
      date_format(to_date(TimeWindows.eventTime), "yyyy-MM-dd").as("day"),
      col("user_id").cast("string").as("key"))

  /** Land one batch's delta cells idempotently (replay-safe). */
  def absorb(batch: DataFrame, batchId: Long, path: String): Unit = {
    val delta = cells(keyedOf(batch))
      .groupBy(col("day"), col("r"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
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

  /** The current sketch: cell-wise sum over the delta log. */
  def current(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(col("day"), col("r"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Frequency estimates for a (day, key) probe frame — min over the
    * DEPTH cells, the CMS read. Cells the log never touched count 0 via
    * the left join, so a never-seen key estimates 0 exactly.
    */
  def estimates(s: SparkSession, path: String, probes: DataFrame): DataFrame =
    cells(probes.select(col("day"), col("key")))
      .join(current(s, path), Seq("day", "r", "cell"), "left")
      .groupBy(col("day"), col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
      .orderBy("day", "key")

  /** Fold the aged delta log into one partition (cell sums are linear,
    * so fold ∪ later deltas ≡ the union's sketch).
    */
  def compact(s: SparkSession, path: String): Unit =
    SketchLog.compact(s, path, delta =>
      delta.groupBy(col("day"), col("r"), col("cell"))
        .agg(sum(col("cnt")).as("cnt")))
}
