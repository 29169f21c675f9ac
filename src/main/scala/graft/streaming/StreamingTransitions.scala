package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Extras

/** Streaming maintenance of q73's event-transition matrix — the online
  * user-journey monitor: as events land, each batch contributes its
  * WITHIN-batch transition rollup plus one per-user BOUNDARY row (first
  * and last event of the batch), and the read stitches consecutive
  * batches' boundaries back into the transitions that straddle them.
  * History is never rescanned: a batch lands ≤ |types|² + |users(batch)|
  * rows, and the read costs O(log), not O(events).
  *
  * Exactness contract: stitching reconstructs the batch q73 EXACTLY when
  * each user's per-batch windows do not INTERLEAVE — the read sorts
  * boundary rows by first event, so even batches that arrive out of
  * ORDER are repaired as long as their windows are disjoint (the spec
  * pins the repair). In-order per-user delivery (the Kafka/binlog
  * per-partition guarantee, the ST3 discipline) implies this trivially.
  * The read does not ASSUME it silently: [[orderViolations]] counts
  * boundary pairs whose windows overlap, a declarative audit that is 0
  * exactly when the stitched matrix is trustworthy; the spec plants an
  * interleaved split and pins the counter firing.
  *
  *   - exactly-once: [[SketchLog.land]] per-writer dynamic overwrite on
  *     both sub-logs (a replayed batch replaces its own partitions);
  *   - batch-split invariance: within-rollups are sums and boundary
  *     stitching telescopes, so ANY ordered split of the stream folds to
  *     the one-pass matrix (spec-pinned for 1-, 2- and 4-batch splits);
  *   - [[compact]]: transitions fold under component-wise sum; boundary
  *     rows fold by CONCATENATION (they are the stitch state itself), so
  *     the bounds log stays O(users · batches) between compactions and
  *     O(users · compaction cycles) after — the trade against a
  *     mapGroupsWithState design whose per-user state store needs its
  *     own checkpoint lifecycle (documented, not hidden).
  */
object StreamingTransitions {

  private def transPath(path: String) = s"$path/trans"
  private def boundsPath(path: String) = s"$path/bounds"

  /** One batch's delta: within-batch transition rollup + per-user
    * boundary rows, landed idempotently under the batch's partition.
    * `maxGapUs` is the q75 within-session predicate (see
    * [[StreamingSessionTransitions]]); None = q73, every pair counts.
    */
  def absorb(batch: DataFrame, batchId: Long, path: String,
      maxGapUs: Option[Long] = None): Unit = {
    val ev = Extras.transitionEvents(batch)
    if (ev.isEmpty) return
    val within = Extras.transitionRollup(ev, maxGapUs)
      .withColumn("batch_id", lit(batchId))
    // a batch of single-event users has bounds but no within-transitions;
    // an empty partitioned write would leave a schema-less dir behind
    if (!within.isEmpty) SketchLog.land(within, transPath(path))
    // first/last per user: struct min/max orders by (us, event_id) —
    // unique pairs, so the trailing event_type rides along deterministically
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(struct(col("us"), col("event_id"), col("event_type"))).as("f"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("l"))
      .select(col("user_id"),
        col("f.us").as("first_us"), col("f.event_id").as("first_id"),
        col("f.event_type").as("first_type"),
        col("l.us").as("last_us"), col("l.event_id").as("last_id"),
        col("l.event_type").as("last_type"))
      .withColumn("batch_id", lit(batchId))
    SketchLog.land(bounds, boundsPath(path))
  }

  /** Start maintaining the transition log from an event stream. */
  def start(events: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => absorb(b, id, path))
      .trigger(trigger)
      .start()

  /** Boundary rows with each user's PREVIOUS batch-last event attached —
    * the stitch frame shared by the read and the order audit.
    */
  private def stitchFrame(s: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("first_us"), col("first_id"))
    s.read.parquet(boundsPath(path)).drop("batch_id")
      .withColumn("p_type", lag(col("last_type"), 1).over(w))
      .withColumn("p_us", lag(col("last_us"), 1).over(w))
      .withColumn("p_id", lag(col("last_id"), 1).over(w))
  }

  /** An empty (prev_type, next_type, n, gap_sum) counts frame — what a
    * read before any batch has landed folds from (both sub-logs absent).
    */
  private def emptyCounts(s: SparkSession): DataFrame =
    s.range(0).select(col("id").cast("string").as("prev_type"),
      col("id").cast("string").as("next_type"),
      col("id").as("n"), col("id").as("gap_sum"))

  /** The folded transition matrix: within-batch sums + stitched
    * cross-boundary transitions, through the SAME final projection as
    * batch q73 (spec-pinned ≡ on identical, ordered events). A read
    * before ANY batch has landed is an empty matrix, not a path error —
    * the bounds read carries the same partitions-guard as trans.
    */
  def transitions(s: SparkSession, path: String,
      maxGapUs: Option[Long] = None): DataFrame = {
    val cross =
      if (SketchLog.partitions(boundsPath(path)).isEmpty) emptyCounts(s)
      else {
        val stitched = stitchFrame(s, path)
          .filter(col("p_type").isNotNull)
          .select(col("p_type").as("prev_type"),
            col("first_type").as("next_type"),
            (col("first_us") - col("p_us")).as("gap_us"))
        // q75 predicate on the stitched boundary pair itself: the pair
        // is same-session iff ITS gap is under the threshold — session
        // membership factorizes over consecutive pairs, so no per-user
        // session state is needed (see StreamingSessionTransitions)
        maxGapUs.map(g => stitched.filter(col("gap_us") < g))
          .getOrElse(stitched)
          .groupBy(col("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("gap_sum"))
      }
    val unioned =
      if (SketchLog.partitions(transPath(path)).nonEmpty)
        s.read.parquet(transPath(path)).drop("batch_id").unionByName(cross)
      else cross
    val folded = unioned
      .groupBy(col("prev_type"), col("next_type"))
      .agg(sum(col("n")).as("n"), sum(col("gap_sum")).as("gap_sum"))
    Extras.transitionReport(folded)
  }

  /** Ordering audit: boundary pairs where the previous batch's last
    * event does NOT precede this batch's first — 0 exactly when the
    * stitched matrix equals the batch operator on the merged events.
    */
  def orderViolations(s: SparkSession, path: String): DataFrame =
    if (SketchLog.partitions(boundsPath(path)).isEmpty)
      s.range(1).select(lit(0L).as("violations"))
    else stitchFrame(s, path)
      .filter(col("p_type").isNotNull)
      .agg(count(when(struct(col("p_us"), col("p_id")) >
        struct(col("first_us"), col("first_id")), 1)).as("violations"))

  /** Fold the aged logs: transitions sum; boundary rows concatenate
    * (they ARE the stitch state — dropping or merging them would lose
    * the cross-batch transitions they imply).
    */
  def compact(s: SparkSession, path: String): Unit = {
    SketchLog.compact(s, transPath(path), delta =>
      delta.groupBy(col("prev_type"), col("next_type"))
        .agg(sum(col("n")).as("n"), sum(col("gap_sum")).as("gap_sum")))
    SketchLog.compact(s, boundsPath(path), identity)
  }
}
