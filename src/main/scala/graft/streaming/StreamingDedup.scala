package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous document ingest — the
  * Structured-Streaming face of the batch d01 operator: content identity
  * is md5(text), first arrival wins, later copies are dropped across
  * micro-batches.
  *
  * Scale design: state stores ONLY the 128-bit content hash per seen
  * document (never bodies — `dropDuplicates` keys the state store on the
  * listed columns), sharded by hash across executors, checkpointed.
  * Two modes:
  *
  *   - [[dedupStream]]: unbounded state — exact "ever seen" semantics for
  *     bounded backfills, where the state ceiling is |corpus| hashes;
  *   - [[dedupStreamWithinWatermark]]: `dropDuplicatesWithinWatermark`
  *     bounds state by the event-time horizon — the continuous-ingest
  *     mode. Duplicates in real crawl streams arrive close in time
  *     (re-crawls, retries, mirror lag), so a horizon of days catches
  *     them while state stays O(ingest-rate × horizon) instead of
  *     O(everything ever).
  */
object StreamingDedup {

  /** Unbounded-state exact dedup: docs (doc_id, text, ...) → first
    * occurrence of each distinct text. Adds the content hash as `h`.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text"))).dropDuplicates("h")

  /** Watermark-bounded dedup: suppresses duplicates whose copies arrive
    * within `horizon` of the original (by the `tsCol` event time); a copy
    * arriving after the state for its hash expired is re-admitted —
    * the explicit trade for bounded state.
    */
  def dedupStreamWithinWatermark(docs: DataFrame, tsCol: String,
      horizon: String): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("h")
}
