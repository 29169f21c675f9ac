package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed heavy hitters with BOUNDED state — the continuous
  * face of t06's batch top-tokens: "per 10-minute window, the k most
  * frequent tokens", over a vocabulary that is unbounded by contract.
  *
  * An exact windowed `groupBy(window, token).count()` keeps one state row
  * per DISTINCT token per open window — on a 100 TB/day ingest with
  * long-tail vocabulary that is the state store growing with the data,
  * the streaming analog of the d03 uncapped posting list. The bounded
  * answer is the SpaceSaving summary (Metwally, Agrawal, El Abbadi:
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005): at most [[DEFAULT_CAPACITY]] counters per shard;
  * an unseen token arriving at a full summary evicts the minimum counter
  * and inherits its count as its error bound. Invariants (spec-pinned):
  * est ≥ true ≥ est − err for every surviving token, and any token with
  * true count > shardN/capacity is GUARANTEED to survive — heavy hitters
  * cannot be evicted.
  *
  * Keying is (window, pmod(xxhash64(token), shards)) — a token lives in
  * exactly ONE shard per window, so per-window merge is concatenation,
  * and state parallelism is shards-fold rather than one task per window
  * (the p04/p06/StreamingBudget low-cardinality-key lesson; a window key
  * alone has ~1 live value). Summaries EMIT ONCE, when the event-time
  * timeout fires after the watermark passes the window end — append-mode
  * discipline, no per-batch deltas. In-batch arrival order is made
  * deterministic by sorting each group on (event time, token).
  */
object StreamingTopK {

  val DEFAULT_CAPACITY = 64

  final case class TokRow(windowStartMs: Long, shard: Int, token: String,
      ts: java.sql.Timestamp) {
    // the watermarked timestamp COLUMN must survive into the typed rows —
    // event-time timeouts are rejected at analysis if it is projected away
    def tsMillis: Long = ts.getTime
  }
  final case class Entry(est: Long, err: Long)
  final case class SummaryState(counts: Map[String, Entry])
  final case class HitRow(window_start_ms: Long, shard: Int, token: String,
      est_count: Long, max_err: Long)

  /** One SpaceSaving update. Eviction picks the (est, token)-minimal
    * counter so replays are bit-deterministic.
    */
  private[streaming] def add(m: Map[String, Entry], tok: String,
      capacity: Int): Map[String, Entry] =
    m.get(tok) match {
      case Some(e) => m.updated(tok, e.copy(est = e.est + 1))
      case None if m.size < capacity => m.updated(tok, Entry(1L, 0L))
      case None =>
        val (mTok, mE) = m.minBy { case (t, e) => (e.est, t) }
        (m - mTok).updated(tok, Entry(mE.est + 1L, mE.est))
    }

  /** tokens (streaming, columns `token` string + `tsCol` castable to
    * timestamp) → one [[HitRow]] per surviving counter per (window,
    * shard), emitted when the watermark closes the window. `delay` is the
    * watermark (late tokens beyond it are dropped with their window).
    */
  def windowedHeavyHitters(tokens: DataFrame, tsCol: String, windowMs: Long,
      delayMs: Long, capacity: Int = DEFAULT_CAPACITY,
      shards: Int = 8): Dataset[HitRow] = {
    require(windowMs > 0 && capacity > 0 && shards > 0)
    val spark = tokens.sparkSession
    import spark.implicits._
    val rows = tokens
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", s"$delayMs milliseconds")
      .select(
        (floor(unix_millis(col("_ts")) / windowMs) * windowMs).as("windowStartMs"),
        pmod(xxhash64(col("token")), lit(shards)).cast("int").as("shard"),
        col("token"), col("_ts").as("ts"))
      .as[TokRow]
    rows.groupByKey(r => (r.windowStartMs, r.shard))
      .flatMapGroupsWithState[SummaryState, HitRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStart, shard), batch, state: GroupState[SummaryState]) =>
          if (state.hasTimedOut) {
            // window closed: emit the summary once, drop the state
            val out = state.getOption.map(_.counts).getOrElse(Map.empty)
              .toSeq.sortBy { case (t, e) => (-e.est, t) }
              .map { case (t, e) => HitRow(winStart, shard, t, e.est, e.err) }
            state.remove()
            out.iterator
          } else if (state.getOption.isEmpty &&
              winStart + windowMs <= state.getCurrentWatermarkMs()) {
            // stragglers for a window that already closed AND emitted
            // (its state is gone): drop them — re-creating state here
            // would emit a SECOND summary for the window and break the
            // emit-once contract
            Iterator.empty
          } else {
            var m = state.getOption.map(_.counts).getOrElse(Map.empty)
            batch.toSeq.sortBy(r => (r.tsMillis, r.token))
              .foreach(r => m = add(m, r.token, capacity))
            state.update(SummaryState(m))
            // fire as soon as the watermark passes the window end
            state.setTimeoutTimestamp(
              math.max(winStart + windowMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Batch tail over emitted summaries: the top-k per window. Tokens are
    * hash-sharded, so each appears in one shard's summary and cross-shard
    * "merge" is the bare union the emissions already are.
    */
  def topK(summaries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window_start_ms"))
      .orderBy(col("est_count").desc, col("token"))
    summaries
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("window_start_ms", "rank", "token", "est_count", "max_err")
  }
}
