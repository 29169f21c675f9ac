package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — the Structured Streaming operator
  * class behind click→conversion attribution, CDC enrichment against a
  * slowly-arriving second stream, and any "two unbounded inputs, bounded
  * time skew" correlation.
  *
  * Scale shape: both sides are watermarked and the join condition bounds
  * the match window, so Spark's symmetric hash join keeps PER-SIDE state
  * only for rows that can still match (evicted once the watermark passes
  * `ts + window`); state is hash-partitioned by the equi-key like any
  * shuffle join. Without BOTH the watermarks and the time-range bound the
  * state is unbounded — this module makes the bounded form the only
  * constructible one.
  *
  * Contract: `clicks` carries (click_id, user_id, click_ts timestamp),
  * `conversions` carries (conv_id, user_id, conv_ts timestamp).
  */
object StreamingJoins {

  /** Attribute each conversion to clicks by the same user within
    * [click_ts, click_ts + window]. `joinType` "inner" emits attributed
    * conversions only; "left_outer" additionally emits never-converted
    * clicks (null conv columns) once their match window fully expires —
    * the funnel-drop report.
    */
  def attributionJoin(clicks: DataFrame, conversions: DataFrame,
      delay: String = "10 seconds", window: String = "60 seconds",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", delay)
    val v = conversions.withWatermark("conv_ts", delay)
    c.join(v,
        c("user_id") === v("user_id") &&
          v("conv_ts") >= c("click_ts") &&
          v("conv_ts") <= c("click_ts") + expr(s"INTERVAL $window"),
        joinType)
      .select(c("user_id").as("user_id"), col("click_id"), col("click_ts"),
        col("conv_id"), col("conv_ts"))
  }

  /** Stream-STATIC dimension enrichment — the other production join: an
    * unbounded fact stream against a bounded dimension table (the CDC
    * latest-state output, a nation/customer dim, a mixture-config frame).
    * No watermark and NO STATE: the static plan RE-EXECUTES per
    * micro-batch and Spark broadcasts it when it fits, exactly as in
    * batch. Whether a dim refresh is picked up batch-over-batch depends
    * on the static source: a JDBC/catalog/Delta-backed dim re-resolves
    * in place; a path-based parquet read pins its file listing at query
    * start and needs a (stateless, offsets-only) query restart. left_outer
    * keeps facts whose dimension row is missing (nulls), the
    * data-quality-visible form; inner silently drops them.
    */
  def dimensionEnrich(facts: DataFrame, dim: DataFrame, key: String,
      joinType: String = "left_outer"): DataFrame =
    facts.join(broadcast(dim), Seq(key), joinType)
}
