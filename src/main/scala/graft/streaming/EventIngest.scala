package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest of an event stream into the daily-partitioned layout
  * ([[graft.operators.ScalePatterns.writeDailyPartitioned]]'s landing
  * path, continuous form) — the production shape for the events table:
  *
  *   - each micro-batch appends under its rows' `day=YYYY-MM-DD`
  *     partition directories — delta-proportional writes, no existing
  *     file is ever read or rewritten (the index-append discipline);
  *   - exactly-once to readers: the parquet sink records committed files
  *     in its `_spark_metadata` log transactionally with the checkpoint,
  *     so a batch replayed after a crash overwrites its OWN manifest
  *     entry instead of double-appearing, and batch readers of the
  *     output path list from the manifest, never from raw directory
  *     state;
  *   - the layout is the NTZ-immune one: readers prune at LISTING time
  *     via [[graft.operators.ScalePatterns.eventRange]]'s derived
  *     day-conjunct, so the TIMESTAMP_NTZ FilterPredicate gap never
  *     applies; retention/compaction operate on whole day directories.
  *
  * The `day` column derives from the event-TIME column (not arrival
  * time): late events land in their OWN day's partition, keeping the
  * layout query-correct under any lateness — the tradeoff is that a
  * late-arriving day partition receives a second (small) file, which
  * day-granularity compaction folds later.
  */
object EventIngest {

  /** Start the ingest. AvailableNow by default (drain-and-stop — the
    * testable trigger); pass ProcessingTime for a long-running daemon.
    */
  def start(events: DataFrame, path: String, checkpoint: String,
      tsCol: String = "ts",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(events.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
      "EventIngest requires spark.sql.session.timeZone=UTC (day derivation " +
        "must agree with the batch layout and the oracle)")
    events
      .withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
