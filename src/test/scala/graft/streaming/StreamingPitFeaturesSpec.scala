package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Advanced

/** Streaming PIT-feature maintenance: streamed rollups replay to exactly
  * the batch q71 frame (the leakage guarantee rides along), replay
  * idempotence, cross-batch day-split folding, compaction invariance.
  */
class StreamingPitFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  // user 10's day 1 is SPLIT across the two batches — the fold must merge
  // it into one rollup row before the prior-frame window sees it
  private val b1 = Seq(
    (1L, ts(1, 9), 10L, "view", 10.0), (2L, ts(1, 10), 10L, "purchase", 25.5),
    (3L, ts(2, 9), 10L, "click", 1.0), (4L, ts(1, 11), 20L, "view", 3.0))
  private val b2 = Seq(
    (5L, ts(1, 12), 10L, "view", 2.0), (6L, ts(4, 9), 10L, "purchase", 99.99),
    (7L, ts(2, 10), 20L, "purchase", 49.5))

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def collected(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("streamed rollups replay to exactly the batch q71 features") {
    val path = Files.createTempDirectory("spit").toString + "/log"
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingPitFeatures.absorb(b, id, path))
      .start()
    Seq(b1, b2).foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    // batch q71 over the SAME events, via a parquet table the operator reads
    val dir = Files.createTempDirectory("pitbatch").toString
    eventsDf(b1 ++ b2).write.parquet(s"$dir/events.parquet")
    val batch = Advanced.pitFeatures(spark, dir)
    assert(collected(StreamingPitFeatures.features(spark, path)) ==
      collected(batch),
      "streamed feature frame must equal the batch operator row-for-row")
  }

  test("replayed batch is idempotent; compaction changes nothing") {
    val path = Files.createTempDirectory("spit").toString + "/log"
    StreamingPitFeatures.absorb(eventsDf(b1), 0L, path)
    StreamingPitFeatures.absorb(eventsDf(b2), 1L, path)
    val once = collected(StreamingPitFeatures.features(spark, path))
    StreamingPitFeatures.absorb(eventsDf(b2), 1L, path) // crash-replay
    assert(collected(StreamingPitFeatures.features(spark, path)) == once)
    StreamingPitFeatures.compact(spark, path)
    assert(collected(StreamingPitFeatures.features(spark, path)) == once)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }

  test("a day split across batches folds before the prior frame sees it") {
    val path = Files.createTempDirectory("spit").toString + "/log"
    StreamingPitFeatures.absorb(eventsDf(b1), 0L, path)
    StreamingPitFeatures.absorb(eventsDf(b2), 1L, path)
    val u10 = StreamingPitFeatures.currentRollup(spark, path)
      .filter("user_id = 10").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(u10.values.sum == 5L, "all 5 user-10 events counted once")
    assert(u10.size == 3, "three distinct active days for user 10")
    // the split day folded: its rollup row carries all 3 of that day's
    // events (2 from batch 0, 1 from batch 1)
    assert(u10(u10.keys.min) == 3L)
  }
}
