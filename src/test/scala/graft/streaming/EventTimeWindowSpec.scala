package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** ST5 streaming side: watermarked tumbling-window aggregation with
  * late-data drop, deterministic via MemoryStream + processAllAvailable.
  */
class EventTimeWindowSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with 10-minute watermark drops late events in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_sink").start()

    // two events in the 10:00 window, one in 10:05
    mem.addData((ts(0), 1.0), (ts(3), 1.0), (ts(7), 1.0))
    q.processAllAvailable()
    // advance event time far enough that watermark (max - 10min) passes 10:10
    mem.addData((ts(25), 1.0))
    q.processAllAvailable()
    // LATE: an event for the already-finalized 10:00 window — must be dropped
    mem.addData((ts(1), 99.0))
    q.processAllAvailable()
    // close remaining windows
    mem.addData((ts(59), 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_sink").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(rows("2024-01-01 10:00:00.0") == 2L) // late event NOT counted
    assert(rows("2024-01-01 10:05:00.0") == 1L)
    assert(rows("2024-01-01 10:25:00.0") == 1L)
  }
}
