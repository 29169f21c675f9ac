package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming count-min maintenance: cell-sum linearity across batches,
  * the one-sided estimate bound, replay idempotence, exactness below
  * collision load, and compaction invariance.
  */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def eventsDf(rows: Seq[(Timestamp, Long)]): DataFrame =
    rows.toDF("ts", "user_id")

  /** user 10 is the planted heavy hitter on day 1. */
  private val b1 = Seq((ts(1, 9), 10L), (ts(1, 10), 10L), (ts(1, 11), 10L),
    (ts(1, 12), 11L), (ts(2, 9), 30L))
  private val b2 = Seq((ts(1, 13), 10L), (ts(1, 14), 12L), (ts(2, 10), 30L),
    (ts(3, 9), 50L))

  private def trueCounts(rows: Seq[(Timestamp, Long)]): Map[(String, String), Long] =
    rows.groupBy { case (t, u) =>
      (t.toString.substring(0, 10), u.toString)
    }.map { case (k, v) => (k, v.size.toLong) }

  private def probeAll(path: String,
      rows: Seq[(Timestamp, Long)]): Map[(String, String), Long] = {
    val probes = trueCounts(rows).keys.toSeq.toDF("day", "key")
    StreamingCms.estimates(spark, path, probes).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
  }

  private def currentCells(path: String): Set[(String, Int, Long, Long)] =
    StreamingCms.current(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("streamed batches fold to the one-pass sketch (cell-sum linearity)") {
    val path = Files.createTempDirectory("scms").toString + "/log"
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val src = mem.toDF().toDF("ts", "user_id")
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => StreamingCms.absorb(b, id, path))
      .start()
    Seq(b1, b2).foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    val onePass = Files.createTempDirectory("scms").toString + "/log"
    StreamingCms.absorb(eventsDf(b1 ++ b2), 0L, onePass)
    assert(currentCells(path) == currentCells(onePass))
  }

  test("estimates are one-sided and exact below collision load; the hitter surfaces") {
    val path = Files.createTempDirectory("scms").toString + "/log"
    StreamingCms.absorb(eventsDf(b1), 0L, path)
    StreamingCms.absorb(eventsDf(b2), 1L, path)
    val truth = trueCounts(b1 ++ b2)
    val est = probeAll(path, b1 ++ b2)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never under-count ($k)")
    }
    // 6 distinct keys against depth-5 x 4096 cells: collision-free, so
    // every estimate is exact and the planted hitter reads its true 4
    assert(est == truth)
    assert(est(("2024-01-01", "10")) == 4L)
    // a never-seen key estimates 0 through the left join
    val ghost = StreamingCms.estimates(spark, path,
      Seq(("2024-01-01", "999")).toDF("day", "key")).collect()
    assert(ghost.map(_.getLong(2)).toSeq == Seq(0L))
  }

  test("a replayed batch overwrites its own partition — absorb is idempotent") {
    val path = Files.createTempDirectory("scms").toString + "/log"
    StreamingCms.absorb(eventsDf(b1), 0L, path)
    StreamingCms.absorb(eventsDf(b2), 1L, path)
    val once = currentCells(path)
    StreamingCms.absorb(eventsDf(b2), 1L, path) // crash-replay of batch 1
    assert(currentCells(path) == once,
      "replay must not double cell counts")
  }

  test("compaction folds to one partition and changes no estimate") {
    val path = Files.createTempDirectory("scms").toString + "/log"
    StreamingCms.absorb(eventsDf(b1), 0L, path)
    StreamingCms.absorb(eventsDf(b2), 1L, path)
    val before = probeAll(path, b1 ++ b2)
    StreamingCms.compact(spark, path)
    assert(probeAll(path, b1 ++ b2) == before)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }
}
