package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.KmvSketch
import graft.operators.{Dedup, Extras, TimeWindows}

/** Streaming maintenance of the q68 KMV sketches: k-min fold across
  * batches, replay idempotence, batch-split invariance (KMV is a set
  * function), estimate equivalence with the batch sketch, compaction.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def eventsDf(rows: Seq[(Timestamp, Long)]): DataFrame =
    rows.toDF("ts", "user_id")

  /** The batch-side per-day sketch of the same rows (the q68 build). */
  private def batchSketch(rows: Seq[(Timestamp, Long)]): Seq[(String, Seq[Long])] =
    eventsDf(rows)
      .select(date_format(to_date(TimeWindows.eventTime), "yyyy-MM-dd").as("day"),
        Dedup.baseHash(col("user_id").cast("string")).as("hv"))
      .groupBy("day").agg(KmvSketch.sketch(col("hv"), Extras.KMV_K).as("sk"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)

  private def currentSketch(path: String): Seq[(String, Seq[Long])] =
    StreamingKmv.current(spark, path)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)

  private val b1 = Seq((ts(1, 9), 10L), (ts(1, 10), 11L), (ts(1, 11), 10L),
    (ts(2, 9), 10L), (ts(2, 10), 30L))
  private val b2 = Seq((ts(1, 12), 12L), (ts(2, 11), 30L), (ts(2, 12), 31L),
    (ts(3, 9), 50L))

  test("streamed batches fold to the one-pass batch sketch (k-min mergeability)") {
    val path = Files.createTempDirectory("skmv").toString + "/log"
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val src = mem.toDF().toDF("ts", "user_id")
    // default trigger (not AvailableNow): the test feeds batches after
    // the query starts, the StreamingHistogramSpec driving pattern
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => StreamingKmv.absorb(b, id, path))
      .start()
    Seq(b1, b2).foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    assert(currentSketch(path) == batchSketch(b1 ++ b2))
  }

  test("a replayed batch overwrites its own partition — absorb is idempotent") {
    val path = Files.createTempDirectory("skmv").toString + "/log"
    StreamingKmv.absorb(eventsDf(b1), 0L, path)
    StreamingKmv.absorb(eventsDf(b2), 1L, path)
    val once = currentSketch(path)
    StreamingKmv.absorb(eventsDf(b2), 1L, path) // crash-replay of batch 1
    assert(currentSketch(path) == once, "replay must not change a set sketch")
  }

  test("batch-split invariance: any partition of the stream folds identically") {
    val pathA = Files.createTempDirectory("skmv").toString + "/log"
    val pathB = Files.createTempDirectory("skmv").toString + "/log"
    val all = b1 ++ b2
    StreamingKmv.absorb(eventsDf(all), 0L, pathA) // one big batch
    all.grouped(3).zipWithIndex.foreach { case (rows, i) => // many small ones
      StreamingKmv.absorb(eventsDf(rows), i.toLong, pathB)
    }
    assert(currentSketch(pathA) == currentSketch(pathB))
  }

  test("estimates off the log equal the q68 estimator on the batch sketch") {
    val path = Files.createTempDirectory("skmv").toString + "/log"
    StreamingKmv.absorb(eventsDf(b1), 0L, path)
    StreamingKmv.absorb(eventsDf(b2), 1L, path)
    val streamed = StreamingKmv.estimates(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // below k the estimator is exact — these are the true distinct counts
    assert(streamed == Seq(("2024-01-01", 3L), ("2024-01-02", 3L), ("2024-01-03", 1L)))
  }

  test("compaction folds the log to one partition and changes nothing observable") {
    val path = Files.createTempDirectory("skmv").toString + "/log"
    StreamingKmv.absorb(eventsDf(b1), 0L, path)
    StreamingKmv.absorb(eventsDf(b2), 1L, path)
    val before = currentSketch(path)
    StreamingKmv.compact(spark, path)
    assert(currentSketch(path) == before)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }

  test("a batch landed mid-compact survives the swap (k-min of fold ∪ delta is still the union's k-min)") {
    val path = Files.createTempDirectory("skmv").toString + "/log"
    val b3 = Seq((ts(1, 12), 77L), (ts(3, 9), 78L))
    StreamingKmv.absorb(eventsDf(b1), 0L, path)
    StreamingKmv.absorb(eventsDf(b2), 1L, path)
    // land batch 99 between SketchLog's snapshot and its swap — the
    // concurrent-absorb window — via a side-effecting fold
    SketchLog.compact(spark, path, { delta =>
      StreamingKmv.absorb(eventsDf(b3), 99L, path)
      delta.groupBy(col("day"))
        .agg(KmvSketch.sketch(col("hv"), Extras.KMV_K).as("sk"))
        .select(col("day"), explode(col("sk")).as("hv"))
    })
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSeq.sorted
    assert(parts == Seq("batch_id=-1", "batch_id=99"))
    assert(currentSketch(path) == batchSketch(b1 ++ b2 ++ b3))
  }
}
