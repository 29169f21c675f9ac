package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Extras

/** Streaming maintenance of the q66 mergeable histogram: cross-batch
  * vector addition, replay idempotence, estimate equivalence with the
  * batch sketch, and the compaction swap.
  */
class StreamingHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(String, Double)]): DataFrame =
    rows.toDF("event_type", "value")

  private def batchHist(rows: Seq[(String, Double)]): Seq[(String, Long, Long)] =
    eventsDf(rows)
      .select(col("event_type").as("key"), Extras.centsOf(col("value")).as("cents"))
      .withColumn("bin", Extras.binOfCents(col("cents")))
      .groupBy("key", "bin").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  private def currentHist(path: String): Seq[(String, Long, Long)] =
    StreamingHistogram.current(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  private val b1 = Seq(("click", 1.50), ("click", 399.99), ("view", 4.00),
    ("view", 4.01), ("error", 250.00))
  private val b2 = Seq(("click", 1.51), ("view", 480.00), ("error", 250.00),
    ("error", 0.01))

  test("streamed batches fold to exactly the one-pass batch histogram") {
    val path = Files.createTempDirectory("shist").toString + "/log"
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val src = mem.toDF().toDF("event_type", "value")
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => StreamingHistogram.absorb(b, id, path))
      .start()
    Seq(b1, b2).foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    assert(currentHist(path) == batchHist(b1 ++ b2))
  }

  test("a replayed batch overwrites its own partition — absorb is idempotent") {
    val path = Files.createTempDirectory("shist").toString + "/log"
    StreamingHistogram.absorb(eventsDf(b1), 0L, path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path)
    val once = currentHist(path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path) // crash-replay of batch 1
    assert(currentHist(path) == once, "replay must not double-count")
  }

  test("estimates off the maintained log equal q66's batch-sketch estimates") {
    val path = Files.createTempDirectory("shist").toString + "/log"
    StreamingHistogram.absorb(eventsDf(b1), 0L, path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path)
    val streamed = StreamingHistogram.estimates(spark, path)
      .collect().map(_.toString).toSeq
    val hist = eventsDf(b1 ++ b2)
      .select(col("event_type").as("key"), Extras.centsOf(col("value")).as("cents"))
      .withColumn("bin", Extras.binOfCents(col("cents")))
      .groupBy("key", "bin").agg(count(lit(1)).as("n"))
    val direct = Extras.histEstimates(hist).orderBy("key")
      .collect().map(_.toString).toSeq
    assert(streamed == direct)
  }

  test("compaction folds the log to one partition and changes nothing observable") {
    val path = Files.createTempDirectory("shist").toString + "/log"
    StreamingHistogram.absorb(eventsDf(b1), 0L, path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path)
    val before = currentHist(path)
    StreamingHistogram.compact(spark, path)
    assert(currentHist(path) == before)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }

  test("a fresh-checkpoint restart's batch 0 cannot clobber compacted history") {
    // the ADVICE r12 collision: history folded into batch_id=0 would be
    // silently REPLACED by the first micro-batch of any stream restarted
    // on a fresh checkpoint (batchIds restart at 0) — the sentinel
    // partition batch_id=-1 is unreachable by any streaming batch
    val path = Files.createTempDirectory("shist").toString + "/log"
    val b3 = Seq(("click", 9.99))
    StreamingHistogram.absorb(eventsDf(b1), 0L, path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path)
    StreamingHistogram.compact(spark, path)
    // restart on a fresh checkpoint: first batch lands as id 0 again
    StreamingHistogram.absorb(eventsDf(b3), 0L, path)
    assert(currentHist(path) == batchHist(b1 ++ b2 ++ b3),
      "batch 0 of a restarted stream must land BESIDE the folded history, not over it")
  }

  test("absorb stays dynamic-overwrite even when the session conf says static") {
    // the ADVICE r11 race: another stream's finally-restore can leave the
    // SESSION in static mode while this absorb plans — the per-writer
    // option must win, or a replay wipes every other batch's partition
    val path = Files.createTempDirectory("shist").toString + "/log"
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "static")
    try {
      StreamingHistogram.absorb(eventsDf(b1), 0L, path)
      StreamingHistogram.absorb(eventsDf(b2), 1L, path)
      StreamingHistogram.absorb(eventsDf(b2), 1L, path) // replay under static session conf
      assert(currentHist(path) == batchHist(b1 ++ b2),
        "replay under a static session conf must not delete sibling partitions")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a batch landed mid-compact survives the swap and keeps counting") {
    val path = Files.createTempDirectory("shist").toString + "/log"
    val b3 = Seq(("click", 7.77), ("view", 0.25))
    StreamingHistogram.absorb(eventsDf(b1), 0L, path)
    StreamingHistogram.absorb(eventsDf(b2), 1L, path)
    // drive SketchLog.compact directly with a fold that lands batch 99
    // AFTER the snapshot was enumerated but BEFORE the swap — the
    // concurrent-absorb window the ADVICE r11 note describes
    SketchLog.compact(spark, path, { delta =>
      StreamingHistogram.absorb(eventsDf(b3), 99L, path)
      delta.groupBy(col("key"), col("bin")).agg(sum(col("n")).as("n"))
    })
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSeq.sorted
    assert(parts == Seq("batch_id=-1", "batch_id=99"),
      "the mid-compact batch must survive beside the folded partition")
    assert(currentHist(path) == batchHist(b1 ++ b2 ++ b3))
  }
}
