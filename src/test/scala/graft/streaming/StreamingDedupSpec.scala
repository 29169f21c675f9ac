package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming exact dedup: cross-batch duplicate suppression, and the
  * bounded-state watermark mode's expire-then-readmit contract.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(makeOut: DataFrame => DataFrame,
      batches: Seq[Seq[(Long, String, Long)]]): Seq[Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Seq[Long]]()
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = makeOut(src).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        emitted.synchronized {
          emitted += b.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
        }
        ()
      }
      .start()
    batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    emitted.toSeq.filter(_.nonEmpty)
  }

  test("unbounded mode: duplicate text dropped across micro-batches, state keyed on hash only") {
    val out = run(StreamingDedup.dedupStream _,
      Seq(
        Seq((1L, "alpha text", 100L), (2L, "beta text", 100L), (3L, "alpha text", 100L)),
        Seq((4L, "alpha text", 200L), (5L, "gamma text", 200L))))
    // batch 1: one of {1,3} (same content) + 2; batch 2: only 5 (4 is a dup)
    assert(out.head.length == 2 && out.head.contains(2L))
    assert(out(1) == Seq(5L))
  }

  test("watermark mode: dup suppressed within horizon, re-admitted after state expiry") {
    val out = run(StreamingDedup.dedupStreamWithinWatermark(_, "ts", "10 seconds"),
      Seq(
        Seq((1L, "alpha text", 100L)),   // original; watermark -> 90
        Seq((2L, "alpha text", 200L)),   // dup, hash still in state -> dropped; watermark -> 190
        Seq((3L, "alpha text", 300L)))) // state for the hash expired (190 > 110) -> re-admitted
    assert(out == Seq(Seq(1L), Seq(3L)), s"got $out")
  }
}
