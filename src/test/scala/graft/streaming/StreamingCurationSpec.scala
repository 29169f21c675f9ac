package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming curation composition: gated docs never enter state, a
  * cross-batch exact dup is suppressed, and the windowed stats emit once
  * the watermark closes the window — with gate and dedup already applied.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val GOOD_A = "alpha beta gamma delta epsilon zeta"          // 6 tokens
  private val GOOD_B = "one two three four five six seven eight"      // 8 tokens
  private val SHORT  = "too short"                                    // gated (< 5)

  test("gate + cross-batch dedup + windowed stats compose in one append query") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("cur-ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Row]()
    val mem = MemoryStream[(Long, String, String, Long, String, Long)]
    val src = mem.toDF()
      .toDF("doc_id", "source", "lang", "n_chars", "text", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = StreamingCuration.curateStream(src, "ts", "10 seconds", "1 minute")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        emitted.synchronized { emitted ++= b.collect() }
        ()
      }
      .start()
    // batch 1, window [60,120): two good docs, one gated, one exact dup
    mem.addData(
      (1L, "src0", "en", 36L, GOOD_A, 70L),
      (2L, "src0", "en", 40L, GOOD_B, 75L),
      (3L, "src0", "en", 9L, SHORT, 80L),   // gated: never reaches state
      (4L, "src0", "en", 36L, GOOD_A, 85L)) // dup of 1: suppressed
    q.processAllAvailable()
    // batch 2: event far enough ahead that the watermark (max - 10s)
    // passes 120s and the first window closes
    mem.addData((5L, "src1", "de", 30L, "eins zwei drei vier funf sechs", 500L))
    q.processAllAvailable()
    q.stop()
    val rows = emitted.synchronized { emitted.toList }
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond,
        r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // exactly one closed window: [60,120) for (src0, en) with the gated
    // and duplicated docs excluded -> 2 docs, 76 chars
    assert(rows == List((60L, "src0", "en", 2L, 76L)), s"got $rows")
  }
}
