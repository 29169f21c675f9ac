package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming NEAR-dup suppression: a near-duplicate (changed token, so a
  * different content hash — exact dedup would admit it) arriving in a
  * LATER micro-batch is suppressed; unrelated docs pass; state expires on
  * the event-time horizon and a post-horizon near-copy is re-admitted.
  */
class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val A  = "the quick brown fox jumps over the lazy dog at dawn today"
  private val A2 = "the quick brown fox jumps over the lazy dog at dawn tonight" // near-dup of A
  private val B  = "spark structured streaming shards keyed state across executors by bucket"
  private val B2 = "spark structured streaming shards keyed state across executors by partition" // near-dup of B
  private val C  = "completely unrelated corpus text mentioning neither foxes nor state stores"

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Seq[Long]]()
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = StreamingNearDedup.verdicts(src, "ts", horizonMs = 10000L).toDF()
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        emitted.synchronized {
          emitted += StreamingNearDedup.admitted(b)
            .collect().map(_.getLong(0)).toSeq.sorted
        }
        ()
      }
      .start()
    batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    emitted.toSeq.filter(_.nonEmpty)
  }

  test("cross-batch near-dup suppressed; unrelated and in-batch ordering handled; horizon re-admits") {
    val out = run(Seq(
      // b1: original admitted; watermark -> 90s
      Seq((1L, A, 100L)),
      // b2: 2 is a near-dup of 1 (changed token -> different md5) ->
      // suppressed; 3 is unrelated -> admitted; 6 is a near-dup of 3
      // WITHIN the batch (processed after 3 by (ts, id) order) -> suppressed
      Seq((2L, A2, 200L), (3L, B, 200L), (6L, B2, 200L)),
      // b3: unrelated, pushes the watermark to 390s so every stored
      // signature (expiries 110s, 210s) ages out
      Seq((5L, C, 400L)),
      // b4: near-copy of 1 after state expiry -> re-admitted
      Seq((4L, A, 500L))))
    assert(out == Seq(Seq(1L), Seq(3L), Seq(5L), Seq(4L)), s"got $out")
  }

  test("streaming persisted-index probe agrees with the batch d16 probe verdict") {
    implicit val sqlCtx = spark.sqlContext
    // "yesterday": the sf0.001 base corpus (doc_id % 5 != 0) indexed once
    val d = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("smhidx").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    graft.operators.Dedup.writeMinhashIndex(
      docs.filter(expr("doc_id % 5 != 0")), dir)
    // "today": a small delta streamed in one batch
    val delta = docs.filter(expr("doc_id % 5 = 0 AND doc_id < 150"))
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // batch expectation from the registered probe over the same delta
    val batchDup = graft.operators.Dedup.probeMinhashIndex(spark, dir,
        docs.filter(expr("doc_id % 5 = 0 AND doc_id < 150")))
      .filter(col("is_dup") === 1).collect().map(_.getLong(0)).toSet
    assert(batchDup.nonEmpty, "fixture lost its planted cross-batch dups")
    val ckpt = Files.createTempDirectory("smhidx-ckpt").toString
    val adm = scala.collection.mutable.ListBuffer[Long]()
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val q = StreamingNearDedup.indexMatches(src, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        adm.synchronized {
          adm ++= StreamingNearDedup.indexAdmitted(b).collect().map(_.getLong(0))
        }
        ()
      }
      .start()
    mem.addData(delta.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val suppressed = delta.map(_._1).toSet -- adm.toSet
    assert(suppressed == batchDup,
      s"streaming suppressed $suppressed, batch says $batchDup")
  }

  test("signature and band keys reproduce the batch d04 family") {
    // the per-row HOF signature must equal the batch explode+aggregate
    // signature, or streaming and batch dedup would disagree
    val docs = Seq((1L, A), (2L, B)).toDF("doc_id", "text")
    val perRow = docs.select(col("doc_id"),
        StreamingNearDedup.signature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = graft.operators.Dedup.minhashSignatures(docs)
      .collect().map { r =>
        r.getLong(0) -> (0 until graft.operators.Dedup.SIG_N).map(i => r.getLong(i + 1))
      }.toMap
    assert(perRow == batch)
  }
}
