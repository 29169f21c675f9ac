package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** Streaming RAG chunking: streamed chunk set ≡ batch t27 on identical
  * input, and chunk-grain dedup collapses shared boilerplate across docs
  * and micro-batches.
  */
class StreamingChunksSpec extends SparkSpec {
  import spark.implicits._

  private val para = (1 to 64).map(i => s"w$i").mkString(" ") // one window

  private def run(makeOut: DataFrame => DataFrame,
      batches: Seq[Seq[(Long, String)]]): Seq[Seq[Row]] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Seq[Row]]()
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val q = makeOut(src).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        emitted.synchronized {
          emitted += b.select("doc_id", "chunk_idx", "start_tok",
            "chunk_tokens", "chunk_hash").collect().toSeq
        }
        ()
      }
      .start()
    batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    emitted.toSeq.filter(_.nonEmpty)
  }

  test("streamed chunks ≡ batch t27 row-for-row on identical input") {
    val docs = Seq((1L, (1 to 120).map(i => s"a$i").mkString(" ")),
      (2L, "short doc"), (3L, para))
    val streamed = run(StreamingChunks.chunkStream _,
      Seq(docs.take(2), docs.drop(2))).flatten
    val batch = TextOps.ragChunksOf(docs.toDF("doc_id", "text"))
      .collect().toSeq
    def key(r: Row) = (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(streamed.map(key).sorted == batch.map(key).sorted,
      "stream and batch disagree on the chunk set")
  }

  test("chunk-grain dedup: shared boilerplate collapses across docs and batches") {
    // doc 1 and doc 2 are DIFFERENT documents sharing one identical
    // 64-token paragraph; doc 3 replays doc 1's text entirely in a later
    // micro-batch
    val out = run(StreamingChunks.chunkDedupStream _,
      Seq(Seq((1L, para), (2L, para)), Seq((3L, para))))
    // exactly one survivor chunk ever emitted, in the first batch
    assert(out.length == 1 && out.head.length == 1,
      s"boilerplate chunk emitted more than once: $out")
    assert(out.head.head.getLong(0) == 1L || out.head.head.getLong(0) == 2L)
  }
}
