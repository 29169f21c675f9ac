package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming ANN serving against the persisted IVF-PQ index: micro-batch
  * rankings must reproduce the batch probe row-for-row, statelessly
  * (queries arriving in different batches can't see each other).
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming IVF-PQ probe reproduces the batch persisted-index ranking across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sann-idx").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    Similarity.writeIvfPqIndex(v.filter(col("vec_id") >= 5), dir)
    val expect = Similarity.probeIvfPqIndex(spark, dir, queries)
    val expectRows = expect.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    graft.operators.Dedup.release(expect)
    assert(expectRows.nonEmpty, "batch probe returned nothing — fixture broken")

    val qRows = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val got = scala.collection.mutable.ListBuffer[(Long, Int, Long, Long)]()
    val mem = MemoryStream[(Long, Array[Long])]
    val q = StreamingAnn.indexScores(mem.toDF().toDF("query_id", "qv"), dir)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("sann-ckpt").toString)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= StreamingAnn.ranked(b).collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()
    // two micro-batches: per-query results may not depend on batch mates
    val (b1, b2) = qRows.partition(_._1 < 3)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.sortBy(t => (t._1, t._2)).toSeq == expectRows.sortBy(t => (t._1, t._2)),
      s"streaming ranking diverged:\n got ${got.take(8)}\n exp ${expectRows.take(8)}")
  }

  test("index append is picked up by an offsets-only restart (the ANN refresh story)") {
    // same discipline as the dedup index probes: path-pinned parquet +
    // zero state means a refresh is stop -> appendToIvfPqIndex -> restart
    // from the SAME checkpoint; re-running a query after the restart must
    // rank against the appended vectors, with no offsets re-processed.
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sann-ref-idx").toString
    val ckpt = Files.createTempDirectory("sann-ref-ckpt").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val corpus = v.filter(col("vec_id") >= 5)
    val (day2, day1) = (corpus.filter(col("vec_id") % 7 === 0),
      corpus.filter(col("vec_id") % 7 =!= 0))
    Similarity.writeIvfPqIndex(day1, dir)
    val qRows = queries.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val batches = scala.collection.mutable.ListBuffer[Seq[(Long, Int, Long, Long)]]()
    val mem = MemoryStream[(Long, Array[Long])]
    def start() = StreamingAnn.indexScores(mem.toDF().toDF("query_id", "qv"), dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized {
          batches += StreamingAnn.ranked(b).collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
        }
        ()
      }
      .start()
    val q1 = start()
    mem.addData(qRows.toSeq: _*)
    q1.processAllAvailable()
    q1.stop()
    val preRefresh = batches.flatten.toSet
    batches.clear()
    Similarity.appendToIvfPqIndex(day2, dir)
    val q2 = start()
    q2.processAllAvailable() // restart replays nothing
    assert(batches.flatten.isEmpty, s"restart re-processed offsets: $batches")
    mem.addData(qRows.toSeq: _*) // same queries again, post-refresh
    q2.processAllAvailable()
    q2.stop()
    val postRefresh = batches.flatten.toSet
    // post-refresh ranking must equal the batch probe over the FULL index
    val expect = Similarity.probeIvfPqIndex(spark, dir, queries)
    val expectRows = expect.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    graft.operators.Dedup.release(expect)
    assert(postRefresh == expectRows)
    // and it genuinely changed: the appended vectors entered some top-10
    assert(postRefresh != preRefresh,
      "append changed nothing — day-2 split never reaches a top-10")
  }
}
