package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

/** ST6 batching: source-side rate limiting caps each micro-batch (the
  * reference has none — 1 event per sink round-trip; Structured Streaming
  * gets it from maxFilesPerTrigger / maxOffsetsPerTrigger).
  */
class BatchingSpec extends SparkSpec {

  test("maxFilesPerTrigger=1 yields one micro-batch per file, in order") {
    val dir = Files.createTempDirectory("batching").toString
    (1 to 3).foreach { i =>
      Files.writeString(java.nio.file.Paths.get(s"$dir/f$i.json"),
        s"""{"v":"file$i"}\n""")
    }
    val schema = StructType(Seq(StructField("v", StringType)))
    val seen = scala.collection.mutable.ListBuffer[(Long, Seq[String])]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(dir)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized {
          seen += ((id, batch.select(col("v")).collect().map(_.getString(0)).toSeq))
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 3, s"expected 3 micro-batches, got $seen")
    assert(seen.forall(_._2.size == 1))
    assert(seen.flatMap(_._2).toSet == Set("file1", "file2", "file3"))
  }

  test("Trigger.AvailableNow drains the backlog in rate-limited batches, then stops itself") {
    // the periodic-catch-up deployment mode: run the consumer as a
    // scheduled job that processes EVERYTHING pending (still respecting
    // maxFilesPerTrigger) and exits — no always-on cluster, exactly the
    // checkpoint/offset semantics of the continuous run
    val dir = Files.createTempDirectory("avnow").toString
    (1 to 4).foreach { i =>
      Files.writeString(java.nio.file.Paths.get(s"$dir/f$i.json"),
        s"""{"v":"file$i"}\n""")
    }
    val schema = StructType(Seq(StructField("v", StringType)))
    val seen = scala.collection.mutable.ListBuffer[Seq[String]]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2)
      .json(dir)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen += batch.select(col("v")).collect().map(_.getString(0)).toSeq
        }
        ()
      }
      .start()
    // self-terminates once the backlog is drained — no stop() needed
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    assert(seen.flatten.toSet == Set("file1", "file2", "file3", "file4"))
    assert(seen.count(_.nonEmpty) == 2, s"rate limit ignored: $seen")
  }
}
