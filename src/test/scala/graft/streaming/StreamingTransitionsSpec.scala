package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Extras

/** Streaming transition-matrix maintenance: stitched stream ≡ batch q73
  * on ordered splits, batch-split invariance, replay idempotence,
  * compaction invariance, and the order-violation audit firing on an
  * out-of-order split.
  */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")

  // per-user ordered split: user 10 and 20 both advance batch to batch;
  // u10's A->C and u20's B->A transitions exist ONLY across boundaries
  private val b1 = Seq(
    (1L, ts(0), 10L, "A"), (2L, ts(1), 10L, "B"), (4L, ts(2), 20L, "A"))
  private val b2 = Seq(
    (5L, ts(3), 10L, "C"), (7L, ts(4), 20L, "B"))
  private val b3 = Seq(
    (9L, ts(5), 10L, "A"), (11L, ts(6), 20L, "A"))
  private val all = b1 ++ b2 ++ b3

  private def df(rows: Seq[(Long, Timestamp, Long, String)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  private def collected(x: DataFrame): Seq[Seq[Any]] =
    x.collect().toSeq.map(_.toSeq)

  private def freshLog(): String =
    Files.createTempDirectory("stx").toString + "/log"

  test("streamed stitched matrix ≡ batch q73 on an ordered split") {
    val path = freshLog()
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingTransitions.absorb(b, id, path))
      .start()
    Seq(b1, b2, b3).foreach { rows =>
      mem.addData(rows: _*); q.processAllAvailable()
    }
    q.stop()
    assert(collected(StreamingTransitions.transitions(spark, path)) ==
      collected(Extras.markovTransitionsOf(df(all))),
      "stitched stream must equal the batch operator row-for-row")
    val v = StreamingTransitions.orderViolations(spark, path).collect()
    assert(v.head.getLong(0) == 0L, "ordered split has zero violations")
  }

  test("any ordered split folds identically (1 vs 3 batches)") {
    val one = freshLog()
    StreamingTransitions.absorb(df(all), 0L, one)
    val three = freshLog()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (rows, i) =>
      StreamingTransitions.absorb(df(rows), i.toLong, three)
    }
    assert(collected(StreamingTransitions.transitions(spark, one)) ==
      collected(StreamingTransitions.transitions(spark, three)))
  }

  test("replayed batch is idempotent; compaction changes nothing") {
    val path = freshLog()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (rows, i) =>
      StreamingTransitions.absorb(df(rows), i.toLong, path)
    }
    val once = collected(StreamingTransitions.transitions(spark, path))
    StreamingTransitions.absorb(df(b2), 1L, path) // crash-replay
    assert(collected(StreamingTransitions.transitions(spark, path)) == once)
    StreamingTransitions.compact(spark, path)
    assert(collected(StreamingTransitions.transitions(spark, path)) == once)
    Seq("trans", "bounds").foreach { sub =>
      assert(SketchLog.partitions(s"$path/$sub") == Seq("batch_id=-1"),
        s"$sub folded to the sentinel partition")
    }
    // boundary stitching survives compaction: violations still computable
    assert(StreamingTransitions.orderViolations(spark, path)
      .collect().head.getLong(0) == 0L)
  }

  test("disjoint batches REORDERED in arrival are repaired by the stitch") {
    val path = freshLog()
    // batch 0 carries user 10's LATER window, batch 1 the earlier one;
    // the windows are disjoint, so sorting bounds by first event
    // reconstructs the true sequence — exact matrix, zero violations
    StreamingTransitions.absorb(df(Seq(
      (2L, ts(1), 10L, "B"), (5L, ts(3), 10L, "C"))), 0L, path)
    StreamingTransitions.absorb(df(Seq(
      (1L, ts(0), 10L, "A"))), 1L, path)
    assert(StreamingTransitions.orderViolations(spark, path)
      .collect().head.getLong(0) == 0L)
    assert(collected(StreamingTransitions.transitions(spark, path)) ==
      collected(Extras.markovTransitionsOf(df(Seq(
        (1L, ts(0), 10L, "A"), (2L, ts(1), 10L, "B"), (5L, ts(3), 10L, "C"))))))
  }

  test("INTERLEAVED batch windows fire the order-violation audit") {
    val path = freshLog()
    // batch 1's only event falls INSIDE batch 0's window: batch 0's
    // within-rollup already paired A(t0)->C(t3) so no stitch can repair
    // it — the audit must flag the matrix as untrustworthy
    StreamingTransitions.absorb(df(Seq(
      (1L, ts(0), 10L, "A"), (5L, ts(3), 10L, "C"))), 0L, path)
    StreamingTransitions.absorb(df(Seq(
      (2L, ts(1), 10L, "B"))), 1L, path)
    val v = StreamingTransitions.orderViolations(spark, path).collect()
    assert(v.head.getLong(0) >= 1L, "interleaved boundaries must be flagged")
  }

  test("single-event-per-user batches: bounds land, stitch still exact") {
    val path = freshLog()
    // every batch has exactly one event per user — no within-batch
    // transitions ever land; the matrix is PURE stitching
    val s1 = Seq((1L, ts(0), 10L, "A"))
    val s2 = Seq((2L, ts(1), 10L, "B"))
    val s3 = Seq((3L, ts(2), 10L, "A"))
    Seq(s1, s2, s3).zipWithIndex.foreach { case (rows, i) =>
      StreamingTransitions.absorb(df(rows), i.toLong, path)
    }
    assert(collected(StreamingTransitions.transitions(spark, path)) ==
      collected(Extras.markovTransitionsOf(df(s1 ++ s2 ++ s3))))
  }
}
