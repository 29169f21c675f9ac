package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Extras

/** q75's online face (round-13 directive #3): streamed ≡ batch
  * sessionTransitionsOf on splits that cut a session MID-STREAM, a
  * session break landing exactly ON a batch boundary, a gap at exactly
  * the 12-hour threshold (the q29 half-open boundary), replay
  * idempotence, and compaction invariance. The load-bearing pinned
  * fact: no per-user session state is needed — a consecutive pair is
  * same-session iff its own gap is under the threshold, so the q73
  * boundary-row log plus that one predicate reconstructs q75 exactly.
  */
class StreamingSessionTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L / 1000L // 1h in ms for Timestamp math
  private def at(hours: Double): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      (hours * 3600 * 1000).toLong)

  // u10: A,B in batch1; C in batch2 CONTINUES the session (2h gap);
  //      then D in batch3 after a 20h gap = NEW session (A,B,C | D);
  //      then E 1h later: D->E counts.
  // u20: A in batch1; B in batch2 at EXACTLY +12h = the half-open
  //      boundary: session breaks, A->B must NOT count;
  //      C 1h after B: B->C counts.
  private val b1 = Seq(
    (1L, at(0.0), 10L, "A"), (2L, at(1.0), 10L, "B"), (3L, at(0.5), 20L, "A"))
  private val b2 = Seq(
    (4L, at(3.0), 10L, "C"), (5L, at(12.5), 20L, "B"))
  private val b3 = Seq(
    (6L, at(23.0), 10L, "D"), (7L, at(24.0), 10L, "E"), (8L, at(13.5), 20L, "C"))
  private val all = b1 ++ b2 ++ b3

  private def df(rows: Seq[(Long, Timestamp, Long, String)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  private def collected(x: DataFrame): Seq[Seq[Any]] =
    x.collect().toSeq.map(_.toSeq)

  private def freshLog(): String =
    Files.createTempDirectory("sstx").toString + "/log"

  test("the planted corpus exercises every boundary case (self-check)") {
    val m = Extras.sessionTransitionsOf(df(all)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // within-session only: A->B, B->C (u10 s1), D->E (u10 s2), B->C (u20 s2)
    assert(m == Set(("A", "B"), ("B", "C"), ("D", "E")))
    // and the q73 matrix WOULD count the cross-session pairs — proving
    // the session predicate does real work on this corpus
    val q73 = Extras.markovTransitionsOf(df(all)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(q73.contains(("C", "D")) && q73.contains(("A", "B")))
  }

  test("streamed session matrix ≡ batch q75 across session-cutting splits") {
    val path = freshLog()
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingSessionTransitions.absorb(b, id, path))
      .start()
    Seq(b1, b2, b3).foreach { rows =>
      mem.addData(rows: _*); q.processAllAvailable()
    }
    q.stop()
    assert(collected(StreamingSessionTransitions.transitions(spark, path)) ==
      collected(Extras.sessionTransitionsOf(df(all))),
      "streamed within-session matrix must equal batch q75 row-for-row")
    assert(StreamingSessionTransitions.orderViolations(spark, path)
      .collect().head.getLong(0) == 0L)
  }

  test("any ordered split folds identically (1 vs 3 batches)") {
    val one = freshLog()
    StreamingSessionTransitions.absorb(df(all), 0L, one)
    val three = freshLog()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (rows, i) =>
      StreamingSessionTransitions.absorb(df(rows), i.toLong, three)
    }
    assert(collected(StreamingSessionTransitions.transitions(spark, one)) ==
      collected(StreamingSessionTransitions.transitions(spark, three)))
  }

  test("replayed batch is idempotent; compaction changes nothing") {
    val path = freshLog()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (rows, i) =>
      StreamingSessionTransitions.absorb(df(rows), i.toLong, path)
    }
    val once = collected(StreamingSessionTransitions.transitions(spark, path))
    StreamingSessionTransitions.absorb(df(b2), 1L, path) // crash-replay
    assert(collected(
      StreamingSessionTransitions.transitions(spark, path)) == once)
    StreamingSessionTransitions.compact(spark, path)
    assert(collected(
      StreamingSessionTransitions.transitions(spark, path)) == once)
  }

  test("a read before any batch lands is an empty matrix, not an error") {
    val path = freshLog()
    assert(collected(StreamingSessionTransitions.transitions(spark, path))
      .isEmpty)
    assert(StreamingSessionTransitions.orderViolations(spark, path)
      .collect().head.getLong(0) == 0L)
  }
}
