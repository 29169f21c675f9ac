package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Windowed SpaceSaving heavy hitters: summaries emit once when the
  * watermark closes a window; heavy tokens survive eviction with the
  * est/err invariants; the batch topK tail ranks them.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val WINDOW_MS = 10000L
  private val CAPACITY = 8

  // window [0, 10s): 3 heavies among 20 singletons — vocab 23 > capacity 8,
  // so eviction churns; heavies (7..12 > shardN/capacity) must survive
  private def window0: Seq[(String, Long)] = {
    val heavies = Seq.fill(12)("alpha") ++ Seq.fill(9)("beta") ++ Seq.fill(7)("gamma")
    val noise = (1 to 20).map(i => f"tok$i%02d")
    // interleave deterministically across the window's 10 seconds
    (heavies ++ noise).zipWithIndex.map { case (t, i) => (t, 100L + i * 190L) }
  }

  private def run(batches: Seq[Seq[(String, Long)]]): Seq[StreamingTopK.HitRow] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[StreamingTopK.HitRow]()
    val mem = MemoryStream[(String, Long)]
    val src = mem.toDF().toDF("token", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val q = StreamingTopK
      .windowedHeavyHitters(src, "ts", WINDOW_MS, delayMs = 2000L,
        capacity = CAPACITY, shards = 2)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingTopK.HitRow], _: Long) =>
          emitted.synchronized { emitted ++= b.collect() }
          ()
      }
      .start()
    batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    emitted.toSeq
  }

  test("summaries emit once on window close; heavies survive with est/err invariants") {
    val truth = window0.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // batch 2 only advances the watermark (event at 60s -> wm 58s > 10s)
    val out = run(Seq(window0, Seq(("later", 60000L))))
    val w0 = out.filter(_.window_start_ms == 0L)
    assert(w0.nonEmpty, "window 0 never emitted")
    // nothing emitted for the still-open 60s window
    assert(out.forall(_.window_start_ms == 0L))
    // bounded state: each shard kept at most CAPACITY counters
    w0.groupBy(_.shard).values.foreach(s => assert(s.size <= CAPACITY))
    // every counter satisfies est >= true >= est - err
    w0.foreach { h =>
      val t = truth.getOrElse(h.token, 0L)
      assert(h.est_count >= t && t >= h.est_count - h.max_err,
        s"${h.token}: est=${h.est_count} err=${h.max_err} true=$t")
    }
    // the SpaceSaving guarantee: the three heavies survive, exact or over
    Seq("alpha", "beta", "gamma").foreach(t =>
      assert(w0.exists(_.token == t), s"heavy hitter $t evicted"))
    // the batch tail ranks the heavies first
    val top3 = StreamingTopK.topK(spark.createDataFrame(w0), 3)
      .collect().map(_.getString(2)).toSet
    assert(top3 == Set("alpha", "beta", "gamma"), s"top3 = $top3")
  }

  test("summary state survives a query restart; the closed window reflects both runs") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("topk-restart").toString
    val emitted = scala.collection.mutable.ListBuffer[StreamingTopK.HitRow]()
    val mem = MemoryStream[(String, Long)]
    def startQuery() = {
      val src = mem.toDF().toDF("token", "ms")
        .withColumn("ts", timestamp_millis(col("ms")))
      StreamingTopK
        .windowedHeavyHitters(src, "ts", WINDOW_MS, delayMs = 2000L,
          capacity = CAPACITY, shards = 1)
        .writeStream.option("checkpointLocation", ckpt).outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingTopK.HitRow], _: Long) =>
            emitted.synchronized { emitted ++= b.collect() }
            ()
        }.start()
    }
    val q1 = startQuery()
    mem.addData(Seq.fill(5)(("alpha", 100L)): _*)
    q1.processAllAvailable()
    q1.stop()
    // more window-0 tokens arrive while the query is DOWN; the restart
    // must add them to the RESUMED counters, then close the window
    mem.addData(Seq.fill(3)(("alpha", 200L)) :+ (("later", 60000L)): _*)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val alpha = emitted.synchronized { emitted.toList }
      .filter(h => h.window_start_ms == 0L && h.token == "alpha")
    // one emission, with the full cross-restart count — a from-zero
    // restart would report 3
    assert(alpha.map(h => (h.est_count, h.max_err)) == Seq((8L, 0L)),
      s"got $alpha")
  }

  test("a token lands in exactly one shard per window (merge is concatenation)") {
    val out = run(Seq(window0, Seq(("later", 60000L))))
    out.filter(_.window_start_ms == 0L).groupBy(_.token).values
      .foreach(rows => assert(rows.map(_.shard).distinct.size == 1))
  }

  test("a straggler after its window emitted is dropped — no second summary") {
    val out = run(Seq(
      window0,
      Seq(("later", 60000L)),        // closes window 0, emits its summary
      Seq(("alpha", 300L)),          // straggler INTO the emitted window
      Seq(("even-later", 90000L)))) // advances wm again — would re-fire
    val w0 = out.filter(_.window_start_ms == 0L)
    // exactly one emission per (shard, token) for window 0
    assert(w0.groupBy(h => (h.shard, h.token)).values.forall(_.size == 1),
      s"window 0 emitted twice: $w0")
    // and alpha's count is the pre-close count (the straggler is gone)
    assert(w0.find(_.token == "alpha").map(_.est_count).contains(12L))
  }

  test("window-close races: in-batch wm advance, then same-trigger late data + timeout — one summary") {
    val out = run(Seq(
      window0,
      // RACE 1: window-0 data arrives in the SAME batch whose other row
      // advances the watermark past the window end. The data is accepted
      // (batch-start wm is still 7.03s < 9.9s), folded into state, and the
      // timeout re-arms; the window must close ONCE, later, with it.
      Seq(("alpha", 9900L), ("later", 60000L)),
      // RACE 2: a late window-0 row and the due timeout land in one
      // trigger (wm is now 58s): the row is watermark-filtered, so the
      // group times out and emits — the straggler must not resurrect
      // state or trigger a second emission afterwards.
      Seq(("alpha", 300L), ("even-later", 90000L)),
      Seq(("final", 120000L))))
    val w0 = out.filter(_.window_start_ms == 0L)
    assert(w0.nonEmpty, "window 0 never emitted")
    assert(w0.groupBy(h => (h.shard, h.token)).values.forall(_.size == 1),
      s"window 0 emitted a (shard, token) twice: $w0")
    // the race-1 row is included exactly once; the race-2 late row is not
    assert(w0.find(_.token == "alpha").map(_.est_count).contains(13L),
      s"alpha count wrong: ${w0.filter(_.token == "alpha")}")
  }

  test("SpaceSaving add: eviction inherits the minimum and keeps size bounded") {
    var m = Map.empty[String, StreamingTopK.Entry]
    (1 to 8).foreach(i => m = StreamingTopK.add(m, s"t$i", 8))
    assert(m.size == 8 && m.values.forall(e => e.est == 1 && e.err == 0))
    m = StreamingTopK.add(m, "new", 8) // evicts (est=1, token-min) "t1"
    assert(m.size == 8 && !m.contains("t1"))
    assert(m("new") == StreamingTopK.Entry(2L, 1L))
  }
}
