package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join semantics: in-window attribution across
  * micro-batches, window-bound rejection, and the left-outer null
  * emission once a click's match window expires past the watermark.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  // (attributed (click_id, conv_id) pairs, unmatched click_ids) per batch
  private def run(joinType: String,
      steps: Seq[(Seq[(Long, String, Long)], Seq[(Long, String, Long)])])
      : (Seq[(Long, Long)], Seq[Long]) = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ssj").toString
    val mc = MemoryStream[(Long, String, Long)]
    val mv = MemoryStream[(Long, String, Long)]
    val clicks = mc.toDF().toDF("click_id", "user_id", "csec")
      .withColumn("click_ts", timestamp_seconds(col("csec"))).drop("csec")
    val convs = mv.toDF().toDF("conv_id", "user_id", "vsec")
      .withColumn("conv_ts", timestamp_seconds(col("vsec"))).drop("vsec")
    val matched = scala.collection.mutable.ListBuffer[(Long, Long)]()
    val unmatched = scala.collection.mutable.ListBuffer[Long]()
    val q = StreamingJoins.attributionJoin(clicks, convs, joinType = joinType)
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("click_id", "conv_id").collect()
        matched.synchronized {
          rows.foreach { r =>
            if (r.isNullAt(1)) unmatched += r.getLong(0)
            else matched += ((r.getLong(0), r.getLong(1)))
          }
        }
        ()
      }.start()
    steps.foreach { case (cs, vs) =>
      if (cs.nonEmpty) mc.addData(cs: _*)
      if (vs.nonEmpty) mv.addData(vs: _*)
      q.processAllAvailable()
    }
    q.stop()
    (matched.toSeq.sorted, unmatched.toSeq.sorted)
  }

  test("inner: conversions attribute within the window, not outside it, across batches") {
    val (m, _) = run("inner", Seq(
      // click a@100; conversion a@130 lands inside [100, 160]
      (Seq((1L, "a", 100L)), Seq((10L, "a", 130L))),
      // conversion a@200 is past the window; b@310 attributes to b@300
      (Seq((2L, "b", 300L)), Seq((11L, "a", 200L), (12L, "b", 310L))),
      // conversion BEFORE its click never matches
      (Seq((3L, "c", 500L)), Seq((13L, "c", 490L)))))
    assert(m == Seq((1L, 10L), (2L, 12L)))
  }

  test("left_outer: a never-converted click emits with nulls once its window expires") {
    val (m, u) = run("left_outer", Seq(
      (Seq((1L, "a", 100L), (2L, "b", 100L)), Seq((10L, "a", 130L))),
      // advance BOTH watermarks far past 100+60: click 2's window expired
      (Seq((7L, "z", 1000L)), Seq((77L, "z", 1000L))),
      (Seq((8L, "z", 2000L)), Seq((88L, "z", 2000L)))))
    assert(m.contains((1L, 10L)))
    assert(u.contains(2L), s"expired unmatched click not emitted: matched=$m unmatched=$u")
    // the attributed click must never ALSO emit as unmatched
    assert(!u.contains(1L))
  }

  test("stream-static enrichment: broadcast dim resolves per batch; missing keys keep nulls") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ssd").toString
    val dim = Seq((0L, "AFRICA"), (1L, "AMERICA"), (2L, "ASIA"))
      .toDF("nation_key", "n_name")
    val mem = MemoryStream[(Long, Long)]
    val facts = mem.toDF().toDF("event_id", "nation_key")
    val got = scala.collection.mutable.ListBuffer[(Long, Option[String])]()
    val q = StreamingJoins.dimensionEnrich(facts, dim, "nation_key")
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("event_id", "n_name").collect()
            .map(r => (r.getLong(0), Option(r.getString(1))))
        }
        ()
      }.start()
    mem.addData((100L, 2L), (101L, 7L)) // 7 has no dim row
    q.processAllAvailable()
    mem.addData((102L, 0L))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == Set(
      (100L, Some("ASIA")), (101L, None), (102L, Some("AFRICA"))))
  }
}
