package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StatefulSessions.{Event, UserUpdate}
import graft.streaming.StatefulSessionsV2.{EventT, SessionOut}

/** transformWithState (Spark 4 arbitrary-state API): fMGWS-parity of the
  * running accounting, event-time timer session closes, and the
  * statestore reader inspecting a live checkpoint.
  */
class StatefulSessionsV2Spec extends SparkSpec {

  import spark.implicits._

  // transformWithState stores each state variable in its own column
  // family — only the RocksDB provider supports that (and it is the
  // production provider anyway; HDFSBacked is the toy default)
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }

  override def afterAll(): Unit = {
    try spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    finally super.afterAll()
  }

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("transformWithState update rows equal the legacy fMGWS output on the same batches") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("twsck").toString

    val b1 = Seq(EventT(1, 10, ts(0), 1.5), EventT(1, 11, ts(1), 2.5),
      EventT(2, 12, ts(1), 10.0))
    val b2 = Seq(EventT(1, 13, ts(2), 4.0))

    val mem = MemoryStream[EventT]
    val q = StatefulSessionsV2.sessions(spark,
        mem.toDS().withWatermark("ts", "0 seconds").as[EventT])
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("memory").queryName("tws_sink").start()
    Seq(b1, b2).foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()

    val v2 = spark.table("tws_sink").as[SessionOut].collect().toSeq
      .filter(_.kind == "update")
      .map(o => UserUpdate(o.userId, o.nEvents, o.total, o.lastEventId))
      .sortBy(u => (u.userId, u.nEvents))

    // the legacy processor on the SAME batch split
    val memOld = MemoryStream[Event]
    val qOld = StatefulSessions.updates(spark, memOld.toDS())
      .writeStream.outputMode("append").format("memory").queryName("tws_old").start()
    Seq(b1, b2).foreach { rows =>
      memOld.addData(rows.map(e => Event(e.userId, e.eventId, e.value)): _*)
      qOld.processAllAvailable()
    }
    qOld.stop()
    val v1 = spark.table("tws_old").as[UserUpdate].collect().toSeq
      .sortBy(u => (u.userId, u.nEvents))

    assert(v2 == v1, "the new API must reproduce the legacy accounting exactly")
  }

  test("event-time timer closes a quiet session once the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("twsck").toString
    val mem = MemoryStream[EventT]
    val q = StatefulSessionsV2.sessions(spark,
        mem.toDS().withWatermark("ts", "0 seconds").as[EventT])
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("memory").queryName("tws_close").start()

    // user 1 active at minute 0-1; user 99's much later event drives the
    // watermark past 1's quiet gap (30 min), firing 1's close timer
    mem.addData(EventT(1, 10, ts(0), 1.0), EventT(1, 11, ts(1), 2.0))
    q.processAllAvailable()
    mem.addData(EventT(99, 50, ts(180), 5.0))
    q.processAllAvailable()
    // one more batch so the watermark computed AFTER the 99-batch is
    // applied and expired timers run
    mem.addData(EventT(99, 51, ts(181), 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tws_close").as[SessionOut].collect().toSeq
    val closed = rows.filter(_.kind == "closed")
    assert(closed == Seq(SessionOut(1, "closed", 2, 3.0, 11)),
      s"expected exactly user 1's close, got $rows")
    // after the close the state is cleared: a re-appearing user restarts
    assert(rows.count(r => r.userId == 1 && r.kind == "update") == 1)
  }

  test("the statestore reader exposes the live checkpointed state") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("twsck").toString
    val mem = MemoryStream[EventT]
    val q = StatefulSessionsV2.sessions(spark,
        mem.toDS().withWatermark("ts", "0 seconds").as[EventT])
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("memory").queryName("tws_inspect").start()
    mem.addData(EventT(1, 10, ts(0), 1.5), EventT(2, 12, ts(1), 10.0))
    q.processAllAvailable()
    q.stop()

    // ops-grade observability: read the state variable as a DataFrame
    val state = spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "running")
      .load()
    val byUser = state.select(col("key.value").as("userId"),
        col("value.nEvents").as("n"), col("value.total").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(byUser == Seq((1L, 1L, 1.5), (2L, 1L, 10.0)))
  }
}
