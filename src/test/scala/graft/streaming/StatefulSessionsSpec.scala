package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulSessions.{Event, UserUpdate}

/** Custom keyed state across micro-batches: counts and totals accumulate
  * per user, state survives between batches, untouched users emit nothing.
  */
class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StatefulSessions.updates(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("state_sink").start()

    mem.addData(Event(1, 10, 1.5), Event(1, 11, 2.5), Event(2, 12, 10.0))
    q.processAllAvailable()
    mem.addData(Event(1, 13, 4.0)) // user 2 untouched this batch
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("state_sink").as[UserUpdate].collect().toSeq
      .sortBy(u => (u.userId, u.nEvents))
    assert(rows == Seq(
      UserUpdate(1, 2, 4.0, 11),   // batch 1: two events
      UserUpdate(1, 3, 8.0, 13),   // batch 2: state carried forward
      UserUpdate(2, 1, 10.0, 12))) // batch 1 only; no row for batch 2
  }
}
