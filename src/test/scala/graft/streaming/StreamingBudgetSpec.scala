package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Token-budget admission: the cap survives micro-batches, in-batch order
  * follows `seq` (not shuffle arrival), unlisted sources are unlimited,
  * and sharding splits a source's budget with bounded overshoot.
  */
class StreamingBudgetSpec extends SparkSpec {
  import spark.implicits._
  import StreamingBudget._

  private def run(budgets: Map[String, Long], shards: Int)(
      batches: Seq[Seq[Doc]]): List[Admission] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("budget-ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Admission]()
    val mem = MemoryStream[Doc]
    val q = admissions(spark, mem.toDS(), budgets, shards)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Admission], _: Long) =>
        emitted.synchronized { emitted ++= b.collect() }
        ()
      }
      .start()
    batches.foreach { docs => mem.addData(docs); q.processAllAvailable() }
    q.stop()
    emitted.synchronized { emitted.toList }
  }

  test("budget is enforced across micro-batches; the crossing doc is admitted, the next is not") {
    // budget 100: batch 1 admits 40+50=90; batch 2's first doc (seq order)
    // crosses at 90<100 -> admitted (overshoot <1 doc), second rejected
    val out = run(Map("web" -> 100L), 1)(Seq(
      Seq(Doc(1, "web", 40, 10), Doc(2, "web", 50, 20)),
      Seq(Doc(4, "web", 30, 40), Doc(3, "web", 30, 30))))
    val byDoc = out.map(a => a.docId -> a.admitted).toMap
    assert(byDoc == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false), s"got $out")
    // in-batch evaluation followed seq: doc 3 (seq 30) was judged before
    // doc 4 (seq 40) even though 4 was enqueued first
    val web = out.filter(_.docId == 3L).head
    assert(web.shardTokens == 120L) // 90 + 30, the admitted overshoot
  }

  test("sources without a budget are unlimited; state stays per-source") {
    val out = run(Map("web" -> 10L), 1)(Seq(
      Seq(Doc(1, "web", 8, 1), Doc(2, "web", 8, 2),
        Doc(3, "books", 1000, 3), Doc(4, "books", 1000, 4))))
    val byDoc = out.map(a => a.docId -> a.admitted).toMap
    assert(byDoc == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true))
    // web's second doc was admitted only because 8 < 10 still held —
    // a third one must be rejected
    val out2 = run(Map("web" -> 10L), 1)(Seq(
      Seq(Doc(1, "web", 8, 1), Doc(2, "web", 8, 2), Doc(3, "web", 8, 3))))
    val adm2 = out2.map(a => a.docId -> a.admitted).toMap
    assert(!adm2(3L))
  }

  test("budget state survives a query restart from its checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("budget-restart-ckpt").toString
    val emitted = scala.collection.mutable.ListBuffer[Admission]()
    val mem = MemoryStream[Doc]
    def startQuery() = admissions(spark, mem.toDS(), Map("web" -> 100L), 1)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Admission], _: Long) =>
        emitted.synchronized { emitted ++= b.collect() }
        ()
      }
      .start()
    val q1 = startQuery()
    mem.addData(Doc(1, "web", 60, 1), Doc(2, "web", 30, 2)) // 90 of 100 spent
    q1.processAllAvailable()
    q1.stop()
    // docs arrive while the query is DOWN; the restarted query must
    // resume the 90-token counter from the state store, not from zero
    mem.addData(Doc(3, "web", 30, 3), Doc(4, "web", 30, 4))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val byDoc = emitted.synchronized { emitted.toList }
      .map(a => a.docId -> a.admitted).toMap
    // 3 crosses at 90 < 100 (admitted, -> 120); 4 must be rejected —
    // a from-zero restart would have admitted it
    assert(byDoc == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false),
      s"got $byDoc")
  }

  test("sharded budgets bound overshoot to one doc per shard and raise state parallelism") {
    // 4 shards x 25 tokens each; docs of 10 tokens land on shard docId%4
    val docs = (0L until 40L).map(i => Doc(i, "web", 10, i))
    val out = run(Map("web" -> 100L), 4)(Seq(docs))
    val admitted = out.filter(_.admitted)
    // each shard admits ceil(25/10)=3 docs (20<25 admits the third) -> 12
    assert(admitted.size == 12, s"admitted ${admitted.size}")
    assert(admitted.groupBy(_.shard).forall(_._2.size == 3))
    // total admitted tokens within one-doc-per-shard of the global budget
    val tot = admitted.map(_ => 10L).sum
    assert(tot >= 100L && tot <= 100L + 4 * 10L)
  }
}
