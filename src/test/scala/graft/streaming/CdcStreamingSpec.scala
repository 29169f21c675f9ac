package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic streaming tests (MemoryStream + processAllAvailable):
  * ST1 idempotent upsert, F8 duplicate absorption, ST3 binlog ordering
  * across micro-batches, ST2 bounded retry → DLQ.
  */
class CdcStreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, name: String, amount: Long, file: String, pos: Long,
      row: Int = 0, op: String = "I"): String = {
    val before =
      if (op == "I") "null"
      else s"""{"id":$id,"name":"old","amount":0}"""
    val after =
      if (op == "D") "null"
      else s"""{"id":$id,"name":"$name","amount":$amount}"""
    s"""{"payload":{"before":$before,"after":$after,
       |"source":{"version":"1","connector":"mysql","name":"s","ts_ms":0,
       |"snapshot":"false","db":"shop","table":"acct","server_id":1,
       |"file":"$file","pos":$pos,"row":$row},"op":"c","ts_ms":0}}""".stripMargin
      .replaceAll("\n", "")
  }

  private def tmpPaths(): CdcStreaming.SinkPaths = {
    val base = Files.createTempDirectory("cdcstream").toString
    CdcStreaming.SinkPaths(s"$base/state", s"$base/errors", s"$base/retry", s"$base/dlq")
  }

  test("upsert stream: latest state across micro-batches, duplicates absorbed, deletes win") {
    val paths = tmpPaths()
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val source = mem.toDF().toDF("value", "loop")
    val q = CdcStreaming.start(spark, source, paths, republishLimit = 3, checkpoint = ckpt)

    // batch 1: two inserts
    mem.addData((ev(1, "alice", 100, "b1", 10), 0), (ev(2, "bob", 200, "b1", 20), 0))
    q.processAllAvailable()
    // batch 2: update id1, delete id2, duplicate redelivery of the id1 insert
    mem.addData(
      (ev(1, "alice2", 150, "b1", 30, op = "U"), 0),
      (ev(2, "bob", 200, "b1", 40, op = "D"), 0),
      (ev(1, "alice", 100, "b1", 10), 0), // exact duplicate of batch-1 insert
      ("", 0))                            // tombstone, dropped (F2)
    q.processAllAvailable()
    // batch 3: LATE arrival of an OLDER update for id2 — must not resurrect
    mem.addData((ev(2, "bob_old", 199, "b1", 35, op = "U"), 0))
    q.processAllAvailable()
    q.stop()

    val state = CdcStreaming.currentState(spark, paths.state)
      .select("id", "name", "amount").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(state == Map(1L -> ("alice2", 150L)))
  }

  test("replaying the same events is a no-op (effective exactly-once)") {
    val paths = tmpPaths()
    val ckpt1 = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val events = Seq((ev(1, "a", 1, "b1", 10), 0), (ev(1, "a2", 2, "b1", 20, op = "U"), 0))

    val mem1 = MemoryStream[(String, Int)]
    val q1 = CdcStreaming.start(spark, mem1.toDF().toDF("value", "loop"), paths,
      republishLimit = 3, checkpoint = ckpt1)
    mem1.addData(events: _*)
    q1.processAllAvailable(); q1.stop()
    val first = CdcStreaming.currentState(spark, paths.state).collect().toSeq.sortBy(_.getLong(2))

    // full redelivery into the same state sink (fresh checkpoint = worst case)
    val ckpt2 = Files.createTempDirectory("ckpt").toString
    val mem2 = MemoryStream[(String, Int)]
    val q2 = CdcStreaming.start(spark, mem2.toDF().toDF("value", "loop"), paths,
      republishLimit = 3, checkpoint = ckpt2)
    mem2.addData(events: _*)
    q2.processAllAvailable(); q2.stop()
    val second = CdcStreaming.currentState(spark, paths.state).collect().toSeq.sortBy(_.getLong(2))
    assert(first == second)
  }

  test("bounded retry: poison record escalates loop count and lands in DLQ at limit 3") {
    val paths = tmpPaths()
    implicit val sqlCtx = spark.sqlContext
    val poison = """{"not":"an envelope"}"""

    var delivery: Seq[(String, Int)] = Seq((poison, 0))
    for (round <- 1 to 3) {
      val ckpt = Files.createTempDirectory("ckpt").toString
      val mem = MemoryStream[(String, Int)]
      val q = CdcStreaming.start(spark, mem.toDF().toDF("value", "loop"), paths,
        republishLimit = 3, checkpoint = ckpt)
      mem.addData(delivery: _*)
      q.processAllAvailable(); q.stop()
      // redeliver from the retry sink, as the reference republishes to Kafka
      delivery =
        if (Files.exists(java.nio.file.Paths.get(paths.retry)))
          spark.read.parquet(paths.retry).as[(String, Int)].collect().toSeq
            .filter(_._2 == round) // only the newest redelivery generation
        else Seq.empty
    }

    val dlq = spark.read.parquet(paths.dlq).as[(String, Int)].collect()
    assert(dlq.toSeq == Seq((poison, 3)))
    val errs = spark.read.parquet(paths.errors)
    assert(errs.count() == 3) // one error-log row per delivery (S4)
    assert(errs.select("error").distinct().collect().head.getString(0) == "unparseable envelope")
  }

  test("streaming JDBC sink: micro-batched DML against Derby, dup absorbed, delete wins") {
    val url = "jdbc:derby:memory:graftstream;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE acct")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE acct (id BIGINT PRIMARY KEY, name VARCHAR(64), amount BIGINT)")
    } finally conn.close()

    val paths = tmpPaths()
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val q = CdcStreaming.startJdbc(spark, mem.toDF().toDF("value", "loop"),
      url, "acct", paths, republishLimit = 3, checkpoint = ckpt)

    mem.addData((ev(1, "alice", 100, "b1", 10), 0), (ev(2, "bob", 200, "b1", 20), 0))
    q.processAllAvailable()
    mem.addData(
      (ev(1, "alice2", 150, "b1", 30, op = "U"), 0),
      (ev(2, "bob", 200, "b1", 40, op = "D"), 0),
      (ev(1, "alice", 100, "b1", 10), 0)) // duplicate insert redelivery (F8)
    q.processAllAvailable()
    q.stop()

    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery("SELECT id, name, amount FROM acct ORDER BY id")
      val rows = scala.collection.mutable.ListBuffer[(Long, String, Long)]()
      while (rs.next()) rows += ((rs.getLong(1), rs.getString(2), rs.getLong(3)))
      assert(rows.toList == List((1L, "alice2", 150L)))
    } finally c2.close()
  }

  test("streaming SCD2 sink: history versions across micro-batches, replay is a no-op") {
    val url = "jdbc:derby:memory:graftscd2;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE hist")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE hist (id BIGINT, ver INT, name VARCHAR(64), amount BIGINT, " +
          "op CHAR(1), src_seq VARCHAR(64), is_current BOOLEAN, PRIMARY KEY (id, src_seq))")
    } finally conn.close()

    def dump(): List[(Long, Int, String, String, Boolean)] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT id, ver, name, op, is_current FROM hist ORDER BY id, ver")
        val rows = scala.collection.mutable.ListBuffer[(Long, Int, String, String, Boolean)]()
        while (rs.next())
          rows += ((rs.getLong(1), rs.getInt(2), rs.getString(3),
            rs.getString(4).trim, rs.getBoolean(5)))
        rows.toList
      } finally c.close()
    }

    val paths = tmpPaths()
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val q = CdcStreaming.startJdbcScd2(spark, mem.toDF().toDF("value", "loop"),
      url, cdcTable = "acct", histTable = "hist", paths,
      republishLimit = 3, checkpoint = ckpt)

    mem.addData((ev(1, "alice", 100, "b1", 10), 0), (ev(2, "bob", 200, "b1", 20), 0))
    q.processAllAvailable()
    mem.addData(
      (ev(1, "alice2", 150, "b1", 30, op = "U"), 0),
      (ev(2, "bob", 200, "b1", 40, op = "D"), 0),
      (ev(1, "alice", 100, "b1", 10), 0)) // redelivered insert: (id, src_seq) gate
    q.processAllAvailable()
    q.stop()

    val expected = List(
      (1L, 1, "alice", "I", false),  // closed by the update
      (1L, 2, "alice2", "U", true),  // the open version
      (2L, 1, "bob", "I", false),    // closed by the delete
      (2L, 2, null.asInstanceOf[String], "D", false)) // delete tombstone, nothing open
    assert(dump() == expected)

    // replay BOTH batches wholesale: every (id, src_seq) already present
    val mem2 = MemoryStream[(String, Int)]
    val q2 = CdcStreaming.startJdbcScd2(spark, mem2.toDF().toDF("value", "loop"),
      url, cdcTable = "acct", histTable = "hist", paths, republishLimit = 3,
      checkpoint = Files.createTempDirectory("ckpt2").toString)
    mem2.addData(
      (ev(1, "alice", 100, "b1", 10), 0), (ev(2, "bob", 200, "b1", 20), 0),
      (ev(1, "alice2", 150, "b1", 30, op = "U"), 0),
      (ev(2, "bob", 200, "b1", 40, op = "D"), 0))
    q2.processAllAvailable()
    q2.stop()
    assert(dump() == expected, "full replay must leave the history unchanged")
  }
}
