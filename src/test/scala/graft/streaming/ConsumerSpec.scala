package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{GraftConfig, SparkSpec}

/** The config-driven daemon assembly: topic resolution, branch selection,
  * and the REPUBLISH gate.
  */
class ConsumerSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(extra: (String, String)*): GraftConfig =
    GraftConfig.fromEnv(Map(
      "SERVER" -> "srv", "DBNAME" -> "shop", "TABLE" -> "acct,txn") ++ extra)

  test("topic resolution follows main.go:50-58") {
    assert(Consumer.topics(cfg()) == Seq("srv.shop.acct", "srv.shop.txn"))
    assert(Consumer.topics(cfg("ACTIVE_SCHEME" -> "true")) == Seq("srv"))
  }

  test("REPUBLISH=false error-logs failures but never retries or DLQs") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("consumer").toString
    val paths = CdcStreaming.SinkPaths(
      s"$base/state", s"$base/errors", s"$base/retry", s"$base/dlq")
    val mem = MemoryStream[(String, Int)]
    val q = Consumer.start(spark, cfg("REPUBLISH" -> "false"),
      mem.toDF().toDF("value", "loop"), paths,
      checkpoint = Files.createTempDirectory("ckpt").toString)
    mem.addData(("not json at all", 0))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(paths.errors).count() == 1)
    assert(!Files.exists(java.nio.file.Paths.get(paths.retry)))
    assert(!Files.exists(java.nio.file.Paths.get(paths.dlq)))
  }

  test("default config republishes: the retry sink receives loop+1") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("consumer2").toString
    val paths = CdcStreaming.SinkPaths(
      s"$base/state", s"$base/errors", s"$base/retry", s"$base/dlq")
    val mem = MemoryStream[(String, Int)]
    val q = Consumer.start(spark, cfg(), mem.toDF().toDF("value", "loop"), paths,
      checkpoint = Files.createTempDirectory("ckpt").toString)
    mem.addData(("still not json", 0))
    q.processAllAvailable()
    q.stop()
    val retry = spark.read.parquet(paths.retry).as[(String, Int)].collect()
    assert(retry.toSeq == Seq(("still not json", 1)))
  }
}
