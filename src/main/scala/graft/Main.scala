package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CdcSources, ConnectClient}
import graft.streaming.{CdcStreaming, Consumer}

/** Production entry point — the reference daemon's `main` (main.go:24-61):
  * env config → Kafka CDC source → the configured consumer pipeline
  * (DML upsert branch or ACTIVE_SCHEME DDL branch), running until
  * terminated. Requires the spark-sql-kafka connector on the classpath
  * (not present in the local test image — the assembly itself is covered
  * by ConsumerSpec through an injected MemoryStream source).
  *
  * Usage: spark-submit --class graft.Main <jar>, configured via the
  * reference's env vars (KAFKA, SERVER, DBNAME, TABLE, GROUP, ...).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(sys.env)
    val spark = SparkSession.builder()
      .appName("graft-cdc-consumer")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val base = args.headOption.getOrElse("/tmp/graft")
    val paths = CdcStreaming.SinkPaths(
      s"$base/state", s"$base/errors", s"$base/retry", s"$base/dlq")
    val source = CdcSources.loadKafka(spark, cfg.kafkaAddress, cfg.server,
        cfg.db, cfg.tables, cfg.activeScheme, cfg.autoOffset)
      .select(col("value").cast("string").as("value"),
        // the reference's `loop` retry counter rides a Kafka header
        // (main.go:174-203); absent header ⇒ first delivery
        coalesce(expr("filter(headers, h -> h.key = 'loop')[0].value")
          .cast("string").cast("int"), lit(0)).as("loop"))
    val client = new ConnectClient(cfg.apiAddress, cfg.connectorName)
    val query = Consumer.start(spark, cfg, source, paths,
      checkpoint = s"$base/checkpoint",
      client = client, appliedPath = s"$base/applied_ddl")
    query.awaitTermination()
  }
}
