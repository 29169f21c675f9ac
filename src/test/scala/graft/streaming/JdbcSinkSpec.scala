package graft.streaming

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcPipeline

/** S3 against a REAL JDBC target (embedded Derby, on the Spark classpath):
  * the fixture's change stream applied as op-specific DML must reproduce
  * exactly the latest-state the window-rank materialization computes, and
  * redelivering the whole stream must be a no-op (F8 duplicate absorption
  * + idempotent upsert).
  */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def fetchAll(table: String): Set[(Long, String, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT id, name, amount FROM $table ORDER BY id")
      val out = scala.collection.mutable.Set[(Long, String, Long)]()
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2), rs.getLong(3)))
      out.toSet
    } finally conn.close()
  }

  test("derby sink reproduces the latest-state materialization; redelivery is a no-op") {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE acct")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE acct (id BIGINT PRIMARY KEY, name VARCHAR(64), amount BIGINT)")
    } finally conn.close()

    val raw = spark.read.text(CdcPipeline.eventsPath)
      .select(col("value"), lit(0).as("loop"))
    val (valid, _) = CdcStreaming.parseBatch(raw)
    val acct = valid.filter(col("db") === "shop" && col("tbl") === "acct")

    JdbcSink.applyChanges(acct, url, "acct")
    val expected = CdcPipeline.latestState(spark)
      .filter(col("db") === "shop" && col("tbl") === "acct")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("name")),
        r.getLong(r.fieldIndex("amount"))))
      .toSet
    assert(fetchAll("acct") == expected)

    // full redelivery: duplicate inserts skipped, updates idempotent
    JdbcSink.applyChanges(acct, url, "acct")
    assert(fetchAll("acct") == expected)
  }
}
