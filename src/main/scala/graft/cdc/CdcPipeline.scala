package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's CDC hot path (main.go:348-377) re-expressed as
  * declarative Spark transforms:
  *
  *   parse (P1)      — from_json with the envelope StructType
  *   classify (P5)   — op from before/after NULLNESS, not the `op` field
  *                     (main.go:365-377 parses but ignores `op`; snapshot
  *                     reads arrive as before=null ⇒ treated as inserts)
  *   order (ST3)     — binlog (file, pos, row) total order, not arrival
  *   dedup (F8)      — duplicate redelivery collapses in the rank window
  *   latest state    — rank=1 per (db, table, pk) minus deletes: what the
  *                     reference's MySQL sink would contain
  *
  * Scale: latest-state is ONE shuffle on (db, table, pk); at 100 TB the
  * fact stream partitions by pk hash, the window is per-key (small), and
  * AQE handles hot-key skew. No per-event round-trips (the reference does
  * 1 event : 1 SQL statement, main.go:63-169).
  */
object CdcPipeline {

  /** Default fixture path (FIXTURES.md A1-shaped synthetic events). */
  val eventsPath = "/root/repo/fixtures/cdc_events.jsonl"
  val ddlPath = "/root/repo/fixtures/cdc_ddl.jsonl"

  /** Raw JSON lines → typed envelope columns. */
  def parseDml(s: SparkSession, path: String = eventsPath): DataFrame =
    s.read.schema(Envelope.dmlEnvelopeSchema).json(path)

  def parseDdl(s: SparkSession, path: String = ddlPath): DataFrame =
    s.read.schema(Envelope.ddlEnvelopeSchema).json(path)

  /** P5: op from nullness — I / U / D (main.go:365-377). */
  val opCol: Column = {
    val before = col("payload.before")
    val after = col("payload.after")
    when(before.isNull && after.isNotNull, "I")
      .when(before.isNotNull && after.isNotNull, "U")
      .when(before.isNotNull && after.isNull, "D")
      .otherwise("X")
  }

  /** Flattened change-event view with classification and pk. */
  def changes(s: SparkSession, path: String = eventsPath): DataFrame =
    parseDml(s, path).select(
      col("payload.source.db").as("db"),
      col("payload.source.table").as("tbl"),
      opCol.as("op"),
      element_at(coalesce(col("payload.after"), col("payload.before")), "id")
        .cast("long").as("id"),
      col("payload.after").as("after"),
      col("payload.source.file").as("file"),
      col("payload.source.pos").as("pos"),
      col("payload.source.row").as("row"),
      passthroughQuery(col("payload.source.query")).as("query"))

  /** P4: carry the captured original statement verbatim when its length
    * exceeds 5 (main.go:357-359); null otherwise. The JDBC sink applies it
    * directly instead of re-synthesizing.
    */
  def passthroughQuery(q: Column): Column =
    when(length(q) > 5, q).otherwise(lit(null).cast("string"))

  /** ST3 + F8: latest surviving row per (db, tbl, id) in binlog order;
    * duplicates (same file/pos/row redelivered) collapse via rank ties →
    * row_number with full deterministic ordering.
    */
  def latestState(s: SparkSession, path: String = eventsPath): DataFrame = {
    val w = Window.partitionBy(col("db"), col("tbl"), col("id"))
      .orderBy(col("file").desc, col("pos").desc, col("row").desc)
    changes(s, path)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("db"), col("tbl"), col("id"),
        element_at(col("after"), "name").as("name"),
        element_at(col("after"), "amount").cast("long").as("amount"))
      .orderBy("db", "tbl", "id")
  }

  /** Per-table op counts (classification check). */
  def opCounts(s: SparkSession, path: String = eventsPath): DataFrame =
    changes(s, path)
      .groupBy(col("tbl"), col("op"))
      .agg(count(lit(1)).as("n"))
      .orderBy("tbl", "op")

  // --------------------------------------------------------------- DDL path
  /** F6 `IsBlock` (utils/clean.go:113-140): case-sensitive substring
    * block-list; DROP TABLE blocked unless reclaim.
    */
  def isBlockedDdl(ddl: Column, reclaim: Boolean): Column = {
    val base = ddl.contains("CREATE DATABASE") || ddl.contains("USE") ||
      ddl.contains("DROP DATABASE")
    if (reclaim) base else base || ddl.contains("DROP TABLE")
  }

  /** Full DDL decision pipeline (main.go:390-415): instance filter (F5),
    * whitelist (F4), empty guard (F7), block-list (F6). Emits one decision
    * per event — the streaming layer acts on 'apply' rows only.
    */
  def ddlDecisions(s: SparkSession, tables: Seq[String], reclaim: Boolean,
      replaceAll: Boolean, path: String = ddlPath): DataFrame = {
    val whitelist = if (replaceAll) lit(true)
      else col("payload.source.table").isin(tables: _*)
    parseDdl(s, path).select(
      col("ddl_id"),
      col("payload.databaseName").as("db"),
      col("payload.ddl").as("ddl"),
      when(col("payload.databaseName").isNull || length(col("payload.databaseName")) === 0, "skip_instance")
        .when(!whitelist, "skip_whitelist")
        .when(col("payload.ddl").isNull || length(col("payload.ddl")) === 0, "error_empty")
        .when(isBlockedDdl(col("payload.ddl"), reclaim), "blocked")
        .otherwise("apply").as("decision"))
      .orderBy("ddl_id")
  }

  /** P7: strip the backtick-quoted db qualifier before sink exec
    * (main.go:87).
    */
  def stripDbQualifier(ddl: Column, db: Column): Column =
    regexp_replace(ddl, concat(lit("`"), db, lit("`\\.")), lit(""))
}
