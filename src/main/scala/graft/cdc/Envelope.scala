package graft.cdc

import org.apache.spark.sql.types._

/** Debezium CDC envelope schemas, mirroring the reference's structs:
  * `data.Response` (/root/reference/data/model.go:4-53) for row-change
  * events and `scheme.Response` (/root/reference/scheme/model.go:4-29) for
  * schema-change (DDL) events.
  *
  * Row images (`before`/`after`) are `map<string,string>`: the payload's
  * column types are carried by the per-event `schema` tree, not by JSON
  * types, so a string-preserving map + explicit decoder casts (Decoders)
  * is the faithful Spark shape — and unlike the reference's per-message
  * linear field scan (data/model.go:56-73), the decode is a typed,
  * codegen'd projection.
  */
object Envelope {

  /** `payload.source` — binlog provenance (data/model.go:19-32).
    * (file, pos, row) is the total order of the stream.
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("server_id", LongType),
    StructField("gtid", StringType),
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("row", IntegerType),
    StructField("thread", LongType),
    StructField("query", StringType)))

  /** DML change-event envelope (payload side; the self-describing `schema`
    * tree is not needed once per-table schemas are registered).
    */
  val dmlPayloadSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  val dmlEnvelopeSchema: StructType = StructType(Seq(
    StructField("payload", dmlPayloadSchema)))

  /** Schema-change (DDL) envelope (scheme/model.go:4-29). */
  val ddlPayloadSchema: StructType = StructType(Seq(
    StructField("source", sourceSchema),
    StructField("databaseName", StringType),
    StructField("ddl", StringType)))

  val ddlEnvelopeSchema: StructType = StructType(Seq(
    StructField("ddl_id", LongType), // fixture bookkeeping, not in the wire format
    StructField("payload", ddlPayloadSchema)))
}
