package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed change-event surface (SURVEY §1.4's `Dataset[ChangeEvent]`
  * option): the flattened CDC stream as a case-class Dataset, for callers
  * who want compile-time field safety over the dynamic row-image maps.
  * The encoder is resolved once; the underlying plan is identical to
  * `CdcPipeline.changes` (same pushdown, same codegen), so the typed view
  * costs nothing at runtime until a lambda forces deserialization.
  */
final case class ChangeEvent(
    db: String,
    tbl: String,
    op: String,
    id: Option[Long],
    after: Option[Map[String, String]],
    file: String,
    pos: Long,
    row: Long)

object TypedChanges {

  def changes(spark: SparkSession,
      path: String = CdcPipeline.eventsPath): Dataset[ChangeEvent] = {
    import spark.implicits._
    CdcPipeline.changes(spark, path)
      .select(col("db"), col("tbl"), col("op"), col("id"),
        col("after"), col("file"), col("pos"), col("row").cast("long").as("row"))
      .as[ChangeEvent]
  }

  /** Typed latest-state: the same binlog-rank materialization expressed
    * over the Dataset (groupByKey + reduceGroups keeps the comparison in
    * the typed world; ties on (file, pos, row) cannot occur for distinct
    * events of one key).
    */
  def latestStateTyped(spark: SparkSession,
      path: String = CdcPipeline.eventsPath): Dataset[ChangeEvent] = {
    import spark.implicits._
    changes(spark, path)
      .filter((e: ChangeEvent) => e.id.isDefined)
      .groupByKey((e: ChangeEvent) => (e.db, e.tbl, e.id.get))
      .reduceGroups { (a: ChangeEvent, b: ChangeEvent) =>
        val winA = (a.file, a.pos, a.row)
        val winB = (b.file, b.pos, b.row)
        if (implicitly[Ordering[(String, Long, Long)]].gteq(winA, winB)) a else b
      }
      .map(_._2)
      .filter((e: ChangeEvent) => e.op != "D")
  }
}
