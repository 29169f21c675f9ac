package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The typed Dataset surface must agree with the untyped window-rank
  * materialization on the same fixture.
  */
class TypedChangesSpec extends SparkSpec {

  test("typed latest-state equals the DataFrame window-rank form") {
    val typed = TypedChanges.latestStateTyped(spark)
      .toDF()
      .select(col("db"), col("tbl"), col("id"),
        element_at(col("after"), "name").as("name"),
        element_at(col("after"), "amount").cast("long").as("amount"))
    val untyped = CdcPipeline.latestState(spark)
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }

  test("typed filter/map compile against the case class") {
    import spark.implicits._
    val inserts = TypedChanges.changes(spark)
      .filter((e: ChangeEvent) => e.op == "I")
      .map((e: ChangeEvent) => e.tbl)
      .distinct().collect().sorted
    assert(inserts.nonEmpty)
  }
}
