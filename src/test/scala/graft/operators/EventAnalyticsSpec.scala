package graft.operators

import graft.SparkSpec

/** Structural invariants of the q61 funnel and q62 cohort retention
  * (exact values are oracle-checked by the driver; these pin the
  * semantics that make the numbers meaningful).
  */
class EventAnalyticsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q61 funnel stages are monotone non-increasing") {
    val rows = Advanced.funnel(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("1_viewed", "2_clicked_after_view", "3_purchased_after_click"))
    assert(rows("1_viewed") >= rows("2_clicked_after_view"))
    assert(rows("2_clicked_after_view") >= rows("3_purchased_after_click"))
    assert(rows("1_viewed") > 0)
  }

  test("q61 stage 2 requires strict order: a click at-or-before the first view never counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted: user 1 clicks BEFORE viewing; user 2 clicks after
    val ev = Seq(
      (1L, "click", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 01:00:00"))
      .toDF("user_id", "event_type", "t0")
      .select(col("user_id"), col("event_type"),
        col("t0").cast("timestamp").as("ts"))
    ev.createOrReplaceTempView("planted_events")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = ev
      .withColumn("fv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("fc", min(when(col("event_type") === "click" && col("ts") > col("fv"), col("ts"))).over(w))
      .groupBy("user_id").agg(max("fc").as("fc"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(staged(1L).isEmpty, "pre-view click must not convert")
    assert(staged(2L).isDefined)
  }

  test("q62 retention at any offset never exceeds the cohort's day-0 size") {
    val rows = Advanced.cohortRetention(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val day0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (cohort, off, n) =>
      assert(off >= 0L && off <= 14L)
      assert(n <= day0(cohort), s"cohort $cohort offset $off: $n > ${day0(cohort)}")
    }
  }
}
