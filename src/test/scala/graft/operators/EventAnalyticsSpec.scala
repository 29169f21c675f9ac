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

  test("q69 planted timeline: last-touch carries across segments, first-touch resets, (none) fallback") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "click", t(1), 0.0),
      (2L, 1L, "view", t(2), 0.0),
      (3L, 1L, "purchase", t(3), 10.0), // last=view, first(seg0)=click
      (4L, 1L, "purchase", t(4), 5.0), // last=view (carries), first(seg1)=(none)
      (5L, 2L, "purchase", t(1), 7.0)) // no touches at all: both (none)
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Advanced.attributionOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("(none)", 1L, 700L, 2L, 1200L),
      ("click", 0L, 0L, 1L, 1000L),
      ("view", 2L, 1500L, 0L, 0L)))
  }

  test("q69 conservation: each model attributes every purchase exactly once") {
    val out = Advanced.attribution(spark, d).collect()
    val nPur = graft.Tables.events(spark, d)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum == nPur, "last-touch counts sum to purchases")
    assert(out.map(_.getLong(3)).sum == nPur, "first-touch counts sum to purchases")
    assert(out.map(_.getLong(2)).sum == out.map(_.getLong(4)).sum,
      "both models allocate the same total revenue")
  }
}
