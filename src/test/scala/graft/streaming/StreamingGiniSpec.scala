package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.operators.Extras

/** Streaming q76 (round-14 directive #4): streamed per-(type, user) cent
  * rollups replay to exactly the batch Gini frame — splits that cut a
  * user's spend across batches, sign-mixed (refund-only) batches, replay
  * idempotence, compaction invariance, and the inherited envelope
  * dispatch (the read calls the SAME kernel, so the DECIMAL(38,0) lift
  * fires on the folded rollup too).
  */
class StreamingGiniSpec extends SparkSpec {
  import spark.implicits._

  // user 7's spend is SPLIT across the batches; user 9 lands a
  // refund-only (negative) delta in batch 2; user 5 has a null-value
  // event (ingest defect — dropped on both faces); user 11 has ONLY a
  // null-value event and must not acquire a rollup row at all
  private val b1 = Seq(
    (1L, "buy", Some(50000.0)), (2L, "buy", Some(700.0)),
    (7L, "buy", Some(12.25)), (9L, "buy", Some(30.0)),
    (5L, "buy", None), (1L, "ad", Some(3.0)))
  private val b2 = Seq(
    (7L, "buy", Some(12.25)), (9L, "buy", Some(-45.0)),
    (5L, "buy", Some(2.0)), (11L, "buy", None),
    (3L, "ad", Some(8.0)), (1L, "ad", Some(3.0)))

  private def df(rows: Seq[(Long, String, Option[Double])]): DataFrame =
    rows.toDF("user_id", "event_type", "value")

  private def collected(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq)

  test("streamed rollups replay to exactly the batch q76 frame") {
    val path = Files.createTempDirectory("sgini").toString + "/log"
    StreamingGini.absorb(df(b1), 0L, path)
    StreamingGini.absorb(df(b2), 1L, path)
    val batch = Extras.revenueGiniOf(df(b1 ++ b2))
    assert(collected(StreamingGini.gini(spark, path)) == collected(batch),
      "streamed ≡ batch across a user-splitting, sign-mixed split")
    // the only-null user never acquired state on either face
    assert(StreamingGini.currentRollup(spark, path)
      .filter($"user_id" === 11L).isEmpty)
  }

  test("replayed batch is idempotent; compaction changes nothing") {
    val path = Files.createTempDirectory("sgini").toString + "/log"
    StreamingGini.absorb(df(b1), 0L, path)
    StreamingGini.absorb(df(b2), 1L, path)
    val once = collected(StreamingGini.gini(spark, path))
    StreamingGini.absorb(df(b2), 1L, path) // crash-replay
    assert(collected(StreamingGini.gini(spark, path)) == once)
    StreamingGini.compact(spark, path)
    assert(collected(StreamingGini.gini(spark, path)) == once)
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }

  test("the envelope dispatch is inherited by the streaming read") {
    val path = Files.createTempDirectory("sgini").toString + "/log"
    // the Round15OpsSpec crossing corpus, split across two batches
    val big = (1L to 200L).map(u => (u, "buy", Some(u * 5.0e10)))
    StreamingGini.absorb(df(big.take(90)), 0L, path)
    StreamingGini.absorb(df(big.drop(90)), 1L, path)
    val auto = StreamingGini.gini(spark, path)
    // the registered read keeps the arm-independent string schema; the
    // lift itself is pinned on the numeric stats face over the SAME
    // folded rollup the read consumes
    assert(auto.schema("rank_mass").dataType ==
      org.apache.spark.sql.types.StringType,
      "the read's schema must not flip with the data")
    assert(Extras.giniStatsOfUserCents(
        StreamingGini.currentRollup(spark, path).localCheckpoint(true))
      .schema("rank_mass").dataType == DecimalType(38, 0),
      "the folded rollup crosses the envelope → the read must lift")
    assert(collected(auto) ==
      collected(Extras.revenueGiniOf(df(big))),
      "lifted streamed ≡ lifted batch")
  }
}
