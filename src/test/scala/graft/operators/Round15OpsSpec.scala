package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.SparkSpec

/** Round-15: q76's int64 envelope made EXECUTABLE (round-14 directive
  * #3). The rank-mass statistics die at ~10^7 users/type in int64; the
  * kernel now computes its own worst case (3·n²·max|cents| per type,
  * a bounded aggregate) and lifts to DECIMAL(38,0) past
  * [[Extras.GINI_INT64_SAFE]]. Pinned here:
  *
  *   - both arms bit-equal (including the ppm doubles) on a corpus
  *     where both are defined;
  *   - a planted corpus that CROSSES the envelope: the forced int64 arm
  *     fails loudly under ANSI (the exact failure the 100× gate caught
  *     in round 14), the auto dispatch picks the lift, and the lifted
  *     values equal an independent BigInt recomputation;
  *   - the dispatch is conservative: a normal corpus stays on the
  *     int64 arm (schema proof — rank_mass is LongType).
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  // the round-14 planted shape: whale + mid tier + tail + ties + refunds
  private lazy val normal = (1L to 40L).flatMap { u =>
    val v = if (u == 1) 50000.0 else if (u <= 5) 700.0
      else if (u == 40) -20.0 else (u % 7).toDouble + 0.25
    Seq((u, "buy", v), (u, "buy", v))
  }.toDF("user_id", "event_type", "value")

  // envelope-crossing corpus: cents_u = u·5e12 (exact doubles end to
  // end: u·5e10 and u·5e12 are integers < 2^53, so floor(value·100) is
  // exact). R = Σ u·(u·5e12) ≈ 1.34e19 > Long.MaxValue — the int64 arm's
  // sum(rnk·cents) genuinely overflows, while n, S and every per-row
  // product still fit.
  private val BIG_N = 200L
  private lazy val crossing = (1L to BIG_N).map(u => (u, "buy", u * 5.0e10))
    .toDF("user_id", "event_type", "value")

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map { r =>
      (r.getString(0), r.getLong(1),
        // decimal-arm columns cast for cross-arm comparison
        r.get(2) match { case d: java.math.BigDecimal => d.longValueExact()
                         case l: Long => l },
        r.get(3) match { case d: java.math.BigDecimal => d.longValueExact()
                         case l: Long => l },
        r.getLong(4))
    }

  test("q76 envelope: both arms bit-equal where both are defined") {
    val int64 = Extras.revenueGiniStatsOf(normal, Double.MaxValue)
    val lifted = Extras.revenueGiniStatsOf(normal, -1.0)
    assert(int64.schema("rank_mass").dataType == LongType)
    assert(lifted.schema("rank_mass").dataType == DecimalType(38, 0))
    assert(asTuples(int64) == asTuples(lifted),
      "the DECIMAL(38,0) lift must reproduce the int64 arm exactly, " +
        "gini_ppm included (both convert the exact num/den once)")
  }

  test("q76 REGISTERED face: one schema and one result on both arms") {
    // the round-15 latent wart, closed: the terminal stringifies
    // sum_cents/rank_mass, so the driver-hashed schema cannot flip with
    // the data (terminal DECIMAL is banned by QueryInventorySpec)
    val int64 = Extras.revenueGiniOf(normal, Double.MaxValue)
    val lifted = Extras.revenueGiniOf(normal, -1.0)
    assert(int64.schema == lifted.schema, "arm-independent schema")
    assert(int64.schema("sum_cents").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(int64.schema("rank_mass").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(int64.collect().toSeq.map(_.toSeq) ==
      lifted.collect().toSeq.map(_.toSeq),
      "the registered face is arm-invariant in values too")
  }

  test("q76 envelope: the crossing corpus overflows int64 loudly, " +
      "dispatches to the lift, and the lift is exact") {
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "envelope proof assumes ANSI overflow semantics")
    // forced int64 arm: the genuine round-14 failure mode, now fenced
    val e = intercept[Throwable] {
      Extras.revenueGiniOf(crossing, Double.MaxValue).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else (t.getClass.getName + ": " + String.valueOf(t.getMessage)) +:
        chain(t.getCause)
    assert(chain(e).exists(m => m.toLowerCase.contains("overflow") ||
      m.contains("ARITHMETIC")), s"expected long overflow, got: ${chain(e)}")
    // auto dispatch: the worst-case scalar (3·n²·maxc ≈ 1.2e20 > 8e18)
    // must pick the lift without being told
    val auto = Extras.revenueGiniStatsOf(crossing)
    assert(auto.schema("rank_mass").dataType == DecimalType(38, 0),
      "dispatch must lift past the envelope")
    val row = auto.collect().head
    // independent BigInt recomputation (cents ascending in u → rnk = u)
    val cents = (1L to BIG_N).map(u => BigInt(u) * BigInt(5000000000000L))
    val s = cents.sum
    val r = cents.zipWithIndex.map { case (c, i) => c * BigInt(i + 1) }.sum
    val num = 2 * r - (BigInt(BIG_N) + 1) * s
    val den = BigInt(BIG_N) * s
    val ppm = math.floor(1.0e6 * num.toDouble / den.toDouble).toLong
    assert(row.getLong(1) == BIG_N)
    assert(BigInt(row.getDecimal(2).toBigInteger) == s)
    assert(BigInt(row.getDecimal(3).toBigInteger) == r,
      "rank mass past the int64 cliff must be EXACT, not approximated")
    assert(row.getLong(4) == ppm)
    // the registered face surfaces the lifted statistics as the same
    // digit strings an int64 arm would have produced
    val pub = Extras.revenueGiniOf(crossing).collect().head
    assert(pub.getString(2) == s.toString && pub.getString(3) == r.toString)
  }

  test("q76 envelope: a normal corpus stays on the int64 arm") {
    assert(Extras.revenueGiniStatsOf(normal).schema("rank_mass").dataType
      == LongType, "below the envelope the plan must not change")
  }

  // ------------------------------------------------------------- g12
  // g09's √N-cells production face (round-14 directive #2): the oracle
  // hash pins the values; pinned here are the two geometry claims the
  // hash doesn't phrase.

  test("g12 ≡ g09 where √N cannot exceed the candidate pool") {
    // sf0.001: 500 vectors → ⌊√N⌋ = 22 requested, but the mod-31
    // candidate pool holds only 16, so both keys train the same 16
    // cells and must agree bit-for-bit
    val d = "/root/testdata/sf0.001"
    assert(Similarity.knnCommunitiesSqrt(spark, d).collect().toSeq ==
      Similarity.knnCommunities(spark, d).collect().toSeq)
  }

  test("g12 trains ⌊√N⌋ cells end-to-end when candidates allow") {
    // 3100 one-hot-cluster vectors: ⌊√3100⌋ = 55 cells from a 100-wide
    // candidate pool. lpaOn pins seeds, so every one of the 55 seed
    // labels must survive to the rollup — 55 communities is the direct,
    // end-to-end proof the √N geometry (not g09's fixed 16) ran.
    val emb = spark.range(3100).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> CAST(" +
        "CASE WHEN d = vec_id % 32 THEN 1.0 ELSE 0.0 END AS FLOAT))")
        .as("embedding"))
    val out = Similarity.knnCommunitiesOn(emb).collect()
    val labels = out.map(_.getLong(0)).toSet
    assert(labels.filter(_ > 0) == (1L to 55L).toSet,
      s"expected the 55 pinned √N seed labels, got ${labels.size} labels")
    assert(out.map(_.getLong(1)).sum == 3100L, "every vector rolled up once")
  }

  test("withStaticPlan refuses to toggle AQE under an active stream") {
    // the round-14 advice hazard: the static-plan toggle is session-
    // global, so a streaming microbatch planning concurrently would
    // silently come out non-adaptive. The guard must fail loudly.
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = mem.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wsp").toString)
      .format("noop").start()
    try {
      val e = intercept[IllegalArgumentException] {
        Graph.relayoutPartitioned(
          spark.range(10).select(col("id").as("src")), col("src"))
      }
      assert(e.getMessage.contains("spark.sql.adaptive.enabled"))
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "the guard must fire BEFORE the toggle, leaving AQE untouched")
    } finally q.stop()
  }
}
