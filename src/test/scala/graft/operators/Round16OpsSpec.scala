package graft.operators

import org.apache.spark.sql.types.StringType

import graft.SparkSpec

/** Round-16: q76's hot-bin hazard made a DISPATCH (round-15 directive
  * #4) and its terminal schema made arm-independent (directive #3).
  * Pinned here:
  *
  *   - the planted low-ARPU corpus (nearly every user's total spend in
  *     Lorenz bin 0 — the shape the Scaladoc named as the residual
  *     concentration): the forced hot-bin decomposition reproduces the
  *     single-window result EXACTLY, on both envelope arms;
  *   - dispatch, not insurance (the t22 lesson): the all-cold plan is
  *     the original single-window plan verbatim — no Union, no hot
  *     aggregates — and the forced-hot plan carries the union;
  *   - the registered face's terminal statistics are STRING whatever
  *     the corpus (QueryInventorySpec's terminal-DECIMAL ban holds by
  *     construction, not by data).
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Sub-$10 corpus: tails tie on 7 exact cents values inside bin 0,
    * refunds plant negative cents in the SAME clamp bin, two whales
    * keep a cold bin alive beside the hot one, and user_ids stride
    * 40009 so one exact-cents tie spans many GINI_TIE_CHUNK-wide
    * user_id chunks (the tie level genuinely decomposes).
    */
  private lazy val lowArpu = (1L to 600L).map { u =>
    val v = if (u <= 2) 320.0      // whales → bin 32, population 2 (cold)
      else if (u % 97 == 0) -3.5   // refunds → negative cents, clamp bin 0
      else (u % 7).toDouble + 0.25 // ties: 7 exact sub-$10 cents values
    (u * 40009L, if (u % 3 == 0) "ad" else "buy", v)
  }.toDF("user_id", "event_type", "value")

  test("q76 hot-bin: the decomposed rank ≡ the single-window rank, " +
      "on both envelope arms") {
    val cold = Extras.revenueGiniOf(lowArpu).collect().toSeq
    val hot = Extras.revenueGiniOf(lowArpu, hotThreshold = 5L)
      .collect().toSeq
    assert(hot == cold,
      "forced hot decomposition must be exact (rank_mass pins every rank)")
    val hotLifted = Extras.revenueGiniOf(lowArpu, int64SafeMax = -1.0,
      hotThreshold = 5L).collect().toSeq
    assert(hotLifted == cold, "hot × DECIMAL lift composes exactly too")
  }

  test("q76 hot-bin is a dispatch: all-cold keeps the original plan") {
    val coldPlan = Extras.revenueGiniOf(lowArpu)
      .queryExecution.optimizedPlan.toString
    val hotPlan = Extras.revenueGiniOf(lowArpu, hotThreshold = 5L)
      .queryExecution.optimizedPlan.toString
    assert(!coldPlan.contains("Union"),
      "a corpus with no hot bin must not pay the hot branch in the plan")
    assert(hotPlan.contains("Union"),
      "the forced-hot plan must actually take the decomposed path")
  }

  test("q76 registered face: terminal statistics are STRING by " +
      "construction") {
    val df = Extras.revenueGiniOf(lowArpu)
    assert(df.schema("sum_cents").dataType == StringType)
    assert(df.schema("rank_mass").dataType == StringType)
  }
}
