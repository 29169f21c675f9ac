package graft.operators

import org.apache.spark.sql.functions.{col, expr}
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

  // ----------------------------------------------- s27 margin mining
  /** Planted corpus for the Artetxe–Schwenk miner, 60 vectors:
    *   - ids 40–49: five true parallel pairs (2m, 2m+1) — same one-hot
    *     base dim (id div 2), the odd side offset by 0.01 in dim 60 so
    *     the pair members are distinct but near-identical;
    *   - ids 50–58 even + 51: a HUB — five even-side near-copies of
    *     the single odd vector 51 (shared dim 30, id-jittered dim 61);
    *     every copy's forward best is 51, so mutual-best must keep
    *     exactly ONE pair, and the hub's saturated own-neighborhood
    *     (avgNN ≈ 1) must drag its margin BELOW a clean pair's even
    *     though the cosines are equally ≈ 1 — the hubness
    *     normalization that distinguishes the ratio margin from plain
    *     cosine thresholding;
    *   - everything else: one-hot background at dim 32 + id % 20;
    *     even ids land on even residues and odd ids on odd, so every
    *     cross-side background cosine is exactly 0 → k-NN sums are 0,
    *     the denominator guard excludes them, and the background mines
    *     NOTHING (the no-false-positives face).
    */
  private lazy val minable = spark.range(60).select(
    col("id").as("vec_id"),
    expr("""transform(sequence(0, 63), d -> CAST(CASE
        WHEN id BETWEEN 40 AND 49 THEN
          CASE WHEN d = CAST(id / 2 AS INT) THEN 1.0
               WHEN d = 60 THEN 0.01 * (id % 2) ELSE 0.0 END
        WHEN id = 51 OR (id BETWEEN 50 AND 58 AND id % 2 = 0) THEN
          CASE WHEN d = 30 THEN 1.0
               WHEN d = 61 THEN 0.001 * id ELSE 0.0 END
        ELSE CASE WHEN d = 32 + id % 20 THEN 1.0 ELSE 0.0 END
      END AS FLOAT))""").as("embedding"))

  test("s27: planted parallel pairs are mined, the hub collapses to " +
      "one mutual pair, background mines nothing") {
    val out = Similarity.marginMiningOn(minable).collect()
    val mined = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined == Set((40L, 41L), (42L, 43L), (44L, 45L), (46L, 47L),
      (48L, 49L), (50L, 51L)),
      s"expected the five planted pairs + exactly one hub pair, got $mined")
    // mutual-best is 1:1 by construction — no src or dst repeats
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.map(_.getLong(1)).distinct.length == out.length)
    val margin = out.map(r => (r.getLong(0), r.getLong(3))).toMap
    // hubness normalization: the hub pair's cosine is as high as a
    // clean pair's, but its margin must be LOWER (the hub's own
    // neighborhood average ≈ 1 inflates the denominator)
    assert(margin(50L) < margin(40L),
      s"hub margin ${margin(50L)} must undercut clean-pair ${margin(40L)}")
    assert(out.forall(_.getLong(3) >= Similarity.MARGIN_MIN_PPM))
  }

  test("s27: a single-side corpus mines nothing (and does not crash)") {
    val oneSide = minable.filter(col("vec_id") % 2 === 0)
    assert(Similarity.marginMiningOn(oneSide).collect().isEmpty)
  }
}
