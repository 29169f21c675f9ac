package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structural invariants for the round-12 curation/retrieval keys
  * (exact values are DuckDB-oracled by the driver): t22 CCNet perplexity
  * terciles, t23 n-gram novelty, p18 temperature mixture, s14
  * matryoshka-truncation recall.
  */
class NoveltyAndPplSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("t22 terciles: exact head/middle/tail sizes, score-monotone, en-skewed head") {
    val rows = TextOps.ccnetBuckets(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length
    assert(n > 0)
    val byB = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byB("head") == n / 3)
    assert(byB.getOrElse("middle", 0) == 2 * n / 3 - n / 3)
    assert(byB("tail") == n - 2 * n / 3)
    // buckets are score-monotone (ties may straddle a boundary: >=)
    val hMin = rows.filter(_._3 == "head").map(_._2).min
    val mMax = rows.filter(_._3 == "middle").map(_._2).max
    val mMin = rows.filter(_._3 == "middle").map(_._2).min
    val tMax = rows.filter(_._3 == "tail").map(_._2).max
    assert(hMin >= mMax && mMin >= tMax)
    // the LM is trained on the en slice, so en docs must be
    // over-represented in head relative to tail — the CCNet point
    val lang = Tables.documents(spark, d).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def enFrac(b: String): Double = {
      val xs = rows.filter(_._3 == b)
      xs.count(x => lang(x._1) == "en").toDouble / xs.length
    }
    assert(enFrac("head") > enFrac("tail"),
      s"en fraction head=${enFrac("head")} must exceed tail=${enFrac("tail")}")
  }

  test("t23 planted: first doc fully novel, exact dup zero-novel, disjoint doc fully novel") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 tokens -> 4 distinct 5-grams, all first here
      (2L, "a b c d e f g h"), // exact duplicate -> zero novel
      (3L, "p q r s t u v w")) // disjoint -> fully novel
      .toDF("doc_id", "text")
    val out = TextOps.ngramNoveltyOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, 1000000L),
      (2L, 4L, 0L, 0L),
      (3L, 4L, 4L, 1000000L)))
  }

  test("t23 conservation: novel counts sum to the corpus's distinct shingle count") {
    val out = TextOps.ngramNovelty(spark, d)
    val sumNovel = out.agg(sum(col("n_novel"))).collect().head.getLong(0)
    val distinctShingles = Dedup.shingleTable(Tables.documents(spark, d),
        n = TextOps.NOVELTY_N, hashed = true)
      .select("sh").distinct().count()
    assert(sumNovel == distinctShingles,
      "every distinct shingle is novel in exactly one document")
    // and the lowest doc_id is fully novel by definition
    val first = out.orderBy("doc_id").limit(1).collect().head
    assert(first.getLong(3) == 1000000L)
  }

  test("p18 temperature flattening: head language down-weighted, tail up, budget respected") {
    val rows = Curation.temperatureMixture(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length >= 3)
    val head = rows.maxBy(_._3) // largest mass (en)
    val tail = rows.minBy(_._3)
    assert(head._1 == "en")
    assert(head._5 < head._4, s"head target_ppm ${head._5} must drop below natural ${head._4}")
    assert(tail._5 > tail._4, s"tail target_ppm ${tail._5} must rise above natural ${tail._4}")
    // alpha=0.5 flattens but never inverts the ordering
    assert(rows.sortBy(-_._4).map(_._1).toSeq == rows.sortBy(-_._5).map(_._1).toSeq)
    // integer-div truncation: shares sum to at most 1e6 / budget, within |langs|
    assert(rows.map(_._5).sum <= 1000000L &&
      rows.map(_._5).sum > 1000000L - rows.length)
    assert(rows.map(_._6).sum <= Curation.TEMP_TARGET_DOCS &&
      rows.map(_._6).sum > Curation.TEMP_TARGET_DOCS - rows.length)
  }

  test("s14 planted: prefix-carried signal keeps recall 1, suffix-only signal loses it") {
    import spark.implicits._
    val dim = 64
    // queries 0/1; corpus 10..29. Query 0's neighborhood (10..19) is
    // prefix-carried: recall@10 = 1. Query 1's TRUE neighborhood
    // (20..29) lives in dims 33-40, while the distractors (10..19) carry
    // broad prefixes far closer to query 1's flat prefix than the true
    // neighbors' single-spike prefixes — the 16-dim scorer ranks all ten
    // distractors first and recall collapses to 0. All prefixes stay
    // nonzero (a zero prefix norm is fail-loud by design).
    def v(f: Int => Double) = (0 until dim).map(i => f(i).toFloat)
    val q0 = v(i => if (i < 8) 1.0 else 0.0)
    val q1 = v(i => if (i >= 32 && i < 40) 1.0 else if (i < 16) 0.05 else 0.0)
    val friends0 = (0 until 10).map(j =>
      (10L + j, v(i => if (i < 8) 1.0 - 0.01 * j else if (i < 16) 0.3 else 0.0)))
    val friends1 = (0 until 10).map(j =>
      (20L + j, v(i => if (i >= 32 && i < 40) 1.0 - 0.01 * j
                       else if (i == j % 8) 0.2 else 0.0)))
    val e = ((0L, q0) +: (1L, q1) +: (friends0 ++ friends1)).toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaRecallFrom(e, 2, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(0L) == 10L, "query 0's neighborhood lives in the prefix: recall@10 = 1")
    assert(out(1L) == 0L,
      "the 16-dim scorer prefers all ten distractors: none of the true top-10 survive")
  }
}
