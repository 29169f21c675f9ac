package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structural invariants for the round-12 text keys (exact values are
  * DuckDB-oracled by the driver): t22 CCNet perplexity terciles and t23
  * n-gram novelty.
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
}
