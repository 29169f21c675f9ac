package graft.operators

import scala.collection.mutable

import graft.{SparkSpec, Tables}

/** t16 BPE merge learning vs a sequential reference trainer (the textbook
  * Sennrich et al. algorithm: word-count table, pair counts, greedy
  * leftmost merge application), compared merge-for-merge.
  */
class BpeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Greedy leftmost merge of (a, b) in one symbol sequence. */
  private def applyMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** The sequential reference trainer both tests compare against. */
  private lazy val referenceMerges: Seq[(Long, String, String, String, Long)] = {
    val wordCounts = Tables.documents(spark, d).select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

    var vocab: Map[List[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toList -> c }.toMap
    val expect = mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (step <- 1 to TextOps.BPE_MERGES) {
      val pairCounts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, c) <- vocab; Seq(x, y) <- syms.sliding(2) if syms.length >= 2)
        pairCounts((x, y)) += c
      val ((a, b), total) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
      expect += ((step.toLong, a, b, a + b, total))
      vocab = vocab.groupBy { case (syms, _) => applyMerge(syms, a, b) }
        .map { case (m, g) => m -> g.values.sum }
    }
    expect.toSeq
  }

  test("t16 matches a sequential reference trainer merge-for-merge") {
    val got = TextOps.bpeMerges(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == referenceMerges)
  }

  test("t17 encodes the corpus exactly as a sequential reference encoder") {
    // reference encode: apply the learned merges to each word in rank order
    val encodeLen = mutable.Map[String, Long]()
    def encode(w: String): Long = encodeLen.getOrElseUpdate(w, {
      var syms = w.map(_.toString).toList
      for ((_, a, b, _, _) <- referenceMerges) syms = applyMerge(syms, a, b)
      syms.length.toLong
    })
    val expect = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
      .map { case (id, toks) => (id, toks.length.toLong, toks.map(encode).sum) }
      .sortBy(_._1).toSeq

    val got = TextOps.bpeEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // BPE can only merge: every word is between 1 symbol and its length
    got.zip(expect).foreach { case ((_, nTok, nBpe), _) => assert(nBpe >= nTok) }
  }

  test("corpus exhaustion stops merge learning early, short of BPE_MERGES") {
    import spark.implicits._
    // 'ab' fully merges in round 1; every word is then a single symbol,
    // so round 2's pair table is empty and the loop must stop at 1 merge
    // (not fail, not emit null rows)
    val degenerate = Seq((1L, "ab ab x y"), (2L, "ab x")).toDF("doc_id", "text")
    val (merges, vocab) = TextOps.bpeLearnOn(degenerate)
    assert(merges == Seq((1L, "ab", 3L)))
    // the final vocabulary is fully merged: one symbol per word
    val states = vocab.collect().map(r => r.getString(1)).toSet
    assert(states == Set("ab", "x", "y"))
  }

  test("greedy run semantics: the reference merge of (a,a) pairs runs left to right") {
    // sanity-pin the reference itself, which the distributed replace-based
    // rewrite is compared against above: "aaaa" -> [aa, aa], "aaa" -> [aa, a]
    assert(applyMerge(List("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
    assert(applyMerge(List("a", "a", "a"), "a", "a") == List("aa", "a"))
  }

  // -------------------------------------------------- t21 BPE fertility
  test("t21 fertility: >= 1 symbol per word, exact ratios, dominant language segments best") {
    val rows = TextOps.bpeFertility(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    rows.foreach { case (lang, nTok, nBpe, nChars, fert, cps) =>
      assert(nBpe >= nTok, s"$lang: a word is at least one symbol")
      assert(fert == nBpe * 1000000L / nTok)
      assert(cps == nChars * 1000000L / nBpe)
      assert(nChars >= nBpe, s"$lang: a symbol is at least one char")
    }
    // the diagnostic must DIFFERENTIATE languages (identical fertility
    // would mean it measures nothing); the per-language ordering itself
    // is data, not a law — at sf0.01 en (the dominant language) reads
    // lowest, at this 50-doc fixture the margin is inside sample noise
    assert(rows.map(_._5).distinct.length > 1,
      "fertility must vary across languages")
  }
}
