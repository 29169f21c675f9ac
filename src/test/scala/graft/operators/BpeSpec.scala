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

  test("t16 matches a sequential reference trainer merge-for-merge") {
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

    val got = TextOps.bpeMerges(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expect.toSeq)
  }

  test("greedy run semantics: the reference merge of (a,a) pairs runs left to right") {
    // sanity-pin the reference itself, which the distributed replace-based
    // rewrite is compared against above: "aaaa" -> [aa, aa], "aaa" -> [aa, a]
    assert(applyMerge(List("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
    assert(applyMerge(List("a", "a", "a"), "a", "a") == List("aa", "a"))
  }
}
