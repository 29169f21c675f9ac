package graft.operators

import graft.{SparkSpec, Tables}

/** s12 hard-negative mining vs a sequential reference using the identical
  * quantized-integer arithmetic (so doubles compare EXACTLY, not within
  * epsilon — the s01 determinism contract).
  */
class HardNegativesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("s12 matches brute-force mining with the label exclusion") {
    val all = Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    val (anchors, corpus) = all.partition(_._1 < 8)
    def norm(v: Array[Long]): Double =
      math.sqrt(v.map(x => x * x).sum.toDouble)

    val expect = anchors.sortBy(_._1).flatMap { case (aid, alabel, av) =>
      val an = norm(av)
      corpus.filter(_._2 != alabel)
        .map { case (cid, clabel, cv) =>
          val dot = av.zip(cv).map { case (x, y) => x * y }.sum
          (cid, clabel, dot.toDouble / (an * norm(cv)))
        }
        .sortBy { case (cid, _, cos) => (-cos, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, clabel, cos), i) => (aid, i + 1, cid, clabel, cos) }
    }.toSeq

    val got = Similarity.hardNegatives(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSeq
    assert(got == expect)
    // the defining property: no negative shares its anchor's label
    val labelOf = all.map(t => t._1 -> t._2).toMap
    assert(got.forall { case (aid, _, cid, clabel, _) =>
      clabel == labelOf(cid) && clabel != labelOf(aid) })
  }

  // ------------------------------------------------------ s13 MMR re-rank
  test("s13 structure: dense steps, distinct picks, step 1 == relevance argmax") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.mmrRerank(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    val top1 = Similarity.cosineTopK(spark, d, 5, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    byQ.foreach { case (qid, rs) =>
      val steps = rs.sortBy(_._2)
      assert(steps.map(_._2).toSeq == (1 to Similarity.MMR_K))
      assert(steps.map(_._3).distinct.length == steps.length, "picks must be distinct")
      assert(steps.head._3 == top1(qid), "first MMR pick is the plain relevance argmax")
    }
  }

  test("s13 diversity: a planted near-duplicate of the top hit is deferred, not ranked 2nd") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one query (id 0) and a corpus where vec 10 is the best hit, vec 11
    // is vec 10 with a tiny perturbation (plain cosine ranks it 2nd), and
    // vecs 12..19 are mutually-orthogonal-ish mediocre hits. MMR must NOT
    // take the near-dup at step 2.
    val dim = 64
    val qv = (0 until dim).map(i => if (i < 8) 1.0f else 0.0f)
    val best = (0 until dim).map(i => if (i < 8) 0.9f else 0.0f)
    val nearDup = best.updated(60, 0.01f)
    val others = (0 until 8).map { j =>
      // some overlap with the query on axis j (<8), plus mass elsewhere
      (0 until dim).map(i =>
        if (i == j) 0.8f else if (i == 8 + j) 1.0f else 0.0f)
    }
    val e = ((0L, qv) +: (10L, best) +: (11L, nearDup) +:
      others.zipWithIndex.map { case (v, j) => ((12 + j).toLong, v) })
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerankFrom(e, 1).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out.head == (1, 10L), "step 1 takes the best hit")
    assert(out(1)._2 != 11L,
      "step 2 must defer the near-duplicate of the already-picked hit")
    val top2 = Similarity.cosineTopKFrom(e, 1, 2) // the contrast case
    assert(top2.collect().map(_.getLong(2)).toSeq == Seq(10L, 11L),
      "plain cosine DOES rank the near-dup 2nd — the contrast MMR removes")
    // shortlist smaller than k: all candidates returned, steps stay dense
    val tiny = Similarity.mmrRerankFrom(
      e.filter(col("vec_id") < 13), 1).collect()
    assert(tiny.map(_.getInt(1)).toSeq == (1 to 3),
      "3 candidates -> 3 dense steps, not k")
  }

  test("s13 degenerate: a one-candidate shortlist still yields its step-1 pick") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // exactly one corpus vector -> zero similarity pairs; an inner join
    // on the pair frame would drop the query entirely while the oracle's
    // recursive CTE still emits the step-1 pick (the ADVICE r11 case)
    val dim = 64
    val qv = (0 until dim).map(i => if (i < 8) 1.0f else 0.0f)
    val only = (0 until dim).map(i => if (i < 8) 0.9f else 0.0f)
    val e = Seq((0L, qv), (10L, only)).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerankFrom(e, 1).collect()
    assert(out.length == 1, "the query must not vanish from the output")
    assert((out.head.getInt(1), out.head.getLong(2)) == (1, 10L))
    // and its reported score is the plain relevance (nothing picked yet)
    val rel = Similarity.cosineTopKFrom(e, 1, 1).collect().head.getDouble(3)
    assert(out.head.getDouble(3) == rel)
  }
}
