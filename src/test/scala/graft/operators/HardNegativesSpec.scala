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
}
