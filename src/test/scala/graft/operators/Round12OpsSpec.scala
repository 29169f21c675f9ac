package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structural invariants for the round-12 session-2 keys (exact values are
  * DuckDB-oracled by the driver): t24 FORCAST readability, q70 time-decay
  * scoring, s16 kNN hubness, p19 cluster-balanced sampling.
  */
class Round12OpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("t24 planted: known syllable structure yields exact integer grades") {
    import spark.implicits._
    // "cat dog sun": all monosyllabic -> grade_centi 2000-1500 = 500, grade 5
    // "cat dog house": house has 2 vowel groups (ou, e) -> mono 2/3 ->
    //   2000 - (1500*2) div 3 = 1000, grade 10
    // "": zero words -> filtered out entirely
    val docs = Seq(
      (1L, "en", "cat dog sun"),
      (2L, "en", "cat dog house"),
      (3L, "de", "  --  ")).toDF("doc_id", "lang", "text")
    val out = TextOps.readabilityOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("en", 5L, 1L, 3L, 3L, 3L),
      ("en", 10L, 1L, 2L, 3L, 4L)))
  }

  test("t24 corpus: grades live in the FORCAST range and doc counts conserve") {
    val out = TextOps.readability(spark, d).collect()
    assert(out.nonEmpty)
    val grades = out.map(_.getLong(1))
    // grade_centi = 2000 - (1500*mono) div words in [500, 2000] -> grade in [5, 20]
    assert(grades.forall(g => g >= 5 && g <= 20))
    val nDocs = out.map(_.getLong(2)).sum
    val total = Tables.documents(spark, d).count()
    assert(nDocs == total, "every document with >=1 word lands in exactly one bucket")
    // monosyllabic words can never exceed total words
    assert(out.forall(r => r.getLong(3) <= r.getLong(4)))
  }

  test("q70: decay only shrinks mass, fresh <= raw, and all segments appear") {
    val out = Extras.decayScore(spark, d).collect()
    assert(out.length == 5, "all five market segments")
    out.foreach { r =>
      val (raw, decayed, fresh) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(decayed <= raw, "a right-shift can only shrink cents")
      assert(fresh <= raw)
      assert(fresh <= decayed * 1 + raw, "sanity")
      assert(decayed >= 0 && fresh >= 0)
    }
    val nOrders = out.map(_.getLong(1)).sum
    assert(nOrders == Tables.orders(spark, d).count(),
      "every order attributes to exactly one segment")
  }

  test("s16 planted: two tight pairs produce mutual nearest neighbors") {
    import spark.implicits._
    val dim = 64
    def v(f: Int => Double) = (0 until dim).map(i => f(i).toFloat)
    // A~B live in dims 0-7, C~D in dims 32-39 (near-orthogonal groups)
    val e = Seq(
      (1L, v(i => if (i < 8) 1.0 else 0.0)),
      (2L, v(i => if (i < 8) 0.95 else if (i == 60) 0.1 else 0.0)),
      (3L, v(i => if (i >= 32 && i < 40) 1.0 else 0.0)),
      (4L, v(i => if (i >= 32 && i < 40) 0.9 else if (i == 62) 0.1 else 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnHubnessFrom(e, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // with k=1 each node points at its pair partner; both directions exist
    // -> in_deg = 1 and n_mutual = 1 everywhere, nn is the partner
    assert(out.toSeq == Seq((1L, 1L, 1L, 2L), (2L, 1L, 1L, 1L),
      (3L, 1L, 1L, 4L), (4L, 1L, 1L, 3L)))
  }

  test("s16 corpus: edge conservation — in-degrees sum to k·n, mutual edges are symmetric") {
    val k = 5
    val out = Similarity.knnHubness(spark, d, k).collect()
    val n = out.length
    assert(n == Tables.embeddings(spark, d).count())
    // every node emits exactly k out-edges; each lands as someone's in-degree
    assert(out.map(_.getLong(1)).sum == k.toLong * n)
    // mutual edges count each endpoint once -> total is even
    assert(out.map(_.getLong(2)).sum % 2 == 0)
    assert(out.forall(r => r.getLong(2) <= k))
    // nearest-neighbor cosine is a valid cosine
    assert(out.forall(r => math.abs(r.getDouble(4)) <= 1.0 + 1e-12))
  }

  test("p19: quotas are ceil(n/4), admissions fill them exactly, population conserves") {
    val out = Similarity.clusterQuotaSample(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty && out.length <= Similarity.N_CELLS)
    out.foreach { case (_, nTotal, quota, nAdmitted, _, nLabels) =>
      assert(quota == (nTotal + 3) / 4)
      assert(nAdmitted == quota, "hash order always fills the quota exactly")
      assert(nLabels >= 1 && nLabels <= nAdmitted)
    }
    assert(out.map(_._2).sum == Tables.embeddings(spark, d).count(),
      "every vector is assigned to exactly one cell")
  }
}
