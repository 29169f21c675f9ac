package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import graft.{SparkSpec, Tables}
import graft.expressions.Md5Hash

/** p13 DSIR importance resampling vs a sequential reference that replays
  * the exact bucket/smoothing/quantization arithmetic on the driver.
  */
class DsirSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def bucket(tok: String): Long =
    Md5Hash.hash60(tok.getBytes(StandardCharsets.UTF_8)) % Curation.DSIR_BUCKETS

  test("p13 admitted set matches a sequential reference exactly") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

    val docToks = docs.map { case (id, _, lang, text) =>
      (id, lang, text.trim.split("\\s+").toSeq)
    }
    val sN = mutable.Map[Long, Long]().withDefaultValue(0L)
    val tN = mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, lang, toks) <- docToks; t <- toks) {
      val b = bucket(t)
      sN(b) += 1
      if (lang == "en") tN(b) += 1
    }
    val w = sN.keys.map { b =>
      b -> math.floor(1000000.0 * (tN(b) + 1) / (sN(b) + 1)).toLong
    }.toMap
    val score = docToks.map { case (id, _, toks) =>
      val wsum = toks.map(t => w(bucket(t))).sum
      id -> (1000L * wsum) / toks.size
    }.toMap
    val nAdmit = (docs.length / Curation.DSIR_KEEP_FRACTION).toInt
    val expect = score.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(nAdmit)

    val got = Curation.dsirResample(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == expect)
    assert(got.length == nAdmit)
  }

  test("p13 weights are bounded by the smoothed-ratio range") {
    // target ⊆ background ⇒ every bucket weight ≤ 10^6, ≥ 0, so every
    // per-doc fixed-point score sits in [0, 10^9]
    val scores = Curation.dsirResample(spark, d).collect().map(_.getLong(3))
    assert(scores.forall(s => s >= 0L && s <= 1000000000L))
  }
}
