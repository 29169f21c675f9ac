package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stop-shingle posting-list cap (the d03/d07 skew defense): a shingle
  * shared by more than maxPostingLen docs must be dropped BEFORE pair
  * emission, so a boilerplate phrase can neither emit k(k-1)/2 pairs nor
  * materialize an unbounded aggregate row.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs sharing exactly one stop-shingle ("S1 S2 S3", plen 6) plus one
  // genuine near-dup pair (101, 102) whose shingles are all rare.
  private lazy val base = {
    val boiler = (1 to 6).map(i => (i.toLong, "en", 0, s"S1 S2 S3 u$i v$i"))
    val neardup = Seq((101L, "en", 0, "P Q R T U"), (102L, "en", 0, "P Q R T V"))
    (boiler ++ neardup).toDF("doc_id", "lang", "band", "text")
  }

  test("cap drops stop-shingle pairs, keeps genuine near-dups") {
    // uncapped: the stop-shingle alone links all 6 boilerplate docs
    // (common=1, union=5, 10 >= 5) -> C(6,2)=15 pairs, plus (101,102)
    val uncapped = Dedup.ngramJaccardPairsOn(base, maxPostingLen = 1000).collect()
    assert(uncapped.length == 16)
    // capped at 5 < 6: boilerplate pairs vanish; the near-dup pair keeps
    // its full common/union (its shingles are under the cap)
    val capped = Dedup.ngramJaccardPairsOn(base, maxPostingLen = 5).collect()
    assert(capped.length == 1)
    val r = capped.head
    assert(r.getLong(0) == 101L && r.getLong(1) == 102L)
    assert(r.getLong(2) == 2L)      // common: "P Q R", "Q R T"
    assert(r.getLong(3) == 4L)      // union: 3 + 3 - 2
  }

  test("dropped stop-shingles are observable with their heat") {
    // the cap operates on PROBE-band groups (band and band+1 copies), so
    // the one stop-shingle shows up once per probe band it saturates
    val dropped = Dedup.stopShingles(base, maxPostingLen = 5).collect()
    assert(dropped.length == 2)
    assert(dropped.forall(_.getAs[String]("sh") == "S1 S2 S3"))
    assert(dropped.forall(_.getAs[Long]("plen") == 6L))
    assert(dropped.map(_.getAs[Int]("pband")).sorted.toSeq == Seq(0, 1))
    assert(Dedup.stopShingles(base, maxPostingLen = 6).isEmpty)
  }

  test("near-identical docs straddling a band boundary are still compared") {
    // 99 vs 101 chars -> bands 0 and 1: strict blocking would never
    // compare them; the adjacent-band probe must
    val straddle = Seq(
      (201L, "en", 0, "A B C D E F G H"),
      (202L, "en", 1, "A B C D E F G I")).toDF("doc_id", "lang", "band", "text")
    val pairs = Dedup.ngramJaccardPairsOn(straddle, Dedup.MAX_POSTING_LEN).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getLong(0) == 201L && r.getLong(1) == 202L)
    assert(r.getLong(2) == 5L)      // common 3-grams of 6 per doc
    assert(r.getLong(3) == 7L)      // union: 6 + 6 - 5
  }

  test("same-band pairs are counted exactly once despite the doubled postings") {
    // both docs in band 0 co-occur in probe bands 0 AND 1; `common` must
    // still equal the true shared-shingle count, not twice it
    val sameBand = Seq(
      (301L, "en", 0, "P Q R T U"),
      (302L, "en", 0, "P Q R T V")).toDF("doc_id", "lang", "band", "text")
    val r = Dedup.ngramJaccardPairsOn(sameBand, Dedup.MAX_POSTING_LEN).collect().head
    assert(r.getLong(2) == 2L)      // common: "P Q R", "Q R T" — once each
    assert(r.getLong(3) == 4L)
  }

  test("cap bounds the largest aggregate row") {
    val maxIds = Dedup.shingleGroups(base, maxPostingLen = 3)
      .agg(max(size(col("ids")))).collect().head.getInt(0)
    assert(maxIds <= 3)
  }

  test("d11 viral-hash cap drops a text present in too many sources") {
    // one viral text in MAX_HASH_SOURCES+1 sources would alone emit
    // C(51,2) pairs; the cap must drop it while the genuine two-source
    // mirror survives
    val viral = (0 to Dedup.MAX_HASH_SOURCES)
      .map(i => (f"src$i%02d", "the viral boilerplate"))
    val mirror = Seq(("alpha", "real shared doc"), ("beta", "real shared doc"))
    val out = Dedup.crossSourceDupMatrixOn(
      (viral ++ mirror).toDF("source", "text")).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "alpha" && out.head.getString(1) == "beta"
      && out.head.getLong(2) == 1L)
    // exactly at the cap the group is kept
    val atCap = (1 to Dedup.MAX_HASH_SOURCES)
      .map(i => (f"src$i%02d", "the viral boilerplate"))
    val kept = Dedup.crossSourceDupMatrixOn(atCap.toDF("source", "text"))
      .agg(sum(col("n_shared"))).collect().head.getLong(0)
    assert(kept == Dedup.MAX_HASH_SOURCES.toLong * (Dedup.MAX_HASH_SOURCES - 1) / 2)
  }

  test("d19 recall curve: banding catches every high-similarity pair, near-none of the noise floor") {
    // the semantic pin behind the oracle's engine-equality: on the fixture
    // corpus the planted near-dups (j >= 0.8) must ALL surface as LSH
    // candidates, while the j < 0.1 noise floor stays essentially dark —
    // the observed ends of the 1-(1-j^r)^b S-curve
    val rows = Dedup.lshRecallCurve(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val high = rows.filter(_._1 >= 8)
    assert(high.nonEmpty, "fixture has no high-similarity pairs to score")
    assert(high.forall { case (_, t, h) => h == t },
      s"missed high-similarity pairs: ${high.mkString(", ")}")
    val noise = rows.filter(_._1 == 0)
    assert(noise.forall { case (_, t, h) => h.toDouble / t < 0.05 },
      s"noise floor lit up: ${noise.mkString(", ")}")
  }

  test("d20 band sweep: candidate sets grow monotonically with band count; 8-band row ≡ d19") {
    val sweep = Dedup.lshBandSweep(spark, "/root/testdata/sf0.001").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // more bands = shorter rows = a superset of candidate pairs, so per
    // decile hits can only grow in band count (the S-curve shifting left)
    val buckets = sweep.keys.map(_._2).toSet
    for (bk <- buckets; Seq(lo, hi) <- Dedup.SWEEP_BANDS.map(_.toLong).sliding(2)) {
      (sweep.get((lo, bk)), sweep.get((hi, bk))) match {
        case (Some((tLo, hLo)), Some((tHi, hHi))) =>
          assert(tLo == tHi, s"truth differs across configs at bucket $bk")
          assert(hLo <= hHi, s"hits shrank from $lo to $hi bands at bucket $bk")
        case _ => fail(s"missing sweep row for bucket $bk")
      }
    }
    // the sweep's 8-band curve IS d19's registered curve
    val d19 = Dedup.lshRecallCurve(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(d19 == sweep.collect { case ((8L, bk), v) => bk -> v })
  }

  test("d22 amortized sweep ≡ d20 row-for-row (checkpointing changes cost, not rows)") {
    val d = "/root/testdata/sf0.001"
    assert(Dedup.lshBandSweepAmortized(spark, d).collect().toSeq ==
      Dedup.lshBandSweep(spark, d).collect().toSeq)
  }

  test("posting pipeline runs on ONE exchange: dedup, cap and groups share it") {
    // the per-doc dedup (lag), the plen cap window and the posting-group
    // aggregate all hash-partition on the same (lang, pband, sh) keys, so
    // the whole pipeline pays exactly one shuffle of the posting table —
    // the old separate corpus-wide (doc_id, sh) distinct exchange is gone.
    val plan = Dedup.shingleGroups(base, maxPostingLen = 5)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange in:\n$plan")
    // and the windows really do sit directly under the aggregate
    assert(plan.contains("Window"))
  }
}
