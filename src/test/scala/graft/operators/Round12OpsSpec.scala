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

  test("t25 planted: NB learns a separable corpus to a perfect diagonal") {
    import spark.implicits._
    // two "languages" with disjoint vocabularies; texts vary by a numeric
    // token so the content-hash split lands docs on both sides of the
    // train/test cut — membership computed with the same hash the
    // operator uses, so the expectation is exact, not probabilistic
    val docs = (0 until 40).map { i =>
      val (lang, text) =
        if (i % 2 == 0) ("aa", s"alpha beta alpha gamma n$i")
        else ("bb", s"zeta eta zeta theta n$i")
      (i.toLong, lang, text)
    }
    val nTest = docs.count { case (_, _, t) =>
      java.lang.Math.floorMod(graft.expressions.Md5Hash.hash60(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 4L) == 0L }
    assert(nTest >= 4, "fixture must place docs in the held-out split")
    val out = TextOps.nbLangidOf(docs.toDF("doc_id", "lang", "text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // separable vocabulary -> every held-out doc classified correctly
    assert(out.forall { case (t, p, _) => t == p },
      s"off-diagonal confusion on separable data: ${out.mkString(",")}")
    assert(out.map(_._3).sum == nTest)
  }

  test("t25 corpus: held-out docs conserve and predictions stay in the label set") {
    val out = TextOps.nbLangid(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    val langs = Tables.documents(spark, d).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(out.forall { case (t, p, n) =>
      langs.contains(t) && langs.contains(p) && n >= 1 })
    // every held-out doc lands in exactly one confusion cell
    val nTest = Tables.documents(spark, d).collect().count { r =>
      java.lang.Math.floorMod(
        graft.expressions.Md5Hash.hash60(r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8)), 4L) == 0L }
    assert(out.map(_._3).sum == nTest)
  }

  test("s17: populations conserve, imbalance ppm sums to ~16e6, sse ordered") {
    val out = Similarity.ivfDrift(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == Similarity.N_CELLS)
    assert(out.map(_._2).sum == Tables.embeddings(spark, d).count())
    val ppm = out.map(_._3).sum
    // sum of floor(n_i*16e6/N) over 16 cells: within 16 of exact 16e6
    assert(ppm <= 16000000L && ppm > 16000000L - 16)
    out.foreach { case (_, n, _, mean, mx) =>
      assert(n >= 1 && mean >= 0 && mx >= mean,
        "max per-vector error bounds the mean")
    }
  }

  test("s18: silhouette values live in [-1000, 1000] and populations match s17") {
    val out = Similarity.silhouette(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == Similarity.N_CELLS)
    out.foreach { case (_, n, mean, mn) =>
      assert(n >= 1)
      assert(mean >= -1000 && mean <= 1000)
      assert(mn <= mean, "the worst point bounds the mean from below")
    }
    // same assignment as s17 -> identical per-cell populations
    val drift = Similarity.ivfDrift(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out.forall { case (c, n, _, _) => drift(c) == n })
  }

  test("g08: modularity contributions are exact and Q is bounded by 1") {
    val out = Graph.modularity(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val mDir = out.map(_._4).sum // sum of per-community degree mass = 2m
    // every symmetric edge lands in exactly one src-label bucket; intra
    // mass is even (counted from both endpoints) and bounded by degree
    out.foreach { case (_, n, intra, degSum, contrib) =>
      assert(n >= 1 && intra >= 0 && intra * 2 <= degSum * 2)
      assert(contrib == mDir * intra * 2 - degSum * degSum)
    }
    // Q = sum(contrib)/M^2 must satisfy Q <= 1 (and > -1)
    val qNum = out.map(_._5).sum
    assert(qNum <= mDir * mDir && qNum > -(mDir * mDir))
  }

  test("indexHealthReport: the amortized faces equal the three registered keys row-for-row") {
    val (drift, sil, quota) = Similarity.indexHealthReport(spark, d)
    assert(drift.collect().toSeq == Similarity.ivfDrift(spark, d).collect().toSeq)
    assert(sil.collect().toSeq == Similarity.silhouette(spark, d).collect().toSeq)
    assert(quota.collect().toSeq ==
      Similarity.clusterQuotaSample(spark, d).collect().toSeq)
  }

  test("g07 planted: a chain of strong ties undercuts the weak direct edge") {
    import spark.implicits._
    // 0-1 direct but weak (1000); 0-3-1 two strong hops (10+10);
    // 5-6 is a disconnected component and must not appear
    val ew = Seq((0L, 1L, 1000L), (0L, 3L, 10L), (3L, 1L, 10L),
      (5L, 6L, 7L)).toDF("src", "dst", "w")
    val out = Graph.ssspFrom(ew, seed = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 20L), (3L, 10L)),
      s"weighted relaxation must prefer the strong-tie chain: ${out.mkString(",")}")
  }

  test("g07 corpus: seed at zero, distances bounded by 6 weak hops, reach matches g04") {
    val out = Graph.sssp(spark, d).collect().map(r => (r.getLong(0), r.getLong(2)))
    val dist = out.toMap
    assert(dist(0L) == 0L)
    assert(out.forall(_._2 <= 6000L), "6 rounds x max weight 1000")
    // weighted reachability within 6 relaxation rounds must cover at
    // least the nodes BFS reaches in 6 hops minus none: same edge set,
    // so the reached sets are identical
    val bfsReached = Graph.bfsReach(spark, d).collect()
      .filter(_.getInt(0) >= 0).map(_.getLong(1)).sum
    assert(out.length == bfsReached)
  }

  test("p20: triplets pair non-roots with roots and draw negatives outside the component") {
    val out = Curation.contrastivePairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty, "the corpus has near-dup components at every SF")
    val comp = Curation.leakageSafeSplitAssign(spark, d)
      .select("doc_id", "source", "component").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    out.foreach { case (anchor, pos, neg, src) =>
      assert(comp(anchor)._2 == comp(pos)._2, "positive shares the component")
      assert(pos < anchor, "the positive is the component root (min id)")
      assert(comp(neg)._2 != comp(anchor)._2,
        "a negative must never be a paraphrase of the anchor")
      assert(comp(neg)._1 == src && comp(anchor)._1 == src,
        "negatives are style-matched: same source as the anchor")
    }
    // one triplet per non-root member, each anchor exactly once
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("s19: fused ranks are contiguous, every candidate came from a retriever, scores bounded") {
    val out = Similarity.rrfFusion(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        "fused ranks are contiguous from 1")
    }
    out.foreach { case (_, _, _, rrf, inE, inA) =>
      assert(Set(0L, 1L).contains(inE) && Set(0L, 1L).contains(inA))
      assert(inE + inA >= 1, "a candidate must come from at least one retriever")
      // single contribution in [1e9/80, 1e9/61]; both-lists in [2e9/80, 2e9/61]
      val (lo, hi) = (1000000000L / 80, 1000000000L / 61)
      if (inE + inA == 1) assert(rrf >= lo && rrf <= hi)
      else assert(rrf >= 2 * lo && rrf <= 2 * hi)
    }
    // consensus dominance: within a query, any both-lists candidate at the
    // best possible single rank outranks every single-list candidate's floor
    assert(out.filter(r => r._5 + r._6 == 2).forall(_._4 > 1000000000L / 61))
  }

  test("q71: features replay each user's history with zero same-day leakage") {
    val rows = Advanced.pitFeatures(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // sequential replay per user: prior_days counts exactly the earlier
    // active days; prior_events/prior_cents are strictly/weakly monotone
    // (every active day adds >= 1 event, cents are non-negative); the
    // recency gap matches the day deltas. Same-day leakage would break
    // the strict prior_events < next-row inequality on single-event days
    rows.groupBy(_._1).foreach { case (_, hist) =>
      val inOrder = hist.sortBy(_._2)
      var prevDay = -1L
      inOrder.zipWithIndex.foreach { case ((_, day, priorDays, _, _, gap, _), i) =>
        assert(priorDays == i, "prior_days must count strictly earlier days")
        assert(gap == (if (prevDay < 0) -1L else day - prevDay))
        prevDay = day
      }
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 > a._4, "each active day adds at least one prior event")
          assert(b._5 >= a._5, "spend never decreases")
        case _ =>
      }
    }
    // first-day rows carry the all-zero cold-start feature vector
    val firsts = rows.groupBy(_._1).values.map(_.minBy(_._2))
    assert(firsts.forall(r => r._3 == 0 && r._4 == 0 && r._5 == 0 && r._6 == -1))
  }

  test("q72: KLL quantiles hit known ranks on a planted ramp, and halves union to the whole") {
    import spark.implicits._
    import graft.expressions.KllSketch
    // 1..10000: true p50 = 5000, p90 = 9000; k=800 bound ~0.4%, assert 4%
    val vals = (1 to 10000).map(_.toLong)
    val whole = vals.toDF("v").agg(KllSketch.sketch(col("v")).as("sk"))
      .select(KllSketch.quantile(col("sk"), 0.5).as("p50"),
        KllSketch.quantile(col("sk"), 0.9).as("p90")).collect().head
    assert(math.abs(whole.getLong(0) - 5000) <= 400, s"p50=${whole.getLong(0)}")
    assert(math.abs(whole.getLong(1) - 9000) <= 400, s"p90=${whole.getLong(1)}")
    // mergeability: per-half sketches unioned estimate the SAME ramp
    val unioned = vals.map(v => (v % 2, v)).toDF("half", "v")
      .groupBy("half").agg(KllSketch.sketch(col("v")).as("sk"))
      .agg(KllSketch.union(col("sk")).as("sk"))
      .select(KllSketch.quantile(col("sk"), 0.5).as("p50")).collect().head
    assert(math.abs(unioned.getLong(0) - 5000) <= 400,
      s"union p50=${unioned.getLong(0)}")
  }

  test("q72 corpus: one row per event type plus the union total, all contracts true") {
    val out = Extras.kllQuantileRollup(spark, d).collect()
    val types = Tables.events(spark, d).select("event_type").distinct().count()
    assert(out.length == types + 1)
    assert(out.forall(r => r.getBoolean(3) && r.getBoolean(4)),
      "every rank-accuracy contract holds")
    assert(out.map(_.getLong(2)).max == Tables.events(spark, d).count(),
      "the total row counts every event")
  }

  test("m07: ImageIO round-trip recovers the exact planted gray ramp") {
    val out = Multimodal.imageioRoundtrip(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val ramp = (0 until 64).map(i => (id * 31 + i) % 256)
      assert(r.getLong(1) == 8 && r.getLong(2) == 8,
        "dimensions must come from the real decoder")
      assert(r.getLong(3) == ramp.sum)
      assert(r.getLong(4) == ramp.min && r.getLong(5) == ramp.max)
    }
  }

  test("t26 planted: class runs segment punctuated text the way whitespace cannot") {
    import spark.implicits._
    // "it's 3.5 bottles!!" -> ws 3; alpha runs: it, s, bottles (3);
    // digits: 3, 5 (2); punct: ', ., !! (3) -> pretok 8
    val docs = Seq((1L, "en", "it's 3.5 bottles!!")).toDF("doc_id", "lang", "text")
    val out = TextOps.pretokenCompareOf(docs).collect().head
    assert(out.getLong(2) == 3 && out.getLong(3) == 3 && out.getLong(4) == 2
      && out.getLong(5) == 3 && out.getLong(6) == 8)
    assert(out.getLong(7) == 8L * 1000000 / 3)
  }

  test("p21: dedup shrinks masses one-sidedly and budget shifts conserve") {
    val out = Curation.dedupAwareMixture(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(out.nonEmpty)
    out.foreach { case (_, rd, ud, rt, ut, ppm, _, _, _) =>
      assert(ud <= rd && ut <= rt, "collapsing duplicates only shrinks")
      assert(ud >= 1, "every source keeps at least one doc")
      assert(ppm == (rt - ut) * 1000000 / rt)
    }
    // proportional allocation: both target columns sum to ~budget (floor
    // slack < |sources|), and shifts sum to ~0 (same slack)
    val (tRaw, tDedup) = (out.map(_._7).sum, out.map(_._8).sum)
    val budget = Curation.MIX_BUDGET_TOKENS
    assert(tRaw <= budget && tRaw > budget - out.length)
    assert(tDedup <= budget && tDedup > budget - out.length)
    assert(math.abs(out.map(_._9).sum) < out.length)
    // the corpus has exact dups (d01 proves it): somebody must lose budget
    assert(out.map(_._5).max > 0, "duplicate inflation exists in this corpus")
  }

  test("m08: WAV round-trip recovers the exact planted PCM ramp through a real codec") {
    val out = Multimodal.wavRoundtrip(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val ramp = (0 until 64).map(i => (id * 7 + i * 13) % 65536 - 32768)
      assert(r.getLong(1) == 64 && r.getLong(2) == 8000,
        "frame count and rate must come from the decoded stream/format")
      assert(r.getLong(3) == ramp.sum)
      assert(r.getLong(4) == ramp.min && r.getLong(5) == ramp.max)
    }
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
