package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structural + planted-value invariants for the round-13 second-session
  * keys (exact values are DuckDB-oracled by the driver): q73 event
  * transition matrix, s23 pruned exact kNN.
  */
class Round13bOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q73
  test("q73 planted: transition counts, ppm probabilities, mean gaps") {
    import spark.implicits._
    // user 1: A->B (10s), B->A (30s), A->B (60s); user 2: A->A (5s);
    // user 3: a single event contributes no transition
    val ev = Seq(
      (1L, "A", 0L, 10L), (1L, "B", 10L, 11L),
      (1L, "A", 40L, 12L), (1L, "B", 100L, 13L),
      (2L, "A", 0L, 20L), (2L, "A", 5L, 21L),
      (3L, "B", 7L, 30L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Extras.markovTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("A", "A", 1L, 333333L, 5000000L),
      ("A", "B", 2L, 666666L, 35000000L),
      ("B", "A", 1L, 1000000L, 30000000L)))
  }

  test("q73 planted: equal timestamps order by event_id, not arrival") {
    import spark.implicits._
    // both events at t=0: event_id decides the sequence (B after A)
    val ev = Seq(
      (1L, "B", 0L, 2L), (1L, "A", 0L, 1L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Extras.markovTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", "B", 1L)))
  }

  // ------------------------------------------------------------- s23
  test("s23: pruned search ≡ brute force on the real (isotropic) corpus") {
    val e = Tables.embeddings(spark, d)
    val exact = Similarity.cosineTopKFrom(e, 5, 10).collect().toSeq
    val pruned = Similarity.prunedExactTopK(spark, d).collect().toSeq
    assert(pruned == exact, "triangle-inequality pruning must lose nothing")
    // bound sanity even where it can't fire: survivors never exceed cells
    val counts = Similarity.prunedExactCellCounts(e).collect()
    assert(counts.length == 5)
    counts.foreach { r =>
      val (n, probed, surv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(probed <= Similarity.N_PROBE && surv <= n)
    }
  }

  /** 16 orthogonal tight clusters, jitter confined to each cluster's own
    * 4-dim block (cross-cluster cosine exactly 0). The %31 centroid
    * sample lands one member in every cluster (31 ≡ −1 mod 16), so cells
    * are tight and the triangle bound must prune nearly everything.
    */
  private def plantedClusters = {
    import spark.implicits._
    def vec(cluster: Int, salt: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      for (dd <- 0 until 4) a(cluster * 4 + dd) = 10.0f
      a(cluster * 4 + salt % 4) += 0.01f * (salt % 7 + 1)
      a
    }
    ((0L until 5L).map(i => (i, vec(i.toInt, i.toInt + 3))) ++
      (5L until 500L).map(i => (i, vec((i % 16).toInt, i.toInt))))
      .toDF("vec_id", "embedding")
  }

  // ------------------------------------------------------------- s24
  test("s24: store round-trip ≡ brute force; planted clusters stay exact") {
    val real = Tables.embeddings(spark, d)
    val dirR = java.nio.file.Files.createTempDirectory("pidx").toString
    Similarity.writePrunedIndex(real, 5, dirR)
    assert(Similarity.prunedExactFromDir(spark, real, 5, 10, dirR)
      .collect().toSeq ==
      Similarity.cosineTopKFrom(real, 5, 10).collect().toSeq,
      "store-served pruned search ≡ brute force on the real corpus")
    val planted = plantedClusters
    val dirP = java.nio.file.Files.createTempDirectory("pidx").toString
    Similarity.writePrunedIndex(planted, 5, dirP)
    assert(Similarity.prunedExactFromDir(spark, planted, 5, 10, dirP)
      .collect().toSeq ==
      Similarity.cosineTopKFrom(planted, 5, 10).collect().toSeq,
      "store-served pruned search ≡ brute force under heavy pruning")
    // the layout is the partition-pruned shape: one cell dir per cell
    val cellDirs = new java.io.File(s"$dirP/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length == Similarity.N_CELLS)
  }

  test("s24: a crash-partial store is rebuilt, not served truncated") {
    val e = plantedClusters
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    // simulate a crash between the two table writes: vectors committed,
    // cells never written — bare Files.exists(dir) would accept this
    Similarity.writePrunedIndex(e, 5, dir)
    val cellsSuccess = java.nio.file.Paths.get(s"$dir/cells", "_SUCCESS")
    java.nio.file.Files.delete(cellsSuccess)
    assert(!Similarity.committed(s"$dir/vectors", s"$dir/cells"))
    Similarity.ensurePrunedIndex(e, 5, dir)
    assert(Similarity.committed(s"$dir/vectors", s"$dir/cells"),
      "rebuild restores both commit markers")
    assert(Similarity.prunedExactFromDir(spark, e, 5, 10, dir)
      .collect().toSeq == Similarity.cosineTopKFrom(e, 5, 10).collect().toSeq)
  }

  test("s23 planted: tight clusters prune to ~1 cell, still exact") {
    val e = plantedClusters
    val exact = Similarity.cosineTopKFrom(e, 5, 10).collect().toSeq
    val pruned = Similarity.prunedExactTopKFrom(e, 5, 10).collect().toSeq
    assert(pruned == exact, "exact under heavy pruning")
    val counts = Similarity.prunedExactCellCounts(e).collect()
    counts.foreach { r =>
      assert(r.getLong(3) <= 2,
        s"query ${r.getLong(0)}: survivors ${r.getLong(3)} — bound too loose")
    }
    assert(counts.map(_.getLong(3)).sum < counts.map(_.getLong(1)).sum / 4,
      "the bound prunes the vast majority of cells on clustered data")
  }

  // ------------------------------------------------------------- g10
  test("g10 planted: triangle+tail peels to the triangle, deeper cores empty") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4-1: 2-core = the triangle; no 3-core
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val edges = (raw ++ raw.map(e => (e._2, e._1))).toDF("src", "dst")
    val out = Graph.kcoreCensusOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (2L, 3L, 3L, true), (3L, 0L, 0L, true), (4L, 0L, 0L, true)))
  }

  test("g10 corpus: cores nest, all converged, symmetric counts") {
    val out = Graph.kcoreCensus(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 3 && out.map(_._1).toSeq == Seq(2L, 3L, 4L))
    assert(out.forall(_._4), "peeling reached its fixpoint at every k")
    // nesting: the (k+1)-core is a subgraph of the k-core
    assert(out.sliding(2).forall { case Array(a, b) =>
      b._2 <= a._2 && b._3 <= a._3 })
  }

  // ------------------------------------------------------------- q75
  test("q75 planted: the session boundary drops exactly the cross-session pair") {
    import spark.implicits._
    // A->B within session 1; 13h gap; C->D within session 2. q73 sees
    // B->C too; q75 must not.
    val h = 3600L
    val ev = Seq(
      (1L, "A", 0L, 1L), (1L, "B", 60L, 2L),
      (1L, "C", 60L + 13L * h, 3L), (1L, "D", 120L + 13L * h, 4L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val q75 = Extras.sessionTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(q75.toSeq == Seq(("A", "B", 1L), ("C", "D", 1L)))
    val q73 = Extras.markovTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(q73.contains(("B", "C")), "q73 keeps the cross-session pair")
  }

  test("q75 corpus: within-session mass never exceeds the global matrix") {
    val tot73 = Extras.markovTransitions(spark, d)
      .agg(sum("n")).collect().head.getLong(0)
    val tot75 = Extras.sessionTransitions(spark, d)
      .agg(sum("n")).collect().head.getLong(0)
    assert(tot75 <= tot73, s"$tot75 within-session vs $tot73 global")
  }

  // ------------------------------------------------------------- p27
  test("p27: lower temperature flattens the mixture monotonically") {
    val out = Curation.temperatureSweep(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    val byAlpha = out.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._3).max, rs.map(_._3).min)).toMap
    val alphas = Curation.TEMP_ALPHAS_MILLI // descending: 1000..0
    // as alpha decreases, the head share can only shrink and the tail
    // share can only grow
    alphas.sliding(2).foreach { case Seq(hi, lo) =>
      assert(byAlpha(lo)._1 <= byAlpha(hi)._1,
        s"head share must shrink: a=$lo ${byAlpha(lo)._1} vs a=$hi ${byAlpha(hi)._1}")
      assert(byAlpha(lo)._2 >= byAlpha(hi)._2,
        s"tail share must grow: a=$lo vs a=$hi")
    }
    // alpha = 0 is uniform to within integer-floor resolution
    val (mx, mn) = byAlpha(0L)
    assert(mx - mn <= 1L, s"uniform face not uniform: $mx vs $mn")
    // every alpha's shares sum to ~1e6 (floor loss < |langs|)
    out.groupBy(_._1).foreach { case (a, rs) =>
      val sum = rs.map(_._3).sum
      assert(sum <= 1000000L && sum > 1000000L - rs.length,
        s"alpha $a ppm mass: $sum")
    }
  }

  // ------------------------------------------------------------- s25
  test("s25: recall and candidate volume are monotone in nprobe") {
    val out = Similarity.nprobeSweep(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1L to Similarity.NPROBE_MAX).toSeq)
    // widening the probe can only add candidates and can only help recall
    assert(out.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._4 >= a._4 })
    assert(out.forall { case (_, cands, hits, ppm) =>
      hits <= 50 && ppm <= 1000000L && cands >= hits })
  }

  // ------------------------------------------------------------- g11
  test("g11 planted: trust decays with hop distance from the seed") {
    import spark.implicits._
    // chain seed(1)—2—4—6: packed labels s:0, c:1, s:... use raw even/odd
    // packing directly (1 odd = supplier seed; 2,4 even; 6 even)
    val raw = Seq((1L, 2L), (2L, 4L), (4L, 6L))
    val edges = (raw ++ raw.map(e => (e._2, e._1))).toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.pprTrustOn(edges, seeds).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // with FIXED bounded rounds on a path, mass oscillates between the
    // chain's two parities (converged PPR is hop-monotone; 4-round PPR is
    // only parity-monotone) — so compare SAME-parity hops: hop-1 ≫ hop-3
    assert(out("c:1") > out("c:3"),
      s"trust must decay along same-parity hops: $out")
    assert(!out.contains("s:0"), "the seed itself is excluded")
  }

  test("g11 corpus: TOPK non-seed rows, positive non-increasing trust") {
    val out = Graph.pprTrust(spark, d).collect()
    assert(out.length == 30)
    val ranks = out.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.sliding(2).forall { case Array(x, y) => x >= y })
    // seeds (nation < 5 suppliers) never appear in the expansion list
    val seedLabels = Tables.supplier(spark, d)
      .filter(col("s_nationkey") < 5)
      .select(concat(lit("s:"), col("s_suppkey").cast("string")))
      .collect().map(_.getString(0)).toSet
    assert(out.forall(r => !seedLabels.contains(r.getString(0))))
  }

  // ------------------------------------------------------------- t30
  test("t30 planted: the co-occurrence hub outranks every spoke") {
    import spark.implicits._
    // 'hub' is adjacent to eight distinct spokes; spokes only ever touch
    // the hub — a star graph, where PageRank must put the hub first
    val docs = (1 to 8).map(i => (i.toLong, s"s$i hub")).toDF("doc_id", "text")
    val out = TextOps.textrankKeywordsOf(docs).collect()
    assert(out.head.getString(0) == "hub", out.map(_.getString(0)).mkString(","))
    assert(out.head.getLong(1) > out(1).getLong(1),
      "hub rank strictly above the spokes")
    // spokes tie exactly (symmetric star) and break by word
    val spokes = out.tail.map(_.getString(0))
    assert(spokes.toSeq == spokes.sorted.toSeq)
  }

  test("t30 corpus: exactly TR_K rows, ranks positive and non-increasing") {
    val out = TextOps.textrankKeywords(spark, d).collect()
    assert(out.length == 20)
    val ranks = out.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.sliding(2).forall { case Array(x, y) => x >= y })
  }

  // ------------------------------------------------------------- q74
  test("q74: rational slope carries the OLS identity and sign discipline") {
    val out = Extras.trendRegression(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, num, den, milli) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(den > 0 || (den == 0 && n == 1),
        "nΣx² − (Σx)² is positive whenever two distinct days exist")
      if (den > 0) {
        // milli slope = trunc-toward-zero of 1000·num/den on BOTH engines
        val expect = if (num >= 0) 1000 * num / den
                     else -((1000 * -num) / den)
        assert(milli == expect, s"sign-explicit division: $milli vs $expect")
      }
    }
  }

  // ------------------------------------------------------------- p25
  test("p25: full suite x source grid; planted leaks are found per suite") {
    val out = Curation.contaminationReport(spark, d)
    val rows = out.collect()
    val nSources = Tables.documents(spark, d)
      .select("source").distinct().count()
    assert(rows.length == Curation.CONTAM_SUITES.length * nSources,
      "one dashboard cell per (suite, source), zeros included")
    // every suite finds at least its own planted leaks: one planted
    // train doc per bench doc, each sharing all its 8-grams
    val perSuite = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val nDocs = Tables.documents(spark, d).count()
    Curation.CONTAM_SUITES.foreach { m =>
      val benchCount = (0L until nDocs).count(_ % m == 0)
      assert(perSuite(m) >= benchCount,
        s"suite $m: ${perSuite(m)} contaminated < $benchCount planted")
    }
    // ppm is a proper fraction in exact ppm
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 1000000L))
  }

  test("q73 corpus: rows bounded by |types|^2, ppm rows sum to ~1 per prev") {
    val out = Extras.markovTransitions(spark, d)
    val rows = out.collect()
    assert(rows.length <= 25, "at most |types|^2 transition rows")
    // per prev_type, integer-floor ppm sums within |types| of 1e6
    val sums = out.groupBy("prev_type")
      .agg(sum("prob_ppm").as("s"), count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      val (s, k) = (r.getLong(1), r.getLong(2))
      assert(s <= 1000000L && s > 1000000L - k,
        s"floor-ppm mass for ${r.getString(0)}: $s")
    }
    // transition count conservation: sum n = total events - distinct users
    val ev = Tables.events(spark, d)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val got = rows.map(_.getLong(2)).sum
    assert(got == expected, "every adjacent pair is exactly one transition")
  }
}
