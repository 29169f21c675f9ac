package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structural + planted-value invariants for the round-13 keys (exact
  * values are DuckDB-oracled by the driver): t27 RAG chunking, t28
  * weak-supervision votes, s21 kNN-graph construction, p24 token-balanced
  * shard manifest.
  */
class Round13OpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- t27
  test("t27 planted: stride/window arithmetic and covered-tail suppression") {
    import spark.implicits._
    val w120 = (1 to 120).map(i => s"w$i").mkString(" ") // starts 0,48,96
    val w60 = (1 to 60).map(i => s"w$i").mkString(" ")   // start 48 covered
    val w70 = (1 to 70).map(i => s"w$i").mkString(" ")   // start 48 adds 65..70
    val docs = Seq(
      (1L, w120), (2L, w60), (3L, w70), (4L, "solo"), (5L, "   "))
      .toDF("doc_id", "text")
    val out = TextOps.ragChunksOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 0L, 64L), (1L, 1, 48L, 64L), (1L, 2, 96L, 24L),
      (2L, 0, 0L, 60L), // 60 <= 48 + 16: tail adds nothing, suppressed
      (3L, 0, 0L, 64L), (3L, 1, 48L, 22L),
      (4L, 0, 0L, 1L))) // whitespace-only doc 5 never chunks
  }

  test("t27 corpus: chunks tile every doc with W/S overlap accounting") {
    val docs = Tables.documents(spark, d)
    val out = TextOps.ragChunks(spark, d)
    val W = TextOps.CHUNK_W; val S = TextOps.CHUNK_S
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("chunk_tokens").as("tok_mass"),
        max("start_tok").as("last_start"), min("chunk_tokens").as("min_len"))
      .collect()
    val nDocs = docs.filter(length(trim(col("text"))) > 0).count()
    assert(perDoc.length == nDocs, "every non-empty doc chunks")
    perDoc.foreach { r =>
      val (n, mass, last) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // chunk overlap: total chunk-token mass = n_tokens + (n-1) overlaps
      // of exactly W-S tokens except a possibly-shorter final window —
      // bounded both sides
      assert(mass >= last + 1, "last chunk reaches past its own start")
      assert(n == 1 || last == (n - 1) * S, "starts are exact strides")
      assert(r.getLong(4) >= 1, "no empty chunk ever emitted")
    }
    // chunk_idx dense from 0 per doc
    val idx = out.groupBy("doc_id").agg(
      min("chunk_idx").as("lo"), max("chunk_idx").as("hi"),
      count(lit(1)).as("n")).collect()
    idx.foreach { r =>
      assert(r.getInt(1) == 0 && r.getLong(3) == r.getInt(2) + 1,
        "chunk_idx is dense 0..n-1")
    }
  }

  // ------------------------------------------------------------- t28
  test("t28 planted: each LF votes as specified and the sum-sign labels") {
    import spark.implicits._
    val long = ("the and of to " * 50).trim        // 200 toks, 699 chars
    val docs = Seq(
      // n_chars>600 (+1), sym 0 <=2% (+1), stopwords 100% (+1), uniq 4/200 (<50%, -1)
      (1L, "en", "web", long, long.length.toLong),
      // short (-1), all-symbol (-1), no stopwords (-1), uniq 1/1 (>80%, +1)
      (2L, "en", "web", "!!!???###", 9L),
      // mid length (0), low sym (+1), stop 1/25 = 4% (+1), uniq 25/25 (+1)
      (3L, "de", "web",
        (1 to 24).map(i => s"tok$i").mkString(" ") + " the", 200L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    val out = TextOps.weakLabelsOf(docs).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // doc1 score +2 -> keep (4 votes, not unanimous); doc2 score -2 -> drop;
    // doc3 score +3 -> keep with 3 unanimous non-abstain votes
    assert(out.toSet == Set(
      ("en", "keep", 1L, 2L, 4L, 0L),
      ("en", "drop", 1L, -2L, 4L, 0L),
      ("de", "keep", 1L, 3L, 3L, 1L)))
  }

  test("t28 corpus: cohorts conserve docs and vote bounds hold") {
    val out = TextOps.weakLabels(spark, d).collect()
    val nDocs = out.map(_.getLong(3)).sum
    assert(nDocs == Tables.documents(spark, d).count())
    out.foreach { r =>
      val (n, mass, cast, unan) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(math.abs(mass) <= cast && cast <= 4 * n, "vote mass bounded")
      assert(unan <= n)
      val label = r.getString(2)
      if (label == "keep") assert(mass > 0)
      if (label == "drop") assert(mass < 0)
    }
  }

  // ------------------------------------------------------------- s21
  test("s21 planted: every node links its true within-cell nearest first") {
    import spark.implicits._
    // 64 vectors with ids 0..63 -> seeds at ids 6 and 37 (vec_id%31==6),
    // two well-separated directions so residency is unambiguous
    val mk = (base: Int, i: Int) =>
      (0 until 64).map(j =>
        if (j == base) 1000000L + i * 1000L else i * 7L % 97L).toArray
    val vecs = (0 until 32).map(i => (i.toLong, mk(0, i))) ++
      (32 until 64).map(i => (i.toLong, mk(40, i)))
    val corpus = vecs.toDF("vec_id", "qv")
    val out = Similarity.knnGraphFrom(corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc.forall(_._2.length <= Similarity.KNN_GRAPH_K))
    // ranks are dense 1..k per src
    bySrc.foreach { case (_, edges) =>
      assert(edges.map(_._2).sorted.toSeq == (1 to edges.length).toSeq)
    }
    // cell purity: all of a node's edges carry one cell, and nodes from
    // the two planted directions never mix (ids 0..31 vs 32..63 — seeds 6
    // and 37 sit one in each)
    out.foreach { case (src, _, dst, _) =>
      assert((src < 32) == (dst < 32), s"cross-cluster edge $src -> $dst")
    }
  }

  test("s21 corpus: bounded degree, no self-loops, symmetric cell residency") {
    val out = Similarity.knnGraph(spark, d).collect()
    assert(out.nonEmpty)
    val k = Similarity.KNN_GRAPH_K
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(2), "no self loop")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= k)
      val c = r.getDouble(4)
      assert(c >= -1.0000001 && c <= 1.0000001, s"cosine in range: $c")
    }
    // each (src) block's cosines are non-increasing in rank
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  // ------------------------------------------------------------- s22
  test("s22 corpus: delta edges link batch-only srcs into base-only dsts") {
    val out = Similarity.incrementalKnn(spark, d).collect()
    assert(out.nonEmpty)
    val (m, r) = (Similarity.KNN_BATCH_MOD, Similarity.KNN_BATCH_RES)
    out.foreach { row =>
      assert(row.getLong(0) % m == r, "src must come from the delta batch")
      assert(row.getLong(2) % m != r, "dst must be an indexed base vector")
      assert(row.getInt(1) >= 1 && row.getInt(1) <= Similarity.KNN_GRAPH_K)
    }
    // ranks dense per src, cosines non-increasing
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
      val c = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(c.zip(c.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  // ------------------------------------------------------------- g09
  test("g09 corpus: communities partition residency; labels stay in seed range") {
    val out = Similarity.knnCommunities(spark, d).collect()
    assert(out.nonEmpty)
    val labels = out.map(_.getLong(0))
    assert(labels.forall(l => l == -1L || (l >= 1 && l <= Similarity.N_CELLS)),
      "labels are seed cells or the explicit unreached bucket")
    val emb = Tables.embeddings(spark, d)
    assert(out.map(_.getLong(1)).sum == emb.count(),
      "every vector lands in exactly one community")
    val idSum = out.map(_.getLong(3)).sum
    assert(idSum == emb.agg(sum("vec_id")).collect()(0).getLong(0))
    // n_cells measures cross-cell spill: at least one community must span
    // >1 cell, otherwise the 2-probe edges added nothing over residency
    assert(out.exists(r => r.getLong(0) >= 0 && r.getLong(2) > 1),
      "no community spans cells — propagation degenerated to residency")
  }

  // ------------------------------------------------------------- d24
  test("d24 corpus: chunk-grain accounting conserves and bounds") {
    val out = Dedup.chunkDedup(spark, d).collect()
    assert(out.nonEmpty)
    val totalChunks = out.map(_.getLong(1)).sum
    assert(totalChunks == TextOps.ragChunks(spark, d).count(),
      "per-lang chunk masses partition the t27 chunk set")
    out.foreach { r =>
      val (n, u, dup, mx, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(u + dup == n, "unique + duplicated = total")
      assert(mx >= 1 && mx <= n)
      assert(ppm >= 0 && ppm < 1000000L)
      assert((dup == 0) == (ppm == 0))
    }
  }

  test("d24 planted: an identical paragraph across docs counts as dup chunk mass") {
    import spark.implicits._
    val para = (1 to 64).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "en", para), (2L, "en", para),
      (3L, "en", (1 to 64).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val rows = TextOps.ragChunkRows(docs, Seq("lang")).collect()
    val byHash = rows.groupBy(_.getLong(5)) // doc_id, lang, idx, start, len, hash
    assert(byHash.size == 2, "two distinct chunk identities")
    assert(byHash.values.map(_.length).toSeq.sorted == Seq(1, 2),
      "the shared paragraph collapses to one identity with multiplicity 2")
  }

  // ------------------------------------------------------------- t29
  test("t29 planted: a separable weak-labeled corpus distills diagonally") {
    import spark.implicits._
    // keep docs: long, clean, stopword-bearing, high-distinct text drawn
    // from a 40-word class vocabulary (all four LFs vote +1); drop docs:
    // short symbol strings from a disjoint 8-token vocabulary (3 LFs
    // vote -1, LF4 +1). Vocabularies are class-pure, so the held-out
    // quarter must distill (mostly) diagonally.
    val keepPool = (0 until 40).map(i => f"keyword$i%02d")
    val dropPool = Seq("!!!", "###", "%%%", "@@@", "^^^", "&&&", "***", "|||")
    val docs = ((0 until 80).map { i =>
      val words = (0 until 100).map(j => keepPool((i * 3 + j * 5) % 40)) :+
        "the" :+ "the" :+ "the" :+ "the" :+ "the"
      val txt = words.mkString(" ")
      (i.toLong, "en", "web", txt, txt.length.toLong)
    } ++ (1000 until 1080).map { i =>
      val txt = (0 until 10).map(j => dropPool((i + j) % 8)).mkString(" ")
      (i.toLong, "en", "web", txt, txt.length.toLong)
    }).toDF("doc_id", "lang", "source", "text", "n_chars")
    val out = TextOps.nbQualityOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val total = out.values.sum
    val diag = out.getOrElse(("keep", "keep"), 0L) +
      out.getOrElse(("drop", "drop"), 0L)
    assert(total > 0, "held-out quarter is non-empty")
    assert(diag * 10 >= total * 9,
      s"separable corpus should distill >=90% diagonally: $out")
    assert(out.contains(("keep", "keep")) && out.contains(("drop", "drop")),
      s"both classes must appear and self-agree: $out")
  }

  // ------------------------------------------------------------- m09
  test("m09: the real GIF sequence codec round-trips every sampled frame") {
    val out = Multimodal.gifFrames(spark, d).collect()
    val docs = Tables.documents(spark, d).count()
    val sampled = (0 until Multimodal.GIF_FRAMES by Multimodal.FRAME_STRIDE)
    assert(out.length == docs * sampled.length,
      "every doc emits exactly the sampled frames")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == sampled.map(_.toLong),
        "frame indices are the stride positions")
    }
    out.foreach { r =>
      assert(r.getLong(2) == Multimodal.GIF_FRAMES,
        "container reports all frames even though only samples decode")
      assert(r.getLong(4) >= 0 && r.getLong(5) <= 255, "palette range")
      assert(r.getLong(3) >= r.getLong(5), "sum >= max for 64 pixels")
    }
  }

  // ------------------------------------------------------------- p24
  test("p24 planted: boustrophedon deal balances a known frame exactly") {
    import spark.implicits._
    // 16 docs, token counts 16,15,...,1 (pure letter words — "w1" would
    // bpeish-count as TWO tokens) -> ranks are id order; serpentine over
    // 8 shards pairs (r, 15-r): every shard gets exactly 17 tokens
    val docs = (1 to 16).map { i =>
      (i.toLong, Seq.fill(17 - i)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Curation.shardManifestOf(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == Curation.N_SHARDS)
    assert(out.forall(_._2 == 2L), "two docs per shard")
    assert(out.forall(_._3 == 17L), "perfect token balance by pairing")
  }

  test("p24 corpus: manifest conserves corpus mass and stays balanced") {
    val docs = Tables.documents(spark, d)
    val out = Curation.shardManifest(spark, d).collect()
    assert(out.length == Curation.N_SHARDS)
    val nDocs = out.map(_.getLong(1)).sum
    assert(nDocs == docs.count(), "every doc lands in exactly one shard")
    val masses = out.map(_.getLong(2))
    // serpentine dealing bounds shard skew by one doc's tokens per pass:
    // the max-min spread can never exceed the largest doc's token count
    val maxDoc = out.map(_.getLong(3)).max
    assert(masses.max - masses.min <= maxDoc,
      s"balance within one max-doc: spread ${masses.max - masses.min} vs $maxDoc")
    val idSum = out.map(_.getLong(5)).sum
    val trueIdSum = docs.agg(sum("doc_id")).collect()(0).getLong(0)
    assert(idSum == trueIdSum, "id checksum partitions the corpus")
  }
}
