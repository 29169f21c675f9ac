package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("C8 cleanText: char map, gate, truncate (clean.go:9-102)") {
    val rows = Seq(
      "curly “quotes” & em—dash… here",
      "tiny",                     // < 5 chars => gated to ""
      ("long " * 40).trim,        // > 80 chars => truncated with ellipsis
      "it’s a ‘test’ with | pipe", // curly singles + pipe DELETED (not folded)
      "uüber™ café") // ü->u, TM deleted, é deleted
      .toDF("t").select(TextFunctions.cleanText(col("t"), 80)).collect()
      .map(_.getString(0))
    assert(rows(0) == "curly \"quotes\" and em-dash... here")
    assert(rows(1) == "")
    assert(rows(2).length == 80 && rows(2).endsWith("..."))
    assert(rows(3) == "its a test with  pipe")
    assert(rows(4) == "uuber caf")
  }

  test("CleanTextFold kernel equals the declarative Column chain on arbitrary inputs") {
    import org.scalacheck.{Gen, rng}
    // every char class the kernel special-cases, drawn from the kernel's
    // OWN tables (1:1 folds, deletions incl. astral pairs) plus the
    // &/ellipsis expansions, newlines, spaces, and plain words
    import graft.expressions.CleanTextKernel
    def cpStrings(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toSeq
    }
    val special = cpStrings(CleanTextKernel.ONE2ONE_FROM) ++
      cpStrings(CleanTextKernel.DELETE_CHARS) ++
      Seq("&", "\u2026", "\n", " ", "word", "ab", "\n\n")
    val gen = Gen.listOfN(250,
      Gen.chooseNum(0, 24).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(special.toIndexedSeq)).map(_.mkString)))
    val samples = (Seq("", "tiny", "exactly5", ("long " * 40).trim) ++
      gen.apply(Gen.Parameters.default, rng.Seed(7L)).get).distinct
    for (maxLen <- Seq(5, 10, 80)) {
      val rows = samples.toDF("t")
        .select(TextFunctions.cleanText(col("t"), maxLen).as("k"),
          TextFunctions.cleanTextColumnForm(col("t"), maxLen).as("c"))
        .collect()
      rows.zip(samples).foreach { case (r, s) =>
        assert(r.getString(0) == r.getString(1),
          s"maxLen=$maxLen diverged on ${s.take(40).replace("\n", "\\n")}: " +
            s"kernel=${r.getString(0)} column=${r.getString(1)}")
      }
    }
    // interpreted path too (no codegen)
    samples.take(30).foreach { s =>
      val got = graft.expressions.CleanTextFold(
        org.apache.spark.sql.catalyst.expressions.Literal(s), 80).eval(null).toString
      val want = Seq(s).toDF("t")
        .select(TextFunctions.cleanTextColumnForm(col("t"), 80))
        .collect().head.getString(0)
      assert(got == want, s"interpreted diverged on ${s.take(40)}")
    }
  }

  test("t13 gopher rules: pass is the conjunction of its reported measures; both classes occur") {
    val rows = TextOps.gopherRules(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (nw, wl, al, sh, pass) =>
      val expect = nw >= TextOps.G_MIN_WORDS &&
        wl >= TextOps.G_MEAN_WLEN_MIN && wl <= TextOps.G_MEAN_WLEN_MAX &&
        al >= TextOps.G_MIN_ALPHA_PERMILLE && sh >= TextOps.G_MIN_STOP_HITS
      assert(pass == (if (expect) 1 else 0), s"($nw,$wl,$al,$sh) -> $pass")
    }
    // the rules discriminate on this corpus — a gate that passes (or
    // fails) everything is a mis-tuned gate
    assert(rows.exists(_._5 == 1) && rows.exists(_._5 == 0))
  }

  test("C8 newline-join quirk: appends whole sections while under maxLen (clean.go:14-24)") {
    // maxLen 10: starts with "aaaa" (4 < 10), appends " bbbb" (9 < 10),
    // appends " cccc" (overshoots to 14 — the reference checks BEFORE
    // appending), then stops; 14 > 10 => truncate to 7 + "..."
    val r = Seq("aaaa\nbbbb\ncccc\ndddd").toDF("t")
      .select(TextFunctions.cleanText(col("t"), 10)).collect().head.getString(0)
    assert(r == "aaaa bb...")
  }

  test("C9 cleanString strips non-alphanumerics (clean.go:105-111)") {
    val r = Seq("a-b_c 1!2@3#").toDF("t")
      .select(TextFunctions.cleanString(col("t"))).collect().head.getString(0)
    assert(r == "abc123")
  }

  test("tokenCount / bpeishTokenCount") {
    val r = Seq("hello world, 42 ok!").toDF("t")
      .select(TextFunctions.tokenCount(col("t")),
        TextFunctions.bpeishTokenCount(col("t"))).collect().head
    assert(r.getInt(0) == 4)
    // hello | world | , | 42 | ok | !  => 6
    assert(r.getInt(1) == 6)
  }

  test("langId picks marker-heavy language; und on no hits") {
    val r = Seq("the cat and the dog is here",
      "der hund und die katze ist da",
      "xyzzy plugh").toDF("t")
      .select(TextFunctions.langId(col("t"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint: formatting-noise-insensitive, content-sensitive") {
    val r = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(r(0) == r(1)) // case + whitespace folded
    assert(r(1) != r(2)) // content change changes the fingerprint
  }

  test("wordNgrams produces n-2 trigrams; short docs collapse to one") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 3)).collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq("a b"))
  }

  test("t11 typicality: common-token docs outscore rare-token docs") {
    val out = TextOps.typicality(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500)
    // every doc tokenizes to >0 tokens; scores are positive (every token
    // occurs at least once, so tf/N >= 1/N > 0)
    assert(out.forall { case (_, n, t) => n > 0 && t > 0 })
    // the corpus vocabulary is ~30 very common words, so scores must be
    // well above the 1-occurrence floor (1e9/N) for typical docs
    val n_total = out.map(_._2).sum
    val floor1 = 1.0e9 / n_total
    assert(out.count(_._3 > 100 * floor1) > 400, "scores look degenerate")
  }

  test("t10 pii: planted email/phone/IP are counted and redacted") {
    val out = TextOps.piiRedaction(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // planting by residue: doc_id % 7 -> email, % 11 -> phone, % 13 -> IP
    out.foreach { case (id, em, ph, ip) =>
      assert(em == (if (id % 7 == 0) 1 else 0), s"doc $id emails")
      assert(ph == (if (id % 11 == 0) 1 else 0), s"doc $id phones")
      assert(ip == (if (id % 13 == 0) 1 else 0), s"doc $id ips")
    }
    // doc 0 has all three residues: every marker must be redacted
    val red = Seq((0L, "x y z reach user0@example.com call 555-867-5309 host 10.0.0.42"))
      .toDF("doc_id", "t")
      .select(regexp_replace(regexp_replace(regexp_replace(col("t"),
        TextOps.emailRe, "<EMAIL>"),
        TextOps.phoneRe, "<PHONE>"),
        TextOps.ipRe, "<IP>")).collect().head.getString(0)
    assert(red == "x y z reach <EMAIL> call <PHONE> host <IP>")
  }
}

/** Near-dup detection on planted duplicates: a corpus of distinct docs plus
  * pairs that differ by one token must be caught by MinHash LSH and SimHash,
  * and not flood with false positives.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
  private def doc(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private lazy val corpus = {
    val base = (0 until 40).map(i => (i.toLong, doc(60)))
    // planted near-dups: copy doc i with one token changed
    val nd = Seq(100L -> (base(3)._2.replaceFirst("\\w+", "CHANGED")),
      101L -> (base(7)._2 + " extra"))
    // exact dup
    val xd = Seq(200L -> base(5)._2)
    (base ++ nd ++ xd).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
  }

  private def withDocs[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("minhash LSH finds planted near-dups and the exact dup") {
    withDocs { dir =>
      val pairs = Dedup.minhashLshPairs(spark, dir, threshold = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((3L, 100L)), s"missing planted near-dup (3,100): $pairs")
      assert(pairs.contains((7L, 101L)), s"missing planted near-dup (7,101): $pairs")
      assert(pairs.contains((5L, 200L)), s"missing exact dup (5,200): $pairs")
      // no flood: well under all-pairs (43*42/2 = 903)
      assert(pairs.size < 20, s"too many candidate pairs: ${pairs.size}")
    }
  }

  test("minhash est_jaccard is 1.0 on the exact dup") {
    withDocs { dir =>
      val est = Dedup.minhashLshPairs(spark, dir, threshold = 0.5)
        .filter(col("id_a") === 5 && col("id_b") === 200)
        .select("est_jaccard").collect().head.getDouble(0)
      assert(est == 1.0)
    }
  }

  test("simhash: aggregate formulation equals the per-row expression") {
    withDocs { dir =>
      val agg = Dedup.simhashFingerprints(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val perRow = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), Dedup.simhash(col("text")).as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(agg == perRow)
    }
  }

  test("simhash: exact dup identical; near-dup within small hamming distance") {
    withDocs { dir =>
      val fp = Dedup.simhashFingerprints(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fp(5L) == fp(200L))
      val ham = java.lang.Long.bitCount(fp(3L) ^ fp(100L))
      assert(ham <= 16, s"near-dup hamming distance too large: $ham")
      // distinct random docs should differ broadly on average
      val hamFar = java.lang.Long.bitCount(fp(0L) ^ fp(1L))
      assert(hamFar > 8)
    }
  }

  test("d11 cross-source matrix: every planted mirror pair detected, nothing else") {
    val out = Dedup.crossSourceDupMatrix(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    // planted mirrors are the ONLY cross-source copies: each pair is
    // (srcK, srcK_mirror) and counts exactly the planted hashes
    out.foreach { case (a, b, n) =>
      assert(b == a + "_mirror", s"unexpected pair ($a, $b)")
      assert(n >= 1)
    }
    val totalShared = out.map(_._3).sum
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(totalShared == (0L until docs).count(_ % Dedup.MIRROR_EVERY == 0))
  }

  test("d12 containment: a quoted doc is flagged inside its container, low-overlap pairs are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "A B C D E F G H"),                       // contained
      (2L, "en", "A B C D E F G H X Y Z W"),               // container (quotes 1)
      (3L, "en", "A B C P Q R S T U V")                    // shares a prefix only
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.containmentPairsOn(docs, Dedup.MAX_POSTING_LEN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1 (6 trigrams) fully inside doc 2; doc 3 shares only "A B C"
    assert(out.toSeq == Seq((1L, 2L, 6L, 6L, 1000L)))

    // the registered query's planted quoters are all detected as containers
    val planted = Dedup.containmentPairs(spark, "/root/testdata/sf0.001")
      .filter(col("container_id") >= Dedup.QUOTE_ID_OFFSET)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val docsN = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val expected = (0L until docsN).count(_ % Dedup.QUOTE_EVERY == 0)
    assert(planted.count { case (c, q, _) => q == c + Dedup.QUOTE_ID_OFFSET } == expected)
    // a quoted original is ~fully covered
    planted.filter { case (c, q, _) => q == c + Dedup.QUOTE_ID_OFFSET }
      .foreach { case (_, _, permille) => assert(permille >= 990L) }
  }

  test("d10 paragraph dedup: shared chunks flagged, first occurrence survives") {
    val stats = Dedup.paragraphDedupStats(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.length == 500)
    // every doc chunks into ceil(n_tokens/8) paragraphs, none empty
    assert(stats.forall { case (_, n, dup, _) => n > 0 && dup >= 0 && dup <= n })
    // a duplicate instance is never charged to the FIRST occurrence: the
    // minimum doc_id in the corpus owning any given paragraph keeps it,
    // so total dups < total paras and doc 0's first chunk is never a dup
    val total = stats.map(_._2).sum
    val dups = stats.map(_._3).sum
    assert(dups < total)
    // permille arithmetic is the exact floor over integers
    stats.foreach { case (_, n, dup, pm) =>
      assert(pm == math.floor(1000.0 * dup / n).toLong)
    }
  }

  test("cross-operator consistency: d04 MinHash estimates track d03 exact Jaccard") {
    val d = "/root/testdata/sf0.01"
    val exact = Dedup.ngramJaccardPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(2).toDouble / r.getLong(3)).toMap
    val est = Dedup.minhashLshPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val both = exact.keySet intersect est.keySet
    assert(both.nonEmpty, "no pair found by both d03 and d04")
    // 32-hash MinHash: sd(est) = sqrt(J(1-J)/32) <= 0.09; 0.35 is ~4 sigma
    both.foreach { k =>
      assert(math.abs(exact(k) - est(k)) <= 0.35,
        s"pair $k: exact ${exact(k)} vs minhash ${est(k)}")
    }
  }

  test("d13 substring coverage: full copies score 1000, one shared window scores exactly k, unique text 0") {
    val w = (1 to 20).map(i => s"w$i").mkString(" ")           // 20 tokens
    val sharedRun = (5 to 12).map(i => s"w$i").mkString(" ")   // one 8-token window of A
    val docs = Seq(
      (1L, w),                                    // full copy pair with 2
      (2L, w),
      (3L, s"x1 x2 x3 $sharedRun y1"),            // 12 tokens, 8 shared
      (4L, (1 to 15).map(i => s"z$i").mkString(" "))) // unique
      .toDF("doc_id", "text")
    val out = Dedup.substringDupStatsOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // identical docs: every token covered, permille exactly 1000
    assert(out(1L) == ((20L, 20L, 1000L)) && out(2L) == ((20L, 20L, 1000L)))
    // doc 3 shares exactly one rolling window with doc 1/2 (positions 3..10)
    assert(out(3L)._2 == Dedup.SUBSTR_TOKENS.toLong)
    // ...and that window also marks 8 of doc 1's tokens — but doc 1 is
    // already fully covered by its full copy, so no double counting
    assert(out(4L) == ((15L, 0L, 0L)))
  }

  test("t12 boilerplate removes ALL instances of a viral chunk, unlike d10's keep-first") {
    val d = "/root/testdata/sf0.01"
    // expected flags recomputed independently from the shared chunk table
    val chunks = Dedup.paraChunkTable(spark.read.parquet(s"$d/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val viral = chunks.groupBy(_._2).filter(_._2.length >= TextOps.BOILER_MIN).keySet
    val expBoiler = chunks.filter(c => viral(c._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val out = TextOps.boilerplateRemoval(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viral.nonEmpty, "fixture must carry organic boilerplate")
    out.foreach { case (id, n) => assert(n == expBoiler.getOrElse(id, 0L)) }
    // EVERY instance of a viral chunk is counted: total flags equal the
    // full group sizes (d10 would spare one per group)
    val totalFlagged = out.values.sum
    val groupTotal = chunks.count(c => viral(c._2)).toLong
    assert(totalFlagged == groupTotal && totalFlagged > viral.size)
  }
}

/** ANN recall vs brute force on the real embeddings table. */
class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ann lsh results are a subset of same-bucket candidates with decent recall@10") {
    val brute = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = Similarity.annLshTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every ANN hit must be a true corpus vector; recall averaged over queries
    val recalls = brute.keys.toSeq.sorted.map { q =>
      val b = brute(q); val a = ann.getOrElse(q, Set.empty)
      a.intersect(b).size.toDouble / b.size
    }
    val avg = recalls.sum / recalls.size
    // random-hyperplane bucketing on 8 planes: recall well above chance
    assert(avg >= 0.2, s"avg recall@10 too low: $avg ($recalls)")
  }

  test("ann ivf recall@10 above chance; probes only N_PROBE/N_CELLS of the corpus") {
    val brute = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.annIvfTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      val b = brute(q); val a = ivf.getOrElse(q, Set.empty)
      a.intersect(b).size.toDouble / b.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg ivf recall@10 too low: $avg ($recalls)")
  }

  test("brute-force cosine self-consistency: top1 of a cluster member shares its label often") {
    val df = Similarity.cosineTopK(spark, sfDir, nQueries = 5, k = 1)
    assert(df.count() == 5)
    assert(df.filter(col("cosine") > -1.0 && col("cosine") < 1.0000001).count() == 5)
  }

  test("s04 semantic dedup: planted near-dups are dropped, cells partition the corpus") {
    val cells = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(cells.map(_._1).toSeq == (1 to Similarity.N_CELLS))
    // cells partition corpus + planted copies exactly
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val nPlanted = (0L until nVecs).count(_ % Similarity.PLANT_EVERY == 0)
    assert(cells.map(_._2).sum == nVecs + nPlanted)
    // at least one planted near-dup lands in its original's cell and is dropped
    assert(cells.map(_._3).sum > 0, "semantic dedup dropped nothing")
    // never drop more than the cluster holds
    cells.foreach { case (_, n, drp) => assert(drp < n) }
  }

  test("s05 k-means step: cells partition the corpus, means move toward members") {
    val out = Similarity.kmeansStep(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to Similarity.N_CELLS))
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.map(_.getLong(1)).sum == nVecs)
    out.foreach { r =>
      val shift = r.getDouble(2)
      // a refined centroid stays correlated with its seed but must move
      // (shift strictly below 1) unless the cell is a single point
      assert(shift > 0.0 && shift <= 1.0, s"cell ${r.getInt(0)} shift $shift")
      // checked projection folds the array to a 16-hex-char fingerprint
      // (the driver comparator can't sort ArrayType cells)
      assert(r.getString(3).matches("[0-9a-f]{16}"))
    }
    // the step must actually refine something: average shift below 0.999
    val avg = out.map(_.getDouble(2)).sum / out.length
    assert(avg < 0.999, s"centroids did not move: avg shift $avg")
    // the raw-array library form still exposes full 64-dim centroids
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val raw = Similarity.kmeansStepFrom(corpus, Similarity.seedCentroids(corpus))
    assert(raw.head().getSeq[Long](3).length == 64)
  }

  test("s07 SQ8 ranking stays close to the exact s01 ranking (recall@10 >= 0.8)") {
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val sq8 = Similarity.sq8TopK(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(exact.keySet == sq8.keySet && exact.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect sq8(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"SQ8 recall@10 degraded to $mean (per-query $recalls)")
  }

  test("s03 scale path is executable: cell partitions the written index; a probe prunes") {
    // the s03/s04 design claim — "cell is a write-time partition key at
    // scale" — as running code: write the assigned corpus partitioned by
    // cell, probe one cell, and the scan must PRUNE partitions (read
    // only that cell's files), not filter rows post-scan
    val dir = java.nio.file.Files.createTempDirectory("ivfpart").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val assigned = Similarity.assignToCells(corpus, Similarity.seedCentroids(corpus))
    assigned.write.partitionBy("cell").mode("overwrite").parquet(dir)
    val expected = assigned.filter(col("cell") === 2).count()
    assert(expected > 0, "cell 2 empty — pick a different probe cell")
    val probed = spark.read.parquet(dir).filter(col("cell") === 2)
    assert(probed.count() == expected)
    val p = probed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") && p.contains("cell"),
      s"probe did not prune partitions:\n${p.take(800)}")
  }

  test("s09 scale path is executable: cell-partitioned code table, pruned probe, same ranking") {
    // the composed IVF-PQ claim — "cell and codes are write-time columns;
    // a probe reads only its cells' partitions and scores via the
    // broadcast LUT" — as the library's persisted-index API
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val corpus = v.filter(col("vec_id") >= 5)
    Similarity.writeIvfPqIndex(corpus, dir)
    // query time: probe cells as literals (≤ nQueries·N_PROBE of them)
    val cents = spark.read.parquet(s"$dir/centroids")
    val probeCells = Similarity.assignToCells(
        queries.withColumnRenamed("query_id", "vec_id"), cents,
        nBest = Similarity.N_PROBE)
      .select("cell").distinct().collect().map(_.getInt(0))
    assert(probeCells.length < Similarity.N_CELLS,
      s"probe touches all cells — pruning untestable")
    // the probe's code scan prunes partitions (the probe itself
    // checkpoints its result, detaching the scan — pin it directly)
    val codeScan = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
    val scanLine = codeScan.queryExecution.sparkPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("cell"),
      s"probe did not prune partitions:\n$scanLine")
    // the persisted probe equals the registered composed query
    val got = Similarity.probeIvfPqIndex(spark, dir, queries)
    assert(got.collect().toSeq ==
      Similarity.ivfPqTopK(spark, sfDir).collect().toSeq)
    graft.operators.Dedup.release(got)
  }

  test("s09: probeIvfPqIndex strands no intermediate checkpoints") {
    // the probeMinhashIndex hygiene, for the ANN probe: intermediates are
    // released, the returned frame holds exactly one checkpoint for the
    // caller. Delta-with-retries: a genuine leak survives every attempt.
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-leak").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    Similarity.writeIvfPqIndex(v.filter(col("vec_id") >= 5), dir)
    val clean = (1 to 5).exists { _ =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val got = Similarity.probeIvfPqIndex(spark, dir, queries)
      got.collect()
      graft.operators.Dedup.release(got)
      val persisted = spark.sparkContext.getPersistentRDDs
      val added = persisted.keySet -- before
      added.foreach(id => persisted.get(id).foreach(_.unpersist(true)))
      added.isEmpty
    }
    assert(clean, "probeIvfPqIndex leaked checkpointed RDDs")
  }

  test("s09: appendToIvfPqIndex encodes under the frozen model — merged probe == from-scratch") {
    // daily-ingest for ANN: write day-1, append day-2 (no re-clustering),
    // probe == an index built from scratch over day-1 ∪ day-2. The delta
    // is chosen ABOVE every seed/codebook id, so the from-scratch build
    // derives the identical model and the comparison isolates the append
    // path itself.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ivfpq-append").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val corpus = v.filter(col("vec_id") >= 5)
    // seeds are the first N_CELLS ids with vec_id % 31 == 6 (6 … 471);
    // the codebook is the first PQ_K ids overall (5 … 20) — a delta of
    // high non-seed ids leaves both model inputs inside the base
    val isDelta = col("vec_id") > 400 && col("vec_id") % 31 =!= 6
    val delta = corpus.filter(isDelta)
    val base = corpus.filter(!isDelta)
    assert(Similarity.seedCentroids(base).collect().toSeq ==
      Similarity.seedCentroids(corpus).collect().toSeq,
      "delta split touches the seed set — comparison would conflate models")
    assert(Similarity.pqCodebook(base).collect().toSeq ==
      Similarity.pqCodebook(corpus).collect().toSeq,
      "delta split touches the codebook — comparison would conflate models")
    Similarity.writeIvfPqIndex(base, s"$dir/inc")
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/inc"))
      .iterator()
    import scala.jdk.CollectionConverters._
    val beforeFiles = before.asScala.filter(f =>
        java.nio.file.Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
      .map(f => f -> java.nio.file.Files.size(f)).toMap
    Similarity.appendToIvfPqIndex(delta, s"$dir/inc")
    val afterFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/inc"))
      .iterator().asScala.filter(f =>
        java.nio.file.Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
      .map(f => f -> java.nio.file.Files.size(f)).toMap
    assert(beforeFiles.forall { case (f, sz) => afterFiles.get(f).contains(sz) },
      "append rewrote or removed an existing index file")
    assert(afterFiles.size > beforeFiles.size, "append added no files")
    Similarity.writeIvfPqIndex(corpus, s"$dir/scratch")
    val merged = Similarity.probeIvfPqIndex(spark, s"$dir/inc", queries)
    val scratch = Similarity.probeIvfPqIndex(spark, s"$dir/scratch", queries)
    val mergedRows = merged.collect().toSeq
    assert(mergedRows == scratch.collect().toSeq)
    assert(mergedRows.nonEmpty)
    // the appended VECTORS are searchable too: the refined probe re-ranks
    // against the merged flat store and equals the from-scratch refine
    val mergedRef = Similarity.probeIvfPqIndexRefined(spark, s"$dir/inc", queries)
    val scratchRef = Similarity.probeIvfPqIndexRefined(spark, s"$dir/scratch", queries)
    val mergedRefRows = mergedRef.collect().toSeq
    assert(mergedRefRows == scratchRef.collect().toSeq,
      "append left the refine store inconsistent with a from-scratch build")
    Seq(mergedRef, scratchRef).foreach(graft.operators.Dedup.release)
    // appended vectors are genuinely searchable: some delta id must rank
    // (the delta is ~1/5 of the corpus across all cells)
    assert(mergedRows.exists(r => r.getLong(2) > 400 && r.getLong(2) % 31 != 6),
      s"no appended vector ranked: $mergedRows")
    Seq(merged, scratch).foreach(graft.operators.Dedup.release)
    // compaction folds the append debris to one file per cell without
    // touching the frozen model or any ranking
    graft.operators.Similarity.compactIvfPqIndex(spark, s"$dir/inc")
    import scala.jdk.CollectionConverters._
    Seq("codes", "vectors").foreach { t =>
      val perCell = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/inc/$t"))
        .iterator().asScala.filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.toString.endsWith(".parquet")).toSeq
        .groupBy(_.getParent.getFileName.toString).view.mapValues(_.size).toMap
      assert(perCell.nonEmpty && perCell.values.forall(_ == 1),
        s"compaction left multi-file cells in $t: $perCell")
    }
    val compacted = Similarity.probeIvfPqIndex(spark, s"$dir/inc", queries)
    assert(compacted.collect().toSeq == mergedRows,
      "compaction changed the ANN ranking")
    graft.operators.Dedup.release(compacted)
    val compactedRef = Similarity.probeIvfPqIndexRefined(spark, s"$dir/inc", queries)
    assert(compactedRef.collect().toSeq == mergedRefRows,
      "compaction changed the refined ranking")
    graft.operators.Dedup.release(compactedRef)
  }

  test("s11 at rest: refined probe equals the registered re-rank, prunes the vectors scan, strands nothing") {
    // the IndexRefineFlat claim — "the refine reads flat vectors from
    // only the probed cells and broadcasts the shortlist" — against the
    // persisted index, pinned three ways: ranking identity with the
    // registered s11 query, PartitionFilters on the vectors scan, and
    // the one-surviving-checkpoint hygiene
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-refine").toString
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    Similarity.writeIvfPqIndex(v.filter(col("vec_id") >= 5), dir)
    // the refine's vector read prunes to the probed cells (the probe
    // checkpoints its result, detaching the scan — pin it directly)
    val cents = spark.read.parquet(s"$dir/centroids")
    val probeCells = Similarity.assignToCells(
        queries.withColumnRenamed("query_id", "vec_id"), cents,
        nBest = Similarity.N_PROBE)
      .select("cell").distinct().collect().map(_.getInt(0))
    assert(probeCells.length < Similarity.N_CELLS,
      "probe touches all cells — pruning untestable")
    val vecScan = spark.read.parquet(s"$dir/vectors")
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
    val scanLine = vecScan.queryExecution.sparkPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("cell"),
      s"refine did not prune the vectors scan:\n$scanLine")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Similarity.probeIvfPqIndexRefined(spark, dir, queries)
    assert(got.collect().toSeq ==
      Similarity.ivfPqRerank(spark, sfDir).collect().toSeq,
      "refined probe ranks differently from the registered s11 query")
    graft.operators.Dedup.release(got)
    val persisted = spark.sparkContext.getPersistentRDDs
    val added = persisted.keySet -- before
    added.foreach(id => persisted.get(id).foreach(_.unpersist(true)))
    assert(added.isEmpty, "probeIvfPqIndexRefined leaked checkpointed RDDs")
  }

  test("d16: persisted-index probe equals the registered join form; planted cross-batch dups found") {
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    Dedup.writeMinhashIndex(docs.filter(expr("doc_id % 5 != 0")), dir)
    val probed = Dedup.probeMinhashIndex(spark, dir,
      docs.filter(expr("doc_id % 5 = 0")))
    val registered = Dedup.incrementalNearDup(spark, d)
    assert(probed.collect().toSeq == registered.collect().toSeq)
    // the fixture plants cross-batch near-dups — the probe must find them
    assert(registered.filter(col("is_dup") === 1).count() > 0)
  }

  test("d16: the delta probe PRUNES band partitions — only the delta's buckets are read") {
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("mhidx-prune").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    Dedup.writeMinhashIndex(docs.filter(expr("doc_id % 100 != 0")), dir)
    // a TINY delta (the daily-ingest shape): its band keys hash into a
    // strict subset of the 64 bucket partitions
    val delta = docs.filter(expr("doc_id % 100 = 0"))
    val deltaBuckets = Dedup.bandedKeys(Dedup.minhashSignatures(delta))
      .select(pmod(xxhash64(col("band_key")), lit(Dedup.INDEX_BUCKETS)).cast("int"))
      .distinct().count()
    assert(deltaBuckets < Dedup.INDEX_BUCKETS,
      s"delta covers all $deltaBuckets buckets — pruning untestable")
    // assert pruning on the exact scans the probe constructs (the probe
    // itself checkpoints its candidate frame, which detaches the scans
    // from the returned plan — so pin them directly, pre-adaptive, where
    // FileScan nodes print in full)
    def pinPruned(df: org.apache.spark.sql.DataFrame, part: String): Unit = {
      val scans = df.queryExecution.sparkPlan.toString
      val scanLine = scans.linesIterator.find(_.contains("FileScan"))
        .getOrElse(fail(s"no scan in plan:\n${scans.take(1200)}"))
      assert(scanLine.contains("PartitionFilters: [") &&
        !scanLine.contains("PartitionFilters: []") && scanLine.contains(part),
        s"scan did not prune on $part:\n$scanLine")
    }
    val someBuckets = Seq(0, 1, 2).map(Integer.valueOf)
    pinPruned(spark.read.parquet(s"$dir/bands")
      .filter(col("bkt").isin(someBuckets: _*)), "bkt")
    pinPruned(spark.read.parquet(s"$dir/sigs")
      .filter(col("sbkt").isin(someBuckets: _*)), "sbkt")
    // and the full pruned probe returns exactly what the un-persisted
    // join form computes on the same split (not fixture-dependent)
    val deltaSigs = Dedup.minhashSignatures(delta)
    val baseSigs = Dedup.minhashSignatures(docs.filter(expr("doc_id % 100 != 0")))
    val expected = Dedup.probeSignatures(deltaSigs,
      Dedup.bandedKeys(baseSigs), baseSigs).collect().toSeq
    assert(Dedup.probeMinhashIndex(spark, dir, delta).collect().toSeq == expected)
  }

  test("d17: bloom-prefiltered exact-index probe equals the registered join; bloom prunes pre-shuffle") {
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("exidx").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val base = docs.filter(expr("doc_id % 5 != 0"))
    Dedup.writeExactIndex(base, dir)
    // delta: the %5 slice + planted exact copies of base docs (the
    // registered query's construction)
    val delta = docs.filter(expr("doc_id % 5 = 0")).select("doc_id", "text")
      .unionAll(base.filter(expr(s"doc_id % ${Dedup.EXACT_PLANT_STRIDE} = 1"))
        .select((col("doc_id") + Dedup.EXACT_PLANT_OFFSET).as("doc_id"), col("text")))
    val probed = Dedup.probeExactIndex(spark, dir, delta)
    assert(probed.collect().toSeq ==
      Dedup.incrementalExact(spark, d).collect().toSeq)
    // the bloom is a codegen prefilter: most non-dup delta rows die
    // before any join or exchange (fpp 1% on this corpus ⇒ survivors
    // ≈ the planted dups, far below the delta size)
    val bf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "bloom.bin"))
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnShim
    import org.apache.spark.sql.types.BinaryType
    val survivors = delta.select(md5(col("text")).as("h"))
      .filter(ColumnShim.column(BloomFilterMightContain(
        Literal(bf, BinaryType),
        ColumnShim.expression(xxhash64(col("h")))))).count()
    val dups = probed.count()
    val total = delta.count()
    assert(survivors >= dups && survivors < total / 2,
      s"bloom pruned nothing: $survivors of $total survive ($dups true dups)")
    // the pruned index scan pins PartitionFilters on the hash bucket
    val scan = spark.read.parquet(s"$dir/hashes")
      .filter(col("hbkt").isin(Seq(0, 1).map(Integer.valueOf): _*))
      .queryExecution.sparkPlan.toString
    val scanLine = scan.linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("hbkt"),
      s"index scan did not prune:\n$scanLine")
  }

  test("d18: composed probe equals the registered exact-then-near; exact-killed rows reach no band") {
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("composed").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val base = docs.filter(expr("doc_id % 5 != 0"))
    Dedup.writeExactIndex(base, s"$dir/ex")
    Dedup.writeMinhashIndex(base, s"$dir/mh")
    val delta = docs.filter(expr("doc_id % 5 = 0")).select("doc_id", "text")
      .unionAll(base.filter(expr(s"doc_id % ${Dedup.EXACT_PLANT_STRIDE} = 1"))
        .select((col("doc_id") + Dedup.EXACT_PLANT_OFFSET).as("doc_id"), col("text")))
    val probed = Dedup.probeExactThenNear(spark, s"$dir/ex", s"$dir/mh", delta)
    val registered = Dedup.exactThenNear(spark, d)
    assert(probed.collect().toSeq == registered.collect().toSeq)
    // the exact tier provably fires (every plant is a byte-copy of base)
    val exactIds = registered.filter(col("tier") === "exact")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactIds.nonEmpty && exactIds.exists(_ >= Dedup.EXACT_PLANT_OFFSET))
    // the composition's point: an exact-killed row generates ZERO band
    // candidates — the near tier's signature input excludes it entirely
    val index = base.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("match_id"))
    val survivors = delta.withColumn("h", md5(col("text")))
      .join(index, Seq("h"), "left_anti").select("doc_id", "text")
    val survivorBands = Dedup.bandedKeys(Dedup.minhashSignatures(survivors))
    assert(survivorBands.filter(col("doc_id").isin(exactIds.toSeq: _*)).count() == 0)
    // and no near verdict exists for an exact-matched doc
    assert(registered.filter(col("tier") === "near" &&
      col("doc_id").isin(exactIds.toSeq: _*)).count() == 0)
    Dedup.release(probed)
  }

  test("ANN at production k: 256 cells / 256 codes stay broadcast-safe; probe prune stays literal-bounded") {
    // N_CELLS=16 / PQ_K=16 are fixture-scaled; a production vector store
    // runs k ≈ 256+. This pins, QUANTITATIVELY at k=256 on sf0.1, the
    // structural claims the ANN family's 100 TB story rests on: the
    // centroid/codebook builds stay bounded (TakeOrderedAndProject, never
    // a corpus window), their frames stay far under the broadcast
    // threshold, the cell layout partitions cleanly at 256 dirs, and a
    // probe still prunes to its literal cells.
    import java.nio.file.Files
    import org.apache.spark.sql.execution.window.WindowExec
    val K = 256
    val d = "/root/testdata/sf0.1"
    val all = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val corpus = all.filter(col("vec_id") >= 5)
    // centroid build: bounded even at production k (the %31 sample is
    // fixture-thin, so sample every 2nd id to reach 256 candidates)
    val cents = Similarity.seedCentroids(corpus, nCells = K, stride = 2L, residue = 0L)
    assert(cents.queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"))
    assert(cents.count() == K)
    // broadcast-safety is arithmetic, not hope: k × 64 dims × 8 bytes
    assert(K.toLong * 64 * 8 < 8L * 1024 * 1024)
    // assignment: centroids broadcast; every window partitions by vec_id
    val assign = Similarity.assignToCells(corpus, cents)
    val ap = assign.queryExecution.sparkPlan
    // pre-EnsureRequirements plan: the broadcast shows as the BNLJ itself
    assert(ap.toString.contains("BroadcastNestedLoopJoin"), ap.toString.take(1500))
    // the only empty-partition window allowed is the centroid rank, which
    // sits on the 256-row TakeOrderedAndProject bound (the census rule)
    assert(ap.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        !w.child.exists {
          case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
          case _: org.apache.spark.sql.execution.GlobalLimitExec => true
          case _: org.apache.spark.sql.execution.LocalLimitExec => true
          case _ => false
        } => w
    }.isEmpty, "corpus-proportional unpartitioned window in the assignment plan")
    // write-time cell layout at 256 cells; a probe prunes to its literals
    val dir = Files.createTempDirectory("ivf256").toString
    assign.select("vec_id", "cell").write.partitionBy("cell").parquet(s"$dir/cells")
    val probeCells = Seq(3, 77, 201).map(Integer.valueOf)
    val scan = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(probeCells: _*))
    val scanLine = scan.queryExecution.sparkPlan.toString
      .linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("cell"),
      s"probe scan did not prune:\n$scanLine")
    assert(scan.count() ==
      assign.filter(col("cell").isin(probeCells: _*)).count())
    // PQ at k=256: codebook bounded; LUT = nQueries·M·k rows and is the
    // BROADCAST side of the scoring join
    val queries = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val cb = Similarity.pqCodebook(corpus, k = K)
    assert(cb.queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"))
    assert(cb.count() == K)
    val lut = Similarity.pqLut(queries, cb)
    assert(lut.count() == 5L * Similarity.PQ_M * K)
    val scoring = Similarity.pqEncode(corpus, cb).join(broadcast(lut),
      col("m") === col("lm") && col("code") === col("lj"))
    assert(scoring.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "ADC scoring join did not broadcast the LUT")
  }

  // ---- shared by the d16/d17 append tests: the byte-identical-files
  // invariant and the three-way day split. day-3 plants a byte-copy of a
  // DAY-2 doc (id + APPEND_PLANT_OFFSET): its match is findable only if
  // the appended day-2 entries are live in the merged index. day3 is
  // checkpointed — each test releases it.
  private val APPEND_PLANT_OFFSET = 20000000L
  private def parquetListing(p: String): Map[java.nio.file.Path, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        f.toString.endsWith(".parquet"))
      .map(f => f -> java.nio.file.Files.size(f)).toMap
  }
  private def daySplit(docs: org.apache.spark.sql.DataFrame): (
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val day1 = docs.filter(expr("doc_id % 3 = 1"))
    val day2 = docs.filter(expr("doc_id % 3 = 2")).select("doc_id", "text")
    val day3 = docs.filter(expr("doc_id % 3 = 0")).select("doc_id", "text")
      .unionAll(day2.orderBy("doc_id").limit(1)
        .select((col("doc_id") + APPEND_PLANT_OFFSET).as("doc_id"), col("text")))
      .localCheckpoint(true)
    (day1, day2, day3)
  }

  test("d16: appendToMinhashIndex absorbs a delta — merged probe == from-scratch; no existing file rewritten") {
    // the full daily-ingest cycle: write day-1, probe+append day-2,
    // probe day-3 against the merged index. Merged must equal an index
    // built from scratch over day-1 ∪ day-2, and the append must be
    // delta-proportional: every pre-append file survives byte-identical
    // (parquet append only ADDS files under the delta's partitions).
    import java.nio.file.Files
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, day3) = daySplit(docs)
    val dir = Files.createTempDirectory("mhappend").toString
    Dedup.writeMinhashIndex(day1, s"$dir/inc")
    val before = parquetListing(s"$dir/inc")
    // day-2 probes (the daily verdict), then is absorbed
    Dedup.release(Dedup.probeMinhashIndex(spark, s"$dir/inc", day2))
    Dedup.appendToMinhashIndex(day2, s"$dir/inc")
    val after = parquetListing(s"$dir/inc")
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "append rewrote or removed an existing index file")
    assert(after.size > before.size, "append added no files")
    // merged probe == from-scratch probe over day-1 ∪ day-2
    Dedup.writeMinhashIndex(docs.filter(expr("doc_id % 3 != 0")), s"$dir/scratch")
    val merged = Dedup.probeMinhashIndex(spark, s"$dir/inc", day3)
    val scratch = Dedup.probeMinhashIndex(spark, s"$dir/scratch", day3)
    val mergedRows = merged.collect().toSeq
    assert(mergedRows == scratch.collect().toSeq)
    // the planted day-2 copy is found via the APPENDED signatures
    assert(mergedRows.exists(r =>
      r.getLong(0) >= APPEND_PLANT_OFFSET && r.getInt(4) == 1),
      s"planted day-2 copy not matched: $mergedRows")
    // torn-append safety: the writer lands sigs BEFORE bands, so the
    // worst crash leaves ORPHAN signatures (no band rows). Orphans are
    // never probed — the band join is what creates candidates — so
    // verdicts must be byte-identical to the untorn index
    val orphan = day2.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"))
    Dedup.minhashSignatures(orphan)
      .withColumn("sbkt",
        pmod(col("doc_id"), lit(Dedup.INDEX_BUCKETS.toLong)).cast("int"))
      .write.mode("append").partitionBy("sbkt").parquet(s"$dir/inc/sigs")
    val afterTorn = Dedup.probeMinhashIndex(spark, s"$dir/inc", day3)
    assert(afterTorn.collect().toSeq == mergedRows,
      "orphan signatures changed probe verdicts")
    Seq(merged, scratch, day3, afterTorn).foreach(Dedup.release)
  }

  test("d17: appendToExactIndex absorbs a delta — merged probe == from-scratch; bloom union is live") {
    import java.nio.file.Files
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, day3) = daySplit(docs)
    val dir = Files.createTempDirectory("exappend").toString
    // NON-default bloom parameters: the append must pick them up from the
    // index's own manifest (a caller-side default would build a
    // bit-incompatible delta filter)
    Dedup.writeExactIndex(day1, s"$dir/inc", expectedKeys = 2000000L, fpp = 0.02)
    val day2Verdict = Dedup.probeExactIndex(spark, s"$dir/inc", day2)
    // organic corpus has no exact dups: day-2 is all-new, append it whole
    assert(day2Verdict.count() == 0)
    Dedup.release(day2Verdict)
    val before = parquetListing(s"$dir/inc/hashes")
    Dedup.appendToExactIndex(day2, s"$dir/inc")
    val after = parquetListing(s"$dir/inc/hashes")
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "append rewrote or removed an existing index file")
    assert(after.size > before.size, "append added no files")
    Dedup.writeExactIndex(docs.filter(expr("doc_id % 3 != 0")), s"$dir/scratch")
    val merged = Dedup.probeExactIndex(spark, s"$dir/inc", day3)
    val scratch = Dedup.probeExactIndex(spark, s"$dir/scratch", day3)
    val mergedRows = merged.collect().toSeq
    assert(mergedRows == scratch.collect().toSeq)
    // the planted day-2 copy passes the MERGED bloom and hash-joins to
    // its day-2 keeper — proof the append reached both tiers of the index
    assert(mergedRows.exists(_.getLong(0) >= APPEND_PLANT_OFFSET),
      s"planted day-2 copy not matched: $mergedRows")
    // an empty append is a no-op, not a crash
    Dedup.appendToExactIndex(day2.filter(lit(false)), s"$dir/inc")
    Seq(merged, scratch, day3).foreach(Dedup.release)
  }

  private def filesPerBucket(path: String): Map[String, Int] =
    parquetListing(path).keys.toSeq
      .groupBy(_.getParent.getFileName.toString).view.mapValues(_.size).toMap

  test("d17: compactExactIndex folds file debris to one file per bucket; probe identical; bloom re-sized") {
    // after a season of appends every bucket partition holds
    // one-file-per-append (plus one-file-per-write-task) debris;
    // compaction folds each bucket to ONE file, rebuilds the bloom at
    // the manifest fpp over the ACTUAL key set, and must not change a
    // single probe verdict
    import java.nio.file.{Files, Paths}
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, day3) = daySplit(docs)
    val dir = Files.createTempDirectory("excompact").toString
    Dedup.writeExactIndex(day1, s"$dir/inc", expectedKeys = 2000000L, fpp = 0.02)
    Dedup.appendToExactIndex(day2, s"$dir/inc")
    val before = Dedup.probeExactIndex(spark, s"$dir/inc", day3)
    val beforeRows = before.collect().toSeq
    Dedup.release(before)
    assert(filesPerBucket(s"$dir/inc/hashes").values.exists(_ > 1),
      "no multi-file bucket — compaction untestable")
    // a stale __compact from a crashed prior run is reconciled, not tripped over
    Files.createDirectories(Paths.get(s"$dir/inc/hashes__compact"))
    Files.write(Paths.get(s"$dir/inc/hashes__compact/junk"), Array[Byte](1))
    Dedup.compactExactIndex(spark, s"$dir/inc")
    val bucketFiles = filesPerBucket(s"$dir/inc/hashes")
    assert(bucketFiles.nonEmpty && bucketFiles.values.forall(_ == 1),
      s"compaction left multi-file buckets: $bucketFiles")
    assert(!Files.exists(Paths.get(s"$dir/inc/hashes__compact")) &&
      !Files.exists(Paths.get(s"$dir/inc/hashes__old")),
      "compaction left swap debris")
    val after = Dedup.probeExactIndex(spark, s"$dir/inc", day3)
    assert(after.collect().toSeq == beforeRows, "compaction changed probe verdicts")
    Dedup.release(after)
    // the manifest now records the actual key count at the original fpp —
    // future appends size their delta blooms against reality
    val meta = new String(Files.readAllBytes(
      Paths.get(s"$dir/inc/bloom.meta")), "UTF-8").split(",")
    assert(meta(0).toLong == spark.read.parquet(s"$dir/inc/hashes").count(),
      s"manifest keys ${meta(0)} != on-disk key count")
    assert(meta(1).toDouble == 0.02, "compaction changed the manifest fpp")
    // the cycle continues: a post-compaction append + probe still works
    val day4 = day3.filter(col("doc_id") < 100)
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))
    Dedup.appendToExactIndex(day4, s"$dir/inc")
    val reprobe = Dedup.probeExactIndex(spark, s"$dir/inc",
      day4.select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    assert(reprobe.count() == day4.count(),
      "post-compaction append not probe-visible")
    Seq(reprobe, day3).foreach(Dedup.release)
  }

  test("d16: compactMinhashIndex folds both bucketed tables; probe identical") {
    import java.nio.file.{Files, Paths}
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, day3) = daySplit(docs)
    val dir = Files.createTempDirectory("mhcompact").toString
    Dedup.writeMinhashIndex(day1, s"$dir/inc")
    Dedup.appendToMinhashIndex(day2, s"$dir/inc")
    val before = Dedup.probeMinhashIndex(spark, s"$dir/inc", day3)
    val beforeRows = before.collect().toSeq
    Dedup.release(before)
    assert(filesPerBucket(s"$dir/inc/bands").values.exists(_ > 1),
      "no multi-file band bucket — compaction untestable")
    Dedup.compactMinhashIndex(spark, s"$dir/inc")
    Seq(s"$dir/inc/sigs", s"$dir/inc/bands").foreach { t =>
      val counts = filesPerBucket(t)
      assert(counts.nonEmpty && counts.values.forall(_ == 1),
        s"compaction left multi-file buckets in $t: $counts")
      assert(!Files.exists(Paths.get(t + "__compact")) &&
        !Files.exists(Paths.get(t + "__old")), s"swap debris at $t")
    }
    val after = Dedup.probeMinhashIndex(spark, s"$dir/inc", day3)
    assert(after.collect().toSeq == beforeRows, "compaction changed probe verdicts")
    Seq(after, day3).foreach(Dedup.release)
  }

  test("index writers rebuild cleanly over an existing directory (the retrain path)") {
    // all three writers drop the table whose staleness would pair
    // silently with fresh artifacts (bands / codes) before writing, and
    // overwrite the rest — a rebuild must fully replace content, and a
    // probe against the rebuilt index must see ONLY the new corpus
    import java.nio.file.Files
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, _) = daySplit(docs)
    val dir = Files.createTempDirectory("rebuild").toString
    // exact: rebuild over day2; a day1 copy must no longer match
    Dedup.writeExactIndex(day1, s"$dir/ex")
    Dedup.writeExactIndex(day2, s"$dir/ex")
    val day1Copy = day1.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
    val day2Copy = day2.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
    val exOld = Dedup.probeExactIndex(spark, s"$dir/ex", day1Copy)
    val exNew = Dedup.probeExactIndex(spark, s"$dir/ex", day2Copy)
    assert(exOld.count() == 0, "stale exact-index content survived a rebuild")
    assert(exNew.count() == 1, "rebuilt exact index misses its own corpus")
    Seq(exOld, exNew).foreach(Dedup.release)
    // minhash: after a rebuild over day2, both tables hold ONLY day2 ids
    Dedup.writeMinhashIndex(day1, s"$dir/mh")
    Dedup.writeMinhashIndex(day2, s"$dir/mh")
    assert(spark.read.parquet(s"$dir/mh/bands")
      .filter(expr("doc_id % 3 != 2")).count() == 0,
      "stale band rows survived a rebuild")
    assert(spark.read.parquet(s"$dir/mh/sigs")
      .filter(expr("doc_id % 3 != 2")).count() == 0,
      "stale signature rows survived a rebuild")
    // ivf-pq: rebuild over the full corpus equals a fresh-dir build
    val v = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val corpus = v.filter(col("vec_id") >= 5)
    Similarity.writeIvfPqIndex(corpus.filter(col("vec_id") < 250), s"$dir/ann")
    Similarity.writeIvfPqIndex(corpus, s"$dir/ann")
    assert(spark.read.parquet(s"$dir/ann/codes").select("vec_id").distinct()
      .count() == corpus.count(), "rebuilt code table has stale or missing ids")
    assert(spark.read.parquet(s"$dir/ann/vectors").select("vec_id").distinct()
      .count() == corpus.count(), "rebuilt vectors table has stale or missing ids")
    val rebuilt = Similarity.probeIvfPqIndex(spark, s"$dir/ann", queries)
    assert(rebuilt.collect().toSeq ==
      Similarity.ivfPqTopK(spark, d).collect().toSeq,
      "rebuilt index ranks differently from the registered query")
    Dedup.release(rebuilt)
  }

  test("torn exact rebuild is loud; rebuild migrates an old-layout index and stamps last") {
    import java.nio.file.{Files, Paths}
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val (day1, day2, _) = daySplit(docs)
    val dir = Files.createTempDirectory("torn").toString
    Dedup.writeExactIndex(day1, s"$dir/ex")
    // the rebuild's torn window: the stale hash table is dropped BEFORE
    // any new artifact lands (either stale pairing — old bloom/new
    // hashes or new bloom/old hashes — mis-verdicts silently), so a
    // crash inside the window leaves bloom artifacts with no hash table,
    // and a probe must fail LOUDLY on the missing path, never report
    // "unique"
    Dedup.deleteTreeIfExists(Paths.get(s"$dir/ex", "hashes"))
    val delta = day1.orderBy("doc_id").limit(1).select("doc_id", "text")
    intercept[Exception] {
      Dedup.probeExactIndex(spark, s"$dir/ex", delta).count()
    }
    // an index stamped by an OLDER build refuses probes (layout test),
    // but a REBUILD over it must succeed — rebuild IS the migration path
    // — and must leave the new stamp, written AFTER the tables so a torn
    // migration keeps refusing instead of blessing old tables
    Dedup.writeExactIndex(day1, s"$dir/ex")
    Files.write(Paths.get(s"$dir/ex", "index.meta"),
      "buckets=7,from=an-older-build".getBytes("UTF-8"))
    Dedup.writeExactIndex(day2, s"$dir/ex")
    assert(new String(Files.readAllBytes(Paths.get(s"$dir/ex", "index.meta")),
      "UTF-8") == Dedup.exactLayout, "rebuild did not re-stamp the layout")
    val day2Copy = day2.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
    val probed = Dedup.probeExactIndex(spark, s"$dir/ex", day2Copy)
    assert(probed.count() == 1, "migrated index misses its own corpus")
    Dedup.release(probed)
  }

  test("s11 re-rank recovers recall over the raw ADC ranking; refine joins broadcast") {
    import org.apache.spark.sql.expressions.Window
    val k = 10
    // exact squared-L2 ground truth, computed independently of the
    // operators under test (the metric ADC approximates)
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sq"), col("vec_id"))
    val exact = v.filter(col("vec_id") >= 5).crossJoin(broadcast(q))
      .withColumn("sq",
        Similarity.qdot(col("quv"), col("quv")) +
          Similarity.qdot(col("qv"), col("qv")) -
          lit(2L) * Similarity.qdot(col("quv"), col("qv")))
      .withColumn("r", row_number().over(w)).filter(col("r") <= k)
      .select("query_id", "vec_id")
    def hitsOf(topk: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      exact.join(topk.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
        .groupBy("query_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val adcHits = hitsOf(Similarity.ivfPqTopK(spark, sfDir))
    val rerank = Similarity.ivfPqRerank(spark, sfDir)
    val rrHits = hitsOf(rerank)
    // s10 agrees with the independent ground truth on the ADC hits
    val s10 = Similarity.ivfPqRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s10 == (0L until 5L).map(q => q -> adcHits(q)).toMap, s"$s10 vs $adcHits")
    // refinement never loses a hit (the true neighbor only has to be in
    // the top-C, not at its exact ADC rank) and recovers some on this
    // corpus (deterministic fixture: 7 -> 14 of 50)
    (0L until 5L).foreach(q =>
      assert(rrHits(q) >= adcHits(q), s"query $q: ${rrHits(q)} < ${adcHits(q)}"))
    assert(rrHits.values.sum > adcHits.values.sum,
      s"re-rank recovered nothing: $rrHits vs $adcHits")
    // the re-ranked list is drawn from the ADC shortlist, nowhere else
    val shortlist = Similarity.ivfPqTopK(spark, sfDir, 5, Similarity.RERANK_C)
      .select("query_id", "vec_id")
    assert(rerank.select("query_id", "vec_id")
      .join(shortlist, Seq("query_id", "vec_id"), "left_anti").isEmpty,
      "re-rank emitted a vector outside the ADC shortlist")
    // plan pin: the ranked shortlist (the plan's only per-query window
    // below a join — the ADC path's windows partition on vec_id) is only
    // ever the BROADCAST side of the refine joins; a shuffle join there
    // would exchange the corpus scan against a ≤ C·nQueries-row frame
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def hasShortlist(j: SparkPlan): Boolean = j.exists {
      case we: WindowExec =>
        we.partitionSpec.exists(_.references.exists(_.name == "query_id"))
      case _ => false
    }
    val shuffledOverShortlist = rerank.queryExecution.sparkPlan.collect {
      case j: SortMergeJoinExec if hasShortlist(j) => j
      case j: ShuffledHashJoinExec if hasShortlist(j) => j
    }
    assert(shuffledOverShortlist.isEmpty,
      s"shortlist reached a shuffle join; refine must broadcast it:\n${shuffledOverShortlist.headOption}")
  }

  test("index probes refuse a layout-mismatched index, naming both layouts") {
    // the layout constants an index was written under are part of the
    // index (the bloom.meta lesson generalized): a probe computing
    // buckets/band keys/scores with different compiled constants would
    // prune the wrong partitions and silently report non-dups — so every
    // probe/append requires index.meta to match exactly
    import java.nio.file.{Files, Paths}
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val base = docs.filter(expr("doc_id % 5 != 0"))
    val delta = docs.filter(expr("doc_id % 5 = 0")).select("doc_id", "text")
    val dir = Files.createTempDirectory("layout").toString
    Dedup.writeExactIndex(base, s"$dir/ex")
    Dedup.writeMinhashIndex(base, s"$dir/mh")
    val v = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val queries = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    Similarity.writeIvfPqIndex(v.filter(col("vec_id") >= 5), s"$dir/ann")
    def tamper(idx: String): Unit =
      Files.write(Paths.get(s"$dir/$idx/index.meta"),
        "buckets=32,from=an-older-build".getBytes("UTF-8"))
    Seq("ex", "mh", "ann").foreach(tamper)
    def refusal(run: => Any): String = {
      val e = intercept[IllegalArgumentException](run)
      assert(e.getMessage.contains("buckets=32,from=an-older-build") &&
        e.getMessage.contains("rebuild"), e.getMessage)
      e.getMessage
    }
    refusal(Dedup.probeExactIndex(spark, s"$dir/ex", delta))
    refusal(Dedup.appendToExactIndex(delta, s"$dir/ex"))
    refusal(Dedup.probeMinhashIndex(spark, s"$dir/mh", delta))
    refusal(Dedup.appendToMinhashIndex(delta, s"$dir/mh"))
    refusal(Similarity.probeIvfPqIndex(spark, s"$dir/ann", queries))
    refusal(Similarity.probeIvfPqIndexRefined(spark, s"$dir/ann", queries))
    refusal(Similarity.appendToIvfPqIndex(queries
      .withColumnRenamed("query_id", "vec_id"), s"$dir/ann"))
    refusal(graft.streaming.StreamingNearDedup.indexMatches(
      delta, s"$dir/mh"))
    // a missing manifest (pre-manifest index) also refuses, pointing at
    // the rebuild path rather than probing on a guess
    Files.delete(Paths.get(s"$dir/mh/index.meta"))
    val e = intercept[IllegalArgumentException](
      Dedup.probeMinhashIndex(spark, s"$dir/mh", delta))
    assert(e.getMessage.contains("no layout manifest"), e.getMessage)
  }

  test("compactBucketedTable: __old without a live table aborts with the recovery path") {
    // the one crash window is between the two swap renames; the
    // reconciler must refuse to guess and name the recovery move
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("compact-crash").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(expr("doc_id % 7 = 1"))
    Dedup.writeExactIndex(docs, s"$dir/inc")
    // simulate the mid-swap crash: live moved to __old, replacement lost
    Files.move(Paths.get(s"$dir/inc/hashes"), Paths.get(s"$dir/inc/hashes__old"))
    val e = intercept[IllegalArgumentException] {
      Dedup.compactExactIndex(spark, s"$dir/inc")
    }
    assert(e.getMessage.contains("restore by renaming"), e.getMessage)
    // the documented recovery, then compaction proceeds
    Files.move(Paths.get(s"$dir/inc/hashes__old"), Paths.get(s"$dir/inc/hashes"))
    Dedup.compactExactIndex(spark, s"$dir/inc")
    assert(filesPerBucket(s"$dir/inc/hashes").values.forall(_ == 1))
  }

  test("d16/d17 probes strand no intermediate checkpoints (daily-ingest hygiene)") {
    // the probes localCheckpoint their intermediates (signatures, bands,
    // candidates, bloom survivors); DataFrame.unpersist is a NO-OP for
    // those, so in a long-lived ingest service every probe call would
    // strand RDD blocks. Each probe must release its intermediates and
    // return a verdict holding exactly ONE checkpoint, which the caller
    // releases once consumed. Delta-with-retries pattern: a genuine leak
    // survives every attempt; a concurrent suite's transient cache does not.
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("probeleak").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val base = docs.filter(expr("doc_id % 5 != 0"))
    Dedup.writeMinhashIndex(base, s"$dir/mh")
    Dedup.writeExactIndex(base, s"$dir/ex")
    val delta = docs.filter(expr("doc_id % 5 = 0")).select("doc_id", "text")
    def leaksAtMost(expected: Int)(run: => Unit): Boolean =
      (1 to 5).exists { _ =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        run
        val persisted = spark.sparkContext.getPersistentRDDs
        val added = persisted.keySet -- before
        added.foreach(id => persisted.get(id).foreach(_.unpersist(true)))
        added.size <= expected
      }
    assert(leaksAtMost(0) {
      val v = Dedup.probeMinhashIndex(spark, s"$dir/mh", delta)
      v.collect(); Dedup.release(v)
    }, "probeMinhashIndex leaked checkpointed RDDs")
    assert(leaksAtMost(0) {
      val v = Dedup.probeExactIndex(spark, s"$dir/ex", delta)
      v.collect(); Dedup.release(v)
    }, "probeExactIndex leaked checkpointed RDDs")
  }

  test("d16/d17: index writers refuse an empty corpus before touching any file") {
    val dir = java.nio.file.Files.createTempDirectory("exidx-empty").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val empty = docs.filter(expr("doc_id < 0"))
    val ex = intercept[IllegalArgumentException] {
      Dedup.writeExactIndex(empty, dir)
    }
    assert(ex.getMessage.contains("empty corpus"))
    // nothing half-written: no parquet dir, no bloom, no manifest
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "hashes")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bloom.bin")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bloom.meta")))
    val mx = intercept[IllegalArgumentException] {
      Dedup.writeMinhashIndex(empty, dir)
    }
    assert(mx.getMessage.contains("empty corpus"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")))
    // an APPEND against a missing index path must fail loudly, not
    // silently mint a fresh delta-only index at the typo'd location
    val ax = intercept[IllegalArgumentException] {
      Dedup.appendToMinhashIndex(docs.filter(expr("doc_id < 20")), s"$dir/nope")
    }
    assert(ax.getMessage.contains("no index"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/nope", "bands")))
    // an empty minhash APPEND over an existing index is a harmless no-op
    Dedup.writeMinhashIndex(docs.filter(expr("doc_id < 20")), dir)
    Dedup.appendToMinhashIndex(empty, dir)
    assert(spark.read.parquet(s"$dir/bands").count() > 0)
  }

  test("neardupReport yields d07/d14/d15 outputs from one pair-pipeline run") {
    val d = "/root/testdata/sf0.01"
    val (pairs, components, keepers, confirms) = Dedup.neardupReport(spark, d)
    assert(pairs.collect().toSet ==
      Dedup.ngramJaccardPairs(spark, d).select("id_a", "id_b").collect().toSet)
    assert(components.collect().toSeq ==
      Dedup.neardupSurvivors(spark, d).collect().toSeq)
    assert(keepers.collect().toSeq ==
      Dedup.qualitySurvivors(spark, d).collect().toSeq)
    assert(confirms.collect().toSeq ==
      Dedup.editDistancePairs(spark, d).collect().toSeq)
  }

  test("d21 unified report sections ≡ the registered d07/d14/d15 outputs") {
    val d = "/root/testdata/sf0.01"
    val rows = Dedup.neardupReportUnified(spark, d).collect()
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq ==
      Seq("component", "confirm", "keeper"))
    // component section = d07 (doc_id, component, is_survivor)
    val comp = rows.filter(_.getString(0) == "component")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(comp == Dedup.neardupSurvivors(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq)
    // keeper section = d14 (component, keeper_id, n_members, quality)
    val keep = rows.filter(_.getString(0) == "keeper")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toSeq
    assert(keep == Dedup.qualitySurvivors(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getDouble(3))).toSeq)
    // confirm section = d15 (id_a, id_b, edit_dist, sim_permille)
    val conf = rows.filter(_.getString(0) == "confirm")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(conf == Dedup.editDistancePairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
    // null shape: quality only on keeper rows, val2 only on confirm rows
    assert(rows.forall(r => r.isNullAt(5) == (r.getString(0) != "keeper")))
    assert(rows.forall(r => r.isNullAt(4) == (r.getString(0) != "confirm")))
  }

  test("d15 confirmed pairs: independent DP recompute matches; threshold holds") {
    val d = "/root/testdata/sf0.01"
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.editDistancePairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no confirmed pairs at sf0.01 — threshold mis-tuned")
    rows.foreach { case (a, b, dist, sim) =>
      val (ta, tb) = (texts(a), texts(b))
      assert(dist == lev(ta, tb), s"($a,$b) dist $dist != DP")
      val maxlen = math.max(ta.length, tb.length)
      assert(sim == 1000L * (maxlen - dist) / math.max(maxlen, 1))
      assert(sim >= Dedup.EDIT_SIM_MIN_PERMILLE)
    }
  }

  test("d14 keeps the max-quality member of each d07 component (ties -> min id)") {
    val d = "/root/testdata/sf0.001"
    val comps = Dedup.neardupSurvivors(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    val quality = TextOps.qualityScores(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val got = Dedup.qualitySurvivors(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == comps.keySet)
    got.foreach { case (comp, n, keeper, kq) =>
      val members = comps(comp)
      assert(n == members.size && members.contains(keeper))
      val best = members.map(m => (quality(m), -m)).max
      assert((kq, -keeper) == best,
        s"component $comp keeper $keeper/$kq, expected ${-best._2}/${best._1}")
    }
  }

  test("s08 PQ/ADC output equals a local reimplementation of encode + LUT scoring") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      .sortBy(_._1)
    val (m, sd, kcb, nq, topk) =
      (Similarity.PQ_M, Similarity.PQ_SUBDIM, Similarity.PQ_K, 5, 10)
    val queries = vecs.filter(_._1 < nq)
    val corpus = vecs.filter(_._1 >= nq)
    val cb = corpus.take(kcb).map(_._2)
    def d2(a: Array[Long], b: Array[Long], off: Int): Long =
      (off until off + sd).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val codes = corpus.map { case (id, v) =>
      id -> (0 until m).map(mm => cb.indices.minBy(j => (d2(v, cb(j), mm * sd), j))).toArray
    }.toMap
    val expected = queries.flatMap { case (qid, qv) =>
      val lut = Array.tabulate(m, kcb)((mm, j) => d2(qv, cb(j), mm * sd))
      corpus.map { case (id, _) =>
        (qid, id, (0 until m).map(mm => lut(mm)(codes(id)(mm))).sum) }
        .sortBy { case (_, id, adc) => (adc, id) }
        .take(topk).zipWithIndex
        .map { case ((q, id, adc), i) => (q, i + 1, id, adc) }
    }.toSeq
    val got = Similarity.pqTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("s05 iterated: a second Lloyd step moves centroids less than the first") {
    import org.apache.spark.sql.expressions.Window
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val seed = corpus.filter(col("vec_id") % 31 === 6)
      .withColumn("cell", row_number().over(Window.orderBy(col("vec_id"))))
      .filter(col("cell") <= Similarity.N_CELLS)
      .select(col("cell"), col("qv").as("centroid"))
    val step1 = Similarity.kmeansStepFrom(corpus, seed).cache()
    val shift1 = step1.agg(avg(col("shift"))).collect().head.getDouble(0)
    val step2 = Similarity.kmeansStepFrom(corpus,
      step1.select(col("cell"), col("centroid")))
    val shift2 = step2.agg(avg(col("shift"))).collect().head.getDouble(0)
    step1.unpersist()
    // Lloyd converges: consecutive centroid sets grow more similar
    assert(shift2 > shift1, s"no convergence: step1 $shift1, step2 $shift2")
    assert(shift2 > 0.9, s"second step still moving far: $shift2")
  }
}
