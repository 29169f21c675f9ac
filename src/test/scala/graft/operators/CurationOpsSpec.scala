package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior specs for the curation extras: benchmark decontamination
  * (p02) and within-doc repetition scoring (t09).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags planted near-copies of benchmark docs") {
    val out = Curation.decontamination(spark, "/root/testdata/sf0.001").collect()
    val planted = out.filter(_.getLong(0) >= Curation.PLANT_OFFSET)
    assert(planted.nonEmpty, "planted contamination must produce hits")
    // each planted doc traces back to a benchmark doc id and hit it
    planted.foreach { r =>
      val src = r.getLong(0) - Curation.PLANT_OFFSET
      assert(src % Curation.BENCH_MOD == 0)
      assert(r.getLong(1) > 0 && r.getLong(2) >= 1)
    }
    // flagged organic docs (the corpus's own planted near-dup pairs can
    // straddle the benchmark split) must never be benchmark members
    out.filter(_.getLong(0) < Curation.PLANT_OFFSET)
      .foreach(r => assert(r.getLong(0) % Curation.BENCH_MOD != 0))
  }

  test("train/val split is content-keyed: duplicates co-locate, fraction is sane") {
    val out = Curation.trainValSplit(spark, "/root/testdata/sf0.01")
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    assert(out.keySet.subsetOf(Set("train", "val")) && total > 0)
    // 10% target with hash variance at 500 docs: accept 2-25%
    val valFrac = out.getOrElse("val", 0L).toDouble / total
    assert(valFrac > 0.02 && valFrac < 0.25, s"val fraction $valFrac")
    // identical content must always land on the same side (no holdout leak
    // through duplicates), regardless of doc_id
    val dup = Seq((1L, "same text"), (999L, "same text"), (5L, "other words"))
      .toDF("doc_id", "text")
      .select(when(Dedup.baseHash(col("text")) % 100 < Curation.VAL_PCT, "val")
        .otherwise("train").as("split"), col("text"))
      .collect().map(r => r.getString(1) -> r.getString(0))
    assert(dup.filter(_._1 == "same text").map(_._2).distinct.length == 1)
  }

  test("curation funnel: stages are ordered, monotone non-increasing, consistent with p01") {
    val f = Curation.curationFunnel(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(f.map(_._2).toSeq ==
      Seq("raw", "quality_gated", "exact_deduped", "neardup_survivors"))
    val counts = f.map(_._3)
    assert(counts.head ==
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet").count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${counts.toSeq}")
    // survivors must equal p01's total
    val p01Total = Curation.curate(spark, "/root/testdata/sf0.01")
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect().head.getLong(0)
    assert(counts.last == p01Total)
  }

  test("sequence packing: per-source offsets are contiguous and spans are consistent") {
    val rows = Curation.sequencePacking(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    rows.foreach { case (_, _, n, s0, s1) =>
      assert(n > 0 && s1 >= s0)
      // a doc of n tokens can straddle at most ceil(n/SEQ)+1 sequences
      assert(s1 - s0 <= n / Curation.SEQ_TOKENS + 1)
    }
    // within a source, consecutive docs are contiguous: next doc's start
    // sequence never skips past the previous doc's end sequence + 1
    rows.groupBy(_._2).values.foreach { docs =>
      val sorted = docs.sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, _, _, _, e1), (_, _, _, s2, _)) =>
        assert(s2 == e1 || s2 == e1 + 1, s"gap between seqs $e1 -> $s2")
      }
    }
  }

  test("source downsample caps every source and is deterministic") {
    val perSource = Curation.sourceDownsample(spark, "/root/testdata/sf0.01")
      .groupBy("source").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.nonEmpty)
    assert(perSource.values.forall(_ <= Curation.SAMPLE_CAP))
    // at sf0.01 each source holds >100 docs, so the cap must bind
    assert(perSource.values.exists(_ == Curation.SAMPLE_CAP))
    // hash-ranked selection: two runs pick the identical sample
    val a = Curation.sourceDownsample(spark, "/root/testdata/sf0.01").collect().toSeq
    val b = Curation.sourceDownsample(spark, "/root/testdata/sf0.01").collect().toSeq
    assert(a == b)
  }

  test("p04 two-level rank picks exactly the single-window winners") {
    val d = "/root/testdata/sf0.001"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(Dedup.baseHash(col("text")).asc, col("doc_id").asc)
    val ref = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Curation.SAMPLE_CAP)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("source", "lang")
      .collect().toSeq
    assert(Curation.sourceDownsample(spark, d).collect().toSeq == ref)
  }

  test("p06 distributed prefix-sum equals the single-window running sum") {
    val d = "/root/testdata/sf0.001"
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val ref = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"offset div ${Curation.SEQ_TOKENS}").as("start_seq"),
        expr(s"(offset + n_tokens - 1) div ${Curation.SEQ_TOKENS}").as("end_seq"))
      .orderBy("doc_id")
      .collect().toSeq
    assert(Curation.sequencePacking(spark, d).collect().toSeq == ref)
  }

  test("curationReport produces p01's stats and p05's funnel from one pipeline run") {
    val d = "/root/testdata/sf0.001"
    val (stats, funnel) = Curation.curationReport(spark, d)
    assert(stats.collect().toSeq == Curation.curate(spark, d).collect().toSeq)
    assert(funnel.collect().toSeq == Curation.curationFunnel(spark, d).collect().toSeq)
  }

  test("p11 unified report sections equal the registered p01/p05 outputs") {
    // the composed key must be a pure repackaging: its 'stats' section is
    // p01 row-for-row (item = source/lang), its 'funnel' section p05
    // (item = stageNo_stage) — no third computation path to drift
    val d = "/root/testdata/sf0.001"
    val unified = Curation.curationReportUnified(spark, d).collect()
    val stats = unified.filter(_.getString(0) == "stats")
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val funnel = unified.filter(_.getString(0) == "funnel")
      .map(r => (r.getString(1), r.getLong(2), r.isNullAt(3))).toSeq
    assert(stats.size + funnel.size == unified.length)
    val p01 = Curation.curate(spark, d).collect()
      .map(r => (s"${r.getString(0)}/${r.getString(1)}", r.getLong(2), r.getLong(3))).toSeq
    assert(stats == p01)
    val p05 = Curation.curationFunnel(spark, d).collect()
      .map(r => (s"${r.getInt(0)}_${r.getString(1)}", r.getLong(2), true)).toSeq
    assert(funnel == p05)
  }

  test("p09 distributed curriculum rank equals the single-window total order") {
    val d = "/root/testdata/sf0.001"
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc, col("h"), col("doc_id"))
    val ref = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        least(floor(graft.functions.TextFunctions.qualityScore(
          col("text"), TextOps.stopwords) * 10).cast("long"), lit(9L)).as("bucket"),
        Dedup.baseHash(col("text")).as("h"))
      .withColumn("epoch_order", row_number().over(w).cast("long"))
      .select("doc_id", "bucket", "epoch_order")
      .orderBy("epoch_order")
      .collect().toSeq
    val got = Curation.curriculumOrder(spark, d).collect().toSeq
    assert(got == ref)
    // the rank is a permutation of 1..n with high-quality deciles first
    assert(got.map(_.getLong(2)).toSet == (1L to got.length).toSet)
    assert(got.map(_.getLong(1)).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("p07 mixture sample: epoch math exact, capped sources subsample, full sources keep all") {
    val rows = Curation.mixtureSample(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 20)
    rows.foreach { case (src, w, t, target, epochs, kept, keptTok) =>
      // n_epochs is exactly ceil(target/total) for under-represented
      // sources and 1 otherwise
      val expEpochs = if (target > t) (target + t - 1) / t else 1L
      assert(epochs == expEpochs, s"$src epochs $epochs != $expEpochs")
      assert(keptTok <= t)
      // an under-represented source (needs epoching) is never subsampled
      if (epochs > 1) assert(keptTok == t, s"$src epoched yet subsampled")
      // an over-represented source is actually cut down
      if (target * 2 <= t) assert(keptTok < t, s"$src uncut at rate<=0.5")
    }
    // both regimes must actually occur in the fixture
    assert(rows.exists(_._5 > 1) && rows.exists(r => r._7 < r._3))
    // deterministic: a second run is bit-identical
    val again = Curation.mixtureSample(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(again.toSeq == rows.toSeq)
  }

  test("p08 quality gate: each source keeps >= 75% by its OWN threshold; thresholds differ") {
    val rows = Curation.qualityGate(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (src, n, kept, q1) =>
      // >= 75% survive (the threshold bin is kept whole), but the gate
      // must actually cut something
      assert(kept * 4 >= n * 3, s"$src kept $kept of $n")
      assert(kept < n, s"$src gate cut nothing")
      assert(q1 >= 0 && q1 <= Curation.QGATE_BINS)
    }
    // adaptive: per-source thresholds are not one global cutoff
    assert(rows.map(_._4).distinct.length > 5, "thresholds collapsed to a global cutoff")
  }

  test("p12 dataset profile is internally consistent with its source measures") {
    val kv = Curation.datasetProfile(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-language composition partitions the corpus
    assert(kv.filter(_._1.startsWith("docs_lang_")).values.sum == kv("n_docs"))
    // the dup split partitions the corpus too, and the card's headline
    // numbers agree with the measures they were composed from
    assert(kv("distinct_docs") + kv("exact_dup_docs") == kv("n_docs"))
    assert(kv("gopher_pass_docs") ==
      TextOps.gopherFrame(spark, "/root/testdata/sf0.001")
        .agg(sum(col("gopher_pass"))).collect().head.getLong(0))
    assert(kv("mean_doc_tokens_x1000") ==
      kv("total_tokens") * 1000 / kv("n_docs"))
  }

  test("repetition stats: a self-repeating doc scores high, distinct text scores zero") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // one distinct 3-gram, 8 total
      (2L, "eight unique tokens make six unrepeated shingles here")).toDF("doc_id", "text")
    val rows = Dedup.shingleTable(docs, distinct = false)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("sh")).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == (8L, 1L)) // 10 tokens -> 8 shingles, all identical
    assert(rows(2L) == (6L, 6L)) // 8 tokens -> 6 shingles, all distinct
  }

  test("t18: shingle-type growth curve matches a sequential reference") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length < 3) Seq(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSeq
    }
    val first = scala.collection.mutable.Map[String, Long]()
    for ((id, t) <- docs.sortBy(_._1); sh <- shingles(t))
      if (!first.contains(sh)) first(sh) = id
    val w = docs.map(_._1).max / 10 + 1
    val expect = first.values.groupBy(_ / w + 1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (dec, n)) => (dec, n, cum + n) }
      .drop(1)
    val got = TextOps.vocabGrowth(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the curve is non-degenerate on this corpus: several deciles mint types
    assert(got.length >= 5, s"degenerate growth curve: $got")
  }

  test("p15: no near-dup pair straddles the leakage-safe split") {
    val d = "/root/testdata/sf0.001"
    val splitOf = Curation.leakageSafeSplitAssign(spark, d)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.ngramJaccardPairs(spark, d).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "guarantee would be vacuous without near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles the split")
    }
    // ...and the guarantee is not free: p03's content-hash split DOES
    // leak on this corpus (deterministic — no RNG anywhere): of the 8
    // near-dup pairs at sf0.001, exactly one straddles p03's boundary
    val p03Of = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        when(Dedup.baseHash(col("text")) % 100 < Curation.VAL_PCT, "val")
          .otherwise("train").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val straddledP03 = pairs.count { case (a, b) => p03Of(a) != p03Of(b) }
    assert(straddledP03 == 1,
      s"expected p03 to straddle exactly 1 near-dup pair here, got $straddledP03")
    // both sides exist, and the aggregate face is the rollup of this frame
    assert(splitOf.values.toSet == Set("train", "val"))
    val agg = Curation.leakageSafeSplit(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fromAssign = Curation.leakageSafeSplitAssign(spark, d)
      .groupBy("source", "split")
      .agg(count(lit(1)), countDistinct(col("component")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(agg == fromAssign)
  }

  // ------------------------------------------------------ p17 PPS sample
  test("p17 telescoping exactness: total hits == W div S, sample near target") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, d)
    val wTot = docs.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val stride = math.max(1L, wTot / 256L)
    val rows = Curation.ppsSample(spark, d).collect()
    // the per-row interval counts telescope to exactly W div S
    assert(rows.map(_.getLong(2)).sum == wTot / stride)
    // and the selection is ~N (exact when no doc spans multiple strides)
    assert(math.abs(rows.length - 256) <= rows.map(_.getLong(2)).sum - rows.length + 1)
  }

  test("p17 PPS bias: selected docs are longer on average; giant docs carry multiplicity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, d)
    val avgAll = docs.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sel = Curation.ppsSample(spark, d)
    val avgSel = sel.agg(avg(col("w"))).collect()(0).getDouble(0)
    assert(avgSel > avgAll,
      s"PPS must over-select long docs: sample avg $avgSel vs corpus $avgAll")
    // planted multiplicity: one doc worth half the corpus weight gets
    // hits ≈ n/2 — the exact expected PPS multiplicity, not a dropped cap
    val n = 16L
    val planted = (1L to 63L).map(i => (i, 100L)) :+ (999L, 6300L)
    val out = Curation.ppsSampleOf(
      planted.toDF("doc_id", "n_chars"), n).collect()
    val giant = out.find(_.getLong(0) == 999L)
    assert(giant.isDefined, "the giant doc is certain to be selected")
    val tot = 63L * 100L + 6300L
    val s = tot / n
    assert(giant.get.getLong(2) >= 6300L / s,
      "giant doc multiplicity must reflect its stride span")
    // determinism: same input, same sample
    val again = Curation.ppsSample(spark, d).collect()
    assert(Curation.ppsSample(spark, d).collect().map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }
}
