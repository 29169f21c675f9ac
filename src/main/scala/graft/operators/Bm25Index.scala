package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index + stateless probe — the production face
  * of t19's ad-hoc retrieval (which rescans the corpus per query set).
  * Mirrors the d16/d17 persisted-index discipline: build once, probe
  * per query workload at posting-proportional cost, absorb crawl deltas
  * append-only, fail loudly on torn layouts.
  *
  * Layout at `dir`:
  *   postings/   parquet, partitioned by tbkt = xxhash64(term) mod 64:
  *               (term, doc_id, tf, dl) for EVERY word bigram — probes
  *               read only the query terms' bucket partitions.
  *   stats.meta  "n_docs,sum_dl" — the corpus constants BM25 needs
  *               (df is NOT persisted: the probe derives it from the
  *               postings it reads anyway, so appends can't stale it).
  *   layout.meta landed LAST by the build — a torn build leaves no
  *               stamp and every probe refuses loudly.
  *
  * Crash story: build writes postings → stats → stamp (stamp-last, the
  * writeExactIndex discipline). Append writes delta postings (append-only
  * into the delta's own bucket partitions — no existing file touched),
  * then swaps stats.meta atomically; a crash between the two leaves
  * stale consts beside committed postings, which [[repairStats]] fixes
  * by re-deriving stats FROM the postings (posting-proportional, no
  * corpus access) — recovery is one idempotent call, never a rebuild.
  */
object Bm25Index {

  val INDEX_BUCKETS = 64
  private val LAYOUT = s"bm25:v1:bigram,b$INDEX_BUCKETS"

  private def tbkt(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(INDEX_BUCKETS)).cast("int")

  private def readMeta(dir: String, name: String): String =
    new String(Files.readAllBytes(Paths.get(dir, name)), "UTF-8")

  private def writeMetaAtomic(dir: String, name: String, value: String): Unit = {
    val tmp = Paths.get(dir, name + ".tmp")
    Files.write(tmp, value.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def requireLayout(dir: String, op: String): Unit = {
    val p = Paths.get(dir, "layout.meta")
    require(Files.exists(p), s"$op: no layout stamp at $dir — torn or missing build")
    val got = new String(Files.readAllBytes(p), "UTF-8")
    require(got == LAYOUT, s"$op: index at $dir has layout '$got', expected '$LAYOUT'")
  }

  /** One-row (n_docs, sum_dl) off the docs' thin projection. */
  private def corpusStats(docs: DataFrame): (Long, Long) = {
    val r = docs
      .select((size(graft.functions.TextFunctions.tokens(col("text"))) - 1)
        .cast("long").as("dl"))
      .filter(col("dl") >= 1)
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .head() // bounded: one row of two longs
    (r.getLong(0), r.getLong(1))
  }

  /** Build the index from a corpus frame (doc_id, text). */
  def write(docs: DataFrame, dir: String): Unit = {
    val (n, sumDl) = corpusStats(docs)
    require(n > 0, s"Bm25Index.write: empty corpus — refusing to write $dir")
    // stale stamp dropped FIRST: every torn state from here on is
    // stamp-less and probes refuse loudly instead of pairing new postings
    // with old stats (or vice versa)
    Files.deleteIfExists(Paths.get(dir, "layout.meta"))
    TextOps.bigramPostings(docs, None)
      .withColumn("tbkt", tbkt(col("term")))
      .write.mode("overwrite").partitionBy("tbkt").parquet(s"$dir/postings")
    writeMetaAtomic(dir, "stats.meta", s"$n,$sumDl")
    writeMetaAtomic(dir, "layout.meta", LAYOUT)
  }

  /** Absorb a crawl delta append-only. Caller contract (as for
    * appendToExactIndex): delta doc_ids are disjoint from the indexed
    * corpus — re-crawled ids go through dedup first, not here.
    */
  def append(docs: DataFrame, dir: String): Unit = {
    requireLayout(dir, "Bm25Index.append")
    val (dn, dSum) = corpusStats(docs)
    if (dn == 0) return // empty delta: nothing to absorb
    val Array(n0, s0) = readMeta(dir, "stats.meta").split(",").map(_.toLong)
    TextOps.bigramPostings(docs, None)
      .withColumn("tbkt", tbkt(col("term")))
      .write.mode("append").partitionBy("tbkt").parquet(s"$dir/postings")
    // stats land AFTER the postings commit: the torn-append window leaves
    // committed postings under slightly-stale consts (scores shift by one
    // delta's worth of avg-length drift, rankings still well-defined);
    // repairStats re-derives the exact pair idempotently
    writeMetaAtomic(dir, "stats.meta", s"${n0 + dn},${s0 + dSum}")
  }

  /** Recompute stats.meta from the postings themselves (recovery after a
    * torn append): n_docs = distinct doc_id, sum_dl = sum of one dl per
    * doc. Posting-proportional; touches no corpus.
    */
  def repairStats(s: SparkSession, dir: String): Unit = {
    requireLayout(dir, "Bm25Index.repairStats")
    val r = s.read.parquet(s"$dir/postings")
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .head() // bounded: one row of two longs
    writeMetaAtomic(dir, "stats.meta", s"${r.getLong(0)},${r.getLong(1)}")
  }

  /** Probe: top-k docs per query with NO corpus access — only the query
    * terms' bucket partitions are read (partition pruning on tbkt plus the
    * literal term IN-list inside each bucket), df is derived from exactly
    * those postings, and the arithmetic is TextOps.bm25ScorePostings — the
    * same kernel as the oracle-checked ad-hoc key, so the two paths cannot
    * drift. Scale: driver-side state is the query term list (bounded by
    * the caller's query set, ≤ 64 distinct buckets); everything else is
    * posting-bounded.
    */
  def probe(s: SparkSession, dir: String,
      queries: Seq[(Int, Seq[String])], k: Int = 5): DataFrame = {
    requireLayout(dir, "Bm25Index.probe")
    val Array(n, sumDl) = readMeta(dir, "stats.meta").split(",").map(_.toLong)
    val terms = queries.flatMap(_._2).distinct
    require(terms.nonEmpty, "Bm25Index.probe: no query terms")
    // bucket ids computed with the SAME hash the writer used, via a tiny
    // Spark job over the literal terms (≤ |terms| rows) — never reimplement
    // xxhash64 driver-side
    import s.implicits._
    val buckets = terms.toDF("term").select(tbkt(col("term")))
      .distinct().collect().map(_.getInt(0)) // bounded: ≤ min(|terms|, 64)
    val postings = s.read.parquet(s"$dir/postings")
      .filter(col("tbkt").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .select("term", "doc_id", "tf", "dl")
    val consts = s.range(1).select(lit(n).as("n_docs"),
      greatest(lit(sumDl / math.max(n, 1L)), lit(1L)).as("avg_dl"))
    val qterms = s.createDataFrame(
      queries.flatMap { case (q, ts) => ts.map(t => (q, t)) })
      .toDF("query_id", "term")
    TextOps.bm25Cut(TextOps.bm25ScorePostings(postings, consts, qterms), k)
      .orderBy("query_id", "rank")
  }
}
