package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming NEAR-duplicate suppression for continuous document ingest —
  * the Structured-Streaming face of the batch d04 MinHash-LSH operator
  * (StreamingDedup covers exact content-hash dedup; this catches the
  * re-crawl with a changed footer that exact hashing misses).
  *
  * Shape, per document:
  *   1. a MinHash signature is computed PER ROW (stateless, no shuffle) —
  *      the same [[Dedup]] hash family, but in the higher-order-function
  *      form: at batch scale that form is interpreted and ~100x slower
  *      than the explode+hash-aggregate pipeline, but a streaming
  *      aggregate per doc would be a second stateful operator, and ingest
  *      rates are orders of magnitude below batch scan rates — the right
  *      trade flips;
  *   2. the signature is banded into [[Dedup.BANDS]] LSH bucket keys and
  *      exploded — ONE shuffle, keyed by bucket, which is how the state
  *      store shards across executors at scale;
  *   3. per bucket, flatMapGroupsWithState keeps the recent signatures
  *      (bounded by [[MAX_BUCKET_SIGS]] and the event-time horizon) and
  *      emits a per-band verdict: did this doc's signature agree with a
  *      stored one on >= threshold of its minhashes (the d04 estimator)?
  *   4. [[admitted]] reassembles verdicts per doc inside the caller's
  *      foreachBatch sink: a doc is admitted iff NO band matched.
  *
  * State never holds document bodies — only (doc_id, event-time,
  * signature) triples per bucket: 32 longs per doc, sharded by bucket
  * key, expired by watermark. Suppressed docs' signatures still enter
  * state: their content is suppressed content, and a later copy of it
  * should be suppressed too.
  */
object StreamingNearDedup {

  /** Max signatures retained per LSH bucket. A bucket holding more than
    * this many live signatures is boilerplate gravity (the streaming
    * analog of d03's stop-shingle), and comparing against the most recent
    * K is the bounded-state policy.
    */
  val MAX_BUCKET_SIGS = 64

  final case class BandRow(bandKey: String, docId: Long, ts: java.sql.Timestamp,
      sig: Seq[Long]) {
    def tsMillis: Long = ts.getTime
  }
  final case class BucketState(sigs: List[(Long, Long, Seq[Long])])
  final case class Verdict(doc_id: Long, band_key: String, matched: Boolean)

  /** Per-row MinHash signature: the [[Dedup.SIG_N]] affine-family minima
    * over the doc's distinct word-3-gram shingle hashes.
    */
  def signature(text: Column): Column = {
    val hashes = transform(array_distinct(TextFunctions.wordNgrams(text, 3)),
      sh => Dedup.baseHash(sh) % Dedup.HASH_P)
    array((0 until Dedup.SIG_N).map(i =>
      array_min(transform(hashes,
        h => (lit(Dedup.seedA(i)) * h + lit(Dedup.seedB(i))) % Dedup.HASH_P))): _*)
  }

  /** The [[Dedup.BANDS]] LSH bucket keys ("bandIdx:m,m,m,m") of a
    * signature — same banding as the batch d04 operator.
    */
  def bandKeys(sig: Column): Column =
    array((0 until Dedup.BANDS).map { b =>
      concat_ws(":", lit(b), concat_ws(",",
        (b * Dedup.ROWS_PER_BAND until (b + 1) * Dedup.ROWS_PER_BAND)
          .map(i => element_at(sig, i + 1)): _*))
    }: _*)

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / Dedup.SIG_N

  /** Per-(doc, band) match verdicts. `docs` needs `doc_id` (long), `text`
    * (string) and event-time column `tsCol`; `horizonMs` bounds how long a
    * seen signature suppresses later near-copies (and with it, state
    * size). Emits one row per (doc, band); feed each micro-batch through
    * [[admitted]] to get the per-doc decision.
    */
  def verdicts(docs: DataFrame, tsCol: String, horizonMs: Long,
      threshold: Double = 0.5): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .withColumn("_sig", signature(col("text")))
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", s"$horizonMs milliseconds")
      .select(col("doc_id"), col("_ts"), col("_sig"),
        explode(bandKeys(col("_sig"))).as("_bk"))
      // the watermarked _ts column must survive into the typed rows —
      // event-time timeouts need it
      .select(col("_bk").as("bandKey"), col("doc_id").as("docId"),
        col("_ts").as("ts"), col("_sig").as("sig"))
      .as[BandRow]
    banded.groupByKey(_.bandKey)
      .flatMapGroupsWithState[BucketState, Verdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            // horizon expiry is enforced HERE, not only via the timeout:
            // a bucket that keeps receiving data is never invoked with
            // hasTimedOut=true, so stale signatures must be aged out on
            // the data path for expiry to be deterministic
            var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
              .filter { case (_, ts, _) => ts + horizonMs > wm }
            // deterministic in-batch order regardless of shuffle arrival
            val out = rows.toSeq.sortBy(r => (r.tsMillis, r.docId)).map { r =>
              val m = sigs.exists { case (id, _, s) =>
                id != r.docId && estJaccard(s, r.sig) >= threshold
              }
              sigs = ((r.docId, r.tsMillis, r.sig) ::
                sigs.filterNot(_._1 == r.docId)).take(MAX_BUCKET_SIGS)
              Verdict(r.docId, key, m)
            }
            state.update(BucketState(sigs))
            val maxTs = sigs.iterator.map(_._2).max
            state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
            out.iterator
          }
      }
  }

  /** Per-doc admission over ONE micro-batch of [[verdicts]] output (run
    * inside foreachBatch): a doc is admitted iff none of its bands
    * matched a stored signature.
    */
  def admitted(verdictBatch: DataFrame): DataFrame =
    verdictBatch.groupBy("doc_id")
      .agg(max(col("matched").cast("int")).as("_m"))
      .filter(col("_m") === 0)
      .select("doc_id")

  // ------------------------------------------ persisted-index probe
  /** Batch-format band keys of a signature (comma-joined, array position
    * = band_idx) — the [[Dedup.bandedKeys]] layout, so a streaming row
    * can equi-join the persisted d16 index.
    */
  def indexBandKeys(sig: Column): Column =
    array((0 until Dedup.BANDS).map { b =>
      concat_ws(",", (b * Dedup.ROWS_PER_BAND until (b + 1) * Dedup.ROWS_PER_BAND)
        .map(i => element_at(sig, i + 1)): _*)
    }: _*)

  /** Streaming face of the batch d16 probe: a continuous delta stream
    * checks each document against "yesterday's" PERSISTED corpus index
    * (written once by [[Dedup.writeMinhashIndex]]) — the cross-day dedup
    * [[verdicts]]' within-stream state cannot see, with no state at all:
    * a stream-STATIC left-outer equi-join on (band_idx, band_key), the
    * signature-agreement confirm only for candidate rows, one row out
    * per (doc, band[, candidate]). The static plan RE-EXECUTES per
    * micro-batch, but a path-based parquet read pins its file listing at
    * query start — an index refresh is picked up by RESTARTING the
    * query, which is free here precisely because there is no state (the
    * checkpoint holds only source offsets); a catalog/Delta-backed index
    * would re-resolve in place.
    * Per-event work is bounded by the d04 banding (≤ BANDS index
    * lookups); at scale the join partitions by band_key exactly as the
    * batch probe does. Feed micro-batches through [[indexAdmitted]];
    * equivalence with the batch [[Dedup.probeMinhashIndex]] verdict is
    * spec-pinned.
    */
  def indexMatches(docs: DataFrame, indexDir: String,
      threshold: Double = Dedup.INC_DUP_THRESHOLD): DataFrame = {
    // the stream computes band keys with its own compiled constants —
    // refuse an index laid out under different ones (Dedup.requireLayout)
    Dedup.requireLayout(indexDir, Dedup.minhashLayout, "indexMatches")
    val spark = docs.sparkSession
    val banded = docs
      .withColumn("_sig", signature(col("text")))
      .select(col("doc_id"), col("_sig"),
        posexplode(indexBandKeys(col("_sig"))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    val idxBands = spark.read.parquet(s"$indexDir/bands")
      .select(col("doc_id").as("index_id"), col("band_idx"), col("band_key"))
    val idxSigs = spark.read.parquet(s"$indexDir/sigs").drop("sbkt")
      .toDF("sig_id" +: (0 until Dedup.SIG_N).map(i => s"m$i"): _*)
    val agree = (0 until Dedup.SIG_N).map(i =>
      when(element_at(col("_sig"), i + 1) === col(s"m$i"), 1).otherwise(0))
      .reduce(_ + _)
    banded
      .join(idxBands, Seq("band_idx", "band_key"), "left_outer")
      .join(idxSigs, col("index_id") === col("sig_id"), "left_outer")
      .select(col("doc_id"), col("band_idx"), col("index_id"),
        when(col("index_id").isNotNull, agree.cast("double") / Dedup.SIG_N)
          .as("est_jaccard"))
      .withColumn("matched",
        coalesce(col("est_jaccard") >= threshold, lit(false)))
  }

  /** Per-doc admission over ONE micro-batch of [[indexMatches]] output
    * (run inside foreachBatch): admitted iff no index candidate
    * confirmed at the threshold. Duplicate (doc, candidate) rows from
    * multi-band hits collapse in the aggregate — the streaming side
    * never needs a stateful distinct.
    */
  def indexAdmitted(matchBatch: DataFrame): DataFrame =
    matchBatch.groupBy("doc_id")
      .agg(max(col("matched").cast("int")).as("_m"))
      .filter(col("_m") === 0)
      .select("doc_id")

  // ------------------------------------- composed exact-then-near probe
  /** Streaming face of the composed d18 probe ([[Dedup.probeExactThenNear]]):
    * the production ingest ORDER — cheap exact tier first, near tier only
    * for its survivors — with zero streaming state.
    *
    *   1. exact tier: md5 per row, then the exact index's PERSISTED Bloom
    *      filter as a codegen literal filter — a bloom-negative row is
    *      DEFINITIVELY not an exact dup and skips the static hash join
    *      entirely (at a re-crawl-heavy 1% novel rate the join sees ~1%
    *      of the stream + fpp); bloom-positives join the persisted
    *      (h, match_id) table, and a join hit is an exact verdict;
    *   2. near tier: only exact-SURVIVORS (bloom-negatives plus bloom
    *      false-positives that missed the join) are signatured and
    *      band-probed via [[indexMatches]] — an exact-killed row
    *      generates zero shingles, signatures, or band lookups, which is
    *      the composition's entire point at scale.
    *
    * Both tiers are stream-static joins against path-pinned parquet, so
    * the refresh story is [[indexMatches]]'s: stop → append/compact the
    * indexes → restart from the same offsets-only checkpoint. Feed each
    * micro-batch through [[indexAdmitted]]; equivalence with the batch
    * [[Dedup.probeExactThenNear]] verdict is spec-pinned.
    */
  def exactThenNearMatches(docs: DataFrame, exactDir: String, mhDir: String,
      threshold: Double = Dedup.INC_DUP_THRESHOLD): DataFrame = {
    Dedup.requireLayout(exactDir, Dedup.exactLayout, "exactThenNearMatches")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnShim
    import org.apache.spark.sql.types.BinaryType
    val spark = docs.sparkSession
    val bfBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(exactDir, "bloom.bin"))
    val hashed = docs.withColumn("_h", md5(col("text")))
    val mightDup = ColumnShim.column(
      BloomFilterMightContain(Literal(bfBytes, BinaryType),
        ColumnShim.expression(xxhash64(col("_h")))))
    val idx = spark.read.parquet(s"$exactDir/hashes")
      .select(col("h").as("_h"), col("match_id"))
    val maybe = hashed.filter(mightDup)
    val exact = maybe.join(idx, "_h")
      .select(col("doc_id"), lit("exact").as("tier"), col("match_id"),
        lit(1.0).as("est_jaccard"), lit(true).as("matched"))
    val survivors = hashed.filter(!mightDup).select("doc_id", "text")
      .unionByName(maybe.join(idx, Seq("_h"), "left_anti")
        .select("doc_id", "text"))
    val near = indexMatches(survivors, mhDir, threshold)
      .select(col("doc_id"), lit("near").as("tier"),
        col("index_id").as("match_id"), col("est_jaccard"), col("matched"))
    exact.unionByName(near)
  }
}
