package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextOps

/** Streaming RAG chunking — the online face of batch t27: continuously
  * ingested documents explode into fixed-window overlapping chunks, with
  * optional chunk-level exact dedup (boilerplate paragraphs shared across
  * crawled pages collapse AT THE CHUNK GRAIN, which document-level d01
  * can never catch).
  *
  * Scale design: [[chunkStream]] is completely STATELESS — the t27 kernel
  * is a per-row explode inside the scan's codegen stage, so the stream
  * inherits source parallelism, needs no watermark, and replays are
  * naturally idempotent (same doc → same chunk rows). [[chunkDedupStream]]
  * adds the StreamingDedup discipline on top: state stores only the
  * 60-bit chunk hash (never chunk text — the key is computed BEFORE
  * dropDuplicates so the state store holds one long per seen chunk),
  * sharded by hash, checkpointed. First arrival wins across micro-batches;
  * the batch-equivalence spec pins the streamed chunk set row-for-row to
  * t27 on identical input.
  */
object StreamingChunks {

  /** Stateless chunk explode: docs (doc_id, text, ...) → the t27 chunk
    * rows (doc_id, chunk_idx, start_tok, chunk_tokens, chunk_hash).
    */
  def chunkStream(docs: DataFrame): DataFrame =
    TextOps.ragChunkRows(docs)

  /** Chunk-grain exact dedup: first occurrence of each distinct chunk
    * hash survives, later copies (same boilerplate in other documents,
    * or replayed input) are dropped. Unbounded state = one long per
    * distinct chunk; bound it with the source's retention horizon the
    * same way StreamingDedup.dedupStreamWithinWatermark does when ingest
    * is continuous.
    */
  def chunkDedupStream(docs: DataFrame): DataFrame =
    chunkStream(docs).dropDuplicates("chunk_hash")
}
