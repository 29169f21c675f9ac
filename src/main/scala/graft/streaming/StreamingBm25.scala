package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Bm25Index

/** Streaming BM25 serving: an unbounded stream of search queries answered
  * against the persisted [[Bm25Index]] — the text-retrieval sibling of
  * StreamingAnn's vector serving, with the same production stance:
  *
  *  - the index is FROZEN state on disk; serving holds NO streaming state
  *    at all (no watermarks, no stateful aggregation) — each micro-batch
  *    is a closed set of queries answered by the stateless batch probe,
  *    so the result for a query is independent of every other batch and
  *    a restart from offsets alone is exact;
  *  - index refreshes are offsets-only restarts against the new index dir
  *    (the StreamingAnn/StreamingNearDedup refresh story);
  *  - per batch, driver-side state is the batch's distinct term list —
  *    bounded by the query arrival rate, never by the corpus.
  *
  * Input schema: (query_id INT, terms ARRAY<STRING>) — one row per query.
  * Each batch's answers (query_id, rank, doc_id, score, batch_id) go to
  * the caller's sink callback, which makes the exactly-once story the
  * sink's manifest discipline (EventIngest) rather than re-scoring.
  */
object StreamingBm25 {

  def serve(queries: DataFrame, dir: String, k: Int = 5,
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    checkpoint.foldLeft(queries.writeStream)(
        (w, c) => w.option("checkpointLocation", c))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // bounded collect: one (id, terms) row per query in THIS batch —
        // the serving contract is interactive query arrival, not a bulk
        // reindex (bulk scoring is the batch probe)
        val qs = batch.select(col("query_id"), col("terms")).collect()
          .map(r => (r.getInt(0), r.getSeq[String](1).toSeq)).toSeq
        if (qs.nonEmpty) {
          val answered = Bm25Index.probe(batch.sparkSession, dir, qs, k)
            .withColumn("batch_id", lit(batchId))
          sink(answered, batchId)
        }
        ()
      }
      .start()
}
