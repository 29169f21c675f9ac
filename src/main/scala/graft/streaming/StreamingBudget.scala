package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget admission — the stateful face of the batch p07
  * mixture sampler. The batch sampler's deterministic hash threshold works
  * unchanged on a stream (it is stateless), but it enforces a RATE, not a
  * CAP: "admit ~30% of src7" keeps admitting forever. The contract a
  * continuous-ingest mixture actually needs is "admit src7 docs until its
  * N-token budget is spent, then stop" — a running counter that must
  * survive micro-batches, i.e. keyed state.
  *
  * State is two longs per key (admitted tokens, admitted docs) — constant
  * per key, never document bodies. Admission is admit-while-under: a doc
  * is admitted iff the budget was not yet exhausted when it arrived, so
  * the final admitted doc may overshoot by less than one document — the
  * standard quota semantics (rejecting it instead would starve a budget
  * sitting one token short forever).
  *
  * In-batch arrival order is made deterministic by sorting each batch's
  * group on `seq` (the binlog-position discipline of the CDC layer:
  * shuffle arrival order is not a contract, the stream's own sequence
  * is). Cross-batch order is trigger order, which Structured Streaming
  * already guarantees per key.
  *
  * Scale note: keying by bare `source` (~20 values) would serialize each
  * source's admission through one state-store task — the same
  * low-cardinality hazard p04/p06 fixed in batch. `shards` splits every
  * source's budget across (source, doc_id % shards) sub-keys, each
  * enforcing budget/shards: state parallelism grows shards-fold and the
  * total admitted overshoot is bounded by one doc per shard. shards=1 is
  * the exact single-counter form for low-rate sources.
  */
object StreamingBudget {

  final case class Doc(docId: Long, source: String, nTokens: Long, seq: Long)
  final case class ShardState(admittedTokens: Long, admittedDocs: Long)
  final case class Admission(docId: Long, source: String, shard: Int,
      admitted: Boolean, shardTokens: Long)

  /** docs (streaming) → one admission verdict per doc, append-mode.
    * `budgets`: per-source token budget; absent sources are unlimited.
    */
  def admissions(spark: SparkSession, docs: Dataset[Doc],
      budgets: Map[String, Long], shards: Int = 1): Dataset[Admission] = {
    import spark.implicits._
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // floorMod: Scala % follows the dividend's sign, so a negative docId
    // would mint an out-of-range shard with its own budget slice
    docs.groupByKey(d => (d.source, math.floorMod(d.docId, shards).toInt))
      .flatMapGroupsWithState[ShardState, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((source, shard), batch, state: GroupState[ShardState]) =>
          val shardBudget = budgets.get(source)
            .map(b => math.max(1L, b / shards)).getOrElse(Long.MaxValue)
          val prev = state.getOption.getOrElse(ShardState(0L, 0L))
          var tokens = prev.admittedTokens
          var nDocs = prev.admittedDocs
          val out = batch.toSeq.sortBy(_.seq).map { d =>
            val admit = tokens < shardBudget
            if (admit) { tokens += d.nTokens; nDocs += 1 }
            Admission(d.docId, source, shard, admit, tokens)
          }
          state.update(ShardState(tokens, nDocs))
          out.iterator
      }
  }
}
