package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Shared landing/compaction mechanics for the append-only sketch logs
  * (StreamingHistogram, StreamingKmv): per-batch delta partitions keyed
  * by `batch_id`, folded at read time under each sketch's merge law.
  *
  * Two concurrency rules, both learned the hard way:
  *
  *   - [[land]] scopes dynamic-partition overwrite to the ONE writer via
  *     the DataFrameWriter option, never by toggling
  *     `spark.sql.sources.partitionOverwriteMode` on the session: with
  *     two foreachBatch streams sharing a SparkSession, one stream's
  *     finally-restore can land while the other stream's write is
  *     planning, flipping that write to static mode — and a static
  *     `mode("overwrite")` deletes EVERY existing batch_id partition
  *     (the whole log), not just the batch's own.
  *   - [[compact]] folds only the partitions ENUMERATED at snapshot
  *     time and moves exactly those out during the swap, so a batch
  *     landed by a still-running absorb between the snapshot and the
  *     swap survives in place instead of vanishing with a whole-dir
  *     rename. The folded copy is fully written beside the log BEFORE
  *     any move (a completed write action, not a localCheckpoint whose
  *     non-reproducible blocks would be lost with an executor), so
  *     nothing ever needs recomputing after the source partitions move.
  */
object SketchLog {

  /** Land one batch's delta partition idempotently: a replayed batch
    * replaces its own `batch_id=N` partition and nothing else.
    */
  def land(delta: DataFrame, path: String): Unit =
    delta.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** The `batch_id=*` partition dirs currently present in the log. */
  def partitions(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (!f.isDirectory) Seq.empty
    else f.listFiles().filter(d => d.isDirectory && d.getName.startsWith("batch_id="))
      .map(_.getName).toSeq.sorted
  }

  /** Fold the snapshot-enumerated partitions into the `batch_id=-1`
    * sentinel under the caller's merge law (`fold` sees the unioned
    * delta rows WITHOUT the batch_id column and returns the folded
    * frame, also without it). The sentinel is -1 because streaming
    * batchIds start at 0: a stream restarted on a FRESH checkpoint
    * re-lands batch_id=0, and had history been folded there, that
    * dynamic overwrite would silently replace the entire compacted log.
    * No micro-batch can ever produce -1, so the folded partition is
    * collision-proof (a re-compaction enumerates and re-folds it like
    * any other partition).
    *
    * Swap discipline: folded copy fully written beside the log; then the
    * snapshot partitions move to `__old`, the folded `batch_id=-1` moves
    * in, `__old` is dropped. Crash mid-swap ⇒ recovery is moving
    * `__old/ *` back and deleting `__compact`. Partitions landed after
    * the snapshot are untouched on both the success and recovery paths;
    * a REPLAY of a snapshot partition that lands mid-swap is dropped
    * with `__old`, which is correct — its rows are already inside the
    * fold. Readers racing the move window can transiently miss the
    * folded history, so run compact from the maintenance path, not
    * under live dashboards (the compactExactIndex discipline).
    */
  def compact(s: SparkSession, path: String, fold: DataFrame => DataFrame): Unit = {
    val dir = Paths.get(path)
    val snap = partitions(path)
    if (snap.isEmpty) return
    val folded = fold(s.read.option("basePath", path)
        .parquet(snap.map(p => s"$path/$p"): _*)
        .drop("batch_id"))
      .withColumn("batch_id", lit(-1L))
    val tmp = path + "__compact"
    val old = path + "__old"
    Dedup.deleteTreeIfExists(Paths.get(tmp))
    Dedup.deleteTreeIfExists(Paths.get(old))
    folded.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    Files.createDirectories(Paths.get(old))
    snap.foreach { p =>
      val live: Path = dir.resolve(p)
      if (Files.exists(live)) Files.move(live, Paths.get(old).resolve(p))
    }
    Files.move(Paths.get(tmp).resolve("batch_id=-1"), dir.resolve("batch_id=-1"))
    Dedup.deleteTreeIfExists(Paths.get(old))
    Dedup.deleteTreeIfExists(Paths.get(tmp))
  }
}
