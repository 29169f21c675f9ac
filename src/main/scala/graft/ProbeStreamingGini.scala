package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingGini

/** Scale-grade probe for StreamingGini (the q76 sketch-log face) — the
  * absorb/fold/read timing row every sketch-log family records once it
  * graduates past spec scale (histogram, KMV, CMS, PIT precedent).
  *
  * Reads the SF dir's events table, splits it into `BATCHES` disjoint
  * batches by event_id residue (a batch-split the spec proves
  * invariant), and times the three lifecycle phases the dashboard
  * pays: absorb (per-batch delta rollup + idempotent landing), compact
  * (fold the aged log to one partition), and the gini read (replay the
  * batch Lorenz kernel over the folded rollup). Emits one JSON line:
  *
  *   {"probe":"streaming_gini","sf":…,"batches":N,
  *    "absorb_total_sec":…,"absorb_max_sec":…,
  *    "read_pre_compact_sec":…,"compact_sec":…,"read_sec":…,
  *    "gini_rows":…}
  *
  * The read is timed AFTER a warm read (parquet footers, codegen), so
  * the number prices the steady-state dashboard call, and both reads
  * are checked equal to the batch operator over the same events — the
  * probe is a correctness gate too, not just a stopwatch.
  */
object ProbeStreamingGini {
  val BATCHES = 8

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = Files.createTempDirectory("sgini_probe").toString + "/log"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val events = Tables.events(spark, sfDir).localCheckpoint(true)
    val absorbs = (0 until BATCHES).map { i =>
      val b = events.filter(pmod(col("event_id"), lit(BATCHES)) === i)
      timed(StreamingGini.absorb(b, i.toLong, path))._2
    }
    val (preRows, readPre) = timed(
      StreamingGini.gini(spark, path).collect())
    val (_, compactSec) = timed(StreamingGini.compact(spark, path))
    StreamingGini.gini(spark, path).collect() // warm read, untimed
    val (rows, readSec) = timed(StreamingGini.gini(spark, path).collect())
    // correctness gate: streamed (pre- AND post-compaction) ≡ batch
    val batch = graft.operators.Extras.revenueGiniOf(events).collect()
    require(rows.toSeq.map(_.toSeq) == batch.toSeq.map(_.toSeq),
      "streamed read != batch q76 — probe is invalid")
    require(preRows.toSeq.map(_.toSeq) == batch.toSeq.map(_.toSeq),
      "pre-compaction read != batch q76 — probe is invalid")
    val line =
      f"""{"probe":"streaming_gini","sf":"$sfDir","batches":$BATCHES,""" +
      f""""absorb_total_sec":${absorbs.sum}%.3f,""" +
      f""""absorb_max_sec":${absorbs.max}%.3f,""" +
      f""""read_pre_compact_sec":$readPre%.3f,""" +
      f""""compact_sec":$compactSec%.3f,"read_sec":$readSec%.3f,""" +
      s""""gini_rows":${rows.length}}"""
    println(line)
    spark.stop()
  }
}
