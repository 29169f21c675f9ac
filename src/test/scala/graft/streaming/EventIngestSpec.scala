package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ScalePatterns

/** Streaming daily-partitioned event ingest: append-only day directories,
  * exactly-once restarts off the checkpoint + sink manifest, and
  * listing-level pruning for readers of the landed table.
  */
class EventIngestSpec extends SparkSpec {
  import spark.implicits._

  private def parquetListing(p: String): Map[Path, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(p)).iterator().asScala
      .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet") &&
        !f.toString.contains("_spark_metadata"))
      .map(f => f -> Files.size(f)).toMap
  }

  test("ingest lands event-time day partitions append-only; restarts are exactly-once; readers prune") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("evt-ingest").toString
    val out = s"$dir/events"
    val ckpt = s"$dir/ckpt"
    def at(day: Int, hour: Int) = LocalDateTime.of(2024, 1, day, hour, 0, 0)
    val mem = MemoryStream[(Long, LocalDateTime, Double)]
    def drain(): Unit = {
      val q = EventIngest.start(mem.toDF().toDF("event_id", "ts", "value"),
        out, ckpt)
      q.awaitTermination()
    }
    // the stream's ts is TIMESTAMP_NTZ — the same type the batch table
    // carries, so this IS the NTZ layout story's landing path
    assert(mem.toDF().toDF("event_id", "ts", "value").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)

    // day 1-2 arrive; one AvailableNow drain
    mem.addData((1L, at(1, 3), 10.0), (2L, at(1, 17), 20.0), (3L, at(2, 8), 30.0))
    drain()
    val days1 = Files.list(Paths.get(out)).iterator()
    import scala.jdk.CollectionConverters._
    val dirs1 = days1.asScala.map(_.getFileName.toString).filter(_.startsWith("day=")).toSet
    assert(dirs1 == Set("day=2024-01-01", "day=2024-01-02"), dirs1)
    val before = parquetListing(out)

    // restart with NO new data: nothing replays, nothing lands
    drain()
    assert(parquetListing(out) == before, "empty restart changed the table")

    // day 3 plus a LATE day-1 event: append-only, late row joins ITS day
    mem.addData((4L, at(3, 9), 40.0), (5L, at(1, 23), 50.0))
    drain()
    val after = parquetListing(out)
    assert(before.forall { case (f, sz) => after.get(f).contains(sz) },
      "ingest rewrote or removed an existing file")
    assert(after.size > before.size)

    // the landed table reads exactly-once through the sink manifest and
    // prunes at listing: a day-1 range query scans ONLY day-1's rows
    val table = spark.read.parquet(out)
    val q = ScalePatterns.eventRange(table, "ts",
      "2024-01-01 00:00:00", "2024-01-01 23:59:59")
    val rows = q.select("event_id", "value").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0), (5L, 50.0)),
      s"day-1 read wrong rows: $rows")
    val scanLine = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("day"),
      s"no day partition filter:\n$scanLine")
    // whole-table read sees every event exactly once (no double-append)
    assert(table.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))

    // ---- lifecycle tail: finalize -> compact the closed day-1
    // day-1 holds the original file PLUS the late-arrival file
    def dayFiles(day: String) = parquetListing(s"$out/day=$day")
    assert(dayFiles("2024-01-01").size >= 2,
      "late arrival did not add a second day-1 file — premise broken")
    val day2Before = dayFiles("2024-01-02")
    // compaction refuses while the sink manifest still governs reads
    val ex = intercept[IllegalArgumentException](
      ScalePatterns.compactDay(spark, out, "2024-01-01"))
    assert(ex.getMessage.contains("finalizeStreamTable"), ex.getMessage)
    ScalePatterns.finalizeStreamTable(out)
    ScalePatterns.compactDay(spark, out, "2024-01-01")
    assert(dayFiles("2024-01-01").size == 1, "day-1 did not fold to one file")
    assert(dayFiles("2024-01-02") == day2Before, "compaction touched day-2")
    // content identical, pruning intact, post-finalize listing semantics
    val compacted = spark.read.parquet(out)
    assert(compacted.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    val q2 = ScalePatterns.eventRange(compacted, "ts",
      "2024-01-01 00:00:00", "2024-01-01 23:59:59")
    assert(q2.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 5L))

    // ---- retention: expire days before the cutoff; keep the rest
    val dropped = ScalePatterns.expireDays(out, "2024-01-02")
    assert(dropped == Seq("2024-01-01"), dropped)
    assert(!Files.exists(Paths.get(s"$out/day=2024-01-01")))
    assert(spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L),
      "retention dropped or kept the wrong rows")
    // idempotent: nothing older remains
    assert(ScalePatterns.expireDays(out, "2024-01-02").isEmpty)
    // malformed cutoff refuses before touching anything
    val bad = intercept[IllegalArgumentException](
      ScalePatterns.expireDays(out, "Jan 2, 2024"))
    assert(bad.getMessage.contains("yyyy-MM-dd"))
  }
}
