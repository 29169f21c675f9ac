package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted BM25 index lifecycle: probe ≡ the oracle-checked ad-hoc key,
  * append-only delta absorption ≡ full rebuild, torn-append recovery, and
  * the stateless streaming serving face ≡ the batch probe.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    Files.createTempDirectory("bm25idx").toString

  private def canon(df: DataFrame): Seq[String] =
    df.select("query_id", "rank", "doc_id", "score")
      .collect().map(_.toString).toSeq

  test("index probe equals the ad-hoc oracle-checked t19 result") {
    val dir = tmpDir()
    Bm25Index.write(graft.Tables.documents(spark, d), dir)
    val probed = canon(Bm25Index.probe(spark, dir, TextOps.BM25_QUERIES))
    val adhoc = canon(TextOps.bm25TopK(spark, d))
    assert(probed == adhoc)
  }

  test("append-only delta absorption answers exactly like a full rebuild") {
    val docs = graft.Tables.documents(spark, d)
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val incr = tmpDir(); val full = tmpDir()
    Bm25Index.write(base, incr)
    Bm25Index.append(delta, incr)
    Bm25Index.write(docs, full)
    assert(canon(Bm25Index.probe(spark, incr, TextOps.BM25_QUERIES)) ==
      canon(Bm25Index.probe(spark, full, TextOps.BM25_QUERIES)))
    // and the absorbed stats are the exact pair, not an approximation
    assert(new String(Files.readAllBytes(Paths.get(incr, "stats.meta")), "UTF-8") ==
      new String(Files.readAllBytes(Paths.get(full, "stats.meta")), "UTF-8"))
  }

  test("torn append (stale stats beside committed postings) is repaired idempotently") {
    val docs = graft.Tables.documents(spark, d)
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val dir = tmpDir(); val full = tmpDir()
    Bm25Index.write(base, dir)
    val staleStats = new String(Files.readAllBytes(Paths.get(dir, "stats.meta")), "UTF-8")
    Bm25Index.append(delta, dir)
    // simulate the crash window: postings committed, stats swap lost
    Files.write(Paths.get(dir, "stats.meta"), staleStats.getBytes("UTF-8"))
    Bm25Index.repairStats(spark, dir)
    Bm25Index.write(docs, full)
    assert(new String(Files.readAllBytes(Paths.get(dir, "stats.meta")), "UTF-8") ==
      new String(Files.readAllBytes(Paths.get(full, "stats.meta")), "UTF-8"))
    // repair is idempotent
    Bm25Index.repairStats(spark, dir)
    assert(canon(Bm25Index.probe(spark, dir, TextOps.BM25_QUERIES)) ==
      canon(Bm25Index.probe(spark, full, TextOps.BM25_QUERIES)))
  }

  test("a torn build (no layout stamp) refuses to probe") {
    val dir = tmpDir()
    Bm25Index.write(graft.Tables.documents(spark, d), dir)
    Files.delete(Paths.get(dir, "layout.meta"))
    val e = intercept[IllegalArgumentException] {
      Bm25Index.probe(spark, dir, TextOps.BM25_QUERIES)
    }
    assert(e.getMessage.contains("layout"))
  }

  test("streaming serving over the frozen index equals the batch probe, batch by batch") {
    val dir = tmpDir()
    Bm25Index.write(graft.Tables.documents(spark, d), dir)
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val got = scala.collection.mutable.Map[Long, Seq[String]]()
    val mem = MemoryStream[(Int, Seq[String])]
    val src = mem.toDF().toDF("query_id", "terms")
    val q = graft.streaming.StreamingBm25.serve(src, dir,
        checkpoint = Some(ckpt)) { (answered, batchId) =>
      got.synchronized { got(batchId) = canon(answered) }
    }
    val batches: Seq[Seq[(Int, Seq[String])]] = Seq(
      Seq(1 -> TextOps.BM25_QUERIES.head._2),
      TextOps.BM25_QUERIES.tail.map { case (id, ts) => (id, ts) })
    batches.foreach { rows => mem.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    // every served batch must equal the stateless batch probe of ITS queries
    val probes = batches.zipWithIndex.map { case (qs, i) =>
      i.toLong -> canon(Bm25Index.probe(spark, dir, qs))
    }.toMap
    assert(got.toMap == probes, s"streaming answers diverge: $got vs $probes")
  }
}
