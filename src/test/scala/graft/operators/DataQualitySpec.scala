package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.cdc.CdcQueries

/** Invariants for c06 SCD2 history, q64 FK audit, and p14 semantic
  * decontamination (exact values are DuckDB-oracled by the driver).
  */
class DataQualitySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("c06: the is_current slice equals c01 latest-state exactly") {
    val current = CdcQueries.scd2History(spark, d)
      .filter(col("is_current"))
      .select("db", "tbl", "id", "name", "amount")
      .collect().map(_.toSeq).toSet
    val latest = CdcQueries.latestState(spark, d)
      .collect().map(_.toSeq).toSet
    assert(current == latest)
  }

  test("c06: at most one current version per entity; versions consecutive from 1") {
    val rows = CdcQueries.scd2History(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        r.getLong(3), r.getBoolean(6)))
    val byEntity = rows.groupBy(_._1)
    byEntity.foreach { case (k, vs) =>
      assert(vs.count(_._3) <= 1, s"$k has multiple current versions")
      assert(vs.map(_._2).sorted.toSeq == (1L to vs.length).toSeq,
        s"$k versions not consecutive: ${vs.map(_._2).sorted.toSeq}")
    }
    assert(rows.nonEmpty)
  }

  test("c06: differing payloads at one binlog coordinate both survive, deterministically ordered") {
    import spark.implicits._
    // F8 promises redeliveries are byte-identical; if that contract is
    // ever violated (two DIFFERENT payloads at one coordinate), the
    // history must mirror the oracle's SELECT DISTINCT — keep both as
    // versions, ordered by the payload tiebreak — rather than Spark
    // silently keeping an arbitrary one (the ADVICE r11 case)
    val changes = Seq(
      ("db1", "acct", 1L, "I", Map("id" -> "1", "name" -> "a", "amount" -> "10"),
        "f1", 10L, 0L),
      ("db1", "acct", 1L, "U", Map("id" -> "1", "name" -> "b", "amount" -> "20"),
        "f1", 20L, 0L), // same coordinate as the next row, different payload
      ("db1", "acct", 1L, "U", Map("id" -> "1", "name" -> "c", "amount" -> "30"),
        "f1", 20L, 0L),
      ("db1", "acct", 1L, "U", Map("id" -> "1", "name" -> "c", "amount" -> "30"),
        "f1", 20L, 0L)) // byte-identical redelivery: must still collapse
      .toDF("db", "tbl", "id", "op", "after", "file", "pos", "row")
    val out = CdcQueries.scd2HistoryFrom(changes).collect()
    assert(out.map(r => (r.getLong(3), r.getString(4))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "I + both U payloads survive; the redelivery collapses; name tiebreak orders the tie")
    assert(out.map(_.getBoolean(6)).toSeq == Seq(false, false, true))
  }

  test("q64: the synthetic star schema is referentially intact (7 checks, 0 orphans)") {
    val rows = Relational2.fkAudit(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 7)
    rows.foreach { case (fk, n, orphans) =>
      assert(n > 0, s"$fk audited an empty child table")
      assert(orphans == 0L, s"$fk reports $orphans orphans on consistent data")
    }
  }

  test("q64 semantics: null and dangling FKs both count as orphans") {
    import spark.implicits._
    // replicate the check's anti-join contract on a planted frame
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = child.join(broadcast(parent), col("fk") === col("pk"), "left_anti").count()
    assert(orphans == 2L, "dangling (99) and null FK must both survive the anti join")
  }

  test("p14 matches a brute-force max-cosine reference") {
    val all = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    val (bench, corpus) = all.partition(_._1 < 16)
    def norm(v: Array[Long]) = math.sqrt(v.map(x => x * x).sum.toDouble)
    val expect = corpus.map { case (cid, cv) =>
      val cn = norm(cv)
      val (bid, cos) = bench.map { case (bid, bv) =>
        (bid, bv.zip(cv).map { case (x, y) => x * y }.sum.toDouble / (norm(bv) * cn))
      }.minBy { case (bid, c) => (-c, bid) }
      (cid, bid, cos)
    }.sortBy { case (cid, _, c) => (-c, cid) }.take(50).toSeq

    val got = Similarity.semanticDecontam(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
  }
}
