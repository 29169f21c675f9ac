package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stop-shingle posting-list cap (the d03/d07 skew defense): a shingle
  * shared by more than maxPostingLen docs must be dropped BEFORE pair
  * emission, so a boilerplate phrase can neither emit k(k-1)/2 pairs nor
  * materialize an unbounded aggregate row.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs sharing exactly one stop-shingle ("S1 S2 S3", plen 6) plus one
  // genuine near-dup pair (101, 102) whose shingles are all rare.
  private lazy val base = {
    val boiler = (1 to 6).map(i => (i.toLong, "en", 0, s"S1 S2 S3 u$i v$i"))
    val neardup = Seq((101L, "en", 0, "P Q R T U"), (102L, "en", 0, "P Q R T V"))
    (boiler ++ neardup).toDF("doc_id", "lang", "band", "text")
  }

  test("cap drops stop-shingle pairs, keeps genuine near-dups") {
    // uncapped: the stop-shingle alone links all 6 boilerplate docs
    // (common=1, union=5, 10 >= 5) -> C(6,2)=15 pairs, plus (101,102)
    val uncapped = Dedup.ngramJaccardPairsOn(base, maxPostingLen = 1000).collect()
    assert(uncapped.length == 16)
    // capped at 5 < 6: boilerplate pairs vanish; the near-dup pair keeps
    // its full common/union (its shingles are under the cap)
    val capped = Dedup.ngramJaccardPairsOn(base, maxPostingLen = 5).collect()
    assert(capped.length == 1)
    val r = capped.head
    assert(r.getLong(0) == 101L && r.getLong(1) == 102L)
    assert(r.getLong(2) == 2L)      // common: "P Q R", "Q R T"
    assert(r.getLong(3) == 4L)      // union: 3 + 3 - 2
  }

  test("dropped stop-shingles are observable with their heat") {
    val dropped = Dedup.stopShingles(base, maxPostingLen = 5).collect()
    assert(dropped.length == 1)
    assert(dropped.head.getAs[String]("sh") == "S1 S2 S3")
    assert(dropped.head.getAs[Long]("plen") == 6L)
    assert(Dedup.stopShingles(base, maxPostingLen = 6).isEmpty)
  }

  test("cap bounds the largest aggregate row") {
    val maxIds = Dedup.shingleGroups(base, maxPostingLen = 3)
      .agg(max(size(col("ids")))).collect().head.getInt(0)
    assert(maxIds <= 3)
  }

  test("capped pair aggregation adds no extra shuffle over the posting table") {
    // the plen window and the posting-group aggregate hash-partition on the
    // same (lang, band, sh) keys, so they share ONE exchange; the only
    // other exchange is the pre-existing shingle distinct on (doc_id, sh).
    // The cap itself must not introduce a third.
    val plan = Dedup.shingleGroups(base, maxPostingLen = 5)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges in:\n$plan")
    // and the window really does sit directly under the aggregate
    assert(plan.contains("Window"))
  }
}
