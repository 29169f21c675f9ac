package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t22's sliced-rank skew hazard, upgraded from prose to handled: the
  * decomposed hot-bin path must reproduce the naive global window's
  * ranks EXACTLY on a planted pathological corpus (one exact score held
  * by most documents, straddling both tercile cuts).
  */
class HotBinRankSpec extends SparkSpec {
  import spark.implicits._

  // 5000 docs share ONE exact score (sparse stride-83 ids — the worst
  // case for doc_id chunking), 600 docs spread across other bins above
  // and below, including exact ties inside cold bins
  private def planted = {
    val tied = (0 until 5000).map(i => (i * 83L + 7, 123456789L))
    val spread = (0 until 600).map(i =>
      (900000L + i, (i % 37L) * TextOps.PPL_BIN_W / 5 + (i % 7L)))
    (tied ++ spread).toDF("doc_id", "lm_score")
  }

  private def naiveRanks = {
    val w = Window.orderBy(col("lm_score").desc, col("doc_id"))
    planted
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("tot", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("doc_id", "lm_score", "rnk", "tot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
  }

  private def ranksAt(threshold: Long) =
    TextOps.slicedRanks(planted, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)

  test("hot-path decomposed ranks equal the naive global window on the planted skew corpus") {
    val naive = naiveRanks
    // threshold 100: the 5000-tie bin AND several spread bins go hot
    assert(ranksAt(100L) == naive, "decomposed hot-bin ranks diverged from ground truth")
    // threshold 0: EVERY bin takes the decomposed path
    assert(ranksAt(0L) == naive, "all-hot decomposition diverged from ground truth")
    // huge threshold: the original all-cold single-window path
    assert(ranksAt(Long.MaxValue) == naive, "cold path regressed")
  }

  test("registered t22 buckets are invariant to forcing the hot path") {
    val d = "/root/testdata/sf0.001"
    val registered = TextOps.ccnetBuckets(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // rebuild buckets from t22's own (doc_id, lm_score) through the
    // forced-hot rank path — the tercile labels must not move
    val doc = TextOps.ccnetBuckets(spark, d).select("doc_id", "lm_score")
    val forced = TextOps.slicedRanks(doc, hotThreshold = 0L)
      .select(col("doc_id"), col("lm_score"),
        when(lit(3L) * col("rnk") <= col("tot"), "head")
          .when(lit(3L) * col("rnk") <= lit(2L) * col("tot"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(forced == registered)
  }
}
