package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantic properties of the second relational tranche (the DuckDB oracle
  * already pins exact values at sf0.01; these pin the algebraic meaning at
  * sf0.001 so a wrong-but-matching oracle can't slip through).
  */
class Relational2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q36 multiset counts satisfy except = views - min(views, clicks)") {
    val e = Tables.events(spark, sf)
    val perUser = e.groupBy("user_id").agg(
      count(when(col("event_type") === "view", 1)).as("v"),
      count(when(col("event_type") === "click", 1)).as("c"))
    val expected = perUser
      .withColumn("n_except", greatest(col("v") - col("c"), lit(0L)))
      .withColumn("n_intersect", least(col("v"), col("c")))
      .filter(col("n_except") > 0 || col("n_intersect") > 0)
      .select("user_id", "n_except", "n_intersect")
    val got = Relational2.multisetOps(spark, sf)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("q37 arg aggregates equal the window-rank formulation") {
    val e = Tables.events(spark, sf)
    val byMaxId = e.groupBy("event_type").agg(max("event_id").as("event_id"))
      .join(e, Seq("event_type", "event_id"))
      .select(col("event_type"), col("value").as("last_value"))
    val got = Relational2.argMinMax(spark, sf).select("event_type", "last_value")
    assert(got.exceptAll(byMaxId).isEmpty && byMaxId.exceptAll(got).isEmpty)
  }

  test("q38 string agg is sorted and complete per source") {
    val rows = Relational2.stringAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("doc_ids").split(",")
      assert(ids.length == r.getAs[Long]("n_docs"))
      assert(ids.sameElements(ids.sorted))
    }
  }

  test("q39 posexplode positions are dense from 0 per doc") {
    val rows = Relational2.posExplodeTokens(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    rows.values.foreach { rs =>
      val pos: Seq[Int] = rs.map(_.getAs[Int]("pos")).toSeq.sorted
      assert(pos == pos.indices.toList)
    }
  }

  test("q47 sliced global ranks equal the single-window form on negatives, ties, and nulls") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial fixture: negative values (negative bins), exact ties
    // (cross- and within-bin), nulls, NaN (sorts above every double, but
    // floor(NaN·100) would land it in bin 0), and bin-edge values
    val df = Seq(
      (1L, Some(-1.37)), (2L, Some(-1.37)), (3L, Some(-0.005)),
      (4L, Some(0.0)), (5L, None), (6L, Some(0.01)), (7L, Some(0.01)),
      (8L, Some(249.99)), (9L, Some(250.0)), (10L, None), (11L, Some(-0.004)),
      (12L, Some(Double.NaN)), (13L, Some(Double.NaN))
    ).toDF("event_id", "prev")
    val got = Relational2.slicedGlobalRanks(df, "prev", "event_id")
      .select("event_id", "rn_desc", "rn_asc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sortBy(_._1)
    val ref = df
      .withColumn("rn_desc", row_number().over(
        Window.orderBy(col("prev").desc_nulls_last, col("event_id"))))
      .withColumn("rn_asc", row_number().over(
        Window.orderBy(col("prev").asc_nulls_first, col("event_id"))))
      .select("event_id", "rn_desc", "rn_asc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sortBy(_._1)
    assert(got == ref)
  }

  test("q47 sliced ranks: property check over random values with nulls, ties, and negatives") {
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    // deterministic scalacheck sample: clustered values force cross-bin
    // and within-bin ties; scale mixes sub-cent and multi-bin magnitudes
    val gen = Gen.listOfN(400, Gen.frequency(
      (8, Gen.chooseNum(-500, 500).map(n => Some(n / 100.0))),
      (3, Gen.oneOf(-1.0, 0.0, 0.005, 0.01, 2.5).map(Some(_))),
      (1, Gen.const(Some(Double.NaN))),
      (2, Gen.const(Option.empty[Double]))))
    val vals = gen.apply(Gen.Parameters.default, rng.Seed(4242L)).get
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "prev")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(1), r.getInt(2))
    val got = Relational2.slicedGlobalRanks(df, "prev", "event_id")
      .select("event_id", "rn_desc", "rn_asc").collect().map(key).sortBy(_._1)
    val ref = df
      .withColumn("rn_desc", row_number().over(
        Window.orderBy(col("prev").desc_nulls_last, col("event_id"))))
      .withColumn("rn_asc", row_number().over(
        Window.orderBy(col("prev").asc_nulls_first, col("event_id"))))
      .select("event_id", "rn_desc", "rn_asc").collect().map(key).sortBy(_._1)
    assert(got.sameElements(ref))
  }

  test("d06 near-dup pairs are ordered, above threshold, and bucket-born") {
    val rows = Similarity.embeddingNearDupPairs(spark, sf, threshold = 0.5).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") >= 0.5)
    }
  }

  test("d06 seeded: planted near-dups are recalled through the LSH buckets") {
    // every planted vector (3x + rot(x)) should pair with its source at
    // cosine >= 0.8; LSH recall at that similarity is ~0.92/pair, so at
    // least one of the planted pairs must surface even on the tiny SF —
    // and every (original, original+OFFSET) pair that does surface must be
    // a true plant
    val rows = Similarity.embeddingNearDupPairsSeeded(spark, sf).collect()
    val planted = rows.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + Similarity.PLANT_ID_OFFSET)
    assert(planted.nonEmpty, "no planted pair recalled — seeding is broken")
    planted.foreach { r =>
      assert(r.getAs[Long]("id_a") % Similarity.PLANT_EVERY == 0)
      assert(r.getAs[Double]("cosine") >= 0.8)
    }
  }
}
