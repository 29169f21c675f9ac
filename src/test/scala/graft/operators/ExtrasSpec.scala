package graft.operators

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q26 contract: every within_10pct boolean holds (the oracle's TRUE face)") {
    Extras.approxDistinct(spark, sfDir).collect().foreach { r =>
      assert(r.getBoolean(2),
        s"flag=${r.getString(0)} exact=${r.getLong(1)} estimate drifted past 10% (5 sigma at rsd 0.02)")
    }
  }

  test("q26 distinct-then-count equals the multi-distinct Expand form bit-for-bit") {
    import org.apache.spark.sql.functions._
    // HLL registers are set-functions: deduping the input cannot change
    // the sketch, so the cheap pre-distinct plan must reproduce the
    // Expand plan's EXACT values — estimate included, not just the count
    val li = graft.Tables.lineitem(spark, sfDir)
    val expand = li
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val preDistinct = li
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(preDistinct == expand)
    // and the registered q26 plan really dropped the Expand
    val plan = Extras.approxDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1500))
  }

  test("q52 recursive CTE: full month spine, zero-order months gap-filled") {
    val rows = Advanced.recursiveCte(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2))))
    assert(rows.length == 84) // 1992-01 .. 1998-12, recursion-generated
    assert(rows.head._1 == 199201 && rows.last._1 == 199812)
    // month arithmetic never produces an invalid yyyymm
    assert(rows.forall { case (ym, _, _) => ym % 100 >= 1 && ym % 100 <= 12 })
    // the point of the spine: months with no orders still appear (TPC-H
    // order dates stop 1998-08-02), with NULL sum
    val empty = rows.filter(_._2 == 0L)
    assert(empty.nonEmpty && empty.forall(_._3.isEmpty))
  }

  test("q56 islands partition each user's day set into maximal consecutive runs") {
    import org.apache.spark.sql.functions._
    val islands = Advanced.gapsIslands(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // island length == span (runs are gap-free), and islands don't touch
    // (a gap of >= 1 day separates consecutive islands — else they'd be one)
    islands.foreach { case (_, s, e, n) => assert(n == e - s + 1) }
    islands.groupBy(_._1).values.foreach { is =>
      is.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
    }
    // reconstructing the islands reproduces the exact distinct day set
    val fromIslands = islands.flatMap { case (u, s, e, _) => (s to e).map(u -> _) }.toSet
    val days = graft.Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(to_date(col("ts").cast("timestamp")),
          lit("1992-01-01").cast("date")).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIslands == days)
  }

  test("q55 exact power-sum moments agree with Spark's built-in stat aggregates") {
    import org.apache.spark.sql.functions._
    // The registered query avoids stddev_samp/corr/regr_* because their
    // streaming-merge rounding is engine- and partition-order-dependent;
    // this pins that the exact-integer derivation IS those aggregates
    // (to float tolerance), so the built-in surface is covered.
    val exact = Extras.statsMoments(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("var_x"), r.getAs[Double]("stddev_x"),
          r.getAs[Double]("corr_xy"), r.getAs[Double]("slope_yx"),
          r.getAs[Double]("intercept_yx"))).toMap
    val builtin = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity")).cast("double").as("x"),
        floor(col("l_extendedprice")).cast("double").as("y"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(var_samp(col("x")).as("v"), stddev_samp(col("x")).as("sd"),
        corr(col("x"), col("y")).as("c"),
        regr_slope(col("y"), col("x")).as("sl"),
        regr_intercept(col("y"), col("x")).as("ic"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(exact.keySet == builtin.keySet)
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    exact.foreach { case (k, (v, sd, c, sl, ic)) =>
      val (bv, bsd, bc, bsl, bic) = builtin(k)
      assert(close(v, bv) && close(sd, bsd) && close(c, bc) &&
        close(sl, bsl) && close(ic, bic),
        s"$k exact=($v,$sd,$c,$sl,$ic) builtin=($bv,$bsd,$bc,$bsl,$bic)")
    }
  }

  test("WeightedMean UDAF equals the decimal-exact SQL formulation") {
    val udafRes = Extras.weightedAvgPrice(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.Tables.registerAll(spark, sfDir)
    val sqlRes = spark.sql(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(udafRes == sqlRes)
  }

  test("q63: union of per-group HLL sketches ≡ direct global sketch (re-aggregatability)") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d).select(col("event_type"), col("user_id"))
    // union-of-parts: the materialized-view path (no fact rescan)
    val viaUnion = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    // direct: sketch the raw column in one pass
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))))
      .collect()(0).getLong(0)
    assert(viaUnion == direct,
      "HLL union must lose nothing vs sketching raw data (register-max merge)")
    // and the estimate honors the 2% output contract vs exact
    val exact = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(viaUnion.toDouble - exact) <= 0.02 * exact)
  }

  test("q63 output booleans are all true and levels complete") {
    val rows = Extras.hllRollup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getString(0)).count(_ == "total") == 1)
    assert(rows.forall(_.getBoolean(3)))
  }

  // ------------------------------------------------------------ q68 KMV
  test("kmv sketch: exact below k, distinct-insert dedup, ascending output") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.expressions.KmvSketch
    // 10 distinct values with heavy duplication, k = 8: sketch = the 8
    // smallest distinct values, ascending
    val vals = (1L to 10L).flatMap(v => Seq.fill(5)(v * 100L))
    val sk = vals.toDF("v").agg(KmvSketch.sketch(col("v"), 8)).collect()(0)
      .getSeq[Long](0)
    assert(sk == (1L to 8L).map(_ * 100L))
  }

  test("kmv sketch mergeability: k-min of per-part sketches == whole-data sketch") {
    import org.apache.spark.sql.functions._
    import graft.expressions.KmvSketch
    val d = "/root/testdata/sf0.001"
    val hv = graft.Tables.events(spark, d).select(
      (col("event_id") % 7).as("part"),
      Dedup.baseHash(col("user_id").cast("string")).as("hv"))
    val k = 8 // < 15 distinct users, so the bounded path is exercised
    // parts → sketches → fold sketch arrays (never re-reading facts)
    val viaParts = hv.groupBy("part")
      .agg(KmvSketch.sketch(col("hv"), k).as("sk"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k))
      .collect()(0).getSeq[Long](0)
    val direct = hv.agg(KmvSketch.sketch(col("hv"), k))
      .collect()(0).getSeq[Long](0)
    assert(viaParts == direct,
      "KMV union must equal the sketch of the union (k-min property)")
  }

  test("q68 estimator accuracy: per-day estimates within 4/sqrt(k-2) of exact") {
    import org.apache.spark.sql.functions._
    // sf0.01 is the scale where per-day audiences (~130) exceed k=64 and
    // the (k-1)·D/h_k path is live; 4σ with CV = 1/√(k−2) ≈ 12.7%
    val d = "/root/testdata/sf0.01"
    val rows = Extras.kmvAudienceOverlap(spark, d).collect()
    assert(rows.length == 29, "30 event days -> 29 consecutive pairs")
    val exact = graft.Tables.events(spark, d)
      .groupBy(to_date(TimeWindows.eventTime).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tol = 4.0 / math.sqrt(62.0)
    rows.foreach { r =>
      val (da, ea) = (r.getString(0), r.getLong(2))
      val ex = exact(da).toDouble
      assert(math.abs(ea - ex) / ex <= tol, s"day=$da est=$ea exact=$ex")
      // inclusion–exclusion stays in sane set-algebra bounds
      assert(r.getLong(4) >= math.max(r.getLong(2), r.getLong(3)),
        "union estimate below a side's estimate")
      assert(r.getLong(5) >= 0L && r.getLong(6) <= 1000000L)
    }
  }
}
