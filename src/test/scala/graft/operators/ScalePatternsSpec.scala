package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(plan: SparkPlan): Int = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  /** numOutputRows of the (single) file scan in an EXECUTED plan — the
    * row-group/partition-skipping observable shared by the layout tests.
    */
  private def scanRows(p: SparkPlan): Option[Long] = p match {
    case a: AdaptiveSparkPlanExec => scanRows(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scanRows(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec =>
      Some(s.metrics("numOutputRows").value)
    case other => other.children.iterator.flatMap(scanRows).nextOption()
  }

  test("bucketed join on matching buckets compiles without a shuffle") {
    val d = "/root/testdata/sf0.001"
    ScalePatterns.writeBucketed(spark,
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    ScalePatterns.writeBucketed(spark,
      Tables.lineitem(spark, d).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    val joined = ScalePatterns.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    joined.count() // force AQE to finalize the plan
    assert(shuffleCount(joined.queryExecution.executedPlan) == 0,
      joined.queryExecution.executedPlan.toString)

    // control: the same join over plain parquet DOES shuffle
    val plain = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
    plain.count()
    assert(shuffleCount(plain.queryExecution.executedPlan) > 0)
  }

  test("salted join spreads a hot key and matches the plain join result") {
    // skewed probe: 10k rows of one key + a tail
    val probe = (Seq.fill(10000)(1L) ++ (2L to 100L)).toDF("k")
      .withColumn("pv", col("k") * 10)
    val build = (1L to 100L).toDF("k").withColumn("bv", col("k") + 1000)
    val plain = probe.join(build, "k").agg(count(lit(1)), sum("bv")).collect().head
    val salted = ScalePatterns.saltedJoin(probe, build, "k", salts = 8)
      .agg(count(lit(1)), sum("bv")).collect().head
    assert(plain == salted)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true in the final plan)") {
    // the OTHER half of the skew story: saltedJoin is the explicit
    // rewrite, AQE's OptimizeSkewedJoin is the runtime re-plan the same
    // code gets for free on a cluster. Thresholds are shrunk so the toy
    // hot key trips the same machinery a 100 TB hot key would.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = (Seq.fill(60000)(1L) ++ (2L to 100L)).toDF("k")
        .withColumn("pv", concat_ws("-", Seq.fill(8)(col("k")): _*))
      val build = (1L to 100L).toDF("k").withColumn("bv", col("k") + 1000)
      val joined = probe.join(build, "k")
      // materialize THIS frame's own queryExecution (count() would build
      // and adapt a different plan tree, leaving this one un-finalized)
      assert(joined.collect().length == 60000 + 99)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom-pruned join matches the plain join and prunes non-matching probe rows") {
    // spark.range, not a LocalRelation: ConvertToLocalRelation would fold
    // the probe filter at plan time and hide it from the plan assertions
    val probe = spark.range(1, 10001).toDF("k").withColumn("pv", col("k") * 10)
    // selective build side: 1% of the probe keys
    val build = spark.range(1, 10001, 100).toDF("k").withColumn("bv", col("k") + 7)
    val plain = probe.join(build, "k").select("k", "pv", "bv")
      .collect().map(_.toSeq).toSet
    val pruned = ScalePatterns.bloomPrunedJoin(probe, build, "k",
      expectedBuildKeys = 200L)
    assert(pruned.select("k", "pv", "bv").collect().map(_.toSeq).toSet == plain)
    // the probe must be the native codegen'd expression, not a boxing UDF
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(!planStr.contains("ScalaUDF"), planStr)
    assert(planStr.contains("might_contain"), planStr)
  }

  test("bloom-pruned join clamps an over-cap build estimate instead of throwing") {
    // 100 TB-scale expectedBuildKeys exceeds the session's runtime-bloom
    // maxNumItems/maxNumBits caps; the filter must degrade (higher fpp),
    // never AnalysisException, and the join stays exact
    val probe = spark.range(1, 1001).toDF("k").withColumn("pv", col("k") * 10)
    val build = spark.range(1, 1001, 100).toDF("k").withColumn("bv", col("k") + 7)
    val plain = probe.join(build, "k").select("k", "pv", "bv")
      .collect().map(_.toSeq).toSet
    val pruned = ScalePatterns.bloomPrunedJoin(probe, build, "k",
      expectedBuildKeys = 50000000000L)
    assert(pruned.select("k", "pv", "bv").collect().map(_.toSeq).toSet == plain)
  }

  test("sorted write layout: a range predicate reads a fraction of the bytes") {
    // same rows, two layouts: hash-scattered vs range-partitioned+sorted.
    // The pushed l_shipdate range filter can only skip row groups whose
    // min/max excludes it — impossible when every file spans the whole
    // date range, near-total when the layout clusters dates.
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("sorted-layout").toString
    // cast NTZ -> session-UTC TIMESTAMP: parquet row-group filtering has
    // no FilterPredicate conversion for TIMESTAMP_NTZ (the filter SHOWS
    // as pushed but prunes nothing — verified here), while
    // TIMESTAMP_MICROS/LTZ prunes fine
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").as("l_shipdate"),
        col("l_quantity"))
    // INT96 (Spark's compatibility default) writes NO usable min/max
    // stats — timestamp skipping requires the modern physical type
    val tsType = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      li.repartition(8) // scatter: every file spans the full date range
        .write.mode("overwrite").parquet(s"$tmp/scattered")
      ScalePatterns.writeSorted(li, s"$tmp/sorted", "l_shipdate")
    } finally tsType match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    // the observable is the SCAN's output rows: the vectorized parquet
    // reader emits only row groups whose min/max stats survive the pushed
    // range predicate, so scan rows = rows in surviving row groups
    // (local-fs byte counters are unreliable at these sizes)
    def findScan(p: SparkPlan): Option[Long] = p match {
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Some(s.metrics("numOutputRows").value)
      case other => other.children.iterator.flatMap(findScan).nextOption()
    }
    def run(path: String): (Double, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("l_shipdate").between("1996-01-01", "1996-02-01"))
        .agg(sum("l_quantity"))
      // collect() executes THIS queryExecution (head() would run a
      // separate limited plan and leave these metrics zero)
      val ans = df.collect().head.getDouble(0)
      val scanRows = findScan(df.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in plan"))
      (ans, scanRows)
    }
    val (scatteredAns, scatteredRows) = run(s"$tmp/scattered")
    val (sortedAns, sortedRows) = run(s"$tmp/sorted")
    // identical answers first — layout must never change results
    assert(scatteredAns == sortedAns)
    // scattered: every file's row group spans the full range — nothing
    // skips. Sorted: ~1 month of ~7 years lives in 1 of 8 range files.
    val total = li.count()
    assert(scatteredRows == total,
      s"scattered layout unexpectedly skipped: $scatteredRows of $total")
    assert(sortedRows * 4 < total,
      s"sorted layout did not skip row groups: $sortedRows of $total")
    // CANARY for the TIMESTAMP_NTZ pushdown gap: the same sorted layout
    // written as NTZ shows the filter as pushed but prunes NOTHING in
    // Spark 4.1 (no parquet FilterPredicate conversion for NTZ). If a
    // Spark upgrade makes this assertion fail, the gap is FIXED — delete
    // the LTZ cast advice in PLANS.md and this canary together.
    val liNtz = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    ScalePatterns.writeSorted(liNtz, s"$tmp/sorted-ntz", "l_shipdate")
    val (ntzAns, ntzRows) = run(s"$tmp/sorted-ntz")
    assert(ntzAns == sortedAns, "NTZ layout changed the answer")
    assert(ntzRows == total,
      s"NTZ sorted layout PRUNED ($ntzRows of $total) — Spark now " +
        "converts NTZ filters; retire this canary and the LTZ-cast advice")
  }

  test("writeSortedEventTime: the NTZ event-time key prunes row groups after the LTZ-at-write conversion, oracle-identical") {
    // The executable form of the NTZ canary's advice: events.ts IS
    // TIMESTAMP_NTZ in the current testdata, so a plain writeSorted layout
    // on it reads every row group at any scale. writeSortedEventTime
    // converts the key to session-UTC TIMESTAMP at write — this pins that
    // (a) the converted layout actually SKIPS on a pushed range filter,
    // (b) results are oracle-identical to the NTZ frame, value for value.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("evt-layout").toString
    val ev = Tables.events(spark, d).select("event_id", "ts", "value")
    assert(ev.schema("ts").dataType == TimestampNTZType,
      "events.ts is no longer NTZ — testdata generation changed; revisit " +
        "this pattern and the canary together")
    ScalePatterns.writeSorted(ev, s"$tmp/ntz", "ts")
    ScalePatterns.writeSortedEventTime(ev, s"$tmp/ltz", "ts")
    assert(spark.read.parquet(s"$tmp/ltz").schema("ts").dataType == TimestampType)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan): Option[Long] = p match {
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Some(s.metrics("numOutputRows").value)
      case other => other.children.iterator.flatMap(findScan).nextOption()
    }
    def run(path: String): (Long, Long, Long) = {
      // exact-cents sum, NOT sum(value): a double sum's value depends on
      // task-split addition order, and under a loaded full-suite run the
      // two layouts split differently — the one flake this suite ever
      // produced was a last-ulp mismatch here (the s01/q70 integer
      // discipline applies to test comparisons too)
      val df = spark.read.parquet(path)
        .filter(col("ts").between("2024-01-10 00:00:00", "2024-01-12 00:00:00"))
        .agg(count(lit(1)).cast("long"),
          sum(floor(col("value") * 100).cast("long")))
      val row = df.collect().head
      (row.getLong(0), row.getLong(1),
        findScan(df.queryExecution.executedPlan)
          .getOrElse(sys.error("no FileSourceScanExec in plan")))
    }
    val (nNtz, sumNtz, scanNtz) = run(s"$tmp/ntz")
    val (nLtz, sumLtz, scanLtz) = run(s"$tmp/ltz")
    // value-identity first: the 2-day window agrees row-count and sum
    assert(nNtz == nLtz && sumNtz == sumLtz,
      s"conversion changed results: ($nNtz, $sumNtz) vs ($nLtz, $sumLtz)")
    assert(nNtz > 0, "filter window matched nothing — fixture drifted")
    val total = ev.count()
    // the gap: NTZ layout reads everything despite the pushed filter
    assert(scanNtz == total,
      s"NTZ sorted layout PRUNED ($scanNtz of $total) — Spark now converts " +
        "NTZ filters; retire writeSortedEventTime's cast and the canary")
    // the pattern: converted layout skips (2 days of 30, 8 range files —
    // the bulk of the table must never leave the parquet reader). Bound
    // is 1/3, not the ~1/4 typically observed: repartitionByRange SAMPLES
    // its boundaries, so the window's file overlap jitters by a few
    // percent run-to-run (an exact-4x bound flaked at 2557/10000 in-suite)
    assert(scanLtz * 3 < total,
      s"converted layout did not skip row groups: $scanLtz of $total")
    // and the FULL row set (not just the aggregate) survives conversion:
    // the NTZ frame cast on read equals the converted table row-for-row
    val fromLtz = spark.read.parquet(s"$tmp/ltz")
      .select("event_id", "ts", "value").orderBy("event_id")
      .collect().map(_.toSeq)
    val fromNtz = spark.read.parquet(s"$tmp/ntz")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .orderBy("event_id").collect().map(_.toSeq)
    assert(fromLtz.sameElements(fromNtz), "converted table diverged from the NTZ rows")
  }

  test("z-ordered layout prunes on BOTH dimensions; the 1-D sort prunes only its own key") {
    // writeSorted's limit: one clustered dimension. A 100 TB fact table
    // serves range scans on more than one column (orderkey ranges AND
    // partkey ranges here); z-ordering interleaves both keys' bits so
    // every file is a bounded box in both dimensions. Pins: (1) either
    // dimension's range filter skips most row groups on the z layout,
    // (2) the 1-D layout proves the problem — its own key prunes, the
    // other reads the WHOLE table, (3) answers identical on every layout,
    // (4) the layout column never reaches the table schema.
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey", "l_quantity")
    ScalePatterns.writeSorted(li, s"$tmp/sortedX", "l_orderkey", nFiles = 16)
    ScalePatterns.writeZOrdered(li, s"$tmp/z", "l_orderkey", "l_partkey",
      nFiles = 16)
    assert(spark.read.parquet(s"$tmp/z").schema.fieldNames.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_quantity"), "layout column leaked")
    // keys span 0..14999 / 0..1999 (driver testdata); both filters take
    // ~1/8 of their dimension
    def run(path: String, c: String, lo: Int, hi: Int): (Double, Long) = {
      val df = spark.read.parquet(path)
        .filter(col(c).between(lo, hi)).agg(sum("l_quantity"))
      val ans = df.collect().head.getDouble(0)
      (ans, scanRows(df.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in plan")))
    }
    val total = li.count()
    val (xSorted, xSortedScan) = run(s"$tmp/sortedX", "l_orderkey", 0, 1874)
    val (ySorted, ySortedScan) = run(s"$tmp/sortedX", "l_partkey", 0, 249)
    val (xZ, xZScan) = run(s"$tmp/z", "l_orderkey", 0, 1874)
    val (yZ, yZScan) = run(s"$tmp/z", "l_partkey", 0, 249)
    assert(xSorted == xZ && ySorted == yZ, "layout changed an answer")
    // 1-D: own key prunes, the other dimension reads everything
    assert(xSortedScan * 2 < total,
      s"sorted layout did not prune its own key: $xSortedScan of $total")
    assert(ySortedScan == total,
      s"1-D layout unexpectedly pruned the second dimension: " +
        s"$ySortedScan of $total — revisit this test's premise")
    // z: BOTH dimensions prune (quadrant hierarchy: a 1/8 slice of either
    // dimension touches ~1/4 of the 16 z-range files)
    assert(xZScan * 2 < total, s"z layout did not prune dim A: $xZScan of $total")
    assert(yZScan * 2 < total, s"z layout did not prune dim B: $yZScan of $total")
  }

  test("interleaveBits equals a plain-Scala Morton reference (property)") {
    // the bit-twiddling is the one place writeZOrdered could silently
    // misroute a bit and still "work" (layout degrades, nothing fails) —
    // pin it against an independently written reference
    import spark.implicits._
    val bits = 16
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(300)((rnd.nextInt(1 << bits).toLong,
      rnd.nextInt(1 << bits).toLong)) ++
      Seq((0L, 0L), ((1L << bits) - 1, (1L << bits) - 1), (0L, (1L << bits) - 1))
    def ref(a: Long, b: Long): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val got = pairs.toDF("a", "b")
      .select(ScalePatterns.interleaveBits(col("a"), col("b"), bits).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => ref(a, b) })
  }

  test("daily-partitioned event layout prunes at LISTING time — partition pruning is NTZ-immune") {
    // The third event-time layout, and the one the NTZ FilterPredicate gap
    // cannot touch: pruning happens on the day=YYYY-MM-DD directory values
    // while LISTING files, before any parquet footer is opened — the key's
    // parquet physical type never matters. eventRange adds the derived
    // day-range conjunct (the rewrite lakehouse engines do automatically);
    // the ts predicate keeps row selection exact inside boundary days.
    import org.apache.spark.sql.types.TimestampNTZType
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("daily").toString
    val ev = Tables.events(spark, d).select("event_id", "ts", "value")
    assert(ev.schema("ts").dataType == TimestampNTZType)
    ScalePatterns.writeDailyPartitioned(ev, s"$tmp/daily", "ts")
    val table = spark.read.parquet(s"$tmp/daily")
    val (from, to) = ("2024-01-10 00:00:00", "2024-01-12 00:00:00")
    // decimal sum: exact and order-independent (a double sum differs in
    // last ulps between the 3-partition and unpartitioned reads)
    import org.apache.spark.sql.types.DecimalType
    val exactSum = sum(col("value").cast(DecimalType(18, 2)))
    val q = ScalePatterns.eventRange(table, "ts", from, to)
      .agg(count(lit(1)).cast("long"), exactSum)
    val row = q.collect().head
    // exact same rows as filtering the unpartitioned NTZ frame
    val expect = ev.filter(col("ts").between(from, to))
      .agg(count(lit(1)).cast("long"), exactSum).collect().head
    assert(row.getLong(0) == expect.getLong(0) &&
      row.getDecimal(1) == expect.getDecimal(1))
    assert(row.getLong(0) > 0, "window matched nothing — fixture drifted")
    // pruning fired at listing: the scan touched only the 3 covered days
    // (~1/10 of the 30-day table), and the plan names day partition filters
    val scanned = scanRows(q.queryExecution.executedPlan)
      .getOrElse(sys.error("no FileSourceScanExec in plan"))
    val total = ev.count()
    assert(scanned * 5 < total,
      s"daily layout did not prune partitions: $scanned of $total")
    val scanLine = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      !scanLine.contains("PartitionFilters: []") && scanLine.contains("day"),
      s"no day partition filter in scan:\n$scanLine")
  }

  test("dynPrunedDays: a filtered broadcast dim prunes fact partitions at RUNTIME (DPP)") {
    // The campaign-days shape: which days to scan is data (a filtered dim),
    // not a literal range — eventRange's static rewrite can't express it.
    // Catalyst's PartitionPruning must plant a DynamicPruningExpression in
    // the fact scan so the dim's surviving days prune the file listing.
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    val ev = Tables.events(spark, d).select("event_id", "ts", "value")
    ScalePatterns.writeDailyPartitioned(ev, s"$tmp/daily", "ts")
    val fact = spark.read.parquet(s"$tmp/daily")
    // partition inference types `day` as DATE; the dim's key must match it
    // exactly — a string key would coerce through a cast and the cast
    // target, not the partition attribute, would anchor the join
    val allDays = fact.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(allDays.length >= 10, s"fixture drifted: ${allDays.length} days")
    val campaignDays = allDays.slice(2, 5)
    // dim: every day tagged with a campaign name; the equality filter on
    // it is the selective NON-join predicate the PartitionPruning rule
    // requires (isLikelySelective wants a comparison/IN/LIKE — a bare
    // boolean flag column does not qualify, and `flag === true` would be
    // simplified back to the bare attribute). The dim must also be a real
    // datasource: over a local Seq, ConvertToLocalRelation folds the
    // filter into the relation and the rule sees no predicate at all.
    allDays.toSeq.toDF("d")
      .select(to_date(col("d")).as("day"),
        when(col("d").isin(campaignDays: _*), "summer-sale")
          .otherwise("none").as("campaign"))
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val dim = spark.read.parquet(s"$tmp/dim")
    import org.apache.spark.sql.types.DecimalType
    val exactSum = sum(col("value").cast(DecimalType(18, 2)))
    def run(): (Long, java.math.BigDecimal, Long, String) = {
      val q = ScalePatterns.dynPrunedDays(fact,
          dim.filter(col("campaign") === "summer-sale"))
        .agg(count(lit(1)).cast("long"), exactSum)
      val row = q.collect().head
      val scanned = scanRows(q.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in plan"))
      (row.getLong(0), row.getDecimal(1), scanned,
        q.queryExecution.executedPlan.toString)
    }
    val (n, s, scanned, plan) = run()
    // ground truth from the unpartitioned frame
    val expect = ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("day").isin(campaignDays: _*))
      .agg(count(lit(1)).cast("long"), exactSum).collect().head
    assert(n == expect.getLong(0) && s == expect.getDecimal(1))
    assert(n > 0, "campaign days matched nothing — fixture drifted")
    // the pruning is DYNAMIC: the scan's PartitionFilters name a
    // dynamicpruningexpression, and only the campaign partitions were read
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningExpression in fact scan:\n${plan.take(3000)}")
    assert(scanned == n,
      s"DPP did not prune to the campaign partitions: scanned $scanned, expected $n")
    // control: with the rule disabled the same join scans the whole table
    val total = ev.count()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val (n2, s2, scanned2, _) = run()
      assert(n2 == n && s2 == s, "disabling DPP changed the answer")
      assert(scanned2 == total,
        s"control unexpectedly pruned: $scanned2 of $total")
    } finally spark.conf
      .set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("writeBloomFiltered: parquet bloom filters skip row groups on a point lookup stats cannot serve") {
    // Point lookup on a key the layout is NOT sorted by: hash scatter makes
    // every file's min/max span ~the full key range (stats prune nothing)
    // and the write disables dictionary encoding for the key — modeling the
    // 100 TB regime where high-cardinality keys overflow the dictionary
    // page. Only the per-row-group bloom filter can skip.
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("bloom-layout").toString
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    val nFiles = 8
    val ndv = li.select("l_orderkey").distinct().count()
    ScalePatterns.writeBloomFiltered(li, s"$tmp/bloom", "l_orderkey",
      ndvPerFile = math.max(ndv / nFiles, 1L), nFiles = nFiles)
    // control: same scatter, same no-dictionary key, NO bloom filter
    li.repartition(nFiles, col("l_orderkey"))
      .write.mode("overwrite")
      .option("parquet.enable.dictionary#l_orderkey", "false")
      .parquet(s"$tmp/plain")
    val probeKey = li.select(max("l_orderkey")).head().getLong(0) / 2
    val expect = li.filter(col("l_orderkey") === probeKey)
      .agg(count(lit(1)).cast("long")).head().getLong(0)
    assert(expect > 0, s"probe key $probeKey matches nothing — pick another")
    def run(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("l_orderkey") === probeKey)
        .agg(count(lit(1)).cast("long"))
      val n = q.collect().head.getLong(0)
      (n, scanRows(q.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in plan")))
    }
    val total = li.count()
    val (plainN, plainScanned) = run(s"$tmp/plain")
    val (bloomN, bloomScanned) = run(s"$tmp/bloom")
    assert(plainN == expect && bloomN == expect,
      "layout changed the point-lookup answer")
    // control reads everything: hash scatter defeats min/max, no
    // dictionary, no bloom — nothing can skip
    assert(plainScanned == total,
      s"control unexpectedly skipped: $plainScanned of $total")
    // bloom layout reads only the row groups that might hold the key:
    // the one true file plus at most a false-positive straggler
    assert(bloomScanned * 2 < total,
      s"bloom filter skipped nothing: $bloomScanned of $total")
  }

  test("q58 plan replicates the build side across salts; result equals the plain join") {
    val d = "/root/testdata/sf0.001"
    val q = ScalePatterns.saltedSkewJoin(spark, d)
    // the salt replication is a Generate(explode) over the dim side — the
    // structural signature that distinguishes q58 from a plain hash join
    val hasGenerate = q.queryExecution.executedPlan.toString.contains("Generate")
    assert(hasGenerate, q.queryExecution.executedPlan.toString.take(2000))
    // salting must not change the join multiset: same aggregate as unsalted
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.events(spark, d).select(col("event_type"), col("value"))
    val dim = Tables.events(spark, d).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).as("total"))
    val plain = e.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").cast(DecimalType(18, 2)) * col("cnt") > col("total"),
          1L).otherwise(0L)).as("n_above"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("might_contain SQL surface composes with bloom_filter_agg and prunes the probe") {
    graft.GraftExtensions.register(spark)
    (1L to 10000L).toDF("k").createOrReplaceTempView("bf_probe")
    (1L to 10000L by 100L).toDF("k").createOrReplaceTempView("bf_build")
    val surviving = spark.sql(
      """SELECT count(*) AS n FROM bf_probe
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(k)) FROM bf_build),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    // the filter must remove the bulk of the probe before any join:
    // 100 true keys + a small false-positive tail, far under the 10000 input
    assert(surviving >= 100 && surviving < 600, s"bloom pruned to $surviving rows")
  }

  test("restateDay: one day swapped atomically with corrected rows, other days untouched") {
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("restate").toString
    val ev = Tables.events(spark, d).select("event_id", "ts", "value")
    ScalePatterns.writeDailyPartitioned(ev, s"$tmp/daily", "ts")
    val day = "2024-01-05"
    val before = spark.read.parquet(s"$tmp/daily")
    val othersBefore = before.filter(col("day").cast("string") =!= day)
      .select("event_id", "value").collect().map(_.toSeq).toSet

    // the correction: that day's values were off by 10x upstream
    val corrected = ev
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .withColumn("value", col("value") * 10)
    assert(corrected.count() > 0, "fixture drifted: empty restatement day")
    ScalePatterns.restateDay(spark, s"$tmp/daily", day, corrected, "ts")

    val after = spark.read.parquet(s"$tmp/daily")
    val dayRows = after.filter(col("day").cast("string") === day)
    // the day now carries exactly the corrected rows
    assert(dayRows.select("event_id", "value").collect().map(_.toSeq).toSet ==
      corrected.select("event_id", "value").collect().map(_.toSeq).toSet)
    // every other day byte-identical
    assert(after.filter(col("day").cast("string") =!= day)
      .select("event_id", "value").collect().map(_.toSeq).toSet == othersBefore)
    // no underscore debris left behind
    val leftovers = new java.io.File(s"$tmp/daily").listFiles()
      .map(_.getName).filter(n => n.startsWith("_restate_") || n.startsWith("_old_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))

    // guard: rows outside the day are refused before any file is touched
    val stray = ev.filter(date_format(col("ts"), "yyyy-MM-dd") =!= day).limit(1)
    intercept[IllegalArgumentException] {
      ScalePatterns.restateDay(spark, s"$tmp/daily", day,
        corrected.unionByName(stray), "ts")
    }
  }

  test("q65: merged incremental state equals the direct aggregate, and the delta is non-empty") {
    import org.apache.spark.sql.types.DecimalType
    val d = "/root/testdata/sf0.001"
    val got = ScalePatterns.incrementalAgg(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val direct = Tables.events(spark, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2))
          .cast("string").as("sum_value"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == direct)
    // the split really exercised both sides: the last day holds rows, and
    // so does history (otherwise the merge degenerates to a single branch)
    val e = Tables.events(spark, d)
      .select(to_date(TimeWindows.eventTime).as("day"))
    val cut = e.agg(max(col("day"))).head.getDate(0)
    val nDelta = e.filter(col("day") === lit(cut)).count()
    val nHist = e.filter(col("day") < lit(cut)).count()
    assert(nDelta > 0 && nHist > 0, s"delta=$nDelta hist=$nHist")
  }
}
