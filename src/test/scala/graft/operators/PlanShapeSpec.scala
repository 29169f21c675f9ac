package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins the scale-critical physical-plan shapes (the PLANS.md audit) as
  * assertions, so a refactor can't silently regress them: pushed-down
  * parquet predicates, bounded top-k, broadcast dimension joins, and
  * hash (not sort) aggregation for the LSH pair-distinct. Shapes are
  * asserted on the compiled plan string at sf0.001 — the same text
  * `.explain` prints.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters and column pruning reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(!p.contains("PushedFilters: []"), "no predicates pushed")
    // the predicate columns must appear inside PushedFilters, not a
    // post-scan Filter-only plan
    assert(p.contains("GreaterThanOrEqual(l_discount") || p.contains("LessThan(l_quantity"),
      "range predicates not pushed to the scan")
  }

  test("q03: top-k is TakeOrderedAndProject (bounded heaps, no global sort)") {
    val p = plan("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q04/q05: dimension joins broadcast; no sort-merge or nested-loop join") {
    for (q <- Seq("q04_join_agg", "q05_revenue_by_nation")) {
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, s"$q:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$q picked a non-broadcast join")
    }
  }

  test("q57: all seven dimension joins of the deep star broadcast; fact side never pre-shuffles") {
    val p = plan("q57_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 7, s"q57:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "q57 picked a non-broadcast join")
    // the only hash exchanges are the two-phase year rollup (+ final sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"unexpected extra exchange:\n${p.take(3000)}")
  }

  test("d04: LSH pair-distinct is a hash aggregate over thin keys, not a sort aggregate over arrays") {
    val p = plan("d04_minhash_lsh")
    assert(!p.contains("SortAggregate"), s"signature arrays reached an aggregate:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to all-pairs")
  }

  test("d06: planted near-dup candidates come from a bucket equi-join, never all-pairs") {
    val p = plan("d06_embedding_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in d06:\n${p.take(3000)}")
  }

  test("d09: simhash banded candidates come from a (band, key) equi-join, never all-pairs") {
    val p = plan("d09_simhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in d09:\n${p.take(3000)}")
  }

  test("d10: paragraph identity shuffles hashes, not paragraph bodies") {
    val p = plan("d10_paragraph_dedup")
    // the window exchange partitions by the 60-bit hash column; the
    // concat_ws that assembles paragraph text must stay BELOW it (inside
    // the scan-side projection), so no exchange carries string bodies
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(h#")
    assert(exchangeIdx >= 0, s"no hash-keyed exchange in d10:\n${p.take(3000)}")
    assert(!p.substring(0, exchangeIdx).contains("concat_ws"),
      "paragraph text assembled above the exchange — bodies would shuffle")
    assert(!p.contains("SortAggregate"), "per-doc rollup fell out of hash aggregation")
  }

  test("q50: lateral top-n decorrelates to a ranked join, not per-row re-execution") {
    val df = SparkEntry.queries("q50_lateral_topn")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in q50:\n${p.take(2000)}")
    // ≤ 2 rows per nation, deterministic cut
    val byNation = df.collect().groupBy(_.getString(0))
    assert(byNation.nonEmpty && byNation.values.forall(_.length <= 2))
  }

  test("t11: tf scoring is equi-joined and hash-aggregated; only the 1-row total broadcasts") {
    val p = plan("t11_typicality")
    assert(!p.contains("CartesianProduct"), s"cartesian in t11:\n${p.take(3000)}")
    assert(!p.contains("SortAggregate"), "tf build fell out of hash aggregation")
    // the only nested-loop member is the broadcast single-row total
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "unexpected nested-loop joins beyond the 1-row total")
  }

  test("d12: containment candidates come from the capped posting index, never all-pairs") {
    val p = plan("d12_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in d12:\n${p.take(3000)}")
    // postings shuffle 60-bit hashes, not shingle strings: the concat_ws
    // that assembles a shingle must stay below every exchange
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    assert(firstExchange >= 0)
    assert(!p.substring(0, firstExchange).contains("concat_ws"),
      "shingle strings assembled above an exchange")
  }

  test("p04: ranking is two-level — a hash-bucketed window feeds the bare-source window") {
    val p = plan("p04_source_downsample")
    // level 1 partitions by (source, pmod(hash, B)): bounded partitions at
    // any corpus size; the only bare-source window ranks ≤ B·CAP survivors
    assert(p.contains("pmod("), s"no hash-bucketed level-1 window:\n${p.take(3000)}")
    val windows = p.linesIterator.filter(_.contains("Window [row_number()")).toSeq
    assert(windows.length == 2, s"expected 2 rank windows, got ${windows.length}:\n$p")
    // Spark's InferWindowGroupLimit must keep both rank filters partial —
    // the map-side top-k is what bounds every exchange input
    assert("WindowGroupLimit .*Partial".r.findAllIn(p).length == 2,
      s"map-side rank limits missing:\n${p.take(3000)}")
  }

  test("p06: running sum is a two-phase distributed prefix-sum, not one window per source") {
    val p = plan("p06_sequence_packing")
    // slice ids are arithmetic on doc_id (no RangePartitioner in the
    // correctness path — its sampled bounds are not reproducible across
    // the frame's two consumers); the 1-row width bound broadcasts
    assert(!p.contains("SPARK_PARTITION_ID") && !p.contains("rangepartitioning(source"),
      s"slice ids must not come from physical partitioning:\n${p.take(3000)}")
    // the corpus-side window partitions by (source, slice) — bounded —
    // and the per-slice bases arrive via broadcast
    assert(p.linesIterator.exists(l => l.contains("Window") && l.contains("slice#")),
      s"no (source, slice) window:\n${p.take(3000)}")
    // slice bases broadcast on the equi-key; the 1-row width bound rides
    // a broadcast nested-loop (no key — it IS a scalar)
    assert(p.contains("BroadcastHashJoin"), "slice bases not broadcast")
    assert(p.contains("BroadcastNestedLoopJoin"), "width bound not broadcast")
    // no corpus window partitioned by bare source
    assert(!p.linesIterator.exists(l => l.contains("Window") &&
      l.contains("partitionBy") && !l.contains("slice")), p.take(1000))
  }

  test("p09: global curriculum rank is sliced prefix-sum, not one single-partition window") {
    val p = plan("p09_curriculum")
    // slice ids are arithmetic on (bucket, h) — monotone in the order
    // key, no RangePartitioner in the correctness path
    assert(!p.contains("SPARK_PARTITION_ID") && !p.contains("rangepartitioning(bucket"),
      s"slice ids must not come from physical partitioning:\n${p.take(3000)}")
    assert(p.linesIterator.exists(l => l.contains("Window") &&
      l.contains("row_number") && l.contains("slice#")),
      s"corpus window not partitioned by slice:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), "slice bases not broadcast")
  }

  test("q47: global null-ordering ranks are bin-sliced; no unpartitioned corpus window") {
    val p = plan("q47_null_ordering")
    // every row_number window partitions by the arithmetic (nn, bin)
    // slice — the corpus-proportional input never funnels into one task
    val rankWindows = p.linesIterator.filter(l =>
      l.contains("Window") && l.contains("row_number")).toSeq
    assert(rankWindows.nonEmpty, s"no rank windows found:\n${p.take(3000)}")
    rankWindows.foreach(l => assert(l.contains("_sgr_bin#"),
      s"unpartitioned global rank window:\n$l"))
    // bin ids are arithmetic on the sort key, not physical partitioning
    assert(!p.contains("SPARK_PARTITION_ID") && !p.contains("rangepartitioning(prev"),
      s"slice ids must not come from physical partitioning:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), "bin bases not broadcast")
  }

  test("t12: boilerplate flagging shuffles chunk hashes, never chunk bodies") {
    val p = plan("t12_boilerplate")
    // the chunk text is folded to its 60-bit hash inside the explode's
    // codegen stage — the exchange feeding the count window and the
    // per-doc aggregate must carry longs only (the d10 contract; plan
    // text prints root→leaves, so "above the first Exchange" = the
    // post-shuffle operators)
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    assert(firstExchange >= 0)
    assert(!p.substring(0, firstExchange).contains("concat_ws"),
      "chunk strings crossed an exchange")
  }

  test("d13: substring marking shuffles gram hashes only; no pair join anywhere") {
    val p = plan("d13_substring_dedup")
    // gram text folds to its hash inside the explode's codegen stage —
    // nothing above any exchange re-assembles token strings
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    assert(firstExchange >= 0)
    assert(!p.substring(0, firstExchange).contains("concat_ws"),
      "gram strings crossed an exchange")
    // a MARKING operator: the only self-referential joins are the
    // equi-joins on gram hash / doc_id — never a pair-emitting product
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair blow-up in d13:\n${p.take(3000)}")
  }

  test("p07: the mixture plan broadcasts; no corpus-wide window or cartesian blow-up") {
    val p = plan("p07_mixture_sample")
    // the per-source plan frame (20 rows) joins back via broadcast; the
    // corpus side never sorts or windows globally
    assert(p.contains("BroadcastHashJoin"), s"plan frame not broadcast:\n${p.take(3000)}")
    assert(!p.contains("Window ["), "unexpected corpus window in p07")
    assert(!p.contains("CartesianProduct"), "cartesian in p07")
  }

  test("m04: phash candidates come from a (band, key) equi-join; blobs never shuffle") {
    val df = SparkEntry.queries("m04_phash_neardup")(spark, sf)
    val exec = df.queryExecution.executedPlan
    val p = exec.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in m04:\n${p.take(3000)}")
    // every exchange sits above the kernel's (asset_id, phash) fold —
    // walk the tree: no shuffle's output schema may carry a binary column
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    val root = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: Exchange => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.output.exists(_.dataType == BinaryType),
        s"payload bytes crossed an exchange: ${e.output.mkString(", ")}")
    }
  }

  test("p08: the quantile comes from a histogram CDF, not a value-buffering percentile") {
    val p = plan("p08_quality_gate")
    // no Percentile aggregate (it buffers every value per group); the
    // thresholds ride a hash-aggregated histogram + bounded window, and
    // the gate join is a broadcast of the tiny threshold frame
    assert(!p.contains("percentile"), s"value-buffering percentile in p08:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), "thresholds not broadcast")
  }

  test("d16: index-probe candidates come from the (band_idx, band_key) equi-join, never all-pairs") {
    val p = plan("d16_incremental_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in d16:\n${p.take(3000)}")
    // the signature confirm joins back only for candidates — the
    // pair-distinct before it is a hash aggregate over two longs
    assert(p.contains("HashAggregate(keys=[did"), s"pair-distinct shape:\n${p.take(3000)}")
  }

  test("s09: the only nested-loop members are the broadcast 16-row centroid/codebook frames") {
    val p = plan("s09_ivfpq_ann")
    assert(!p.contains("CartesianProduct"), s"cartesian in s09:\n${p.take(3000)}")
    // crossJoins against centroids/codebook are broadcast by construction;
    // the candidate restriction and the LUT scoring are hash joins
    assert(p.contains("BroadcastHashJoin"), "probe/LUT joins not broadcast")
  }

  test("t14: the CMS probe filters BEFORE the first exchange, in the shingle codegen stage") {
    // the two-pass heavy hitter's whole point: the sketch probe must kill
    // the long tail map-side. Walk the confirm-pass plan to the Filter
    // carrying cms_probe and assert no Exchange sits BELOW it — the tail
    // dies before anything shuffles
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = SparkEntry.queries("t14_heavy_ngrams")(spark, sf)
    def expand(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case other => other.children.flatMap(expand)
    }) :+ p
    val nodes = expand(df.queryExecution.executedPlan)
    // match on the node's OWN line (toString includes the subtree, which
    // would also catch the exact-confirm filter sitting above the probe)
    val probeFilters = nodes.filter(n =>
      n.nodeName.contains("Filter") &&
        n.simpleString(Int.MaxValue).contains("cms_probe"))
    assert(probeFilters.nonEmpty, "no cms_probe filter in the t14 plan")
    probeFilters.foreach { f =>
      val below = expand(f).filterNot(_ eq f)
      assert(!below.exists(_.isInstanceOf[Exchange]),
        s"cms_probe filter runs AFTER an exchange:\n$f")
    }
  }

  test("s04: semantic-dedup candidates come from a (cell, bucket) equi-join, never all-pairs") {
    val p = plan("s04_semantic_dedup")
    // the only nested-loop member allowed is the broadcast 16-row
    // centroid assignment (a crossJoin against a broadcast tiny side);
    // candidate generation must be the bucket equi-join
    assert(!p.contains("CartesianProduct"), s"cartesian in s04:\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      "BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      "no equi-join found for candidate generation")
  }

  test("g01/g03: every iteration joins BROADCAST (no stranded SMJ probe-side shuffles)") {
    // the profiled round-11 defect: a statless ExistingRDD join plans as
    // SMJ, AQE demotes it to broadcast at runtime, and the planned
    // full-edge exchange still executes — once per iteration. The explicit
    // hint pins the static plan; this pins the hint.
    for (q <- Seq("g01_pagerank", "g03_label_propagation")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q iteration join regressed off broadcast:\n${p.take(3000)}")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
        s"$q lost its per-round broadcast joins:\n${p.take(3000)}")
      // per-round cost bound: one partial-sum/count exchange per round
      // (+1 slack for the label seed side); the stranded-exchange bug
      // DOUBLES this count, so the cap detects it
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges <= 5, s"$q: $exchanges hash exchanges (stranded shuffles?)")
    }
  }

  test("g02: wedge enumeration is equi-join only and unpivots via Generate, not Union") {
    val p = plan("g02_triangle_census")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated to all-pairs:\n${p.take(3000)}")
    // the profiled round-11 defect: a 3-way union re-executed the whole
    // wedge join per branch (broadcast joins expose no exchange to reuse)
    assert(!p.contains("Union"), s"g02 unpivot regressed to Union:\n${p.take(3000)}")
    assert("Generate explode".r.findAllIn(p).nonEmpty,
      s"g02 lost the Generate-based unpivot:\n${p.take(3000)}")
  }

  test("s17/s18/p19: the assignment trio stays one-scan x broadcast centroids") {
    for (q <- Seq("s17_ivf_drift", "s18_silhouette", "p19_cluster_quota")) {
      val p = plan(q)
      // the centroid side and the grand-total/model side are broadcast;
      // a demotion to SMJ would shuffle the corpus per consumer
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q lost its broadcast assignment:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q shuffled the assignment:\n${p.take(2000)}")
    }
  }

  test("t25: the NB weight and model frames broadcast into the scoring joins") {
    val p = plan("t25_nb_langid")
    assert(!p.contains("CartesianProduct"),
      s"t25 degenerated to a shuffled cross:\n${p.take(3000)}")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"t25 weight/model frames not broadcast:\n${p.take(3000)}")
  }

  test("s19: the fusion join never shuffles the retriever shortlists as SMJ") {
    val p = plan("s19_rrf_fusion")
    assert(!p.contains("CartesianProduct"),
      s"s19 fused via a cross join:\n${p.take(3000)}")
  }

  test("s21: kNN-graph candidates come from the cell equi-join; centroids broadcast") {
    val p = plan("s21_knn_graph")
    // residency assignment is corpus x broadcast 16-row centroids; the
    // only nested-loop member allowed is that broadcast frame
    assert(!p.contains("CartesianProduct"),
      s"s21 degenerated to an all-pairs cross:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s21 centroids not broadcast:\n${p.take(3000)}")
    // the self-join on cell must be an equi-join (hash or SMJ on cell),
    // and the top-k window partitions by src — no unpartitioned window
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      s"unpartitioned window in s21:\n${p.take(3000)}")
  }

  test("q73: the sequence window partitions by user_id; the row-total joins broadcast") {
    val p = plan("q73_markov_transitions")
    assert("windowspecdefinition\\(user_id".r.findAllIn(p).nonEmpty,
      s"q73 sequence window lost its user partitioning:\n${p.take(3000)}")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"a single-partition exchange crept under q73's window:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"q73 from-total frame not broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q73 join degenerated:\n${p.take(3000)}")
  }

  test("s23: both probe phases are cell-keyed broadcast joins, never all-pairs") {
    val p = plan("s23_pruned_exact_knn")
    // the only nested-loop members allowed are the broadcast 16-row
    // centroid/metadata frames; candidate scoring must be the cell
    // equi-join
    assert(!p.contains("CartesianProduct"),
      s"s23 degenerated to an all-pairs cross:\n${p.take(3000)}")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"s23 probe-list joins not broadcast:\n${p.take(3000)}")
  }

  test("s24: the store probe reads partition-pruned cell dirs") {
    val p = plan("s24_pruned_exact_store")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findAllIn(p).nonEmpty,
      s"s24 vectors scan is not partition-pruned on cell:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"s24 degenerated to an all-pairs cross:\n${p.take(3000)}")
  }

  test("g10: the census reads checkpointed peel output, no join re-derivation") {
    val p = plan("g10_kcore")
    assert(p.contains("Scan ExistingRDD"),
      s"g10 census re-derives the peeled edges:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"g10 final census picked a heavy join:\n${p.take(3000)}")
  }

  test("p25: contamination join is shingle-equi; no cartesian; grid stays tiny") {
    val p = plan("p25_contamination_report")
    assert(!p.contains("CartesianProduct"),
      s"p25 degenerated to all-pairs:\n${p.take(3000)}")
    // the only nested-loop member allowed is the tiny suite×source grid
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      s"an unexpected nested-loop join in p25:\n${p.take(3000)}")
    assert(!p.contains("SortAggregate"),
      "shingle aggregation fell out of hash aggregation")
  }

  test("q74: events reduce to the daily rollup before regression; min-day broadcasts") {
    val p = plan("q74_trend_regression")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q74 joined heavy:\n${p.take(3000)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q74 min-day frame not broadcast:\n${p.take(3000)}")
  }

  test("t30/g11: iteration frames are checkpointed; rank joins broadcast") {
    for (q <- Seq("t30_textrank_keywords", "g11_ppr_trust")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q re-derives its adjacency:\n${p.take(3000)}")
      assert(p.contains("BroadcastHashJoin"),
        s"$q rank/vocab join not broadcast:\n${p.take(3000)}")
      assert(!p.contains("CartesianProduct"), s"$q went all-pairs")
    }
  }

  test("p24: the rank decomposition never runs a corpus-size single-task window") {
    val p = plan("p24_shard_manifest")
    // the only unpartitioned window is the running sum over the per-count
    // aggregate (distinct-token-count-sized); the corpus-size row_number
    // partitions by tok. Assert: every unpartitioned window sits ABOVE an
    // aggregate in the plan (HashAggregate appears before it bottom-up),
    // and the per-doc window is partitioned.
    assert(p.contains("Window"), "rank windows disappeared")
    val partitioned = "windowspecdefinition\\(_shard_bin".r.findAllIn(p).nonEmpty
    assert(partitioned,
      s"per-doc rank lost its _shard_bin partitioning:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"prefix frame not broadcast back:\n${p.take(3000)}")
  }
}
