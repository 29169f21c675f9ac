package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relation-derived edge lists — the missing family a
  * training-data platform leans on for source-quality scoring (PageRank over
  * a citation/link graph) and community structure (triangle census).
  *
  * The reference delegates everything relational to its MySQL sink (SURVEY
  * §2.6); a graph surface does not exist there at all, so these are Layer-B
  * additions in the same spirit as the dedup connected-components pass
  * (Dedup.scala alternating-star CC): expressed as DataFrame joins +
  * aggregations so Catalyst plans the shuffles, with the iteration count
  * fixed and the arithmetic integer-exact so a DuckDB oracle can replay it
  * hash-identically.
  *
  * Numeric determinism (the t15/s01 discipline): PageRank is computed in
  * 64-bit fixed point — start mass 10^9 per node, per-edge contribution
  * `rank div degree` (integer division), damping 0.85 applied as
  * `(85·Σ) div 100`. Sums of longs are order-independent, so shuffle
  * nondeterminism cannot move a hash. Production engines run this in
  * doubles; the fixed-point form changes ranks by < 1e-9 relative and is
  * what makes the result provable against a second engine.
  *
  * Scale design:
  *   - the edge list is derived once, localCheckpoint'ed, and re-read from
  *     cached blocks by every iteration (lineage stays O(1) per round, the
  *     CC/d22 discipline);
  *   - each PageRank round is one shuffle (join on src + groupBy dst) over
  *     `(node, rank)` longs — never bodies; 100 TB of documents reduce to
  *     O(|edges|) longs before the first iteration;
  *   - the triangle census orients every edge from its lower-(degree, id)
  *     endpoint to the higher one, bounding per-node out-degree by
  *     O(√m) — the standard guarantee that the wedge join is O(m^1.5)
  *     worst-case instead of Σ deg² (hub-quadratic);
  *   - the co-order graph is support-thresholded (a corpus-RELATIVE
  *     cutoff, [[SUPPORT_PPM]]) BEFORE the wedge join, so hub density is
  *     bounded at the aggregation, not discovered at the join.
  */
object Graph {

  /** Fixed-point start mass per node (10^9): at 10^7 nodes the total mass
    * is 10^16 and the damped sum `85·Σ` stays under 2^63 (overflow at
    * ~10^17 nodes-worth of mass, far beyond any real graph's node count).
    */
  private val START_FP = 1000000000L
  private val DAMP_NUM = 85L // damping 0.85 as an exact rational 85/100
  private val ITERS    = 4
  /** Per-iteration teleport mass: floor(0.15 · START_FP). */
  private val BASE_FP  = START_FP * (100L - DAMP_NUM) / 100L

  /** g01: PageRank over the undirected customer↔supplier trade graph
    * (edge ⇔ the customer ever ordered a part from the supplier).
    *
    * Undirected (both directions materialized) so every node has out-degree
    * ≥ 1 — no dangling-mass correction term, which would need a global
    * scalar per round. The customer/supplier key spaces overlap, so nodes
    * are disambiguated by parity-packing into longs internally and labeled
    * `c:123` / `s:45` on output.
    */
  /** Undirected customer↔supplier trade edges in packed-long node ids
    * (customer k → 2k, supplier k → 2k+1), both directions materialized,
    * hash-partitioned by src at full shuffle parallelism — shared by the
    * iterative ops (g01 PageRank, g03 label propagation).
    *
    * Long ids: the per-iteration aggregates hash |edges| keys every round,
    * and long keys more than halve that cost vs "c:123" strings (profiled:
    * avgHashProbe 160 → 6); display labels are restored only in final
    * O(|nodes|)-row projections. Both directions come from one explode —
    * NOT union(eraw, eraw.reversed), which would execute the join+distinct
    * subtree twice (profiled). The pre-checkpoint repartition matters:
    * AQE coalesces the tiny post-distinct stage (8 partitions at sf0.1)
    * and localCheckpoint would freeze that coalescing into every
    * iteration's parallelism (profiled: 4× the iteration cost).
    */
  /** One row per undirected customer→supplier edge (parity-packed ids) —
    * the single-direction frame [[tradeEdges]] doubles; g05 consumes it
    * directly (its per-side degree aggregates don't need the doubled,
    * checkpointed frame the iterative keys do).
    */
  private def tradeEdgesRaw(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
              (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  /** DELIBERATELY two exchanges, not one (round-16 optimization A/B):
    * folding the (src, dst) distinct onto the src repartition via the
    * subset rule — one pinned exchange, distinct + explode in the
    * post-shuffle stage — measured 0.81× on g01 (and the same shape
    * 0.70× on t30) in equality-gated interleaved probes: the saved
    * 28 MB exchange feeds the checkpoint directly (no sort, near-free),
    * while the folded form loses map-side partial dedup AND pins the
    * derivation stage to full parallelism where AQE's coalescing of
    * the small distinct stage was the faster call. Keep this shape.
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val eraw = tradeEdgesRaw(s, d)
    eraw.select(explode(array(
        struct(col("src").as("s"), col("dst").as("t")),
        struct(col("dst").as("s"), col("src").as("t")))).as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"))
      .repartition(col("src"))
      // checkpoint HERE, not only downstream: deg's broadcast build side
      // and the probe side are separate executions of this subtree (no
      // exchange to reuse under a broadcast join), so an uncheckpointed
      // edge list runs the join+distinct twice per consumer. (The src
      // hash layout is NOT visible past this adaptive checkpoint — the
      // co-partitioned regime re-lays it via relayoutPartitioned.)
      .localCheckpoint(true)
  }

  /** SQL mirror of [[tradeEdges]] (eraw + edges CTE bodies). */
  private val tradeEdgesCte: String =
    """eraw AS MATERIALIZED (
      |  SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS MATERIALIZED (
      |  SELECT src, dst FROM eraw
      |  UNION ALL SELECT dst AS src, src AS dst FROM eraw)""".stripMargin

  /** Node-count ceiling for broadcasting a per-round rank/label/survivor
    * frame in the iterative family (g01/g03/g09/g10/g11/t30): ~100M
    * nodes × 16 B ≈ 1.6 GB of build-side hash table per executor, the
    * practical broadcast limit. At or below it, [[iterJoin]] broadcasts
    * (zero edge movement AND zero rank shuffle per round); above it, it
    * switches to the CO-PARTITIONED shuffle form: the adjacency is
    * hash-partitioned by src before its checkpoint (tradeEdges), and
    * localCheckpoint preserves outputPartitioning through LogicalRDD, so
    * the planner exchanges ONLY the O(|nodes|) rank side each round —
    * the edges never move. The hint is shuffle_hash, not merge: SMJ
    * would re-SORT the full edge side every round, and the hash build
    * side is the per-partition rank slice — the thing that fits.
    *
    * `GRAFT_RANK_BCAST_MAX` overrides the ceiling for profiling (0 runs
    * every iterative key through the co-partitioned arm — how the
    * crossover ledger in PLANS.md is measured); production leaves it
    * unset.
    */
  val RANK_BCAST_MAX_NODES: Long =
    sys.env.get("GRAFT_RANK_BCAST_MAX").map(_.toLong).getOrElse(100000000L)

  /** The per-round iteration join of the fixed-point family: an
    * edges-shaped frame joined to a per-node frame, physical strategy
    * dispatched on the node count — a bounded driver scalar each
    * operator computes ONCE (the slicedRanks/unionFindLocal dispatch
    * precedent), never per round.
    */
  private[graft] def iterJoin(edgesSide: DataFrame, nodeSide: DataFrame,
      cond: org.apache.spark.sql.Column, nNodes: Long,
      bcastMax: Long, joinType: String = "inner"): DataFrame =
    if (nNodes <= bcastMax) edgesSide.join(broadcast(nodeSide), cond, joinType)
    else edgesSide.join(nodeSide.hint("shuffle_hash"), cond, joinType)

  /** Run `f` under the static (non-adaptive) planner. Measured fact
    * (PartitioningProbeSpec-era probe, Spark 4.1): under AQE an eager
    * localCheckpoint captures UnknownPartitioning — AdaptiveSparkPlanExec
    * cannot expose its final partitioning at capture time — so every
    * downstream join re-exchanges the checkpointed frame and the
    * co-partitioned arm of [[iterJoin]] silently degrades to a
    * two-sided shuffle. Static planning captures the real
    * HashPartitioning into LogicalRDD. Sequential-execution scope: the
    * toggle is session-global, safe here because operators plan one
    * query at a time (the Verify/Bench/test harnesses are serial) —
    * and that invariant is now ENFORCED, not just documented: an active
    * streaming query on the same session could have a microbatch PLAN
    * while the toggle is down and silently come out non-adaptive, so
    * the guard fails loudly instead (run graph co-regime operators on
    * a session with no live streams — `s.newSession()` if needed; a
    * cloned session is no help INSIDE here because a DataFrame plans
    * against the session it was created from).
    */
  private def withStaticPlan[T](s: SparkSession)(f: => T): T = {
    require(s.streams.active.isEmpty,
      "withStaticPlan toggles session-global spark.sql.adaptive.enabled; " +
        s"${s.streams.active.length} streaming quer(ies) are active on this " +
        "session and could plan a microbatch non-adaptively while the " +
        "toggle is down. Run the co-partitioned graph regime on a " +
        "stream-free session (spark.newSession()).")
    val k = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(k)
    s.conf.set(k, "false")
    try f finally s.conf.set(k, prev)
  }

  /** Re-lay an ALREADY-CHEAP (cached/checkpointed) frame by `key` and
    * checkpoint with the HashPartitioning captured (see
    * [[withStaticPlan]]): one thin exchange, statically planned. This —
    * and [[checkpointPreserving]] — run ONLY in the co-partitioned
    * regime: the broadcast regime never reads a checkpoint's
    * partitioning metadata, and statically planning the bench-scale
    * checkpoints was measured at +1-6 s per graph key at sf0.1 (the
    * bisect that shaped this split), so below the ceiling every
    * checkpoint stays on the adaptive planner, byte-identical to the
    * pre-dispatch plans.
    */
  private[graft] def relayoutPartitioned(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame =
    withStaticPlan(df.sparkSession) {
      df.repartition(key).localCheckpoint(true)
    }

  /** Statically planned eager checkpoint that keeps the frame's
    * EXISTING partitioning visible. For frames that inherit it through
    * cheap, already-cached inputs (adj: a broadcast/hinted join from a
    * re-laid edge frame) — co-partitioned regime only, see
    * [[relayoutPartitioned]].
    */
  private[graft] def checkpointPreserving(df: DataFrame): DataFrame =
    withStaticPlan(df.sparkSession) { df.localCheckpoint(true) }

  def pagerank(s: SparkSession, d: String): DataFrame =
    pagerankOn(tradeEdges(s, d))

  /** g01 over any symmetric, src-partitioned, checkpointed edge frame.
    * `bcastMax` is the [[iterJoin]] dispatch ceiling — production default
    * [[RANK_BCAST_MAX_NODES]]; the spec forces 0 to pin the
    * co-partitioned path equal to the broadcast one.
    */
  private[graft] def pagerankOn(edges: DataFrame,
      bcastMax: Long = RANK_BCAST_MAX_NODES): DataFrame = {
    // O(|nodes|) thin frame, checkpointed: serves the dispatch count AND
    // the adj build (previously derived inline and broadcast uncounted)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val nNodes = deg.count() // the dispatch scalar: exactly |nodes|
    val co = nNodes > bcastMax
    // co-partitioned regime only: re-lay the (cached) edges so the src
    // hash layout is VISIBLE to the round joins — one thin exchange,
    // amortized over every round. The broadcast regime keeps the edges
    // and plans exactly as before the dispatch existed.
    val e = if (co) relayoutPartitioned(edges, col("src")) else edges
    // (src, dst, outdeg(src)) — the only frame the iterations touch; eager
    // checkpoint so four rounds scan cached blocks instead of re-deriving
    // the join+distinct four times. In the co regime, checkpointed with
    // the inherited src partitioning captured for every round's probe.
    val adjRaw = iterJoin(e, deg, e("src") === deg("node"), nNodes, bcastMax)
      .select(e("src"), e("dst"), deg("outdeg"))
    val adj = if (co) checkpointPreserving(adjRaw)
      else adjRaw.localCheckpoint(true)

    // node set = adj's src side (every node has degree ≥ 1 by construction)
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("r", lit(START_FP))
    for (_ <- 1 to ITERS) {
      // below the ceiling the rank side is broadcast EXPLICITLY: planned
      // from an ExistingRDD, the join has no stats, plans as SMJ, and
      // AQE's runtime demotion to broadcast leaves the probe-side
      // exchange of adj in the plan — one wasted full-edge shuffle per
      // iteration (profiled at sf0.1). With the hint each round is: scan
      // cached adj → broadcast join → partial agg → one exchange of
      // O(|nodes|) partial sums. Above the ceiling: scan cached adj
      // (already src-partitioned, no exchange) → shuffle-hash join
      // against the exchanged rank frame → same partial-agg exchange.
      ranks = iterJoin(adj, ranks, adj("src") === ranks("node"),
          nNodes, bcastMax)
        .select(adj("dst"), expr("r div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("csum"))
        .select(col("dst").as("node"),
          (lit(BASE_FP) + expr(s"($DAMP_NUM * csum) div 100")).as("r"))
    }
    ranks.select(
        expr("CASE WHEN node % 2 = 0 THEN concat('c:', CAST(node div 2 AS STRING)) " +
          "ELSE concat('s:', CAST((node - 1) div 2 AS STRING)) END").as("node"),
        col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("node"))
  }

  /** g01 oracle: the same four rounds unrolled as chained CTEs. `//` is
    * DuckDB's integer division (floor; identical to Spark's `div` on the
    * non-negative operands here); sums are cast back to BIGINT before the
    * damping multiply because DuckDB widens sum(BIGINT) to HUGEINT.
    */
  val pagerankSql: String = {
    val round = (prev: String, cur: String) =>
      s"""$cur AS (SELECT a.dst AS node,
         |  CAST($BASE_FP AS BIGINT) +
         |    ($DAMP_NUM * CAST(sum(r.r // a.outdeg) AS BIGINT)) // 100 AS r
         |FROM adj a JOIN $prev r ON r.node = a.src GROUP BY a.dst)""".stripMargin
    s"""WITH $tradeEdgesCte,
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |adj AS MATERIALIZED (
       |        SELECT e.src, e.dst, d.outdeg
       |        FROM edges e JOIN deg d ON d.node = e.src),
       |r0 AS (SELECT node, CAST($START_FP AS BIGINT) AS r FROM deg),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${round("r2", "r3")},
       |${round("r3", "r4")}
       |SELECT CASE WHEN node % 2 = 0 THEN concat('c:', CAST(node // 2 AS VARCHAR))
       |  ELSE concat('s:', CAST((node - 1) // 2 AS VARCHAR)) END AS node,
       |  r AS rank_fp
       |FROM r4 ORDER BY rank_fp DESC, node""".stripMargin
  }

  // ------------------------------------ g11 personalized PageRank (PPR)
  /** Seed nations for g11: suppliers of nations < this are the trusted
    * set — the g03 seed convention, which is non-empty at every corpus
    * scale (a single-nation rule already came up empty at sf0.001's
    * 10-supplier table).
    */
  private val PPR_SEED_NATIONS = 5L
  private val PPR_TOPK = 30

  /** g11: personalized PageRank from a trusted seed set — the
    * seed-expansion operator quality curation actually runs ("rank the
    * corpus by proximity to a trusted slice", the Wikipedia-seeded
    * quality-filter shape): teleport mass returns to the SEEDS each
    * round instead of spreading uniformly, so rank measures random-walk
    * proximity to the trusted set, not global centrality. Same integer
    * fixed point as g01 (contributions `rank div degree`, damping
    * `(85·Σ) div 100`), with the 15% teleport mass credited only to
    * seed nodes; output is the top [[PPR_TOPK]] non-seed labeled nodes —
    * the expansion CANDIDATES, which is what a curation pass consumes
    * (the seeds themselves are already trusted).
    *
    * Scale shape ≡ g01: checkpointed adjacency, rank frame broadcast
    * per round (co-partitioned SMJ beyond ~100M nodes), one O(|nodes|)
    * exchange per round; the seed set is a broadcast semi/anti-join
    * side. Mass only ever leaves through the damping floor, so the
    * magnitudes sit strictly below g01's proven int64 envelope.
    */
  def pprTrust(s: SparkSession, d: String): DataFrame = {
    val seeds = Tables.supplier(s, d)
      .filter(col("s_nationkey") < PPR_SEED_NATIONS)
      .select((col("s_suppkey") * 2 + 1).as("seed"))
    pprTrustOn(tradeEdges(s, d), seeds)
  }

  /** g11 over any symmetric edge frame + seed list (spec-injectable).
    * The rank joins dispatch through [[iterJoin]] on the graph's node
    * count; the SEED joins stay broadcast unconditionally — a trusted
    * seed set is small by operator contract (it is curated by hand).
    */
  private[graft] def pprTrustOn(edges: DataFrame, seeds: DataFrame,
      bcastMax: Long = RANK_BCAST_MAX_NODES): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val nNodes = deg.count() // dispatch scalar; ranks ≤ nodes every round
    val co = nNodes > bcastMax
    val e = if (co) relayoutPartitioned(edges, col("src")) else edges
    val adjRaw = iterJoin(e, deg, e("src") === deg("node"), nNodes, bcastMax)
      .select(e("src"), e("dst"), deg("outdeg"))
    val adj = if (co) checkpointPreserving(adjRaw)
      else adjRaw.localCheckpoint(true)
    // all walk mass starts ON the seeds; BASE_FP returns to them each round
    var ranks = seeds.select(col("seed").as("node"))
      .withColumn("r", lit(START_FP))
    // Teleport folded INTO the round aggregate (round-16 optimization):
    // zero-contribution seed marker rows ride the same union into the
    // ONE per-round exchange, so a seed absent from the spread still
    // re-enters (csum 0 → r = BASE_FP) and a present one gets the
    // damped sum + BASE_FP — exactly the old left-join + anti-join +
    // union semantics. The old form referenced the spread subtree TWICE
    // per round (teleport join + re-entry anti-join), doubling the plan
    // tree every round (2^ITERS spread copies by the last round — plan
    // growth the optimizer pays even where runtime exchange reuse
    // absorbs the execution), plus two broadcast joins and a two-branch
    // union per round; this form is one union + one aggregate, linear
    // plan growth, and A/B-priced 1.4x at sf0.1.
    val seedRows = seeds.select(col("seed").as("dst"),
      lit(0L).as("contrib"), lit(1).as("is_seed"))
    for (_ <- 1 to ITERS) {
      ranks = iterJoin(adj, ranks, adj("src") === ranks("node"),
          nNodes, bcastMax)
        .select(adj("dst"), expr("r div outdeg").as("contrib"),
          lit(0).as("is_seed"))
        .unionByName(seedRows)
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("csum"), max(col("is_seed")).as("sd"))
        .select(col("dst").as("node"),
          (expr(s"($DAMP_NUM * csum) div 100") +
            when(col("sd") === 1, lit(BASE_FP)).otherwise(lit(0L))).as("r"))
    }
    val labeled = ranks
      .join(broadcast(seeds), ranks("node") === seeds("seed"), "left_anti")
      .select(
        expr("CASE WHEN node % 2 = 0 THEN concat('c:', CAST(node div 2 AS STRING)) " +
          "ELSE concat('s:', CAST((node - 1) div 2 AS STRING)) END").as("node"),
        col("r").as("ppr_fp"))
    labeled.orderBy(col("ppr_fp").desc, col("node")).limit(PPR_TOPK)
  }

  /** g11 oracle: the seeded rounds unrolled; teleport via a FULL OUTER
    * join against the seed list so absent-from-spread seeds re-enter.
    */
  val pprTrustSql: String = {
    val round = (prev: String, cur: String) =>
      s"""s$cur AS (SELECT a.dst AS node,
         |    ($DAMP_NUM * CAST(sum(r.r // a.outdeg) AS BIGINT)) // 100 AS r
         |  FROM adj a JOIN $prev r ON r.node = a.src GROUP BY a.dst),
         |$cur AS (SELECT coalesce(sp.node, sd.seed) AS node,
         |    coalesce(sp.r, 0) +
         |      CASE WHEN sd.seed IS NOT NULL THEN CAST($BASE_FP AS BIGINT)
         |           ELSE 0 END AS r
         |  FROM s$cur sp FULL OUTER JOIN seeds sd ON sd.seed = sp.node)"""
        .stripMargin
    val rounds = (1 to ITERS).map(k =>
      round(if (k == 1) "r0" else s"r${k - 1}", s"r$k")).mkString(",\n")
    s"""WITH $tradeEdgesCte,
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |adj AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.node = e.src),
       |seeds AS MATERIALIZED (
       |  SELECT 2 * s_suppkey + 1 AS seed FROM supplier
       |  WHERE s_nationkey < $PPR_SEED_NATIONS),
       |r0 AS (SELECT seed AS node, CAST($START_FP AS BIGINT) AS r FROM seeds),
       |$rounds
       |SELECT CASE WHEN node % 2 = 0 THEN concat('c:', CAST(node // 2 AS VARCHAR))
       |    ELSE concat('s:', CAST((node - 1) // 2 AS VARCHAR)) END AS node,
       |  r AS ppr_fp
       |FROM r$ITERS
       |WHERE node NOT IN (SELECT seed FROM seeds)
       |ORDER BY ppr_fp DESC, node LIMIT $PPR_TOPK""".stripMargin
  }

  /** Market-basket support threshold for a supplier pair to become an
    * edge, as parts-per-million of the order count (floor, min 4): support
    * in the frequent-itemset literature is RELATIVE — with a fixed entity
    * vocabulary, an absolute cutoff saturates to the complete graph as the
    * corpus grows (at 10× orders every pair co-occurs ≥4 times and the
    * wedge join goes O(|V|³)); a corpus-proportional cutoff keeps edge
    * density a property of the DATA, not the corpus size. 27 ppm ⇒ the
    * floor of 4 at every local SF (150k orders × 27ppm = 4.05), so small
    * SFs are unchanged while 10×+ corpora sparsify correctly.
    */
  private val SUPPORT_PPM  = 27L
  private val MIN_SUPPORT_FLOOR = 4L

  /** g02: triangle census of the supplier co-order graph (edge ⇔ two
    * suppliers co-order at corpus-relative [[SUPPORT_PPM]] support), reported
    * as the top-100 suppliers by triangle participation.
    *
    * Degree-ordered orientation: each undirected edge points from its
    * lower-(degree, id) endpoint to the higher, so per-node out-degree is
    * O(√m) and the wedge enumeration cannot go hub-quadratic. Every
    * triangle then has exactly one apex with two out-edges inside it, so
    * the wedge⋈closing-edge join counts each triangle exactly once.
    */
  def triangleCensus(s: SparkSession, d: String): DataFrame = {
    // one bounded driver scalar (the p13 discipline): the relative-support
    // cutoff needs the corpus size before the plan is built
    val minSupport = math.max(MIN_SUPPORT_FLOOR,
      Tables.orders(s, d).count() * SUPPORT_PPM / 1000000L)
    // Support pairs as AGGREGATION, not a self-join (the g06/d03 posting
    // shape): one exchange by orderkey carries the (ok, sk) distinct AND
    // the per-order supplier-list collect (subset rule), and co-order
    // pairs are the ordered combinations of each order's sorted list —
    // the former so⋈so self-join broadcast the full distinct frame
    // (34 MB at sf0.1; broadcast-infeasible at scale, where it would
    // decay to an SMJ with two corpus sorts) to emit the same pair rows
    // into the same (u, v) support aggregate. Per-order supplier count
    // is a data property (≤ lines per order), so the list explode is
    // C(order size, 2)-bounded exactly as the join output was.
    // explicit partition count (session shuffle parallelism): the stage
    // reading this exchange explodes per-order supplier lists into pair
    // rows — AQE's bytes-based coalesce starves it (measured: 6-wide on
    // 32 cores at sf0.1; the g06 note has the full rationale)
    val sp = s.sessionState.conf.numShufflePartitions
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .repartition(sp, col("ok"))
      .distinct() // rides the hash(ok) layout — no second exchange
      .groupBy(col("ok"))
      .agg(sort_array(collect_list(col("sk"))).as("sks"))
      .select(explode(flatten(transform(col("sks"), (x, i) =>
        transform(slice(col("sks"), i + 2, size(col("sks"))),
          y => struct(x.as("u"), y.as("v")))))).as("pr"))
      .groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("u"), col("v"))
      // the deg build side and the orientation probe are separate
      // executions of the support pipeline without this (the oracle's
      // MATERIALIZED pairs CTE mirrors it)
      .localCheckpoint(true)
    // explode, not union(u-side, v-side): a union would execute the whole
    // pair-support pipeline once per branch (no exchange to reuse above
    // the broadcast joins); the Generate touches it once
    val deg = pairs.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val du = deg.select(col("node").as("u"), col("dg").as("du"))
    val dv = deg.select(col("node").as("v"), col("dg").as("dv"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pairs.join(du, "u").join(dv, "v")
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("es"),
              when(lowFirst, col("v")).otherwise(col("u")).as("et"))
      // repartition BEFORE the checkpoint (the tradeEdges discipline):
      // without it the checkpoint freezes AQE's coalescing — measured
      // ONE partition at sf0.1 — and the wedge join's O(m^1.5) explode
      // stage, the key's dominant cost, runs single-task
      .repartition(sp, col("es"))
      .localCheckpoint(true) // three self-join arms share one computation
    val e1 = oriented.select(col("es").as("a1"), col("et").as("b1"))
    val e2 = oriented.select(col("es").as("a2"), col("et").as("c2"))
    val e3 = oriented.select(col("es").as("b3"), col("et").as("c3"))
    val tri = e1.join(e2, col("a1") === col("a2") && col("b1") =!= col("c2"))
      .join(e3, col("b3") === col("b1") && col("c3") === col("c2"))
      .select(col("a1").as("x"), col("b1").as("y"), col("c2").as("z"))
    // one Generate over the single wedge-join execution — a 3-way union
    // would re-enumerate all wedges once per branch (profiled: 3× the
    // dominant cost at sf0.1's 14.6M wedges / 1.8M triangles)
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
      .limit(100)
  }

  /** g02 oracle: identical support threshold, orientation, and wedge join.
    * The multiply-referenced CTEs are pinned MATERIALIZED: DuckDB's
    * default inlining re-expands `o` per wedge-join arm and `pairs` per
    * degree-union branch — at 10× corpus that re-executes the 20M-row
    * support join ~9 times and spills tens of GB; materialization executes
    * each CTE once, like the Spark side's localCheckpoint.
    */
  val triangleCensusSql: String =
    s"""WITH so AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
       |pairs AS MATERIALIZED (
       |          SELECT a.sk AS u, b.sk AS v
       |          FROM so a JOIN so b ON a.ok = b.ok AND a.sk < b.sk
       |          GROUP BY a.sk, b.sk
       |          HAVING count(*) >= greatest($MIN_SUPPORT_FLOOR,
       |            (SELECT count(*) FROM orders) * $SUPPORT_PPM // 1000000)),
       |deg AS MATERIALIZED (
       |        SELECT node, CAST(count(*) AS BIGINT) AS dg FROM (
       |          SELECT u AS node FROM pairs
       |          UNION ALL SELECT v AS node FROM pairs)
       |        GROUP BY node),
       |o AS MATERIALIZED (
       |      SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
       |               THEN p.u ELSE p.v END AS es,
       |             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
       |               THEN p.v ELSE p.u END AS et
       |      FROM pairs p JOIN deg du ON du.node = p.u
       |                   JOIN deg dv ON dv.node = p.v),
       |tri AS (SELECT e1.es AS x, e1.et AS y, e2.et AS z
       |        FROM o e1 JOIN o e2 ON e2.es = e1.es AND e1.et <> e2.et
       |                  JOIN o e3 ON e3.es = e1.et AND e3.et = e2.et)
       |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
       |  SELECT x AS node FROM tri
       |  UNION ALL SELECT y AS node FROM tri
       |  UNION ALL SELECT z AS node FROM tri)
       |GROUP BY node ORDER BY n_tri DESC, node LIMIT 100""".stripMargin

  /** Seed-nation cutoff for g03: suppliers in nations < this are seeds. */
  private val LPA_SEED_NATIONS = 5L
  private val LPA_ROUNDS = 3

  /** g03: semi-supervised label propagation (the classic LPA, Zhu &
    * Ghahramani 2002 / Raghavan et al. 2007) over the trade graph:
    * suppliers from the first [[LPA_SEED_NATIONS]] nations are fixed
    * seeds carrying their nation as the label; every other node takes,
    * each synchronous round, the MAJORITY label among its neighbors
    * (ties → smallest label; nodes with no labeled neighbor stay
    * unlabeled). Three rounds reach customers (hop 1), unseeded
    * suppliers (hop 2), and their customers (hop 3) — the market-segment
    * discovery / entity-canonicalization pass.
    *
    * Entirely integer (labels + counts), so the oracle replays it
    * hash-exactly with zero float discipline. Scale shape per round: one
    * join of the checkpointed edge list against the (node, label) frame,
    * a (dst, label) count, and an argmax via max(struct(cnt, -label)) —
    * single aggregation, no window; the label frame never exceeds
    * |nodes| rows. Seeds stay fixed via anti-join + union.
    */
  def labelPropagation(s: SparkSession, d: String): DataFrame = {
    val (labels, _) = lpaLabelsAndEdges(s, d)
    labels.groupBy(col("label"))
      .agg(count(when(col("node") % 2 === 0, 1)).as("n_customers"),
        count(when(col("node") % 2 === 1, 1)).as("n_suppliers"))
      .orderBy(col("label"))
  }

  /** The g03 propagation itself: final (node, label) frame after
    * [[LPA_ROUNDS]] synchronous rounds, plus the checkpointed symmetric
    * edge list it ran on (shared with g08's modularity eval so the eval
    * never re-derives the adjacency).
    */
  private[graft] def lpaLabelsAndEdges(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val edges = tradeEdges(s, d) // checkpointed by construction
    val seeds = Tables.supplier(s, d)
      .filter(col("s_nationkey") < LPA_SEED_NATIONS)
      .select((col("s_suppkey") * 2 + 1).as("node"),
        col("s_nationkey").cast("long").as("label"))
    // dispatch bound from parquet FOOTER counts (no scan, no shuffle):
    // trade-graph nodes ⊆ customers ∪ suppliers
    val bound = Tables.customer(s, d).count() + Tables.supplier(s, d).count()
    (lpaOn(edges, seeds, nNodesHint = Some(bound)), edges)
  }

  /** The g03 vote loop over any symmetric, src-partitioned, checkpointed
    * edge frame + (node, label) seed frame — the kernel g09 shares.
    * INPUT CONTRACT: `seeds` must carry at most ONE row per node. The
    * seed-fold argmax collapses a node's rows to one label; a caller
    * passing the same node with two labels would get ONE of them
    * (max-cnt, then smallest label) where the pre-fold anti-join+union
    * form preserved both rows. All current callers pass unique-node
    * seed frames. The
    * per-round label join dispatches through [[iterJoin]] (labels ≤
    * |nodes| by construction: every round's output is one row per voted
    * node, anti-joined against the fixed seeds). `nNodesHint`: a cheap
    * UPPER bound on the node count when the caller has one (a parquet
    * metadata count beats an O(|edges|) distinct aggregate whose only
    * purpose is the dispatch).
    */
  private[graft] def lpaOn(edges: DataFrame, seeds: DataFrame,
      bcastMax: Long = RANK_BCAST_MAX_NODES,
      rounds: Int = LPA_ROUNDS,
      nNodesHint: Option[Long] = None): DataFrame = {
    val nNodes = nNodesHint.getOrElse(
      edges.select(col("src")).distinct().count()) // dispatch scalar
    val e = if (nNodes > bcastMax) relayoutPartitioned(edges, col("src"))
      else edges
    var labels = seeds
    // Seed fixing folded INTO the round aggregate (round-16
    // optimization, the g11 teleport-fold shape): seed marker rows
    // (sd = 1) ride the vote union through the ONE per-round exchange,
    // and the argmax keys on (sd, cnt, -label) — a seed's own group
    // always wins, so seeds keep their label without the former
    // per-round broadcast anti-join + union. The marker inflates its
    // own (node, seed-label) group's cnt by one, which can never
    // change an outcome: sd dominates the comparison and no node
    // carries two marker rows. Non-seed groups are untouched, so the
    // majority vote (ties → smallest label) is byte-identical.
    val seedRows = seeds.select(col("node").as("dst"), col("label"),
      lit(1).as("sd"))
    for (_ <- 1 to rounds) {
      // same explicit broadcast rationale as the g01 iteration join (the
      // ExistingRDD side has no stats; AQE's runtime demotion would strand
      // a full-edge exchange per round); above the ceiling iterJoin flips
      // to the co-partitioned shuffle-hash form.
      // one exchange per round: hash-partitioning by dst alone satisfies
      // the clustering requirement of BOTH aggregations ((dst, label)
      // count and the per-dst argmax — subset rule), where letting each
      // groupBy plan its own exchange costs two
      labels = iterJoin(e, labels, labels("node") === e("src"),
          nNodes, bcastMax)
        .select(col("dst"), col("label"), lit(0).as("sd"))
        .unionByName(seedRows)
        .repartition(col("dst"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"), max(col("sd")).as("sd"))
        .groupBy(col("dst"))
        .agg(max(struct(col("sd"), col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("label"))
    }
    labels
  }

  /** g03 oracle: the same synchronous rounds unrolled. */
  val labelPropagationSql: String = {
    val round = (prev: String, k: Int) =>
      s"""n$k AS (SELECT e.dst AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
         |  FROM edges e JOIN $prev l ON l.node = e.src GROUP BY e.dst, l.label),
         |v$k AS (SELECT node, label FROM n$k
         |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) = 1),
         |l$k AS MATERIALIZED (
         |  SELECT v.node, v.label FROM v$k v
         |    LEFT JOIN seeds s ON s.node = v.node WHERE s.node IS NULL
         |  UNION ALL SELECT node, label FROM seeds)""".stripMargin
    val rounds = (1 to LPA_ROUNDS).map(k =>
      round(if (k == 1) "l0" else s"l${k - 1}", k)).mkString(",\n")
    s"""WITH $tradeEdgesCte,
       |seeds AS MATERIALIZED (
       |  SELECT 2 * s_suppkey + 1 AS node, CAST(s_nationkey AS BIGINT) AS label
       |  FROM supplier WHERE s_nationkey < $LPA_SEED_NATIONS),
       |l0 AS (SELECT node, label FROM seeds),
       |$rounds
       |SELECT label,
       |  CAST(count(*) FILTER (node % 2 = 0) AS BIGINT) AS n_customers,
       |  CAST(count(*) FILTER (node % 2 = 1) AS BIGINT) AS n_suppliers
       |FROM l$LPA_ROUNDS GROUP BY label ORDER BY label""".stripMargin
  }

  /** g04 BFS geometry: seed = customer 0 (packed node 0 — custkeys start
    * at 0 and stay fixed under ScaleData, so the seed exists at every
    * scale); hop cap 6 ≫ the trade graph's observed diameter (bipartite
    * co-order graphs are small-world; anything still unreached at 6 hops
    * is in another component, reported as hop −1).
    */
  private val BFS_SEED = 0L
  private val BFS_MAX_HOPS = 6

  /** g04: single-source BFS reachability profile — how much of the trade
    * graph lies within k hops of one customer (the blast-radius question
    * behind fraud spread, recall expansion, and partner-network audits).
    * Classic distributed frontier expansion: per round, the O(frontier)
    * frame joins the checkpointed adjacency, newly discovered nodes get
    * hop = round, visited nodes are excluded by an anti-join against the
    * accumulated distance frame. BFS assigns min-hop by construction, so
    * every quantity is integer-exact and the DuckDB mirror is a
    * hop-guarded recursive CTE (UNION dedup bounds it at |nodes|·maxHop
    * pairs) + min(hop) — hash-identical.
    *
    * Iteration discipline (the g01/g03 lessons): adjacency localCheckpoint
    * at full parallelism; the SMALL frame (frontier) broadcast explicitly
    * so AQE demotion can't strand a probe-side exchange; dist re-checkpoints
    * each round so lineage stays O(1); the per-round empty-frontier check
    * is one bounded driver scalar (the CC fingerprint style). Early exit on
    * an empty frontier — the cap is a bound, not a fixed cost.
    *
    * Newly-discovered detection is MIN-HOP AGGREGATION, not an
    * anti-join (round-17 optimization — the g07 relaxation shape,
    * guide §2.3 aggregate-before-shuffle / §2.4 remove shuffles): per
    * round the relaxed frontier rides ONE union + min(hop) aggregate
    * into the accumulated distance frame — a node re-reached at hop r
    * keeps its earlier hop (min), a new node enters at r, and the next
    * frontier is exactly the rows at hop == r off the cached result.
    * The old form paid, per round, a distinct exchange over the relaxed
    * frame PLUS an anti-join against the |visited|-frame (statically an
    * SMJ — at scale that is a full re-exchange of both sides) PLUS two
    * eager checkpoints (next, dist∪next) and a third action for the
    * isEmpty probe; this form pays one exchange, one checkpoint, and
    * reads the frontier count off the cached frame. Equivalence: BFS
    * min-hop — distinct+anti-join(visited)+hop=r emits a node iff its
    * minimum discovery hop is exactly r, which is what min(hop) keeps.
    */
  def bfsReach(s: SparkSession, d: String): DataFrame = {
    val adj = tradeEdges(s, d)
    var dist = adj.sparkSession.range(1)
      .select(lit(BFS_SEED).as("node"), lit(0).cast("int").as("hop"))
      .localCheckpoint(true)
    var frontier = dist
    var hop = 0
    while (hop < BFS_MAX_HOPS && !frontier.isEmpty) {
      hop += 1
      val relaxed = adj.join(broadcast(frontier), adj("src") === frontier("node"))
        .select(adj("dst").as("node"), lit(hop).cast("int").as("hop"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        .localCheckpoint(true)
      frontier = dist.filter(col("hop") === hop)
    }
    // reachability profile + the out-of-component remainder (hop −1): the
    // node universe is adj's src side (degree ≥ 1 by construction)
    val profile = dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
    val unreached = adj.select(col("src").as("node")).distinct()
      .join(dist, Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).cast("int").as("hop"), col("n_nodes"))
    profile.unionByName(unreached).filter(col("n_nodes") > 0)
      .orderBy("hop")
  }

  /** g04 oracle: hop-guarded recursive CTE (UNION dedups (node, hop)
    * pairs; the guard bounds the recursion at maxHop rounds), then
    * min(hop) per node — the BFS distance.
    */
  val bfsReachSql: String =
    s"""WITH RECURSIVE $tradeEdgesCte,
       |r(node, hop) AS (
       |  SELECT CAST($BFS_SEED AS BIGINT) AS node, 0 AS hop
       |  UNION
       |  SELECT e.dst, r.hop + 1 FROM r JOIN edges e ON e.src = r.node
       |  WHERE r.hop < $BFS_MAX_HOPS),
       |d AS (SELECT node, min(hop) AS hop FROM r GROUP BY node),
       |prof AS (SELECT CAST(hop AS INT) AS hop, count(*) AS n_nodes FROM d GROUP BY hop
       |         UNION ALL
       |         SELECT -1, count(*) FROM (
       |           SELECT DISTINCT src AS node FROM edges) u
       |         WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.node = u.node))
       |SELECT hop, n_nodes FROM (
       |  SELECT hop, CAST(sum(n_nodes) AS BIGINT) AS n_nodes
       |  FROM prof GROUP BY hop)
       |WHERE n_nodes > 0 ORDER BY hop""".stripMargin

  // ------------------------------------------------- g05 degree mixing
  /** g05: degree assortativity of the bipartite trade graph — "do
    * high-volume customers trade with high-volume suppliers?" The Pearson
    * correlation of endpoint degrees over edges, the standard mixing
    * coefficient (Newman 2002), computed in the q55 exact-power-sum
    * discipline: every Σ is an exact int64 over the edge list, and the
    * coefficient itself is ONE fixed IEEE chain
    * `(m·Σxy − Σx·Σy) / (√(m·Σx²−Σx²̄) · √(m·Σy²−Σy²̄))` — identical
    * operation order in the oracle, so the double hash-matches (the s01
    * cosine precedent). The exact sums ride along in the output, so a
    * downstream engine can merge partitions' sums and recompute r
    * without rescanning edges (the q63/q66 mergeable-stats stance).
    *
    * Shape: one edge derivation (the checkpointed [[tradeEdges]] frame
    * shared with g01/g03/g04), one degree aggregate, two broadcast
    * degree joins, one global aggregate — no iteration. The broadcast
    * hint carries the same bound as g01's rank join: beyond ~100M nodes
    * swap it for src/node co-hash-partitioned SMJ. Overflow bound:
    * m·Σ(d²) must stay under 2^63; with int64 sums that holds through
    * ~10^12 edges at realistic degree skew (and the exact sums make any
    * violation loud, not silent — Spark overflows throw under ANSI).
    */
  def degreeMixing(s: SparkSession, d: String): DataFrame =
    // checkpointed: THREE consumers (both degree sides + the probe) would
    // otherwise each re-run the orders⋈lineitem distinct (the tradeEdges
    // rationale, at half the rows — single direction)
    degreeMixingOf(tradeEdgesRaw(s, d).localCheckpoint())

  /** g05 over any single-direction packed-long edge frame (spec face).
    * Degrees come per SIDE off the raw frame (a node's degree in the
    * bipartite graph = its row count on its own side), so g05 skips the
    * doubled/checkpointed frame the iterative keys materialize
    * (profiled: 2.07 s → 1.8 s at sf0.1 — the orders⋈lineitem distinct
    * derivation is the remaining floor, shared with every graph key).
    */
  private[graft] def degreeMixingOf(once: DataFrame): DataFrame = {
    val dcs = once.groupBy(col("src").as("nc")).agg(count(lit(1)).as("dc"))
    val dss = once.groupBy(col("dst").as("ns")).agg(count(lit(1)).as("ds"))
    val j = once
      .join(broadcast(dcs), col("src") === col("nc"))
      .join(broadcast(dss), col("dst") === col("ns"))
    j.agg(count(lit(1)).as("m_edges"),
        sum(col("dc")).as("s_dc"), sum(col("ds")).as("s_ds"),
        sum(col("dc") * col("dc")).as("s_dc2"),
        sum(col("ds") * col("ds")).as("s_ds2"),
        sum(col("dc") * col("ds")).as("s_dcds"))
      .select(col("m_edges"), col("s_dc"), col("s_ds"), col("s_dc2"),
        col("s_ds2"), col("s_dcds"),
        (expr("CAST(m_edges * s_dcds - s_dc * s_ds AS DOUBLE)") /
          (sqrt(expr("CAST(m_edges * s_dc2 - s_dc * s_dc AS DOUBLE)")) *
            sqrt(expr("CAST(m_edges * s_ds2 - s_ds * s_ds AS DOUBLE)"))))
          .as("assortativity"))
      .orderBy("m_edges")
  }

  val degreeMixingSql: String =
    s"""WITH eraw AS MATERIALIZED (
      |  SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |dcs AS (SELECT src, count(*) AS dc FROM eraw GROUP BY src),
      |dss AS (SELECT dst, count(*) AS ds FROM eraw GROUP BY dst),
      |oncej AS (SELECT dc, ds FROM eraw JOIN dcs USING (src) JOIN dss USING (dst)),
      |sums AS (SELECT CAST(count(*) AS BIGINT) AS m_edges,
      |           CAST(sum(dc) AS BIGINT) AS s_dc, CAST(sum(ds) AS BIGINT) AS s_ds,
      |           CAST(sum(dc * dc) AS BIGINT) AS s_dc2,
      |           CAST(sum(ds * ds) AS BIGINT) AS s_ds2,
      |           CAST(sum(dc * ds) AS BIGINT) AS s_dcds
      |         FROM oncej)
      |SELECT m_edges, s_dc, s_ds, s_dc2, s_ds2, s_dcds,
      |  CAST(m_edges * s_dcds - s_dc * s_ds AS DOUBLE) /
      |    (sqrt(CAST(m_edges * s_dc2 - s_dc * s_dc AS DOUBLE)) *
      |     sqrt(CAST(m_edges * s_ds2 - s_ds * s_ds AS DOUBLE))) AS assortativity
      |FROM sums ORDER BY m_edges""".stripMargin

  // -------------------------------------------------- g06 link prediction
  /** Parts with more than this many distinct buyers are excluded from
    * the wedge join: a hub bought by everyone predicts nothing (the
    * mutual-information argument), and the cap bounds the pair blowup
    * at Σ_{d≤cap} d² ≤ cap·|edges| — linear in the edge list, never
    * quadratic in a hub's degree (the d03 MAX_POSTING_LEN discipline).
    * Part degree is a DATA property that stays ~30 as the corpus grows
    * (lineitems and parts scale together), so the cap is far above the
    * realized distribution at every SF and only fires on true hubs —
    * unlike the customer–supplier projection, whose ~|customers|/2
    * supplier degrees saturate the graph (the g02 union-saturation
    * lesson: that relation was REJECTED for this key).
    */
  val WEDGE_CAP = 256L
  /** Predicted pairs reported. */
  val LINK_TOPK = 50

  /** g06: co-purchase link prediction over the customer–part bipartite
    * graph — rank customer PAIRS by shared-purchase evidence: `common`
    * (common-neighbor count) and `ra_score` (resource allocation index,
    * Zhou et al. 2009 — Σ 1/deg(shared part), the Adamic–Adar family
    * member that needs no log; rarer shared parts weigh more). The
    * classic recommender / entity-completion signal: "customers whose
    * baskets overlap are likely to share future purchases".
    *
    * Determinism: 1/deg is the EXACT integer `1e9 div deg` — the score
    * is a sum of int64s, shuffle-order-independent, no IEEE anywhere.
    *
    * Scale shape: degree-cap FIRST (join edges to the capped weight
    * table on the part key), THEN the wedge self-join on that same
    * key — hub pairs never materialize, and the weight join rides the
    * wedge join's own (part) partitioning (no extra exchange: both
    * joins key on p). The final ranking is orderBy+limit =
    * TakeOrderedAndProject (per-partition heaps, driver merges
    * [[LINK_TOPK]] rows).
    */
  def linkPrediction(s: SparkSession, d: String): DataFrame =
    // no checkpoint, no pre-distinct: the kernel consumes the raw join
    // output exactly once and dedups on the one exchange it pays
    linkPredictionOf(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")),
      WEDGE_CAP, LINK_TOPK)

  /** g06 over any (c, p) bipartite edge frame — rows need not be
    * pre-distincted; the kernel dedups on the one exchange it pays.
    *
    * Pair generation as AGGREGATION, not a self-join (the d03 posting
    * shape): ONE exchange by part carries the whole candidate pipeline —
    * the (c, p) distinct, the degree cap, and the posting-list collect
    * all cluster on `p` (subset rule: hash(p) co-locates every (c, p)
    * group), so they run in one post-shuffle stage, and pairs are the
    * ordered combinations of each part's sorted, CAPPED customer list.
    * The former self-join form re-read the part exchange twice, paid two
    * corpus-scale sorts + an SMJ, and broadcast a per-part weight table,
    * all to emit the same pair rows into the same (cust_a, cust_b)
    * aggregate (profiled at sf0.1: the two 8-s sort pipelines were the
    * dominant cost; at broadcast-infeasible scale the weight join would
    * have been a third shuffle). The cap is applied by a whole-partition
    * count window BEFORE collect_list materializes anything (the d03
    * windowedPostings discipline), so a hub part never builds its list.
    */
  private[graft] def linkPredictionOf(e: DataFrame, cap: Long,
      topk: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Explicit partition count = the session's configured shuffle
    // parallelism, NOT the AQE-coalescible default: the stage reading
    // this exchange fans each part's posting out into C(|posting|, 2)
    // pair rows (up to ~cap²/2 per input group), and AQE's bytes-based
    // coalesce sees only the thin (p, c) input — measured at sf0.1 it
    // coalesced the read to 5 partitions and the explode+partial-agg
    // stage (the key's dominant cost) ran 5-wide on 32 cores. Same
    // hazard class as the tradeEdges pre-checkpoint repartition note.
    val sp = e.sparkSession.sessionState.conf.numShufflePartitions
    val capped = e.select(col("p"), col("c"))
      .repartition(sp, col("p"))
      .distinct() // (p, c) dedup rides the hash(p) layout — no 2nd exchange
      .withColumn("dg", count(lit(1)).over(Window.partitionBy("p")))
      .filter(col("dg") <= cap) // cap BEFORE the posting list materializes
    capped.groupBy(col("p"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      // dg survived the filter, so size(cs) = dg exactly; 1e9 div dg is
      // the resource-allocation weight of every pair sharing this part
      .select(explode(flatten(transform(col("cs"), (x, i) =>
          transform(slice(col("cs"), i + 2, size(col("cs"))),
            y => struct(x.as("cust_a"), y.as("cust_b")))))).as("pr"),
        expr("CAST(1000000000 div size(cs) AS BIGINT)").as("w"))
      .groupBy(col("pr.cust_a").as("cust_a"), col("pr.cust_b").as("cust_b"))
      .agg(count(lit(1)).as("common"), sum(col("w")).as("ra_score"))
      .orderBy(col("common").desc, col("ra_score").desc,
        col("cust_a"), col("cust_b"))
      .limit(topk)
      .orderBy(col("common").desc, col("ra_score").desc,
        col("cust_a"), col("cust_b"))
  }

  val linkPredictionSql: String =
    s"""WITH e AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |ok AS (SELECT p, 1000000000 // count(*) AS w FROM e
      |       GROUP BY p HAVING count(*) <= $WEDGE_CAP),
      |ec AS MATERIALIZED (SELECT e.p, e.c, ok.w FROM e JOIN ok USING (p)),
      |pr AS (SELECT a.c AS cust_a, b.c AS cust_b,
      |        CAST(count(*) AS BIGINT) AS common,
      |        CAST(sum(a.w) AS BIGINT) AS ra_score
      |      FROM ec a JOIN ec b ON a.p = b.p AND a.c < b.c
      |      GROUP BY 1, 2)
      |SELECT cust_a, cust_b, common, ra_score FROM pr
      |ORDER BY common DESC, ra_score DESC, cust_a, cust_b
      |LIMIT $LINK_TOPK""".stripMargin

  // -------------------------------------------------- g07 weighted SSSP
  private val SSSP_ROUNDS = 6

  /** g07: hop-bounded weighted single-source shortest paths — Bellman-Ford
    * relaxation over the trade graph with TIE-STRENGTH edge weights
    * (w = max(1, 1000 div co-order multiplicity): frequent trading pairs
    * are cheap to traverse, one-off pairs cost 1000), the "cheapest trust
    * path within k hops" question behind fraud-ring tracing, partner
    * routing, and recall expansion with edge affinities. g04 answers
    * min-HOPS; this answers min-COST, and the two diverge exactly where
    * a longer chain of strong ties undercuts one weak tie (the planted
    * spec pins such a case).
    *
    * Contract: distances are exact integer shortest-path costs using at
    * most [[SSSP_ROUNDS]] edges (the g04 hop-cap stance — at 6 rounds the
    * relaxation has converged on this small-world graph; the oracle runs
    * the SAME fixed 6 rounds, so the contract is identical even if a
    * pathological graph were still relaxing). Everything is longs:
    * min-aggregates of integer sums, shuffle-order independent.
    *
    * Iteration discipline (g01/g03/g04 lessons): the weighted adjacency
    * is repartitioned and localCheckpointed ONCE; the O(|nodes|) distance
    * frame is broadcast explicitly each round (AQE demotion would strand
    * a probe-side exchange per round); dist re-checkpoints per round so
    * lineage stays O(1). Six rounds = six bounded jobs; at node counts
    * past broadcast reach the same loop runs with a shuffled src-keyed
    * join (the frames stay |nodes|-bounded either way).
    */
  def sssp(s: SparkSession, d: String): DataFrame = {
    val ew = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("mult"))
      .select(col("src"), col("dst"),
        expr("greatest(1L, 1000L div mult)").as("w"))
    ssspFrom(ew, BFS_SEED)
  }

  /** g07 over any weighted (src, dst, w) half-edge frame (spec face);
    * edges are symmetrized here.
    *
    * DELIBERATELY relax-from-all, not frontier Bellman-Ford (round-17
    * optimization A/B): the changed-flag frontier refinement — relax
    * only from nodes whose distance improved, flag riding the same
    * min(struct(dist, ch)) exchange, early exit on an empty frontier —
    * was implemented, equality-gated (byte-identical rounds: an
    * unchanged node's proposals are already folded into an earlier
    * min), and measured 0.97× at sf0.1 and 0.92× at 10× — REJECTED.
    * On this graph the refinement cannot pay: WEIGHTED relaxation
    * keeps improving distances through all [[SSSP_ROUNDS]] rounds
    * (cheap strong-tie chains keep undercutting), so the frontier
    * never decays, no early exit fires, and the flag column + the
    * per-round frontier probe are pure overhead. g04 (unweighted
    * min-HOP) is where the frontier form wins and uses it.
    */
  private[graft] def ssspFrom(ew: DataFrame, seed: Long): DataFrame = {
    val adj = ew.select(explode(array(
        struct(col("src").as("s"), col("dst").as("t"), col("w")),
        struct(col("dst").as("s"), col("src").as("t"), col("w")))).as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"), col("e.w").as("w"))
      .repartition(col("src"))
      .localCheckpoint(true)
    var dist = adj.sparkSession.range(1)
      .select(lit(seed).as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to SSSP_ROUNDS) {
      val relaxed = adj.join(broadcast(dist), adj("src") === dist("node"))
        .select(adj("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.select(col("node"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp"))
          .as("side"),
        col("dist"))
      .orderBy("node")
  }

  /** g07 oracle: the same six relaxation rounds unrolled as chained CTEs
    * (the g03 $prev pattern — DuckDB recursive CTEs see only the last
    * round's rows, which cannot express "min over all rounds so far"
    * without re-emitting the full set; six explicit rounds can).
    */
  val ssspSql: String = {
    val rounds = (1 to SSSP_ROUNDS).map { r =>
      s"""d$r AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM d${r - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, p.dist + e.w AS dist
         |  FROM d${r - 1} p JOIN e ON e.src = p.node) GROUP BY node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ew AS MATERIALIZED (
       |  SELECT src, dst, greatest(1, 1000 // mult) AS w FROM (
       |    SELECT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst,
       |           count(*) AS mult
       |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |    GROUP BY 1, 2)),
       |e AS MATERIALIZED (SELECT src, dst, w FROM ew
       |  UNION ALL SELECT dst AS src, src AS dst, w FROM ew),
       |d0 AS (SELECT CAST($BFS_SEED AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
       |$rounds
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS side,
       |  CAST(dist AS BIGINT) AS dist
       |FROM d$SSSP_ROUNDS ORDER BY node""".stripMargin
  }

  // ------------------------------------------------ g08 modularity eval
  /** g08: Newman modularity of the g03 label-propagation communities —
    * the eval face of g03, exactly as d19 is to d04 and s18 to s05: the
    * measurement a production clustering choice rests on. Q = Σ_c
    * [intra_c/M − (d_c/M)²] over the symmetric edge list (M = directed
    * edge count = 2m), reported per community as the exact integer
    * numerator q_contrib_num = M·intra_c − d_c², so Q = Σ/M² with zero
    * float accumulation. Positive contributions mark real communities
    * (more internal mass than the degree-random null model); the exact
    * integers stay within int64 through ~3·10⁹ directed edges (M·intra ≤
    * M²), past which the units rescale (document, don't overflow).
    *
    * Nodes the propagation never reached fold into one explicit −1
    * community (deterministic; empty on this graph, where seeds reach
    * everything within the round budget). Shape: labels and adjacency
    * come from ONE propagation run (the p11 amortization discipline —
    * g08 never re-derives either); the |nodes|-row label frame is
    * checkpointed once and broadcast into the edge scan twice (src/dst
    * sides); two bounded aggregates (per-label, 1-row grand total)
    * finish it. Nothing rescans lineitem.
    */
  def modularity(s: SparkSession, d: String): DataFrame = {
    val (labels, edges) = lpaLabelsAndEdges(s, d)
    val lab = edges.select(col("src").as("node")).distinct()
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), lit(-1L)).as("label"))
      .localCheckpoint(true) // iterative lineage; read 3x below
    val e2 = edges
      .join(broadcast(lab.select(col("node").as("src"), col("label").as("lsrc"))),
        "src")
      .join(broadcast(lab.select(col("node").as("dst"), col("label").as("ldst"))),
        "dst")
    // eager checkpoint (round-17, guide §2.4/§5): perLabel has TWO
    // consumers — the report rows and the m_dir grand total — and
    // column pruning gives the m_dir arm a NARROWER partial-aggregate
    // exchange (deg_sum only), so exchange reuse cannot unify them and
    // the whole e2 pipeline (a full edge pass + two broadcast joins +
    // aggregate) executed TWICE (profiled at sf0.1: duplicate 1.17M-row
    // BHJ+HashAggregate subtrees, aggTime 2.3 s + 1.8 s). The frame is
    // O(|labels|) rows — the materialization is free by comparison.
    val perLabel = e2.groupBy(col("lsrc").as("label"))
      .agg(count(lit(1)).as("deg_sum"),
        count(when(col("lsrc") === col("ldst"), 1)).as("intra_deg"))
      .localCheckpoint(true)
    perLabel
      .join(lab.groupBy("label").agg(count(lit(1)).as("n_nodes")), "label")
      .crossJoin(broadcast(perLabel.agg(sum(col("deg_sum")).as("m_dir"))))
      .select(col("label"), col("n_nodes"),
        expr("intra_deg div 2").as("intra_edges"),
        col("deg_sum"),
        (col("m_dir") * col("intra_deg") - col("deg_sum") * col("deg_sum"))
          .as("q_contrib_num"))
      .orderBy("label")
  }

  /** g08 oracle: the g03 unrolled propagation feeding the same exact
    * integer modularity arithmetic.
    */
  val modularitySql: String = {
    val round = (prev: String, k: Int) =>
      s"""n$k AS (SELECT e.dst AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
         |  FROM edges e JOIN $prev l ON l.node = e.src GROUP BY e.dst, l.label),
         |v$k AS (SELECT node, label FROM n$k
         |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) = 1),
         |l$k AS MATERIALIZED (
         |  SELECT v.node, v.label FROM v$k v
         |    LEFT JOIN seeds s ON s.node = v.node WHERE s.node IS NULL
         |  UNION ALL SELECT node, label FROM seeds)""".stripMargin
    val rounds = (1 to LPA_ROUNDS).map(k =>
      round(if (k == 1) "l0" else s"l${k - 1}", k)).mkString(",\n")
    s"""WITH $tradeEdgesCte,
       |seeds AS MATERIALIZED (
       |  SELECT 2 * s_suppkey + 1 AS node, CAST(s_nationkey AS BIGINT) AS label
       |  FROM supplier WHERE s_nationkey < $LPA_SEED_NATIONS),
       |l0 AS (SELECT node, label FROM seeds),
       |$rounds,
       |lab AS MATERIALIZED (
       |  SELECT u.node, coalesce(l.label, -1) AS label
       |  FROM (SELECT DISTINCT src AS node FROM edges) u
       |  LEFT JOIN l$LPA_ROUNDS l ON l.node = u.node),
       |e2 AS (SELECT ls.label AS lsrc, ld.label AS ldst
       |  FROM edges e JOIN lab ls ON ls.node = e.src
       |  JOIN lab ld ON ld.node = e.dst),
       |pl AS (SELECT lsrc AS label, CAST(count(*) AS BIGINT) AS deg_sum,
       |         CAST(count(*) FILTER (lsrc = ldst) AS BIGINT) AS intra_deg
       |       FROM e2 GROUP BY 1),
       |nn AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1),
       |mt AS (SELECT CAST(sum(deg_sum) AS BIGINT) AS m_dir FROM pl)
       |SELECT pl.label, CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       |  intra_deg // 2 AS intra_edges, deg_sum,
       |  mt.m_dir * intra_deg - deg_sum * deg_sum AS q_contrib_num
       |FROM pl JOIN nn USING (label) CROSS JOIN mt ORDER BY pl.label"""
      .stripMargin
  }

  // --------------------------------------------- g10 k-core decomposition
  /** Fixed peel-round budget per k; the engine early-exits at the actual
    * fixpoint (one bounded O(1) driver count per round, the g04 frontier
    * discipline) and the unrolled oracle runs all [[KCORE_CAP]] rounds —
    * identical by monotonicity: once peeling reaches its fixpoint every
    * further round is a no-op, so "engine at fixpoint" and "oracle after
    * CAP rounds" are the same edge set whenever the `converged` flag is
    * true (and byte-identical CAP-round states when it is not).
    */
  private val KCORE_CAP = 8
  private val KCORE_KS  = Seq(2L, 3L, 4L)

  /** g10: k-core census of the trade graph — for k ∈ {2,3,4}, the size of
    * the maximal subgraph where every node keeps ≥ k neighbors (Seidman
    * 1983; the web-graph quality/spam signal Batagelj-Zaveršnik peel).
    * Cores nest, so each k peels the PREVIOUS core, not the full graph —
    * the 4-core pass runs over the 3-core's survivors only.
    *
    * Per round: one degree aggregate over the current (symmetric,
    * checkpointed) edge frame and two semi-joins keeping edges whose both
    * endpoints survive; entirely integer, so the unrolled DuckDB mirror
    * hash-matches. The `converged` flag is computed DECLARATIVELY (min
    * final degree ≥ k, true on an empty core) in both engines — honesty
    * at scales where CAP rounds might not reach the fixpoint.
    *
    * Scale shape: the survivor list is broadcast into both semi-joins
    * (the g03 note: beyond ~100M surviving nodes switch to co-partitioned
    * shuffle-hash on src/dst); the census is a 1-row aggregate per k;
    * lineage is cut per round by an eager localCheckpoint that INHERITS
    * the caller's partition count (the semi-joins are narrow, so no
    * per-round exchange). Edge frames only ever SHRINK, so the deepest core costs
    * the least.
    */
  def kcoreCensus(s: SparkSession, d: String): DataFrame =
    kcoreCensusOf(tradeEdges(s, d))

  /** g10 over any symmetric (src, dst) edge frame (spec-injectable face).
    *
    * Round structure (round-17 optimization — guide §2.4 remove
    * shuffles, §1.2 don't compute what you throw away): ONE per-round
    * degree materialization (an O(|nodes|)-row eager checkpoint) serves
    * (a) the fixpoint test, (b) BOTH endpoint semi-join build sides,
    * and (c) the [[iterJoin]] dispatch scalar — the TRUE survivor node
    * count, not the former edge-row upper bound. The old form computed
    * the survivor aggregate TWICE per round (once per broadcast build;
    * the two subtrees' aliases defeated exchange reuse), and detected
    * the fixpoint by running a FULL no-op peel — checkpointing and
    * counting an edge frame identical to its input — once per k.
    * The fixpoint test is now node-monotone: no node under degree k ⇒
    * no edge removed ⇒ fixpoint (a removed node has ≥ 1 incident edge
    * on a degree-≥1 frame, so node-set equality ⇔ edge-set equality).
    *
    * Per-round exchange discipline: the broadcast regime checkpoints
    * `peeled` DIRECTLY — the semi-joins are narrow over the previous
    * checkpoint's partitions, so the partition count (established once
    * by the caller's pre-checkpoint repartition) carries through every
    * round and the former per-round `repartition(src)` full-edge
    * exchange is dropped. The co regime keeps [[relayoutPartitioned]]:
    * there the src layout must stay VISIBLE (statically captured) so
    * the next round's degree aggregate and src-side semi-join ride it;
    * its dst-side semi-join still re-exchanges the edges on dst each
    * round — the honest price of filtering both endpoints where a
    * broadcast no longer fits. The up-front relayout decision uses the
    * edge count n0 (conservative node bound — the safe direction; a
    * node UNDERCOUNT would broadcast a frame that doesn't fit); every
    * in-loop dispatch uses the exact survivor count.
    */
  def kcoreCensusOf(edgesIn: DataFrame,
      bcastMax: Long = RANK_BCAST_MAX_NODES): DataFrame = {
    val n0 = edgesIn.count()
    // symmetric, checkpointed by the caller; co regime: src layout made
    // visible once, before any peel round reads it
    var edges = if (n0 > bcastMax) relayoutPartitioned(edgesIn, col("src"))
      else edgesIn
    val census = KCORE_KS.map { k =>
      var cur = edges
      var fixed = false
      var round = 0
      while (!fixed && round < KCORE_CAP) {
        round += 1
        // one O(|nodes|) materialization: fixpoint test + both builds
        val degCk = cur.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .localCheckpoint(true)
        val nNow = degCk.count()
        val keep = degCk.filter(col("deg") >= k)
        val nSurv = keep.count() // exact |survivors|: dispatch scalar
        if (nSurv == nNow) {
          fixed = true // no node under k ⇒ no edge removed (monotone)
        } else {
          val peeled = iterJoin(
            iterJoin(cur, keep.select(col("node").as("ks")),
              col("src") === col("ks"), nSurv, bcastMax, "left_semi"),
            keep.select(col("node").as("kd")),
            col("dst") === col("kd"), nSurv, bcastMax, "left_semi")
          cur =
            if (nSurv > bcastMax)
              relayoutPartitioned(peeled.localCheckpoint(true), col("src"))
            else peeled.localCheckpoint(true) // narrow: partitions carry
        }
      }
      edges = cur // the (k+1)-core peels from here
      val conv = cur.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .agg(coalesce(min(col("deg")) >= k, lit(true)).as("converged"))
      cur.agg(countDistinct(col("src")).as("n_nodes"),
          count(lit(1)).as("c2"))
        .crossJoin(conv)
        .select(lit(k).as("k"), col("n_nodes"),
          expr("c2 div 2").as("n_edges"), col("converged"))
    }
    census.reduce(_ unionByName _).orderBy("k")
  }

  /** g10 oracle: the peel unrolled to [[KCORE_CAP]] rounds per k, cores
    * chained (e.g. the 3-core starts from the 2-core's final state).
    */
  val kcoreCensusSql: String = {
    val chains = KCORE_KS.map { k =>
      val rounds = (1 to KCORE_CAP).map { i =>
        val prev = if (i == 1) s"e${k}_0" else s"e${k}_${i - 1}"
        s"""d${k}_$i AS (SELECT src AS node FROM $prev
           |  GROUP BY src HAVING count(*) >= $k),
           |e${k}_$i AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $prev e
           |  JOIN d${k}_$i a ON a.node = e.src
           |  JOIN d${k}_$i b ON b.node = e.dst)""".stripMargin
      }.mkString(",\n")
      val base = if (k == KCORE_KS.head) "edges"
                 else s"e${k - 1}_$KCORE_CAP"
      s"""e${k}_0 AS MATERIALIZED (SELECT src, dst FROM $base),
         |$rounds""".stripMargin
    }.mkString(",\n")
    val rows = KCORE_KS.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
         |  CAST(count(*) AS BIGINT) // 2 AS n_edges,
         |  coalesce((SELECT min(cnt) FROM (
         |      SELECT count(*) AS cnt FROM e${k}_$KCORE_CAP GROUP BY src) t
         |    ) >= $k, TRUE) AS converged
         |FROM e${k}_$KCORE_CAP""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $tradeEdgesCte,
       |$chains
       |$rows
       |ORDER BY k""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g11_ppr_trust" -> (pprTrust _),
    "g10_kcore" -> (kcoreCensus _),
    "g08_modularity" -> (modularity _),
    "g07_sssp" -> (sssp _),
    "g06_link_prediction" -> (linkPrediction _),
    "g05_degree_mixing" -> (degreeMixing _),
    "g04_bfs_reach" -> (bfsReach _),
    "g01_pagerank" -> (pagerank _),
    "g02_triangle_census" -> (triangleCensus _),
    "g03_label_propagation" -> (labelPropagation _))

  def oracles: Map[String, String] = Map(
    "g11_ppr_trust" -> pprTrustSql,
    "g10_kcore" -> kcoreCensusSql,
    "g08_modularity" -> modularitySql,
    "g07_sssp" -> ssspSql,
    "g06_link_prediction" -> linkPredictionSql,
    "g05_degree_mixing" -> degreeMixingSql,
    "g04_bfs_reach" -> bfsReachSql,
    "g01_pagerank" -> pagerankSql,
    "g02_triangle_census" -> triangleCensusSql,
    "g03_label_propagation" -> labelPropagationSql)
}
