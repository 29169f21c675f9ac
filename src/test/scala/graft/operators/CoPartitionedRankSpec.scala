package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The iterative graph family's ~100M-node broadcast ceiling, executable
  * (round-13 directive #1): every fixed-point operator must produce
  * IDENTICAL results when its per-round rank/label/survivor joins are
  * forced through the co-partitioned shuffle arm (`bcastMax = 0`) as
  * through the production broadcast arm — and the co-partitioned plan
  * must actually ride the adjacency's preserved src partitioning (one
  * exchange per join: the node side, never the edges).
  *
  * The planted graph is irregular on purpose: a hub, a chain, a
  * triangle, an isolated pair — degrees 1..5, so rank/vote/peel paths
  * all exercise non-trivial structure.
  */
class CoPartitionedRankSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetric, src-partitioned, checkpointed edges — the kernel
    * contract every iterative operator's caller establishes.
    */
  private def plantedEdges: DataFrame = {
    val raw = Seq(
      // hub 1 ↔ {2,3,4,5,6}; chain 6-7-8; triangle 8-9-10-8; pair 11-12
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L), (9L, 10L), (10L, 8L), (11L, 12L))
    val df = raw.toDF("src", "dst")
    df.unionByName(df.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("g01 pagerank: co-partitioned arm ≡ broadcast arm") {
    val e = plantedEdges
    assert(rows(Graph.pagerankOn(e, bcastMax = 0L)) ==
      rows(Graph.pagerankOn(e)))
  }

  test("g11 ppr: co-partitioned arm ≡ broadcast arm") {
    val e = plantedEdges
    val seeds = Seq(1L, 9L).toDF("seed")
    assert(rows(Graph.pprTrustOn(e, seeds, bcastMax = 0L)) ==
      rows(Graph.pprTrustOn(e, seeds)))
  }

  test("g03/g09 label propagation: co-partitioned arm ≡ broadcast arm") {
    val e = plantedEdges
    val seeds = Seq((1L, 10L), (8L, 20L)).toDF("node", "label")
    val sort = (d: DataFrame) => rows(d.orderBy("node", "label"))
    assert(sort(Graph.lpaOn(e, seeds, bcastMax = 0L)) ==
      sort(Graph.lpaOn(e, seeds)))
    // and at g09's deeper round count
    assert(sort(Graph.lpaOn(e, seeds, bcastMax = 0L, rounds = 4)) ==
      sort(Graph.lpaOn(e, seeds, rounds = 4)))
  }

  test("g10 k-core: co-partitioned arm ≡ broadcast arm") {
    val e = plantedEdges
    assert(rows(Graph.kcoreCensusOf(e, bcastMax = 0L)) ==
      rows(Graph.kcoreCensusOf(e)))
  }

  test("t30 textrank: co-partitioned arm ≡ broadcast arm") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma delta epsilon"),
      (3L, "epsilon zeta alpha delta zeta")).toDF("doc_id", "text")
    assert(rows(TextOps.textrankKeywordsOf(docs, bcastMax = 0L)) ==
      rows(TextOps.textrankKeywordsOf(docs)))
  }

  test("co-partitioned iterJoin plans one exchange: node side only") {
    // AQE would demote the small planted join back to broadcast and the
    // pin would see nothing; -1 disables exactly that runtime demotion
    val demote = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val plan = "spark.sql.autoBroadcastJoinThreshold"
    val prev = Seq(demote, plan).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(demote, "-1")
      spark.conf.set(plan, "-1")
      // the co-regime edge layout the operators build: re-laid with the
      // src HashPartitioning captured (a plain adaptive checkpoint
      // captures UnknownPartitioning and would re-exchange both sides)
      val e = Graph.relayoutPartitioned(plantedEdges, col("src"))
      val ranks = (1L to 12L).map(n => (n, 1000L)).toDF("node", "r")
      val j = Graph.iterJoin(e, ranks, e("src") === ranks("node"),
        nNodes = Long.MaxValue, bcastMax = 0L)
      j.collect()
      // AQE's toString prints Final AND Initial plan; pin the final one
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("ShuffledHashJoin"),
        s"expected the shuffle-hash arm, got:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1,
        s"expected ONE exchange (rank side; edges ride their preserved " +
          s"src partitioning), found $exchanges:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("broadcast iterJoin below the ceiling leaves no exchange at all") {
    val e = plantedEdges
    val ranks = (1L to 12L).map(n => (n, 1000L)).toDF("node", "r")
    val j = Graph.iterJoin(e, ranks, e("src") === ranks("node"),
      nNodes = 12L, bcastMax = Graph.RANK_BCAST_MAX_NODES)
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
