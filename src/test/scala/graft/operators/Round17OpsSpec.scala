package graft.operators

import graft.SparkSpec

/** Round-17 optimization internals, pinned:
  *
  *   - g10's restructured peel detects the fixpoint from NODE counts
  *     BEFORE peeling (no-op confirm rounds no longer materialize an
  *     edge frame). A graph that is already its own k-core for every
  *     swept k must come back unchanged and converged — the
  *     zero-peels path the old loop never took.
  *   - the broadcast-regime rounds checkpoint the narrow semi-join
  *     output directly (no per-round repartition): a multi-round peel
  *     (pendant chain feeding a clique) still reaches the exact core.
  */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("g10: an input that is already a 4-core is returned unchanged by every sweep k (zero peels)") {
    // K5: every node has degree 4, so the 2-, 3- and 4-cores are all K5
    val nodes = 1L to 5L
    val raw = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val edges = (raw ++ raw.map(e => (e._2, e._1))).toDF("src", "dst")
    val out = Graph.kcoreCensusOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (2L, 5L, 10L, true), (3L, 5L, 10L, true), (4L, 5L, 10L, true)))
  }

  test("g10: a chain feeding a clique peels over multiple rounds to the exact core") {
    // pendant chain 10-11-12-13 hangs off K4 {1,2,3,4} at node 1:
    // the 2-core peel must remove 13, then 12, then 11, then 10 —
    // one node per round, four effective rounds — leaving exactly K4;
    // the 3-core is K4 too; no 4-core.
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L), (12L, 13L))
    val raw = k4 ++ chain
    val edges = (raw ++ raw.map(e => (e._2, e._1))).toDF("src", "dst")
    val out = Graph.kcoreCensusOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (2L, 4L, 6L, true), (3L, 4L, 6L, true), (4L, 0L, 0L, true)))
  }
}
