package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The persisted cell-assignment store (round-13): the s17/s18/p19
  * health faces served from a written table instead of a recomputed
  * assignment — the executable form of "at 100 TB the checkpoint is the
  * stored cell assignment".
  */
class IndexHealthStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("store is cell-partitioned and its faces equal the three registered keys row-for-row") {
    val dir = Files.createTempDirectory("cellassign").toString + "/assign"
    Similarity.writeCellAssignments(spark, d, dir)
    val cells = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSeq
    assert(cells.nonEmpty && cells.size <= Similarity.N_CELLS,
      s"expected cell= partition dirs, got $cells")
    val (drift, sil, quota) = Similarity.indexHealthReportFromStore(spark, dir)
    assert(drift.collect().toSeq == Similarity.ivfDrift(spark, d).collect().toSeq)
    assert(sil.collect().toSeq == Similarity.silhouette(spark, d).collect().toSeq)
    assert(quota.collect().toSeq ==
      Similarity.clusterQuotaSample(spark, d).collect().toSeq)
  }

  test("p23 equals p22 and never scans the corpus (zero assignment scans)") {
    val p23 = Similarity.indexHealthFromStore(spark, d)
    assert(p23.collect().toSeq == Similarity.indexHealth(spark, d).collect().toSeq,
      "the stored-assignment report must be row-identical to the computed one")
    // the whole point of the store: the read path touches ONLY the thin
    // assignment table — no embeddings scan, no centroid re-scoring
    val plan = Similarity.indexHealthFromStore(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "store-backed face must not scan the corpus:\n" + plan.take(2000))
    assert(plan.contains("graft_cellassign_"),
      "store-backed face must scan the persisted assignment table")
  }
}
