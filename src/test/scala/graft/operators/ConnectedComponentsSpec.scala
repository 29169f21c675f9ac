package graft.operators

import graft.SparkSpec

/** Both connected-component strategies (driver union-find for bounded
  * graphs, distributed label propagation) must agree.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("union-find and label propagation agree on a multi-component graph") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val lp = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val uf = Dedup.connectedComponentsAuto(edges).as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(lp == expected)
    assert(uf == expected)
  }

  test("small-graph path leaves no cached RDDs behind (cache is unpersisted)") {
    // drain any persistent RDDs left by earlier suites sharing the session
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    Dedup.connectedComponentsAuto(edges).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keys.toList}")
  }

  test("distributed path persists only the checkpointed result") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    Dedup.connectedComponents(edges).collect()
    // fwd/bidir/intermediate label checkpoints must be unpersisted; the
    // final labels' localCheckpoint must stay (its lineage is truncated)
    val persisted = spark.sparkContext.getPersistentRDDs
    assert(persisted.size <= 1, s"leaked: ${persisted.keys.toList}")
    persisted.values.foreach(_.unpersist(true))
  }

  test("long chain converges within the iteration cap") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val lp = Dedup.connectedComponents(chain, maxIter = 50)
      .as[(Long, Long)].collect()
    assert(lp.forall(_._2 == 1L) && lp.length == 40)
  }
}
