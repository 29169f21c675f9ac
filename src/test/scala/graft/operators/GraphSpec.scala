package graft.operators

import scala.collection.mutable

import graft.{SparkSpec, Tables}

/** Graph analytics vs independent driver-side reimplementations on the
  * sf0.001 tables — the same arithmetic (64-bit fixed point, integer
  * division) executed by a sequential reference, compared exactly.
  */
class GraphSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** The customer↔supplier undirected edge list, built locally. */
  private lazy val localEdges: Seq[(String, String)] = {
    val custOf = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eset = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .collect()
      .flatMap(r => custOf.get(r.getLong(0)).map(c => (s"c:$c", s"s:${r.getLong(1)}")))
      .toSet
    eset.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
  }

  test("g01 pagerank matches a sequential fixed-point reference exactly") {
    val edges = localEdges
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank: Map[String, Long] = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 4) {
      val contrib = mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, t) <- edges) contrib(t) += rank(s) / deg(s)
      rank = contrib.map { case (n, c) => n -> (150000000L + 85L * c / 100L) }.toMap
    }
    val got = Graph.pagerank(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == rank)
    // and the output really is the full node set, no dangling-mass loss
    assert(got.keySet == deg.keySet)
  }

  test("g01 ranks order hubs above leaves") {
    val edges = localEdges
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val rows = Graph.pagerank(spark, d).collect()
    val top = rows.head.getString(0)
    val bottom = rows.last.getString(0)
    // the sf0.001 graph has 10 suppliers serving ~1000 customers: the top
    // node must be a supplier-side hub, the bottom a low-degree customer
    assert(deg(top) > deg(bottom))
  }

  test("g03 label propagation matches a sequential synchronous reference") {
    // packed-long edges, mirroring tradeEdges
    val custOf = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eset = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .collect()
      .flatMap(r => custOf.get(r.getLong(0)).map(c => (2 * c, 2 * r.getLong(1) + 1)))
      .toSet
    val edges = eset.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val bySrc = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .collect().filter(_.getInt(1) < 5)
      .map(r => (2 * r.getLong(0) + 1) -> r.getInt(1).toLong).toMap

    var labels: Map[Long, Long] = seeds
    for (_ <- 1 to 3) {
      val voted = bySrc.keys.flatMap { dst =>
        // neighbors of dst = nodes whose edge points INTO dst; the graph
        // is symmetric so bySrc(dst) is exactly that set
        val counts = bySrc(dst).flatMap(labels.get)
          .groupBy(identity).map { case (l, ls) => l -> ls.size.toLong }
        if (counts.isEmpty) None
        else Some(dst -> counts.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
      labels = voted ++ seeds
    }
    val expect = labels.toSeq.groupBy(_._2).map { case (l, g) =>
      (l, g.count(_._1 % 2 == 0).toLong, g.count(_._1 % 2 == 1).toLong)
    }.toSeq.sortBy(_._1)

    val got = Graph.labelPropagation(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.map(_._1).forall(l => l >= 0 && l < 5))
  }

  test("g02 triangle census matches brute-force enumeration") {
    // local support-thresholded supplier co-order graph
    val so = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = so.groupBy(_._1).values
    val support = mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for (grp <- byOrder; a <- grp; b <- grp if a._2 < b._2)
      support((a._2, b._2)) += 1L
    // corpus-relative support, mirroring Graph.SUPPORT_PPM (floor 4; at
    // sf0.001's ~1.5k orders the relative term is 0 so the floor binds)
    val nOrders = Tables.orders(spark, d).count()
    val minSupport = math.max(4L, nOrders * 27L / 1000000L)
    val pairs = support.filter(_._2 >= minSupport).keys.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val triCount = mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (u, v, w) = (nodes(i), nodes(j), nodes(k))
      if pairs((u, v)) && pairs((v, w)) && pairs((u, w))
    } { triCount(u) += 1; triCount(v) += 1; triCount(w) += 1 }
    val expect = triCount.toSeq.sortBy { case (n, c) => (-c, n) }.take(100)
    val got = Graph.triangleCensus(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "sf0.001 co-order graph should contain triangles")
  }
}
