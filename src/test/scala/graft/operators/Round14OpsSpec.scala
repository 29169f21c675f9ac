package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 keys: s26 — the clustered-corpus pruned-exact search where
  * the s23 triangle bound FIRES (round-13 directive #5). The driver
  * hash-check pins exactness + the measured survivor census against
  * DuckDB; this spec pins the structural claims the hash alone doesn't
  * phrase: the bound prunes to ≤ 2/16 cells, the result IS the brute
  * force, and the generated corpus really is the 16-orthogonal-cluster
  * regime (cross-cluster cosine exactly 0).
  */
class Round14OpsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("s26: survivor census ≤ 2 of 16 cells on the clustered corpus") {
    val rows = Similarity.clusteredPruneProof(spark, d).collect()
    assert(rows.length == 50, "5 queries × top-10")
    rows.foreach { r =>
      assert(r.getLong(4) == Similarity.N_CELLS.toLong) // n_cells
      assert(r.getLong(5) <= 2L,
        s"query ${r.getLong(0)}: ${r.getLong(5)} survivors — bound too loose")
    }
  }

  test("s26: pruned result ≡ inline brute force over the same corpus") {
    val v = graft.Tables.embeddings(spark, d).select(col("vec_id"),
      expr("""transform(sequence(0, 63), d -> CAST(
          CASE WHEN d div 4 = vec_id % 16
               THEN 10000000 + CASE WHEN d = 4 * (vec_id % 16) + vec_id % 4
                                    THEN 10000 * (vec_id % 7 + 1) ELSE 0 END
               ELSE 0 END AS BIGINT))""").as("qv"))
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val c = v.filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("qv").as("cv"))
    val dot = expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (s, x) -> s + x)")
    val brute = q.crossJoin(c)
      .withColumn("cosine", dot.cast("double") /
        (sqrt(expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, (s, x) -> s + x)").cast("double")) *
         sqrt(expr("aggregate(zip_with(cv, cv, (a, b) -> a * b), 0L, (s, x) -> s + x)").cast("double"))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 10)
      .select("query_id", "rank", "vec_id", "cosine")
      .orderBy("query_id", "rank")
      .collect().toSeq
    val pruned = Similarity.clusteredPruneProof(spark, d)
      .select("query_id", "rank", "vec_id", "cosine")
      .collect().toSeq
    assert(pruned == brute, "pruning must lose nothing")
  }

  test("q76: decomposed Lorenz rank ≡ the naive one-window Gini") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed planted spend: a whale, a mid tier, a long tail, exact ties,
    // and one refund-heavy user (negative cents) — bins 0 and beyond
    val ev = (1L to 40L).flatMap { u =>
      val v = if (u == 1) 50000.0 else if (u <= 5) 700.0
        else if (u == 40) -20.0 else (u % 7).toDouble + 0.25
      Seq((u, "buy", v), (u, "buy", v))
    }.toDF("user_id", "event_type", "value")
    val got = Extras.revenueGiniOf(ev).collect()
    // naive single-window form computed inline
    val u = ev.groupBy($"event_type", $"user_id")
      .agg(sum(floor($"value" * 100.0).cast("long")).as("cents"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"cents", $"user_id"))
        .cast("long"))
    val naive = u.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        sum($"rnk" * $"cents").as("r"))
      .select($"event_type", $"n", $"s", $"r",
        expr("""CASE WHEN s <= 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(1000000.0 * CAST(2*r - (n+1)*s AS DOUBLE) /
              CAST(n*s AS DOUBLE)) AS BIGINT) END""").as("g"))
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq ==
      naive.map(r => (r.getString(0), r.getLong(1), r.getLong(2).toString,
        r.getLong(3).toString, r.getLong(4))).toSeq)
    // structural sanity on the planted shape: heavy concentration
    assert(got.head.getLong(4) > 500000L, "whale corpus must show Gini > 0.5")
  }

  test("q76 edge cases: all-equal spend → 0; degenerate total → 0") {
    import spark.implicits._
    val equal = (1L to 16L).map(u => (u, "x", 5.0)).toDF(
      "user_id", "event_type", "value")
    assert(Extras.revenueGiniOf(equal).collect().head.getLong(4) == 0L)
    val refunds = (1L to 4L).map(u => (u, "x", -1.0)).toDF(
      "user_id", "event_type", "value")
    assert(Extras.revenueGiniOf(refunds).collect().head.getLong(4) == 0L,
      "negative total mass is degenerate, reported as 0 not nonsense")
  }

  test("s26 corpus: cross-cluster cosine is exactly zero (the regime claim)") {
    val v = graft.Tables.embeddings(spark, d).limit(40).select(col("vec_id"),
      expr("""transform(sequence(0, 63), d -> CAST(
          CASE WHEN d div 4 = vec_id % 16
               THEN 10000000 + CASE WHEN d = 4 * (vec_id % 16) + vec_id % 4
                                    THEN 10000 * (vec_id % 7 + 1) ELSE 0 END
               ELSE 0 END AS BIGINT))""").as("qv"))
    val pairs = v.select(col("vec_id").as("a"), col("qv").as("va"))
      .crossJoin(v.select(col("vec_id").as("b"), col("qv").as("vb")))
      .filter(col("a") < col("b") && col("a") % 16 =!= col("b") % 16)
      .withColumn("dot",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (s, x) -> s + x)"))
    assert(pairs.filter(col("dot") =!= 0L).count() == 0,
      "vectors in different clusters must be orthogonal")
  }
}
