package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-17 A/B probe for the alternating-star CC rounds — the
  * distributed path d07/d14/d21/d25/p15/p20 dispatch to above the
  * 1M-edge threshold, never exercised by the sf0.1 bench, so it is
  * priced here on a synthetic forced-distributed graph (long chains +
  * a hub star: real round counts, real skew). OLD = the pre-round-17
  * star rounds (plain join-backs, planner picks SMJ → the full
  * bidirectional frame re-sorts every round); NEW = the registered
  * shuffle_hash form. Interleaved reps, equality-gated on the label
  * frame (the ProbeAB discipline).
  *
  * Usage: [GRAFT_CC_N=1500000] [GRAFT_AB_REPS=3] runMain graft.ProbeCC
  */
object ProbeCC {

  // ---- OLD star rounds + loop, verbatim from the pre-round-17 tree ----
  private def largeStarOld(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = bidir.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    bidir.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v")).distinct()
  }

  private def smallStarOld(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val fromNbrs = oriented.join(mins, "u").select(col("v").as("n"), col("m"))
    val fromSelf = mins.select(col("u").as("n"), col("m"))
    fromNbrs.union(fromSelf).filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v")).distinct()
  }

  private def edgeStats(e: DataFrame): (Long, Long, Long) = {
    val r = e.agg(count(lit(1)),
      coalesce(call_function("bit_xor", xxhash64(col("u"), col("v"))), lit(0L)),
      coalesce(call_function("bit_xor",
        xxhash64(lit(0x9E3779B9L), col("u"), col("v"))), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def ccOld(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val eRaw = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .localCheckpoint(true)
    val nodes = eRaw.select(col("u").as("id"))
      .union(eRaw.select(col("v").as("id"))).distinct().localCheckpoint(true)
    var e = eRaw.filter(col("u") =!= col("v"))
    var stats = edgeStats(e)
    var iter = 0
    var converged = stats._1 == 0L
    while (!converged && iter < maxIter) {
      val next = smallStarOld(largeStarOld(e)).localCheckpoint(true)
      val ns = edgeStats(next)
      converged = ns == stats
      stats = ns
      Dedup.release(e)
      e = next
      iter += 1
    }
    require(converged, "ccOld did not converge")
    val labels = nodes
      .join(e.select(col("u").as("id"), col("v").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
      .localCheckpoint(true)
    Dedup.release(e)
    Dedup.release(nodes)
    labels
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("GRAFT_CC_N").map(_.toLong).getOrElse(1500000L)
    val reps = sys.env.get("GRAFT_AB_REPS").map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // chains of ~100 nodes (real multi-round convergence) + one hub star
    // (skew realism: one node with n/100 neighbors)
    val chainLen = 100L
    val edges = spark.range(n)
      .select(expr(s"id div $chainLen * ${chainLen + 1} + id % $chainLen").as("id_a"),
        expr(s"id div $chainLen * ${chainLen + 1} + id % $chainLen + 1").as("id_b"))
      .union(spark.range(n / 100)
        .select(lit(0L).as("id_a"), (col("id") * 7919L + n * 3).as("id_b")))
      .localCheckpoint(true)
    println(s"== ${edges.count()} edges ==")

    if (sys.env.contains("GRAFT_CC_PLAN_ONLY")) {
      val e = edges.select(col("id_a").as("u"), col("id_b").as("v"))
        .localCheckpoint(true)
      println("== OLD one-round plan (plain join-backs) ==")
      smallStarOld(largeStarOld(e)).explain("formatted")
      println("== NEW one-round plan (shuffle_hash join-backs) ==")
      Dedup.smallStar(Dedup.largeStar(e)).explain("formatted")
      spark.stop(); return
    }

    def run(f: DataFrame => DataFrame): (Seq[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val labels = f(edges)
      val rows = labels.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val sec = (System.nanoTime() - t0) / 1e9
      Dedup.release(labels)
      (rows, sec)
    }

    // equality gate + warm pass
    val (oldRows, _) = run(ccOld(_))
    val (newRows, _) = run(Dedup.connectedComponents(_))
    require(oldRows == newRows,
      s"[cc] OLD != NEW (${oldRows.length} vs ${newRows.length} labels) — probe refused")
    val (oldT, newT) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (r <- 0 until reps) {
      oldT(r) = run(ccOld(_))._2
      newT(r) = run(Dedup.connectedComponents(_))._2
    }
    val om = Bench.median(oldT.toSeq); val nm = Bench.median(newT.toSeq)
    println(f"""{"probe":"cc_stars","n_edges":$n,"old_sec":$om%.3f,"new_sec":$nm%.3f,""" +
      f""""speedup":${om / nm}%.2f,""" +
      s""""old_reps":[${oldT.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""new_reps":[${newT.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
