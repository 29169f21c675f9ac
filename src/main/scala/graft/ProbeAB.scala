package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, TextOps}
import graft.Tables

/** Round-16 optimization A/B probes: each experiment prices the OLD
  * (pre-optimization, inlined here verbatim) and NEW (registered)
  * formulation of one operator in the SAME JVM with INTERLEAVED reps —
  * the ProbeHotBin discipline for a host with long-lived co-tenant
  * load, where isolated before/after runs are incomparable (the
  * round's baseline ledger showed untouched keys swinging 3-6x between
  * group runs; canary-normalization bounds but does not remove that).
  * A co-tenant burst lands on adjacent old/new reps alike, so the
  * RATIO of the two medians is the robust statistic. Every experiment
  * is equality-gated first: old and new must produce identical rows,
  * or the measurement is refused.
  *
  * Usage: SPARK_GRAFT_AB=g06,g02 runMain graft.ProbeAB [sfDir]
  */
object ProbeAB {
  val REPS = 5

  // ---- OLD formulations, verbatim from the pre-round-16 tree ----

  /** g06 pre-optimization: capped-weight broadcast join + part-keyed
    * self-join (SMJ at scale) + pair aggregate, over a checkpointed
    * distinct edge frame.
    */
  private def g06Old(s: SparkSession, d: String): DataFrame = {
    val cap = Graph.WEDGE_CAP; val topk = Graph.LINK_TOPK
    val e = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint()
    val ok = e.groupBy("p").agg(count(lit(1)).as("dg"))
      .filter(col("dg") <= cap)
      .select(col("p"), expr("1000000000 div dg").as("w"))
    val ec = e.join(ok, "p")
    ec.select(col("p"), col("c").as("cust_a"), col("w"))
      .join(ec.select(col("p"), col("c").as("cust_b")), "p")
      .filter(col("cust_a") < col("cust_b"))
      .groupBy("cust_a", "cust_b")
      .agg(count(lit(1)).as("common"), sum(col("w")).as("ra_score"))
      .orderBy(col("common").desc, col("ra_score").desc,
        col("cust_a"), col("cust_b"))
      .limit(topk)
      .orderBy(col("common").desc, col("ra_score").desc,
        col("cust_a"), col("cust_b"))
  }

  /** g02 pre-optimization: distinct (ok, sk) self-join for support
    * pairs, un-repartitioned checkpoints (the orientation frame froze
    * at AQE's coalesced partition count).
    */
  private def g02Old(s: SparkSession, d: String): DataFrame = {
    val minSupport = math.max(4L,
      Tables.orders(s, d).count() * 27L / 1000000L)
    val so = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val a = so.select(col("ok"), col("sk").as("u"))
    val b = so.select(col("ok").as("ok2"), col("sk").as("v"))
    val pairs = a.join(b, col("ok") === col("ok2") && col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("u"), col("v"))
      .localCheckpoint(true)
    val deg = pairs.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val du = deg.select(col("node").as("u"), col("dg").as("du"))
    val dv = deg.select(col("node").as("v"), col("dg").as("dv"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pairs.join(du, "u").join(dv, "v")
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("es"),
              when(lowFirst, col("v")).otherwise(col("u")).as("et"))
      .localCheckpoint(true)
    val e1 = oriented.select(col("es").as("a1"), col("et").as("b1"))
    val e2 = oriented.select(col("es").as("a2"), col("et").as("c2"))
    val e3 = oriented.select(col("es").as("b3"), col("et").as("c3"))
    val tri = e1.join(e2, col("a1") === col("a2") && col("b1") =!= col("c2"))
      .join(e3, col("b3") === col("b1") && col("c3") === col("c2"))
      .select(col("a1").as("x"), col("b1").as("y"), col("c2").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
      .limit(100)
  }

  /** t29 pre-optimization: the weak-vote projection recomputed by all
    * four NB-chain consumers (no checkpoint).
    */
  private def t29Old(s: SparkSession, d: String): DataFrame =
    TextOps.nbLangidOf(
        TextOps.weakLabelRows(Tables.documents(s, d))
          .filter(col("label") =!= "abstain")
          .select(col("doc_id"), col("label").as("lang"), col("text")))
      .select(col("true_lang").as("true_label"),
        col("pred_lang").as("pred_label"), col("n_docs"))
      .orderBy("true_label", "pred_label")

  def experiments: Map[String, (
      (SparkSession, String) => DataFrame,
      (SparkSession, String) => DataFrame)] = Map(
    "g06" -> ((g06Old _, SparkEntry.queries("g06_link_prediction"))),
    "g02" -> ((g02Old _, SparkEntry.queries("g02_triangle_census"))),
    "t29" -> ((t29Old _, SparkEntry.queries("t29_nb_quality"))))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.get("SPARK_GRAFT_AB")
      .map(_.split(",").toSeq).getOrElse(experiments.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[ab] warmup failed: $e") }

    names.foreach { name =>
      val (oldF, newF) = experiments(name)
      // equality gate + warm pass for both arms
      val oldRows = oldF(spark, sfDir).collect().toSeq.map(_.toSeq)
      val newRows = newF(spark, sfDir).collect().toSeq.map(_.toSeq)
      require(oldRows == newRows,
        s"[ab] $name: OLD != NEW (${oldRows.length} vs ${newRows.length} rows) — probe refused")
      val (oldT, newT) = (Array.ofDim[Double](REPS), Array.ofDim[Double](REPS))
      for (r <- 0 until REPS) {
        var t0 = System.nanoTime()
        oldF(spark, sfDir).write.mode("overwrite").format("noop").save()
        oldT(r) = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        newF(spark, sfDir).write.mode("overwrite").format("noop").save()
        newT(r) = (System.nanoTime() - t0) / 1e9
      }
      val om = Bench.median(oldT.toSeq); val nm = Bench.median(newT.toSeq)
      println(f"""{"probe":"ab_$name","old_sec":$om%.3f,"new_sec":$nm%.3f,""" +
        f""""speedup":${om / nm}%.2f,""" +
        s""""old_reps":[${oldT.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""new_reps":[${newT.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
