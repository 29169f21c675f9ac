package graft

import org.apache.spark.sql.SparkSession

/** Isolated-probe bench ledger for the heavy tail.
  *
  * The full-suite bench (graft.Bench) interleaves every key's reps across
  * suite-length passes, which is the right defence against co-tenant load
  * bursts but means a key's number confounds three effects: the key's own
  * cost, JVM/code-cache pressure from the 180+ other keys that ran before
  * it, and suite growth round-over-round. The round-12 adjudication needed
  * judge-side probes to separate them (the apparent 10% slowdown turned
  * out to be environmental once the q52 canary was measured in isolation).
  *
  * This main makes those probes a first-class artifact: each heavy-tail
  * key runs in an OTHERWISE-IDLE session — one untimed warm pass (codegen
  * compile, parquet footers, JIT) then `REPS` timed back-to-back reps,
  * median reported — with the q52/q03 canaries measured the same way in
  * the same JVM so any run can be normalized against its own quiet floor.
  * Back-to-back reps are safe here precisely because the session is idle:
  * the interleaving argument in Bench.scala protects against bursts that
  * hit a LOADED suite; an isolated run that catches a burst shows it in
  * all three reps and the canary, and is re-run instead of re-weighted.
  *
  * Output: one JSON line (same shape as Bench) with `"mode":"isolated"`,
  * written to SPARK_GRAFT_BENCH_OUT (default bench_isolated.json).
  */
object BenchIsolated {
  val REPS = 3

  /** Heavy tail per VERDICT r12 ("top ~10 keys") + the two canaries. */
  val KEYS: Seq[String] = Seq(
    "q52_recursive_cte", "q03_topk", // canaries: quiet-floor reference
    "g01_pagerank", "g02_triangle_census", "g04_bfs_reach",
    "g06_link_prediction", "g07_sssp", "g08_modularity", "g10_kcore",
    "g11_ppr_trust",
    "s16_knn_hubness",
    "p01_curation_pipeline", "p11_curation_report",
    "d21_neardup_report", "d22_band_sweep_amortized")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(KEYS)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench-iso] warmup failed: $e") }

    val results = keys.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[bench-iso] unknown key $name — skipped"); None
        case Some(fn) =>
          // untimed warm pass, then REPS timed reps in the idle session
          try {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            val reps = (1 to REPS).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.mode("overwrite").format("noop").save()
              (System.nanoTime() - t0) / 1e9
            }
            System.err.println(f"[bench-iso] $name%-28s median ${Bench.median(reps)}%.3f s  reps ${reps.map(r => f"$r%.3f").mkString(",")}")
            Some(name -> Bench.median(reps))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench-iso] $name failed: $e"); None
          }
      }
    }
    val qs = results.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","mode":"isolated","queries":$qs,"sf":"$sfDir","reps":$REPS,"agg":"median"}"""
    println(line)
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_isolated.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench-iso] written to ${out.toAbsolutePath}")
    } catch { case e: Throwable => System.err.println(s"[bench-iso] write failed: $e") }
    spark.stop()
  }
}
