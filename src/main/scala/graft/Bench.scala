package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Passes over the whole suite; the reported time is the per-query MEDIAN
    * ACROSS passes. Interleaving matters: with back-to-back reps of one
    * query, a sustained co-tenant load burst inflates all of them and the
    * median with them (r3/r4 driver recordings were 1.5-2x an idle re-run
    * on exactly this failure mode). Suite-length interleaving separates a
    * query's reps by minutes, so one burst can corrupt at most one rep —
    * which the median then discards.
    */
  val REPS = 3

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) 0.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration escape hatch: SPARK_GRAFT_ONLY=d03_ngram_jaccard,...
    // benches a subset (the driver never sets it — full suite by default)
    val queries = sys.env.get("SPARK_GRAFT_ONLY")
      .map(o => SparkEntry.queries.view.filterKeys(o.split(",").toSet).toMap)
      .getOrElse(SparkEntry.queries)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE's default 64 MB advisory coalesce looks like it strands cores
      // at bench scale (the d03 pipeline's post-shuffle stages run at 8
      // partitions on 32 cores), but forcing ~core-count partitions via a
      // 256 KB advisory measured SLOWER (wall 7.6 -> 9.9 s, task-summed
      // pipeline CPU 3x): at sub-MB partition sizes per-task overhead
      // dominates and the coalesced sorts are cache-resident. Keep the
      // defaults; graft.Profile has env knobs to re-run the experiment.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/scheduler/JIT warmup outside the timed loop (otherwise
    // whichever query happens to run first is charged ~3-4 s of it)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // one untimed pass over EVERY query: with interleaved reps, each
    // query's codegen classes / parquet footers / JIT state have gone cold
    // by the time its next rep comes around, so without this every timed
    // rep measures first-run compile cost — back-to-back reps measured
    // warm runs (the median discarded the one cold rep), and the numbers
    // should stay comparable across rounds
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
    }
    val passes: Seq[Map[String, Double]] = (1 to REPS).map { _ =>
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces FULL computation (count() would let Catalyst prune
        // sorts and projections, understating the real query cost)
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = queries.map { case (name, _) =>
      name -> median(passes.map(_(name)))
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$REPS,"agg":"median"}"""
    println(line)
    // The driver captures stdout with a truncated tail (BENCH_r0x.json has
    // carried `parsed: null` since round 8, hiding ~half the per-query
    // numbers from round-over-round comparison) — ALSO write the full JSON
    // to a file the driver/judge can pick up whole.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full per-query JSON written to ${out.toAbsolutePath}")
    } catch { case e: Throwable => System.err.println(s"[bench] bench_out write failed: $e") }
    spark.stop()
  }
}
