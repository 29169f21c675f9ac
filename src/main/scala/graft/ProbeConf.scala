package graft

import org.apache.spark.sql.SparkSession

/** Round-16 session-config A/B: price a runtime-settable SQL conf over a
  * basket of registered keys, toggling the conf BETWEEN interleaved reps
  * in one JVM (the ProbeAB discipline — the ratio is co-tenant-robust).
  * Used to decide whether a config belongs in the harness sessions
  * (Bench/Verify) — only scale-sane settings are candidates; anything
  * that only makes sense at local[32] is out of scope by policy.
  *
  * Usage:
  *   GRAFT_CONF_KEY=spark.sql.objectHashAggregate.sortBased.fallbackThreshold \
  *   GRAFT_CONF_VALS=128,8192 \
  *   GRAFT_CONF_KEYS=d03_ngram_jaccard,g06_link_prediction \
  *   runMain graft.ProbeConf [sfDir]
  */
object ProbeConf {
  val REPS = 5

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val confKey = sys.env.getOrElse("GRAFT_CONF_KEY",
      sys.error("GRAFT_CONF_KEY must name the spark conf to probe " +
        "(e.g. spark.sql.adaptive.advisoryPartitionSizeInBytes)"))
    val vals = sys.env.getOrElse("GRAFT_CONF_VALS", "").split(",").toSeq
    require(vals.length == 2, "GRAFT_CONF_VALS must hold exactly two values")
    val keys = sys.env.getOrElse("GRAFT_CONF_KEYS",
      "d03_ngram_jaccard,g06_link_prediction,g02_triangle_census," +
        "p01_curation_pipeline,d20_lsh_band_sweep,t29_nb_quality")
      .split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite")
      .format("noop").save()
    catch { case e: Throwable => System.err.println(s"[conf] warmup failed: $e") }

    keys.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm both conf arms (codegen can differ between them)
      vals.foreach { v =>
        spark.conf.set(confKey, v)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      val t = vals.map(_ => Array.ofDim[Double](REPS))
      for (r <- 0 until REPS; i <- vals.indices) {
        spark.conf.set(confKey, vals(i))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        t(i)(r) = (System.nanoTime() - t0) / 1e9
      }
      val m = t.map(a => Bench.median(a.toSeq))
      println(f"""{"probe":"conf","key":"$name","conf":"$confKey",""" +
        s""""a":"${vals(0)}","b":"${vals(1)}",""" +
        f""""a_sec":${m(0)}%.3f,"b_sec":${m(1)}%.3f,""" +
        f""""speedup_b_over_a":${m(0) / m(1)}%.2f}""")
    }
    spark.stop()
  }
}
