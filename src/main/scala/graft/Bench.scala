package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Reps per query; the reported time is the per-query MEDIAN so one noisy
    * co-tenant burst can't corrupt a round's headline metric (r3's driver
    * run recorded 2x inflation on unchanged queries from sandbox load).
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/scheduler/JIT warmup outside the timed loop (otherwise
    // whichever query happens to run first is charged ~3-4 s of it)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to REPS).map { _ =>
        val t0 = System.nanoTime()
        // noop sink forces FULL computation (count() would let Catalyst prune
        // sorts and projections, understating the real query cost)
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$REPS,"agg":"median"}""")
    spark.stop()
  }
}
