package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Extras

/** Scale demonstration for q76's hot-bin dispatch: a synthetic low-ARPU
  * rollup (every user's total spend in Lorenz bin 0 — the shape the
  * dispatch exists for) at N users, priced on BOTH paths:
  *
  *   - hot (default threshold, bin 0 population > GINI_HOT_BIN_USERS):
  *     the decomposed rank — per-cents offsets over aggregated rows,
  *     user_id-chunked tie splits, bounded row_numbers;
  *   - cold (threshold forced to Long.MaxValue): the single per-bin
  *     row_number window — which funnels all N users of the bin
  *     through ONE task, exactly the census-banned shape.
  *
  * Outputs one JSON line with both medians and an equality check (the
  * two paths must produce identical frames — the planted spec pins
  * this at test scale; here it gates the measurement). The synthetic
  * frame has 7 exact-cents tie groups (~N/7 users per tie), so the
  * tie-level decomposition carries real weight, and user_ids stride 17
  * so ties span many chunks.
  */
object ProbeHotBin {
  val REPS = 3

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_HOTBIN_N", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // low-ARPU rollup: all cents in [13, 679] → every user in bin 0
    val users = spark.range(n).select(
      (col("id") * 17L).as("user_id"),
      lit("buy").as("event_type"),
      (pmod(col("id"), lit(7L)) * 111L + 13L).as("cents"))
      .localCheckpoint(true)

    def medianOf(thresh: Long): Double = {
      val reps = (1 to REPS).map { _ =>
        val t0 = System.nanoTime()
        Extras.giniOfUserCents(users, hotThreshold = thresh)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      reps(reps.length / 2)
    }
    // warm both paths once (codegen/JIT), equality-gated
    val hotRows = Extras.giniOfUserCents(users).collect().toSeq.map(_.toSeq)
    val coldRows = Extras.giniOfUserCents(users, hotThreshold = Long.MaxValue)
      .collect().toSeq.map(_.toSeq)
    require(hotRows == coldRows, "hot != cold — probe invalid")
    val hotSec = medianOf(Extras.GINI_HOT_BIN_USERS)
    val coldSec = medianOf(Long.MaxValue)
    println(f"""{"probe":"q76_hot_bin","n_users":$n,""" +
      f""""hot_sec":$hotSec%.3f,"cold_single_window_sec":$coldSec%.3f,""" +
      f""""speedup":${coldSec / hotSec}%.2f}""")
    spark.stop()
  }
}
