package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Streaming ANN serving against the persisted IVF-PQ index — the online
  * face of the batch [[Similarity.probeIvfPqIndex]]: a continuous stream
  * of query vectors is scored against the Spark-maintained index with
  * ZERO streaming state.
  *
  * Why the batch probe can't run as-is in a streaming plan: it collects
  * the probed cell ids for partition pruning and ranks through a window —
  * both illegal on an unbounded frame. The streaming shape re-derives the
  * same numbers with stateless row-level work plus one stream-static join:
  *
  *   1. the index MODEL (≤ [[Similarity.N_CELLS]] centroids,
  *      [[Similarity.PQ_K]]×[[Similarity.PQ_M]] codebook entries) is
  *      collected ONCE at query build into literal arrays — it rides the
  *      codegen'd plan exactly like the d17 Bloom filter literal;
  *   2. per query row: cosine against each centroid literal
  *      ([[Similarity.qdot]] — codegen), `array_sort` by (score DESC,
  *      cell) — the [[Similarity.assignToCells]] tie-break — and a slice
  *      explodes the top [[Similarity.N_PROBE]] cells; the per-subspace
  *      ADC lookup tables are computed as PQ_M literal-codebook array
  *      columns on the same row;
  *   3. ONE stream-static equi-join on `cell` against the code table
  *      (pivoted to one row per vector at query build — a static-side
  *      transform, re-executed per micro-batch exactly like
  *      [[StreamingNearDedup.indexMatches]]'s band scan; a vector lives
  *      in exactly one cell, so no per-(query, vec) aggregation is ever
  *      needed) and the ADC score is PQ_M `element_at` lookups.
  *
  * The ADC integers are bit-identical to the batch probe's LUT-join sum,
  * so ranking a micro-batch with [[ranked]] (inside foreachBatch)
  * reproduces [[Similarity.probeIvfPqIndex]] row-for-row — spec-pinned.
  * Statelessness means index refresh keeps the offsets-only-restart
  * discipline of the other persisted-index streaming probes.
  */
object StreamingAnn {

  /** Scored (query_id, vec_id, cell, adc) rows for a streaming frame of
    * (query_id, qv) quantized query vectors against the index at `dir`.
    */
  def indexScores(queries: DataFrame, dir: String,
      nProbe: Int = Similarity.N_PROBE): DataFrame = {
    Dedup.requireLayout(dir, Similarity.ivfPqLayout, "StreamingAnn.indexScores")
    val spark = queries.sparkSession
    val M = Similarity.PQ_M
    val SUB = Similarity.PQ_SUBDIM

    // ---- model as literals (tiny by construction: N_CELLS + PQ_K rows)
    val cents: Array[(Int, Seq[Long])] = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getAs[Int]("cell"), r.getSeq[Long](r.fieldIndex("centroid"))))
    val cb: Array[(Long, Seq[Long], Seq[Long])] = spark.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getAs[Long]("j"), r.getSeq[Long](r.fieldIndex("cv")),
        (0 until M).map(m => r.getAs[Long](s"cc$m")): Seq[Long]))
      .sortBy(_._1)
    require(cb.map(_._1).toSeq == cb.indices.map(_.toLong),
      s"codebook ids not dense 0..${cb.length - 1} — index at $dir is torn")

    def subQ(m: Int): Column = slice(col("qv"), m * SUB + 1, SUB)

    // ---- per-row cell probe: assignToCells' (score DESC, cell) order
    val cand = array(cents.map { case (cell, cv) =>
      val cnorm = math.sqrt(cv.map(x => x.toDouble * x).sum)
      struct(
        (Similarity.qdot(col("qv"), typedlit(cv)).cast("double") / cnorm).as("score"),
        lit(cell).as("cell"))
    }.toIndexedSeq: _*)
    val ordered = array_sort(cand, (l, r) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .otherwise(l.getField("cell") - r.getField("cell")))

    // ---- per-row ADC lookup tables: lut_m[j+1] = ||q_m - c_mj||² exactly
    // as pqLut's sqd (exact integers, so ranking ties break identically)
    val luts = (0 until M).map { m =>
      array(cb.map { case (_, cv, cc) =>
        val csub = cv.slice(m * SUB, (m + 1) * SUB)
        Similarity.qdot(subQ(m), subQ(m)) -
          lit(2L) * Similarity.qdot(subQ(m), typedlit(csub)) + lit(cc(m))
      }.toIndexedSeq: _*).as(s"lut$m")
    }

    val probe = queries
      .select(Seq(col("query_id"),
        explode(slice(ordered, 1, nProbe)).as("pc")) ++ luts: _*)
      .select(Seq(col("query_id"), col("pc.cell").as("cell")) ++
        (0 until M).map(m => col(s"lut$m")): _*)

    // ---- static code table, one row per vector (codes carry exactly one
    // row per (vec, m) by the writer's contract)
    val codesWide = spark.read.parquet(s"$dir/codes")
      .groupBy("cell", "vec_id")
      .agg(max(when(col("m") === 0, col("code"))).as("code0"),
        (1 until M).map(m =>
          max(when(col("m") === m, col("code"))).as(s"code$m")): _*)

    val adc = (0 until M).map(m =>
      element_at(col(s"lut$m"), col(s"code$m").cast("int") + 1)).reduce(_ + _)
    probe.join(codesWide, "cell")
      .withColumn("adc", adc)
      .select("query_id", "vec_id", "cell", "adc")
  }

  /** Top-k per query over ONE micro-batch of [[indexScores]] output (run
    * inside foreachBatch) — the batch probe's (adc, vec_id) ranking.
    */
  def ranked(scoreBatch: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("vec_id"))
    scoreBatch
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "adc")
      .orderBy("query_id", "rank")
  }
}
