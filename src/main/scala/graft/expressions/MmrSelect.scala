package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over ONE query's bounded
  * shortlist — the per-group kernel that lets s13 run as a single Spark
  * action instead of k driver-scheduled rounds (measured: 11 actions /
  * 3.0 s → 2 actions at sf0.1 for 5×16-row frames; the driver round-trip
  * was the entire cost).
  *
  * Children: `cands` = array<struct<vec_id bigint, rel double>> (the
  * shortlist, any order — the greedy is a pure SET function thanks to the
  * (score desc, vec_id asc) tie-break), `sims` = array<struct<a bigint,
  * b bigint, sim double>> (pairwise cosines within the shortlist).
  * Returns array<struct<step int, vec_id bigint, mmr2 double>> of the
  * first `k` picks: step 1 maximizes rel, later steps maximize
  * `rel − max_{s∈picked} sim(c, s)` (the λ=½ MMR with both weights
  * folded out). Arithmetic is the same subtract/compare chain the DuckDB
  * recursive-CTE oracle replays, on doubles produced by the s01
  * integer-dot discipline — so the whole trace hash-matches.
  *
  * CodegenFallback is deliberate: the expression evaluates once per QUERY
  * (not per corpus row) over ≤ [[MAX_M]] candidates — never a hot path.
  */
case class MmrSelect(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with CodegenFallback {

  import MmrSelect.MAX_M

  require(k >= 1, s"mmr_select needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(c: StructType, _), ArrayType(p: StructType, _))
        if c.length == 2 && c(0).dataType == LongType && c(1).dataType == DoubleType &&
          p.length == 3 && p(0).dataType == LongType && p(1).dataType == LongType &&
          p(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mmr_select needs (array<struct<bigint,double>>, array<struct<bigint,bigint,double>>), got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("mmr2", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(candsAny: Any, simsAny: Any): Any = {
    val cands = candsAny.asInstanceOf[ArrayData]
    val sims = simsAny.asInstanceOf[ArrayData]
    val n = cands.numElements()
    require(n <= MAX_M,
      s"mmr_select shortlist has $n candidates; cap is $MAX_M — " +
        "shrink the shortlist, the kernel is O(k·M) per query by design")
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      i += 1
    }
    // index the candidate ids, then the sim matrix by candidate position
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    i = 0
    while (i < n) { idx.put(ids(i), i); i += 1 }
    val sim = Array.fill(n * n)(Double.NaN)
    i = 0
    val m = sims.numElements()
    while (i < m) {
      val row = sims.getStruct(i, 3)
      val a = idx.get(row.getLong(0))
      val b = idx.get(row.getLong(1))
      if (a != null && b != null) sim(a * n + b) = row.getDouble(2)
      i += 1
    }
    // greedy: maxSim(c) over the picked set, updated incrementally
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Any](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = Double.NaN
      i = 0
      while (i < n) {
        if (!picked(i)) {
          // step 1 scores by raw relevance (picked set is empty)
          val score = if (step == 0) rel(i) else rel(i) - maxSim(i)
          if (best < 0 || score > bestScore ||
            (score == bestScore && ids(i) < ids(best))) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true
      out(step) = new GenericInternalRow(
        Array[Any](step + 1, ids(best), bestScore))
      // fold the new pick into every remaining candidate's max-sim
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val s = sim(i * n + best)
          require(!s.isNaN,
            s"mmr_select: missing pair sim (${ids(i)}, ${ids(best)})")
          if (s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "mmr_select"
}

object MmrSelect {
  /** Shortlist cap: the kernel is O(M²) memory per evaluation. */
  val MAX_M = 4096

  def apply(cands: org.apache.spark.sql.Column,
      sims: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(
      new MmrSelect(ColumnShim.expression(cands), ColumnShim.expression(sims), k))
  }
}
