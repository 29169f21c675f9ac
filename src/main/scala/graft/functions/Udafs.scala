package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF surface of SURVEY §2.6).
  *
  * WeightedMean accumulates exact BigDecimal partial sums so the final
  * value is a single IEEE division over exact sums — deterministic across
  * partitionings and hash-comparable against a SQL oracle (same contract
  * as the DECIMAL-cast built-in aggregates in Relational).
  */
object Udafs {

  final case class WMBuffer(sumWX: BigDecimal, sumW: BigDecimal)

  /** Weighted mean of `x` with weight `w`, both quantized to 2 dp on entry
    * (matching CAST(x AS DECIMAL(18,2)) in the oracle SQL).
    */
  object WeightedMean extends Aggregator[(Double, Double), WMBuffer, Double] {
    private def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

    override def zero: WMBuffer = WMBuffer(BigDecimal(0), BigDecimal(0))

    override def reduce(b: WMBuffer, in: (Double, Double)): WMBuffer = {
      val (x, w) = in
      WMBuffer(b.sumWX + d2(x) * d2(w), b.sumW + d2(w))
    }

    override def merge(a: WMBuffer, b: WMBuffer): WMBuffer =
      WMBuffer(a.sumWX + b.sumWX, a.sumW + b.sumW)

    override def finish(b: WMBuffer): Double =
      if (b.sumW.signum == 0) Double.NaN
      else b.sumWX.toDouble / b.sumW.toDouble

    override def bufferEncoder: Encoder[WMBuffer] = Encoders.product[WMBuffer]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
