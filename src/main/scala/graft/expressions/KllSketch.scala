package graft.expressions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KLL quantile-sketch aggregates over the bundled datasketches-java —
  * the industry-standard MERGEABLE quantile sketch (Karnin–Lang–Liberty
  * 2016), filling the one sketch slot Spark's built-ins leave open:
  * `approx_percentile` is an aggregate you cannot persist or union, and
  * the built-in Datasketches surface covers HLL (q63) but not quantiles.
  * A KLL sketch is a few KB, mergeable exactly like q63's HLL and q66's
  * histogram (persisted per-partition sketches roll up to any coarser
  * level without rescanning facts), and carries a PROVEN normalized-rank
  * error bound (~1.33%·(200/k)^0.9 at 99% confidence) — which is why the
  * q72 contract asserts rank-accuracy booleans, the q63 stance, rather
  * than hash-matching randomized estimates (KLL compaction is
  * randomized by design).
  *
  * Scale: a hash aggregate with an O(k·log(n/k)) buffer; map-side
  * partials reduce each mapper's contribution to one sketch per group
  * before the exchange, where an exact quantile shuffles every value.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch needs 8 <= k <= 65535, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch needs a BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray
  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch"
}

/** Union of serialized KLL sketches — the rollup face (per-type sketches
  * fold to the global one without touching the fact table, exactly
  * `hll_union_agg` for q63's HLL family).
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union needs a serialized sketch (BINARY), got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllLongsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray
  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_union"
}

/** Scalar quantile read off a serialized sketch (INCLUSIVE search, the
  * Datasketches default). Interpreted (CodegenFallback) — it runs on
  * |groups|-row frames, never in a corpus-scan hot path.
  */
case class KllQuantile(child: Expression, q: Double)
  extends UnaryExpression with CodegenFallback {

  require(q > 0.0 && q < 1.0, s"kll_quantile rank must be in (0,1), got $q")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile needs a serialized sketch (BINARY), got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  // an all-null group's KllSketchAgg emits a valid but EMPTY sketch
  // (nullable=false), and getQuantile on an empty sketch throws — the
  // quantile of nothing is null, not a runtime exception
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sk = KllLongsSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
  override def prettyName: String = "kll_quantile"
}

object KllSketch {
  val DEFAULT_K = 800

  /** DataFrame-side aggregate: one serialized sketch per group. */
  def sketch(c: Column, k: Int = DEFAULT_K): Column =
    ColumnShim.column(
      KllSketchAgg(ColumnShim.expression(c), k).toAggregateExpression())

  /** DataFrame-side union aggregate over serialized sketches. */
  def union(c: Column, k: Int = DEFAULT_K): Column =
    ColumnShim.column(
      KllUnionAgg(ColumnShim.expression(c), k).toAggregateExpression())

  /** Scalar quantile estimate off a serialized sketch. */
  def quantile(c: Column, q: Double): Column =
    ColumnShim.column(KllQuantile(ColumnShim.expression(c), q))
}
