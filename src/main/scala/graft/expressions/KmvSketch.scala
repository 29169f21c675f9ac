package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values" / bottom-k) distinct-value sketch aggregate.
  *
  * Keeps the k smallest DISTINCT 60-bit hash values seen (the
  * [[Md5Hash.hash60]] family, so a DuckDB oracle can replay the sketch
  * bit-for-bit). Unlike HLL (q63), a KMV sketch supports set
  * INTERSECTION estimates — k-min coincidence gives Jaccard directly —
  * and because "the k smallest distinct values of a fixed dataset" is a
  * pure function of the data, every derived estimate is DETERMINISTIC:
  * the oracle hash-matches the estimates themselves, not just contract
  * booleans.
  *
  * Mergeability: kmv(A ∪ B) = k-min(kmv(A) ∪ kmv(B)) exactly (any value
  * among the k smallest of the union is among the k smallest of its own
  * side), so persisted per-partition/per-day sketches roll up without
  * rescanning facts — the q63/q66 materialized-view stance.
  *
  * Scale: this is a hash-aggregate with a BOUNDED buffer — map-side
  * partial aggregation reduces each mapper's contribution to ≤ k longs
  * per group before the exchange, where `countDistinct` shuffles every
  * distinct value. Update is O(log k) against a TreeSet with an
  * early-out (`v >= max` and full ⇒ no-op), merge is O(k log k).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a BIGINT hash input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Bounded distinct insert: no-op when the buffer is full and v is not
    * below its max, or when v is already present (TreeSet.add = false).
    */
  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) {
      buf.add(v); ()
    } else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** Ascending sorted array of the ≤ k minima. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** DataFrame-side entry: `kmv(col, k)` as an aggregate Column. */
  def sketch(c: Column, k: Int): Column =
    ColumnShim.column(
      KmvSketchAgg(ColumnShim.expression(c), k).toAggregateExpression())
}
