package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass kernel for [[CdcChunks]]: content-defined chunk boundaries
  * + per-chunk fingerprints of one payload. Semantics are EXACTLY the
  * built-in-HOF formulation (Multimodal.cdcChunksReference, spec-pinned
  * equal): a byte position `i` (1-based) ends a chunk when
  * `md5_60(uppercase-hex of bytes (i-7..i)) % mask == 0`, and each
  * chunk's fingerprint is `md5_60(uppercase-hex of its bytes)` — hex
  * because the DuckDB oracle has no BLOB md5/substr, so the hex string
  * IS the cross-engine byte representation. The kernel just skips the
  * interpreted HOF machinery and the materialized hex column (measured
  * 3.7 s → sub-second at sf0.1).
  */
object CdcChunkKernel {
  private val HEX = "0123456789ABCDEF".getBytes("US-ASCII")

  /** (h, l) pairs packed as a struct array. */
  def chunks(payload: Array[Byte], window: Int, mask: Long): GenericArrayData = {
    val n = payload.length
    // hex form once: 2 ASCII bytes per input byte
    val hx = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      hx(2 * i) = HEX(b >>> 4)
      hx(2 * i + 1) = HEX(b & 0xf)
      i += 1
    }
    // boundary positions (exclusive 0, inclusive n added by the caller loop)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0 // chunk start (bytes, exclusive prefix)
    var pos = window // candidate boundary = window..n-1 (n closes the last)
    while (pos < n) {
      val h = Md5Hash.hash60(java.util.Arrays.copyOfRange(
        hx, 2 * (pos - window), 2 * (pos - window) + 2 * window))
      if (h % mask == 0) {
        if (pos > start) {
          out += new GenericInternalRow(Array[Any](
            Md5Hash.hash60(java.util.Arrays.copyOfRange(hx, 2 * start, 2 * pos)),
            (pos - start).toLong))
        }
        start = pos
      }
      pos += 1
    }
    if (n > start) {
      out += new GenericInternalRow(Array[Any](
        Md5Hash.hash60(java.util.Arrays.copyOfRange(hx, 2 * start, 2 * n)),
        (n - start).toLong))
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<struct<h bigint, l bigint>> of content-defined chunks of a
  * binary payload — see [[CdcChunkKernel]]. Codegen'd (static kernel
  * call): the boundary scan runs per corpus row, inside the stage.
  */
case class CdcChunks(child: Expression, window: Int, mask: Long)
  extends UnaryExpression {

  require(window >= 1 && mask >= 1, "cdc_chunks needs window >= 1, mask >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs a BINARY payload, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("l", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(payload: Any): Any =
    CdcChunkKernel.chunks(payload.asInstanceOf[Array[Byte]], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CdcChunkKernel.chunks($c, $window, ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}
