package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Md5Prefix60]] — a name the generated Java can call
  * (the top-level object gets a static-forwarder mirror class). The
  * overloads let codegen bind directly on the child's static type
  * (UTF8String for string columns, byte[] for binary) with no cast node.
  */
object Md5Hash {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)`:
    * 15 hex chars are the digest's first 7.5 bytes, i.e. the big-endian
    * first-8-byte word shifted right one nibble.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val g = d.digest(bytes)
    val w =
      (g(0) & 0xffL) << 56 | (g(1) & 0xffL) << 48 |
        (g(2) & 0xffL) << 40 | (g(3) & 0xffL) << 32 |
        (g(4) & 0xffL) << 24 | (g(5) & 0xffL) << 16 |
        (g(6) & 0xffL) << 8 | (g(7) & 0xffL)
    w >>> 4
  }

  def hash60(s: UTF8String): Long = hash60(s.getBytes)
}

/** Codegen'd 60-bit md5-prefix hash (the cross-engine [[graft.operators.Dedup.baseHash]]
  * family base) — value-identical to the built-in chain
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` but digest→long
  * direct: no 32-char hex string materialization, no substring copy, no
  * base-16 string parse. This sits under every shingle instance the d03/d04
  * dedup family hashes (millions of rows per corpus partition), which is
  * what justifies a custom Expression per SURVEY §7.2's decision table.
  *
  * The hex-prefix semantics (not e.g. xxhash64) are load-bearing: DuckDB
  * reproduces the same value from `CAST(concat('0x', substr(md5(x),1,15))
  * AS BIGINT)`, which is what lets the driver hash-check LSH structures.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5Hash.hash60(s)
    case b: Array[Byte] => Md5Hash.hash60(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Hash.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}
