package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for the C8 CleanText chain (reference
  * utils/clean.go:9-102) — a name the generated Java can call. The tables
  * are built from the SAME constant strings the Column form uses
  * (graft.functions.TextFunctions), so the two forms cannot drift.
  *
  * Per-code-point semantics mirror the Column chain exactly:
  * `translate` maps by code point; the deletion regex class compiles its
  * surrogate-pair literals to astral code points; '&'→"and" and
  * '…'→"..." run on the already-translated+deleted stream, and no
  * translate output collides with either, so one pass with the precedence
  * map→delete→expand is equivalent to the four sequential passes.
  */
object CleanTextKernel {

  /** 1:1 fold source/target — `translate`'s arguments; the Column form
    * (TextFunctions.charMapFold) consumes these SAME constants.
    */
  val ONE2ONE_FROM: String =
    "\u1ebd\u200b\u200e\u2010\u2013\u2014\u2022\u2038\u2044\u201a\u201b\u2035\u201c\u201d\u201e\u201f\u2033\u2034\u2036\u2037\u27a2\u00a0\u00fc"
  val ONE2ONE_TO: String =
    "e\u0020\u0020---../,''\"\"\"\"\"\"\"\">\u0020u"

  /** Deletion set — the regex character class's contents, shared verbatim
    * (surrogate pairs in this string are the astral code points the regex
    * class compiles them to).
    */
  val DELETE_CHARS: String =
    "\u2032'|\u2018\u2019\u2028\u2122\u2600\u263a\u26fa\ufe0f\u00a2\u00ae\u00bd\u00de\u00e2\u00e9" +
      "\ud83d\udc4c\ud83d\udc4d\ud83d\ude42\ud83d\ude01\ud83d\ude90\ud83c\udf34\ud83c\udfdd\ud83c\udffd\ud83c\udfd6\ud83c\udfa3\ud83d\udd25\ud83d\ude0a"

  private val one2one: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < ONE2ONE_FROM.length) {
      m.put(ONE2ONE_FROM.charAt(i).toInt, ONE2ONE_TO.charAt(i).toInt)
      i += 1
    }
    m
  }

  private val deleteSet: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer]()
    var i = 0
    while (i < DELETE_CHARS.length) {
      val cp = DELETE_CHARS.codePointAt(i)
      s.add(cp)
      i += Character.charCount(cp)
    }
    s
  }

  def clean(input: UTF8String, maxLen: Int): UTF8String = {
    val str = input.toString
    // 1. newline sections joined with " " while the ACCUMULATED length is
    //    still under maxLen — checked BEFORE appending (overshoot kept)
    val joined =
      if (str.indexOf('\n') < 0) str
      else {
        val secs = str.split("\n", -1)
        val sb = new java.lang.StringBuilder(secs(0))
        var cps = secs(0).codePointCount(0, secs(0).length)
        var i = 1
        while (i < secs.length) {
          if (cps < maxLen) {
            sb.append(' ').append(secs(i))
            cps += 1 + secs(i).codePointCount(0, secs(i).length)
          }
          i += 1
        }
        sb.toString
      }
    // 2. char map: 1:1 fold, then delete, then the 1:many expansions
    val out = new java.lang.StringBuilder(joined.length + 8)
    var outCps = 0
    var i = 0
    while (i < joined.length) {
      val cp = joined.codePointAt(i)
      i += Character.charCount(cp)
      val m = one2one.get(cp)
      val t = if (m == null) cp else m.intValue()
      if (!deleteSet.contains(t)) {
        if (t == '&') { out.append("and"); outCps += 3 }
        else if (t == 0x2026) { out.append("..."); outCps += 3 }
        else { out.appendCodePoint(t); outCps += 1 }
      }
    }
    // 3. min-length gate on the ORIGINAL string (code points)
    if (str.codePointCount(0, str.length) < 5) return UTF8String.EMPTY_UTF8
    // 4. truncate to maxLen-3 + "..." (code points); clamp the keep-length
    //    at 0 so maxLen < 3 degenerates to "..." exactly like the Column
    //    form's substring(gated, 1, maxLen - 3) (negative length -> "")
    if (outCps > maxLen) {
      val end = out.offsetByCodePoints(0, math.max(0, maxLen - 3))
      UTF8String.fromString(out.substring(0, end) + "...")
    } else UTF8String.fromString(out.toString)
  }
}

/** Codegen'd single-pass CleanText (C8): replaces an interpreted
  * `aggregate` higher-order join plus translate and three regexp_replace
  * passes (each materializing an intermediate UTF8String per row) with
  * one Java pass. Value-identity with the Column chain is property-pinned
  * in TextFunctionsSpec, and the DuckDB oracle pins the semantics
  * independently.
  */
case class CleanTextFold(child: Expression, maxLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CleanTextKernel.clean(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CleanTextKernel.clean($c, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): CleanTextFold =
    copy(child = newChild)
}
