package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All random-hyperplane LSH bucket ids of a quantized vector in ONE pass.
  *
  * `planes(t*planesPerTable + j)` is the quantized hyperplane j of table t;
  * output element t is the table's bucket id: bit j set iff the plane dot
  * product is > 0.
  *
  * Why a custom expression: composing this from per-plane column
  * expressions inlines 64 literal nodes per plane — with 8×12 planes that
  * is ~6k expression nodes, which blows past codegen method limits and
  * silently degrades the whole projection to interpreted evaluation
  * (measured: the d06 bucket stage dominated its runtime). Here the plane
  * matrix is a single referenced constant and the generated code is three
  * tight primitive loops.
  */
case class LshBucketTables(child: Expression, planes: Array[Array[Long]],
    planesPerTable: Int) extends UnaryExpression {

  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    "planes must hold nTables * planesPerTable rows")

  private def nTables: Int = planes.length / planesPerTable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < planesPerTable) {
        val plane = planes(t * planesPerTable + j)
        val n = math.min(v.numElements(), plane.length)
        var s = 0L
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) s += v.getLong(i) * plane(i)
          i += 1
        }
        if (s > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    val ppt = planesPerTable
    val nt = nTables
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val plane = ctx.freshName("plane")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$nt];
         |for (int $t = 0; $t < $nt; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $ppt; $j++) {
         |    long[] $plane = $planesRef[$t * $ppt + $j];
         |    int $n = java.lang.Math.min($v.numElements(), $plane.length);
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) $s += $v.getLong($i) * $plane[$i];
         |    }
         |    if ($s > 0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketTables =
    copy(child = newChild)

  // content equality over the plane matrix (see ModelEquality)
  override def equals(o: Any): Boolean = o match {
    case that: LshBucketTables =>
      child == that.child && planesPerTable == that.planesPerTable &&
        ModelEquality.deepEq(planes, that.planes)
    case _ => false
  }

  override def hashCode(): Int =
    (31 * child.hashCode() + planesPerTable) * 31 + ModelEquality.deepHash(planes)

  override def prettyName: String = "lsh_bucket_tables"
}
