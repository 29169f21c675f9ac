package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Estimated occurrence count of a long key against a pre-built
  * count-min sketch (Cormode/Muthukrishnan 2005) — the probe half of the
  * two-pass heavy-hitter pattern: pass 1 folds the corpus into one
  * eps-bounded sketch via partial aggregation (Spark's `count_min_sketch`
  * aggregate merges map-side sketches tree-wise, so nothing per-key ever
  * crosses the wire), pass 2 filters each instance through this expression
  * BEFORE the exact confirming aggregate. CMS never under-counts
  * (`estimate >= true`, the one-sided Bloom-style guarantee), so every
  * genuinely heavy key survives to the exact pass; the long tail is killed
  * map-side instead of shuffling into a corpus-vocabulary-sized aggregate.
  *
  * Why a custom expression: Spark ships the sketch *builder*
  * (`count_min_sketch`) but no scalar function to query one — the sketch
  * is a write-only value in SQL. This is the read side, following the
  * [[LshBucketTables]] reference-object discipline: the sketch rides the
  * (stage-broadcast) serialized plan as this expression's `bytes`, is
  * deserialized once per executor into a transient field, and generated
  * code calls one virtual method — constant code size regardless of sketch
  * geometry, so whole-stage codegen survives any (eps, confidence).
  *
  * The interpreted path calls the same [[probe]] the generated code calls,
  * so the two cannot drift (the CleanTextKernel discipline).
  */
case class CountMinProbe(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  // Built lazily per deserialized instance (driver + once per executor);
  // CountMinSketch itself is not java-serializable, its byte form is.
  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(bytes)

  /** Kernel shared by interpreted eval and generated code. The boxed call
    * matches `CountMinSketchAgg`'s long-typed update path (both hash the
    * raw long), so probe estimates are consistent with the builder.
    */
  def probe(v: Long): Long = sketch.estimateCount(java.lang.Long.valueOf(v))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CountMinProbe].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountMinProbe =
    copy(child = newChild)

  // content equality over the sketch bytes (see ModelEquality) — the
  // synthesized case-class equals is referential on Array[Byte], which
  // would defeat subexpression elimination and exchange reuse whenever
  // the same sketch is probed twice in one plan
  override def equals(o: Any): Boolean = o match {
    case that: CountMinProbe =>
      child == that.child && java.util.Arrays.equals(bytes, that.bytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bytes)

  override def prettyName: String = "cms_probe"
}
