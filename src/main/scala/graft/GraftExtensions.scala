package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnShim

import graft.expressions.{CleanTextFold, FloatArrayQuantize, LongArrayDot, LshBucketTables, Md5Prefix60}
import graft.operators.Similarity

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so a SQL-only user gets the same codegen
  * paths the DataFrame API uses:
  *
  *   spark.sql("SELECT long_array_dot(a, b) FROM t")
  *   spark.sql("SELECT float_array_quantize(v) FROM t")   -- 1e6 floor scale
  *   spark.sql("SELECT lsh_buckets(float_array_quantize(v)) FROM t")
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * at session build time, or `GraftExtensions.register(spark)` on a running
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, inf, b) =>
      ext.injectFunction((id, inf,
        (args: Seq[Expression]) => b(args)): (FunctionIdentifier, ExpressionInfo,
          FunctionRegistry.FunctionBuilder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("long_array_dot"),
      info("long_array_dot",
        "long_array_dot(a, b) - exact int64 dot product of two array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "long_array_dot takes 2 arguments")
        LongArrayDot(args(0), args(1))
      }),
    (FunctionIdentifier("float_array_quantize"),
      info("float_array_quantize",
        "float_array_quantize(v) - floor(x*1e6) int64 components of a float vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "float_array_quantize takes 1 argument")
        FloatArrayQuantize(args(0), 1e6)
      }),
    (FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(qv) - the engine's ANN hyperplane bucket ids for a quantized vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "lsh_buckets takes 1 argument")
        LshBucketTables(args(0), Similarity.annPlanesQuantized, Similarity.N_PLANES)
      }),
    // Catalyst keeps its bloom expressions in the INTERNAL registry (only
    // InjectRuntimeFilter plants them); exposing both halves gives SQL
    // users the explicit bloom-pruned-join surface
    // (ScalePatterns.bloomPrunedJoin is the DataFrame face):
    //   WHERE might_contain((SELECT bloom_filter_agg(xxhash64(k)) FROM b),
    //                       xxhash64(k))
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(hashedKey[, estItems[, numBits]]) - build a bloom filter sketch over xxhash64'd keys"),
      (args: Seq[Expression]) => args match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
            .toAggregateExpression()
        case Seq(c, est) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est)
            .toAggregateExpression()
        case Seq(c, est, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est, bits)
            .toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg takes 1-3 arguments")
      }),
    (FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, value) - probe a bloom_filter_agg sketch for an xxhash64'd key"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "might_contain takes 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))
      }),
    // the C8 single-pass text normalizer and the dedup family's base
    // hash, for SQL-only users of the same codegen kernels
    (FunctionIdentifier("clean_text"),
      info("clean_text",
        "clean_text(s, maxLen) - the reference C8 CleanText normalization " +
          "(char fold, emoji/quote strip, '&'->'and', newline join, " +
          "truncate to maxLen); maxLen must be an int literal"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "clean_text takes 2 arguments")
        val maxLen = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"clean_text maxLen must be an int literal, got $other")
        }
        CleanTextFold(args(0), maxLen)
      }),
    (FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60",
        "md5_prefix60(s) - first 60 bits of md5(s) as a non-negative bigint " +
          "(= CAST(CONV(SUBSTRING(MD5(s),1,15),16,10) AS BIGINT), one pass)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5_prefix60 takes 1 argument")
        Md5Prefix60(args(0))
      }),
    // the read half of Spark's write-only count_min_sketch aggregate
    // (TextOps.heavyShingles is the DataFrame face of the two-pass
    // heavy-hitter pattern); the sketch must fold at analysis time — a
    // hex literal (X'..') or a pre-materialized literal, NOT a subquery
    (FunctionIdentifier("cms_probe"),
      info("cms_probe",
        "cms_probe(sketch, key) - estimated occurrence count (>= true " +
          "count) of a bigint key against a count_min_sketch binary; " +
          "sketch must be a foldable binary literal"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_probe takes 2 arguments")
        require(args(0).foldable &&
          args(0).dataType == org.apache.spark.sql.types.BinaryType,
          "cms_probe sketch must be a foldable binary")
        args(0).eval() match {
          case b: Array[Byte] => graft.expressions.CountMinProbe(args(1), b)
          case other => throw new IllegalArgumentException(
            s"cms_probe sketch evaluated to $other")
        }
      }))

  /** Register into an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, b) =>
      ColumnShim.registerFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], id, inf, b)
    }
}
