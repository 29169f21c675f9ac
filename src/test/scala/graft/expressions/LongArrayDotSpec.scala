package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class LongArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("codegen path: dot of long arrays") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .select(Similarity.qdot(col("a"), col("b")))
    assert(df.collect().head.getLong(0) == 32L)
  }

  test("matches the interpreted higher-order formulation on random vectors") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextLong() % 1000000L),
      Seq.fill(64)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("a", "b").select(
      Similarity.qdot(col("a"), col("b")).as("cg"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L),
        (acc, z) => acc + z).as("hof"))
    assert(df.filter(col("cg") =!= col("hof")).count() == 0)
  }

  test("null propagation") {
    val df = Seq((Seq(1L), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(Similarity.qdot(col("a"), col("b")))
    assert(df.collect().head.isNullAt(0))
  }

  test("type mismatch is an analysis error, not a runtime one") {
    val ex = intercept[Exception] {
      Seq(("x", "y")).toDF("a", "b").select(Similarity.qdot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("long_array_dot") || ex.getMessage.contains("DATATYPE"))
  }
}
