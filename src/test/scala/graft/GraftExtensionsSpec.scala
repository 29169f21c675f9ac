package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The custom expressions exposed as SQL functions behave identically to
  * their DataFrame-API forms.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL surface: long_array_dot / float_array_quantize / lsh_buckets") {
    GraftExtensions.register(spark)
    Seq((Seq(1.5f, -2.25f, 3f), Seq(2L, 2L, 2L)))
      .toDF("v", "b").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      """SELECT float_array_quantize(v) AS q,
        |       long_array_dot(float_array_quantize(v), b) AS d,
        |       lsh_buckets(float_array_quantize(v)) AS buckets
        |FROM ext_t""".stripMargin).collect().head
    assert(row.getSeq[Long](0) == Seq(1500000L, -2250000L, 3000000L))
    assert(row.getLong(1) == (1500000L - 2250000L + 3000000L) * 2)
    assert(row.getSeq[Long](2).length == Similarity.N_TABLES)

    // equivalence with the DataFrame API on real vectors
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    e.createOrReplaceTempView("ext_emb")
    val sqlSide = spark.sql(
      "SELECT vec_id, lsh_buckets(float_array_quantize(embedding)) AS b FROM ext_emb")
    val dfSide = e.select(col("vec_id"),
      Similarity.lshBuckets(Similarity.quantize(col("embedding"))).as("b"))
    assert(sqlSide.exceptAll(dfSide).isEmpty && dfSide.exceptAll(sqlSide).isEmpty)
  }
}
