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

  test("SQL surface: clean_text / md5_prefix60 equal their DataFrame forms") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("ext_docs")
    // clean_text == TextFunctions.cleanText (same CleanTextFold kernel)
    val sqlClean = spark.sql(
      "SELECT doc_id, clean_text(text, 200) AS c FROM ext_docs")
    val dfClean = docs.select(col("doc_id"),
      graft.functions.TextFunctions.cleanText(col("text"), 200).as("c"))
    assert(sqlClean.exceptAll(dfClean).isEmpty && dfClean.exceptAll(sqlClean).isEmpty)
    // md5_prefix60 == the replaced conv(substring(md5)) chain
    val mismatch = spark.sql(
      """SELECT count(*) AS n FROM ext_docs
        |WHERE md5_prefix60(text) !=
        |      CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)""".stripMargin)
      .collect().head.getLong(0)
    assert(mismatch == 0L)
    // maxLen must be a literal — a column there is a loud error, not a
    // silent misread
    val ex = intercept[Exception](spark.sql(
      "SELECT clean_text(text, doc_id) FROM ext_docs").collect())
    assert(ex.getMessage.contains("literal"), ex.getMessage)
  }

  test("SQL surface: cms_probe reads a count_min_sketch binary (est >= true)") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("ext_cms_docs")
    // build the sketch with the BUILT-IN aggregate, probe it with ours:
    // write-only SQL value becomes readable through the extension
    val bytes = spark.sql(
      """SELECT count_min_sketch(md5_prefix60(source),
        |  CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 7) AS s
        |FROM ext_cms_docs""".stripMargin).collect().head.getAs[Array[Byte]](0)
    val hex = bytes.map(b => f"$b%02x").mkString
    val under = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT md5_prefix60(source) AS h, count(*) AS true_n
         |  FROM ext_cms_docs GROUP BY 1)
         |WHERE cms_probe(X'$hex', h) < true_n""".stripMargin)
      .collect().head.getLong(0)
    assert(under == 0L)
    // a non-foldable sketch argument is a loud error
    val ex2 = intercept[Exception](spark.sql(
      "SELECT cms_probe(CAST(text AS BINARY), doc_id) FROM ext_cms_docs").collect())
    assert(ex2.getMessage.contains("foldable"), ex2.getMessage)
  }
}
