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

  test("SQL surface: ivf_cell_probe / pq_adc_luts equal their expression forms") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.graft.ColumnShim
    import graft.expressions.{IvfCellProbe, IvfServingKernels, PqAdcLuts}

    // a small inline model: 4 cells / codebook rows over 6-dim vectors
    // (2 subspaces x 3) — non-zero, non-orthogonal so ranking ties and
    // norms are exercised
    val cells = Array(10, 11, 12, 13)
    val cents: Array[Array[Long]] = Array(
      Array(1L, 2L, 3L, 4L, 5L, 6L),
      Array(-1L, 2L, -3L, 4L, -5L, 6L),
      Array(6L, 5L, 4L, 3L, 2L, 1L),
      Array(2L, 2L, 2L, 2L, 2L, 2L))
    val sqlArr = cents.map(_.mkString("array(", "L,", "L)"))
      .mkString("array(", ",", ")")
    val sqlCells = cells.mkString("array(", ",", ")")

    val qs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      .limit(32)
    qs.createOrReplaceTempView("ext_ivf_q")

    val sqlSide = spark.sql(
      s"""SELECT vec_id,
         |  ivf_cell_probe(qv, $sqlCells, $sqlArr, 2) AS probed,
         |  pq_adc_luts(qv, $sqlArr, 2, 3) AS luts
         |FROM ext_ivf_q""".stripMargin)
    val dfSide = qs.select(col("vec_id"),
      ColumnShim.column(IvfCellProbe(ColumnShim.expression(col("qv")),
        cells, cents, cents.map(IvfServingKernels.centroidNorm), 2)).as("probed"),
      ColumnShim.column(PqAdcLuts(ColumnShim.expression(col("qv")),
        cents, cents.map(IvfServingKernels.subspaceSelfDots(_, 2, 3)), 2, 3)).as("luts"))
    assert(sqlSide.exceptAll(dfSide).isEmpty && dfSide.exceptAll(sqlSide).isEmpty)

    // the probe really ranks: a query equal to centroid 2 probes cell 12 first
    val top = spark.sql(
      s"SELECT ivf_cell_probe(array(6L,5L,4L,3L,2L,1L), $sqlCells, $sqlArr, 2) AS p")
      .collect().head.getSeq[Int](0)
    assert(top.head == 12, s"expected cell 12 first, got $top")
    // and the LUT against the matching codebook row is exactly zero
    val lut2 = spark.sql(
      s"SELECT pq_adc_luts(array(6L,5L,4L,3L,2L,1L), $sqlArr, 2, 3) AS l")
      .collect().head.getSeq[Seq[Long]](0)
    assert(lut2(0)(2) == 0L && lut2(1)(2) == 0L, s"got $lut2")

    // a non-foldable model argument is a loud error
    val ex = intercept[Exception](spark.sql(
      "SELECT ivf_cell_probe(qv, array(CAST(vec_id AS INT)), array(qv), 1) FROM ext_ivf_q")
      .collect())
    assert(ex.getMessage.contains("foldable"), ex.getMessage)
  }

  test("reference-object expressions compare by model CONTENT, not allocation") {
    import graft.expressions.{CountMinProbe, IvfCellProbe, IvfServingKernels, LshBucketTables, PqAdcLuts}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val childL = BoundReference(0, LongType, nullable = false)
    val childA = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false)

    // two independently-allocated but identical models must be equal —
    // otherwise CSE / exchange reuse / canonicalized comparison all miss
    val sk1 = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.9, 7)
    sk1.addLong(42L)
    val bytes = { val bo = new java.io.ByteArrayOutputStream(); sk1.writeTo(bo); bo.toByteArray }
    assert(CountMinProbe(childL, bytes.clone()) == CountMinProbe(childL, bytes.clone()))
    assert(CountMinProbe(childL, bytes.clone()).hashCode ==
      CountMinProbe(childL, bytes.clone()).hashCode)
    assert(CountMinProbe(childL, bytes) != CountMinProbe(childL, bytes.drop(1)))

    def cents() = Array(Array(1L, 2L), Array(3L, 4L))
    def norms() = cents().map(IvfServingKernels.centroidNorm)
    assert(IvfCellProbe(childA, Array(0, 1), cents(), norms(), 1) ==
      IvfCellProbe(childA, Array(0, 1), cents(), norms(), 1))
    assert(IvfCellProbe(childA, Array(0, 1), cents(), norms(), 1) !=
      IvfCellProbe(childA, Array(0, 2), cents(), norms(), 1))

    def ccm() = cents().map(IvfServingKernels.subspaceSelfDots(_, 1, 2))
    assert(PqAdcLuts(childA, cents(), ccm(), 1, 2) ==
      PqAdcLuts(childA, cents(), ccm(), 1, 2))
    assert(PqAdcLuts(childA, cents(), ccm(), 1, 2) !=
      PqAdcLuts(childA, cents().map(_.map(_ + 1L)), ccm(), 1, 2))

    assert(LshBucketTables(childA, cents(), 2) == LshBucketTables(childA, cents(), 2))
    assert(LshBucketTables(childA, cents(), 2) != LshBucketTables(childA, cents(), 1))

    // semanticEquals (canonicalized comparison) rides the same equality
    assert(CountMinProbe(childL, bytes.clone())
      .semanticEquals(CountMinProbe(childL, bytes.clone())))
  }

  test("SQL surface: kmv_sketch equals its DataFrame aggregate form") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"),
        graft.operators.Dedup.baseHash(col("user_id").cast("string")).as("hv"))
    ev.createOrReplaceTempView("ext_kmv_events")
    val viaSql = spark.sql(
      """SELECT event_type, kmv_sketch(hv, 8) AS sk
        |FROM ext_kmv_events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    val viaDf = ev.groupBy("event_type")
      .agg(graft.expressions.KmvSketch.sketch(col("hv"), 8).as("sk"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    assert(viaSql == viaDf)
    // a non-literal k is a loud analysis error, not a silent default
    val ex = intercept[Exception](spark.sql(
      "SELECT kmv_sketch(hv, CAST(hv AS INT)) FROM ext_kmv_events").collect())
    assert(ex.getMessage.contains("kmv_sketch"))
  }

  test("SQL surface: cdc_chunks equals its DataFrame kernel form") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val a = graft.operators.Multimodal.assets(spark, "/root/testdata/sf0.001")
    a.createOrReplaceTempView("ext_cdc_assets")
    val viaSql = spark.sql(
      s"""SELECT asset_id, c.h AS h, c.l AS l FROM (
         |  SELECT asset_id, explode(cdc_chunks(payload,
         |    ${graft.operators.Multimodal.CDC_WINDOW},
         |    ${graft.operators.Multimodal.CDC_MASK})) AS c
         |  FROM ext_cdc_assets) ORDER BY asset_id, h, l""".stripMargin)
      .collect().map(_.toString).toSeq
    val viaDf = graft.operators.Multimodal.cdcChunksOf(a)
      .select(col("asset_id"), col("h"), col("l"))
      .orderBy("asset_id", "h", "l").collect().map(_.toString).toSeq
    assert(viaSql == viaDf)
  }

  test("SQL surface: mmr_select equals its expression form on a literal shortlist") {
    GraftExtensions.register(spark)
    // 3 candidates; c and b are near-identical (sim .99) — step 2 must
    // take the dissimilar a over the higher-relevance near-dup c
    val sql =
      """SELECT mmr_select(
        |  array(struct(1L, 0.9d), struct(2L, 0.5d), struct(3L, 0.8d)),
        |  array(struct(1L, 2L, 0.1d), struct(2L, 1L, 0.1d),
        |        struct(1L, 3L, 0.99d), struct(3L, 1L, 0.99d),
        |        struct(2L, 3L, 0.2d), struct(3L, 2L, 0.2d)), 3) AS r""".stripMargin
    val picks = spark.sql(sql).collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(picks.map(_._2) == Seq(1L, 2L, 3L),
      "greedy must defer the near-duplicate of the first pick")
  }

  test("SQL surface: kll_sketch/kll_union/kll_quantile equal their DataFrame forms") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"),
        floor(col("value") * 100.0).cast("long").as("cents"))
    ev.createOrReplaceTempView("ext_kll_events")
    // sketches are randomized internally but the SAME update/merge order
    // within one engine is deterministic per plan; compare the derived
    // QUANTILES which both forms must agree on within the sketch bound
    // plain 0.5 parses as DECIMAL(1,1) — the numeric-widening path must
    // accept it (the documented usage, no CAST required)
    val viaSql = spark.sql(
      """SELECT kll_quantile(kll_union(sk, 800), 0.5) AS p50 FROM (
        |  SELECT event_type, kll_sketch(cents, 800) AS sk
        |  FROM ext_kll_events GROUP BY event_type)""".stripMargin)
      .collect().head.getLong(0)
    val viaDf = ev.groupBy("event_type")
      .agg(graft.expressions.KllSketch.sketch(col("cents")).as("sk"))
      .agg(graft.expressions.KllSketch.union(col("sk")).as("sk"))
      .select(graft.expressions.KllSketch.quantile(col("sk"), 0.5))
      .collect().head.getLong(0)
    // both are valid k=800 estimates of the same median: within 2x bound
    val exact = ev.stat.approxQuantile("cents", Array(0.5), 0.0).head
    assert(math.abs(viaSql - exact) <= 0.02 * exact + 200)
    assert(math.abs(viaDf - exact) <= 0.02 * exact + 200)
    // a non-literal q is a loud analysis error
    val ex = intercept[Exception](spark.sql(
      "SELECT kll_quantile(kll_sketch(cents, 800), cents) FROM ext_kll_events").collect())
    assert(ex.getMessage.contains("kll_quantile"))
    // an all-null group produces a valid-but-EMPTY sketch; its quantile
    // is NULL, not a SketchesArgumentException
    val nul = spark.sql(
      """SELECT kll_quantile(kll_sketch(v, 800), 0.5) AS p50
        |FROM VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT)) t(v)""".stripMargin)
      .collect().head
    assert(nul.isNullAt(0), "quantile of an empty sketch must be null")
  }
}
