package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** t14 (count-min heavy hitters) and t15 (bigram LM) pins.
  *
  * t14's oracle proves engine-level equality; what it CANNOT see is the
  * sketch (the exact >= threshold re-check masks any CMS behavior). These
  * tests pin the sketch layer itself: the one-sided estimate bound that
  * makes the prefilter lossless, the tail-kill that makes it worth having,
  * and codegen survival of the probe expression.
  */
class CmsHeavyHitterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hashedInstances = Dedup
    .shingleTable(Tables.documents(spark, sf), distinct = false, hashed = true)
    .select(col("sh").as("h"))

  test("t14 equals the sketch-free exact heavy-hitter form") {
    val cms = TextOps.heavyShingles(spark, sf).collect()
    val sh = hashedInstances
    val threshold = sh.count() / TextOps.CMS_HH_DENOM + 1L
    val exact = sh.groupBy("h").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= threshold)
      .orderBy(col("n_occurrences").desc, col("h"))
      .collect()
    assert(exact.nonEmpty, "degenerate fixture: no heavy shingles at sf0.001")
    assert(cms.toSeq == exact.toSeq)
  }

  test("probe never under-estimates; the prefilter kills tail instances; codegen survives") {
    import org.apache.spark.sql.graft.ColumnShim
    val sh = hashedInstances
    val row = sh.agg(
      expr(s"count_min_sketch(h, CAST(${TextOps.CMS_EPS} AS DOUBLE), " +
        s"CAST(${TextOps.CMS_CONF} AS DOUBLE), ${TextOps.CMS_SEED})").as("cms"),
      count(lit(1)).as("n")).head()
    val n = row.getAs[Long]("n")
    val threshold = n / TextOps.CMS_HH_DENOM + 1L
    val probe = ColumnShim.column(graft.expressions.CountMinProbe(
      ColumnShim.expression(col("h")), row.getAs[Array[Byte]]("cms")))

    // One-sided CMS bound, checked for EVERY distinct key: est >= true.
    // This is what makes the prefilter lossless for any threshold.
    val underEstimates = sh.groupBy("h").agg(count(lit(1)).as("true_n"))
      .withColumn("est", probe)
      .filter(col("est") < col("true_n"))
      .count()
    assert(underEstimates == 0L)

    // Any silent fallback to interpreted eval of the probe = failure.
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val survivors =
      try sh.filter(probe >= threshold).count()
      finally {
        prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
          spark.conf.set("spark.sql.codegen.fallback", _))
        prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
      }

    // Completeness floor: every instance of a truly-heavy key survives...
    val heavyMass = sh.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= threshold)
      .agg(sum(col("c"))).head().getLong(0)
    assert(survivors >= heavyMass)
    // ...while a real share of the count-1 tail dies before the aggregate
    // (with eps = 1/(2*DENOM) the expected estimate error is far below the
    // threshold; 0.8 leaves head-room for unlucky collisions).
    assert(survivors < (0.8 * n).toLong,
      s"prefilter killed too little: $survivors of $n instances survived")
  }

  test("CMS sketches merge EXACTLY: split-and-merge equals one whole-corpus pass") {
    // the property that makes incremental daily-ingest heavy hitters
    // possible without rescanning the base corpus: a count-min table is a
    // pure sum, so sketch(base) + sketch(delta) is BIT-IDENTICAL to
    // sketch(base ∪ delta) under the same (eps, conf, seed) — merge the
    // persisted sketch with each day's delta sketch and the φN threshold
    // recomputes from the merged totalCount. Pin it bit-for-bit.
    import org.apache.spark.util.sketch.CountMinSketch
    val sh = hashedInstances
    def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(expr(s"count_min_sketch(h, CAST(${TextOps.CMS_EPS} AS DOUBLE), " +
        s"CAST(${TextOps.CMS_CONF} AS DOUBLE), ${TextOps.CMS_SEED})"))
        .head().getAs[Array[Byte]](0)
    val whole = sketchOf(sh)
    val base = CountMinSketch.readFrom(sketchOf(sh.filter(col("h") % 2 === 0)))
    val delta = CountMinSketch.readFrom(sketchOf(sh.filter(col("h") % 2 =!= 0)))
    base.mergeInPlace(delta)
    assert(base.totalCount() == CountMinSketch.readFrom(whole).totalCount())
    assert(java.util.Arrays.equals(base.toByteArray, whole))
  }

  test("t15 bigram conditional-probability scoring on a hand-computed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bigram").toString
    import spark.implicits._
    // C2: (x,y)=2 (y,x)=1 (x,z)=1; C1: x=3, y=1.
    // doc 1 = [xy, yx, xy]: q = 666666666 + 1000000000 + 666666666,
    //   lm = floor(2333333332 / 3) = 777777777
    // doc 2 = [xz]: lm = floor(1/3 * 1e9) = 333333333
    Seq((1L, "x y x y", "en", "s1", 7L), (2L, "x z", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextOps.bigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 777777777L), (2L, 1L, 333333333L)))
  }
}
