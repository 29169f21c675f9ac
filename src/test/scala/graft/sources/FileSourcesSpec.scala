package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trip fidelity + partition-pruning for the batch file formats. */
class FileSourcesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars", "text")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("csv round-trip preserves every row and column") {
    val dir = tmp("csv")
    FileSources.writeCsv(docs, dir)
    val back = FileSources.readCsv(spark, dir, docs.schema)
    assert(back.schema == docs.schema)
    assert(asSet(back) == asSet(docs))
  }

  test("json round-trip preserves every row and column") {
    val dir = tmp("json")
    FileSources.writeJson(docs, dir)
    val back = FileSources.readJson(spark, dir, docs.schema)
    assert(asSet(back) == asSet(docs))
  }

  test("orc round-trip preserves rows; filters push into the orc scan") {
    val dir = tmp("orc")
    FileSources.writeOrcPartitioned(docs, dir, Nil)
    val back = FileSources.readOrc(spark, dir)
    assert(asSet(back) == asSet(docs))
    val p = back.filter(col("n_chars") > 300).select("doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"orc pushdown missing:\n${p.take(1500)}")
  }

  test("partitioned write + partition-key filter prunes, not filters") {
    val dir = tmp("part")
    FileSources.writeParquetPartitioned(docs, dir, Seq("lang"))
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    // correctness: the pruned read returns exactly the en docs
    assert(back.count() == docs.filter(col("lang") === "en").count())
    // plan: lang is a PartitionFilter on the scan, not a post-scan Filter
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") && p.contains("lang"),
      s"no partition filter:\n${p.take(1500)}")
  }

  test("FAILFAST csv surfaces malformed rows instead of nulling them") {
    val dir = tmp("bad")
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.csv"),
      "doc_id,n_chars\n1,10\nnot_a_long,20\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    val ex = intercept[Exception] {
      FileSources.readCsv(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
    // PERMISSIVE mode quarantines instead: the bad row decodes to null
    // AND the raw line is captured in _corrupt_record for replay
    val perm = FileSources.readCsv(spark, dir, schema, mode = "PERMISSIVE")
    assert(perm.schema.fieldNames.contains("_corrupt_record"))
    val rows = perm.collect()
    assert(rows.length == 2)
    val bad = rows.filter(_.isNullAt(0))
    assert(bad.length == 1)
    assert(bad.head.getString(2).startsWith("not_a_long"))
  }

  test("csv with embedded newlines round-trips under multiLine") {
    import spark.implicits._
    val dir = tmp("ml")
    val df = Seq((1L, "first line\nsecond line"), (2L, "plain")).toDF("id", "text")
    FileSources.writeCsv(df, dir)
    val back = FileSources.readCsv(spark, dir, df.schema, multiLine = true)
    assert(asSet(back) == asSet(df))
  }

  test("xml round-trip preserves rows via rowTag records, escaping included") {
    import spark.implicits._
    val dir = tmp("xml")
    // markup characters must survive the writer's escaping
    val df = docs.withColumn("text",
      concat(col("text"), lit(" <a & \"b\"> 'c'")))
    FileSources.writeXml(df, dir, rowTag = "doc")
    val back = FileSources.readXml(spark, dir, df.schema, rowTag = "doc")
    assert(asSet(back) == asSet(df))
  }

  test("binaryFile ingests raw files; glob prunes at listing; metadata filters work") {
    val dir = tmp("bin")
    for (i <- 1 to 3)
      Files.write(java.nio.file.Paths.get(dir, s"a$i.bin"),
        Array.fill[Byte](10 * i)(i.toByte))
    Files.write(java.nio.file.Paths.get(dir, "skip.txt"), Array[Byte](1, 2, 3))

    assert(FileSources.readBinaryFiles(spark, dir).count() == 4)
    val bins = FileSources.readBinaryFiles(spark, dir, glob = Some("*.bin"))
    assert(bins.count() == 3)

    // content arrives as the exact raw bytes, length as file size — the
    // (binary, metadata) shape Multimodal's kernels consume
    val row = bins.filter(col("path").endsWith("a2.bin")).head()
    assert(row.getAs[Long]("length") == 20L)
    assert(row.getAs[Array[Byte]]("content").toSeq ==
      Array.fill[Byte](20)(2.toByte).toSeq)

    // size guard evaluates against file METADATA (BinaryFileFormat pushes
    // length/modificationTime filters, skipping oversized payload reads)
    val small = bins.filter(col("length") < 15)
    assert(small.count() == 1)
    val p = small.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"length filter not pushed to the binaryFile scan:\n${p.take(1500)}")
  }
}
