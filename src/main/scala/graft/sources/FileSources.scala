package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file-format surface: CSV / JSON-lines / ORC readers and writers
  * alongside the parquet path the rest of the engine uses (graft.Tables).
  * The reference consumes only Kafka JSON (main.go:30-64), but an engine
  * its users migrate onto must also ingest and emit the interchange
  * formats around a warehouse; these wrap Spark's bundled sources with the
  * options that matter at 100 TB:
  *
  *   - schema is ALWAYS explicit. Inference costs a full extra scan of the
  *     input (and for JSON samples can silently widen/narrow types between
  *     runs); at 100 TB that is a second 100 TB read.
  *   - `mode` defaults to FAILFAST: a malformed row aborts the job rather
  *     than silently nulling columns mid-corpus (PERMISSIVE is opt-in,
  *     with the corrupt-record column named, for quarantine flows).
  *   - ORC/parquet writers get write-time `partitionBy` so downstream
  *     reads partition-prune — the single biggest scan saver for
  *     predicate-on-partition-key workloads (asserted in FileSourcesSpec).
  *
  * CSV/JSON are row-oriented text: fine as interchange, wrong as the
  * at-rest analytics format (no column pruning, no predicate pushdown, no
  * encoding). The round-trip specs exist to pin fidelity, not to endorse
  * scanning CSV at scale.
  */
object FileSources {

  /** In PERMISSIVE mode Spark only materializes the corrupt-record column
    * when the schema contains it — without this, a malformed row decodes
    * to indistinguishable all-nulls and the raw line is unrecoverable.
    */
  private def withCorrupt(schema: StructType, mode: String): StructType =
    if (mode.equalsIgnoreCase("PERMISSIVE") &&
        !schema.fieldNames.contains("_corrupt_record"))
      schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    else schema

  /** CSV reader: explicit schema, header expected, FAILFAST by default.
    * `multiLine` stays false by default — that is the splittable fast
    * path; fields containing embedded newlines (which [[writeCsv]] quotes
    * correctly) REQUIRE `multiLine = true`, at the cost of one-task-per-
    * file parsing. PERMISSIVE mode gets `_corrupt_record` appended so
    * quarantine flows can capture the offending line.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST", multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(withCorrupt(schema, mode))
      .option("header", "true")
      .option("mode", mode)
      .option("multiLine", multiLine.toString)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** JSON-lines reader: explicit schema, FAILFAST by default; PERMISSIVE
    * gets `_corrupt_record` appended (see [[readCsv]]).
    */
  def readJson(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read
      .schema(withCorrupt(schema, mode))
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ORC reader (bundled columnar alternative; pushdown + pruning work as
    * for parquet).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Columnar write with write-time partitioning: `partitionCols` become
    * directory keys, so a filter on them prunes whole files from every
    * later scan (PartitionFilters in the plan, not a data filter).
    */
  def writeOrcPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def writeParquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** XML reader (Spark 4 bundles the former spark-xml as a native source):
    * one record per `rowTag` element, explicit schema, FAILFAST by
    * default; PERMISSIVE appends `_corrupt_record` (see [[readCsv]]).
    * XML is interchange-only at scale: records span lines, so parsing is
    * effectively per-file like multiLine CSV/JSON — never the at-rest
    * format, but feeds/config exports still arrive in it.
    */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String, mode: String = "FAILFAST"): DataFrame =
    spark.read
      .schema(withCorrupt(schema, mode))
      .option("rowTag", rowTag)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).xml(path)

  /** Binary-file ingest — the multimodal asset LOADER: each matching file
    * becomes one row `(path, modificationTime, length, content binary)`,
    * the raw-bytes shape `graft.operators.Multimodal`'s kernels consume
    * (decode happens in the mapPartitions seam, never here). Two scan
    * savers matter at 100 TB of media files: `pathGlobFilter` prunes at
    * LISTING time (non-matching files are never opened), and the source
    * pushes filters on `length`/`modificationTime` down to file metadata,
    * so a `length < threshold` guard skips oversized payloads without
    * reading a byte of content (spec-pinned).
    */
  def readBinaryFiles(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }
}
