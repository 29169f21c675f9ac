package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All Layer-B queries take `(SparkSession, sfDir)` and read through here so
  * that column pruning / predicate pushdown reach the parquet scan (Catalyst
  * does this for free when the plan stays declarative).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries µs TIMESTAMP_NTZ as of the current testdata
    // generation (earlier generations wrote TIMESTAMP(NANOS)); consumers
    // cast through TimeWindows.eventTime, which is value-stable ONLY under
    // a UTC session — make that invariant explicit instead of implicit.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "graft requires spark.sql.session.timeZone=UTC (NTZ event-time casts " +
        "and DuckDB-oracle comparisons assume it)")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view named after itself (for spark.sql). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
