package graft.sources

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class AvroSourceSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = Files.createTempDirectory("avro-spec").toFile
    dir.deleteOnExit()
    s"${dir.getAbsolutePath}/$name"
  }

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("ok", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("raw", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("ntz", TimestampNTZType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = true)))

  private def fullRows: Seq[Row] = Seq(
    Row(1L, 7, 1.5, 2.5f, true, "hello",
      Array[Byte](1, 2, 3),
      Timestamp.valueOf("2024-03-01 12:34:56.789123"),
      LocalDateTime.parse("2024-03-01T12:34:56.789123"),
      Seq(0.25f, -1.75f)),
    Row(2L, null, null, null, null, null, null, null, null, null),
    Row(3L, -4, -0.125, 0.0f, false, "", Array[Byte](),
      Timestamp.valueOf("1969-12-31 23:59:59.000001"),
      LocalDateTime.parse("1969-12-31T23:59:59.000001"),
      Seq.empty[Float]))

  test("full-type round trip preserves schema and every value (incl. nulls, pre-epoch timestamps)") {
    val df = spark.createDataFrame(fullRows.asJava, fullSchema)
    val path = tmp("full")
    AvroSource.writeAvro(df, path)
    val back = AvroSource.readAvro(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      fullSchema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    val want = fullRows.sortBy(_.getLong(0))
    got.zip(want).foreach { case (g, w) =>
      for (i <- 0 until w.length) {
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq == b.toSeq)
          case (a, b) => assert(a == b, s"field $i: $a vs $b")
        }
      }
    }
  }

  test("documents table round-trips through Avro part files") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).repartition(3)
    val path = tmp("docs")
    AvroSource.writeAvro(docs, path)
    val back = AvroSource.readAvro(spark, path)
    // parallel write produced multiple splittable container part files
    val parts = new java.io.File(path).listFiles().count(_.getName.endsWith(".avro"))
    assert(parts == 3)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("events NTZ timestamps survive the local-timestamp-micros mapping exactly") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d).limit(200)
    val path = tmp("events")
    AvroSource.writeAvro(ev, path)
    val back = AvroSource.readAvro(spark, path)
    assert(back.schema("ts").dataType == ev.schema("ts").dataType)
    assert(back.collect().map(_.toSeq).toSet == ev.collect().map(_.toSeq).toSet)
  }

  test("reads container files written by the plain Avro library (cross-writer compat)") {
    val schema = AvroSource.toAvroSchema(StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true))), "row")
    val path = tmp("plain")
    new java.io.File(path).mkdirs()
    val f = new java.io.File(path, "part-0.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    w.append(new GenericRecordBuilder(schema).set("k", 1L).set("v", "a").build())
    w.append(new GenericRecordBuilder(schema).set("k", 2L).set("v", null).build())
    w.close()
    val back = AvroSource.readAvro(spark, path).collect().sortBy(_.getLong(0))
    assert(back.map(_.toSeq).toSeq == Seq(Seq(1L, "a"), Seq(2L, null)))
  }
}
