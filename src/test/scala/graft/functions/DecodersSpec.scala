package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-vector tests for the C1–C7 Debezium logical-type decoders,
  * pinning the reference semantics (main.go:205-346) including the
  * malformed-input paths from ADVICE.
  */
class DecodersSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("C1 decimal: positive two's-complement") {
    // base64([0x30,0x39]) = "MDk=" -> 12345, scale 2 -> 123.45
    val df = Seq("MDk=").toDF("b64").select(Decoders.debeziumDecimal(col("b64"), 2))
    assert(one[JBigDecimal](df).compareTo(new JBigDecimal("123.45")) == 0)
  }

  test("C1 decimal: negative two's-complement (main.go:231-240 path)") {
    // base64([0xcf,0xc7]) = "z8c=" -> -12345, scale 2 -> -123.45
    val df = Seq("z8c=").toDF("b64").select(Decoders.debeziumDecimal(col("b64"), 2))
    assert(one[JBigDecimal](df).compareTo(new JBigDecimal("-123.45")) == 0)
  }

  test("C1 decimal: malformed base64 => 0 (main.go:226-228), incl. dangling unit") {
    for (bad <- Seq("!!!garbage!!!", "A", "====", "ab!cd")) {
      val df = Seq(bad).toDF("b64").select(Decoders.debeziumDecimal(col("b64"), 2))
      assert(one[JBigDecimal](df).compareTo(JBigDecimal.ZERO) == 0, s"input: $bad")
    }
  }

  test("C1 decimal: null stays null; empty bytes => 0") {
    val dfNull = Seq[(String, Int)](((null: String), 1)).toDF("b64", "i")
      .select(Decoders.debeziumDecimal(col("b64"), 2))
    assert(dfNull.collect().head.isNullAt(0))
    val dfEmpty = Seq("").toDF("b64").select(Decoders.debeziumDecimal(col("b64"), 2))
    assert(one[JBigDecimal](dfEmpty).compareTo(JBigDecimal.ZERO) == 0)
  }

  test("C1 decimal: scale > 18 rejected explicitly (ADVICE truncation trap)") {
    intercept[IllegalArgumentException] {
      Decoders.debeziumDecimal(col("x"), 20)
    }
  }

  test("C1 property: BigDecimal -> Debezium base64 -> decode round-trip (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val unscaled = rnd.nextLong() / 1000
      val scale = rnd.nextInt(7)
      val bytes = java.math.BigInteger.valueOf(unscaled).toByteArray
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
      val expected = new JBigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
      val got = Decoders.decodeBase64Decimal(b64, scale)
      assert(got.compareTo(expected) == 0, s"unscaled=$unscaled scale=$scale")
    }
  }

  test("C2 date: day 0 and arbitrary day") {
    val df = Seq(0, 100, 19000).toDF("d").select(Decoders.debeziumDate(col("d")))
    assert(df.collect().map(_.get(0).toString).toSeq ==
      Seq("1970-01-01", "1970-04-11", "2022-01-08"))
  }

  test("C3 timestamp: epoch millis, optional shift") {
    val df = Seq(1587202401764L).toDF("ms")
      .select(Decoders.debeziumTimestamp(col("ms")).cast("string"),
        Decoders.debeziumTimestamp(col("ms"), -7).cast("string"))
    val r = df.collect().head
    assert(r.getString(0) == "2020-04-18 09:33:21.764")
    assert(r.getString(1) == "2020-04-18 02:33:21.764")
  }

  test("C4 micro-time: no zero pad, floored hour (main.go:285-287)") {
    val df = Seq(45296000000L, 3661000000L, 0L, 59000000L).toDF("us")
      .select(Decoders.debeziumMicroTime(col("us")))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("12:34:56", "1:1:1", "0:0:0", "0:0:59"))
  }

  test("C5 zoned timestamp: strip T/Z + shift; garbage => null (not job failure)") {
    val df = Seq("2020-04-18T08:54:10Z", "not-a-date").toDF("iso")
      .select(Decoders.debeziumZonedTimestamp(col("iso"), 7).cast("string"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "2020-04-18 15:54:10")
    assert(rows(1).isNullAt(0))
  }

  test("C6 bool to int") {
    val df = Seq(true, false).toDF("b").select(Decoders.boolToInt(col("b")))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }

  test("C1 compat rendering: %.2f truncation quirk (main.go:257)") {
    val df = Seq("MDk=").toDF("b64")
      .select(Decoders.debeziumDecimalCompat(col("b64"), 2))
    assert(df.collect().head.getString(0) == "123.45")
  }

  test("C7 float normalization is a double cast") {
    val df = Seq(("1.5", 2.0f)).toDF("s", "f")
      .select(Decoders.floatNormalize(col("f")))
    assert(df.collect().head.getDouble(0) == 2.0)
  }
}
