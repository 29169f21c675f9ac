package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Debezium/Connect logical-type decoders — the reference's scalar-function
  * library re-expressed as pure `Column => Column` functions.
  *
  * Semantics follow the reference consumer (zokypesch/etl-consumer):
  *   - decimal:        main.go:224-258 (base64 → big-endian two's-complement
  *                     unscaled int → /10^scale; bad base64 ⇒ 0)
  *   - date:           main.go:259-264 (epoch days → date)
  *   - timestamp:      main.go:265-276 (epoch millis; optional -7h shift)
  *   - micro-time:     main.go:277-287 (µs since midnight → "H:m:s", no pad)
  *   - zoned ts:       main.go:289-297 (strip T/Z when date-shaped, +7h)
  *   - bool:           main.go:301-308 (true→1, false→0)
  *
  * Everything except the decimal decode is Spark built-ins (codegen'd). The
  * decimal decode needs two's-complement bytes→BigDecimal, which no built-in
  * expresses; it is a Scala UDF (not on any benchmark hot path).
  */
object Decoders {

  /** Two's-complement big-endian unscaled bytes → BigDecimal at `scale`.
    * `java.math.BigInteger(byte[])` implements exactly Debezium's encoding
    * (including the negative path the reference hand-rolls at main.go:231-240).
    */
  def decodeUnscaledBytes(bytes: Array[Byte], scale: Int): JBigDecimal =
    if (bytes == null || bytes.isEmpty) JBigDecimal.ZERO.setScale(scale)
    else new JBigDecimal(new BigInteger(bytes), scale)

  /** Strict base64 → BigDecimal at `scale`; any malformed input ⇒ 0 at
    * `scale`, reproducing the reference's error path (main.go:226-228).
    * Spark's `unbase64` is a lenient MIME decoder (decodes garbage, throws on
    * dangling units), so the strict `java.util.Base64` decode happens inside
    * the UDF on the raw string.
    */
  def decodeBase64Decimal(b64: String, scale: Int): JBigDecimal =
    if (b64 == null) null
    else
      try decodeUnscaledBytes(java.util.Base64.getDecoder.decode(b64), scale)
      catch { case _: IllegalArgumentException => JBigDecimal.ZERO.setScale(scale) }

  /** C1 `decodeDecimal`: base64 string column → DecimalType(38, scale).
    * Typed UDF (Spark 4 rejects the untyped API); its inferred return type
    * is DecimalType(38,18), which silently truncates scales > 18 — hence
    * the explicit scale <= 18 guard (Debezium's MySQL decimals are ≤ 30,2
    * in practice; widen via a second UDF if ever needed).
    */
  def debeziumDecimal(b64: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 18, s"decimal scale out of range (0..18): $scale")
    val fn = udf((s: String) => decodeBase64Decimal(s, scale))
    fn.apply(b64).cast(DecimalType(38, scale))
  }

  /** Reference-compat rendering: `%.2f` of the decoded decimal (main.go:257). */
  def debeziumDecimalCompat(b64: Column, scale: Int): Column =
    format_string("%.2f", debeziumDecimal(b64, scale).cast("double"))

  /** C2 `decodeDate`: int days since 1970-01-01 → DateType. */
  def debeziumDate(days: Column): Column =
    date_add(to_date(lit("1970-01-01")), days.cast("int"))

  /** C3 `decodeTimestamp`: epoch millis → TimestampType; the reference
    * subtracts a hardcoded 7h when WithTimezone (main.go:270-274) — here the
    * shift is a parameter (SURVEY §7.3 timezone-quirk decision).
    */
  def debeziumTimestamp(millis: Column, shiftHours: Int = 0): Column = {
    val ts = timestamp_millis(millis.cast("long"))
    if (shiftHours == 0) ts
    else ts + expr(s"INTERVAL $shiftHours HOURS")
  }

  /** C4 `decodeMicroTime`: µs since midnight → "H:m:s" (no zero padding,
    * hour floored — main.go:285-287). Time-of-day has no Spark type; the
    * reference renders a string, so do we.
    */
  def debeziumMicroTime(micros: Column): Column = {
    val c = micros.cast("long")
    val h = floor(c / 3600000000L).cast("long")
    val m = (floor(c / 60000000L) % 60).cast("long")
    val s = (floor(c / 1000000L) % 60).cast("long")
    concat_ws(":", h, m, s)
  }

  /** Date-shape gate used by the zoned-timestamp decoder (main.go:212). */
  val dateRegex = "((19|20)\\d\\d)-(0?[1-9]|1[012])-(0?[1-9]|[12][0-9]|3[01])"

  /** C5 `decodeZonedTimestamp`: ISO-8601 string → TimestampType. Reference:
    * if date-shaped, strip 'T'/'Z', parse "yyyy-MM-dd HH:mm:ss", add +7h
    * (main.go:289-297). Shift is a parameter here. `try_to_timestamp` (not
    * `to_timestamp`) so one malformed CDC row yields null instead of failing
    * the whole job under ANSI mode — documented divergence from the
    * reference's Go zero-time (0001-01-01) fallback, which is useless
    * downstream anyway.
    */
  def debeziumZonedTimestamp(iso: Column, shiftHours: Int = 7): Column = {
    val cleaned = when(iso.rlike(dateRegex),
      trim(regexp_replace(regexp_replace(iso, "T", " "), "Z", "")))
      .otherwise(iso)
    val ts = try_to_timestamp(cleaned)
    if (shiftHours == 0) ts else ts + expr(s"INTERVAL $shiftHours HOURS")
  }

  /** C6 `boolToInt`: true→1, false→0 (main.go:301-308). */
  def boolToInt(b: Column): Column = b.cast("int")

  /** C7 float normalization — Spark types make this a cast. */
  def floatNormalize(c: Column): Column = c.cast("double")
}
