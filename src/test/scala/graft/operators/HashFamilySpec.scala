package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** Property-pins the cross-engine hash family (Dedup.baseHash / seedA /
  * seedB) against a pure-JVM model of what BOTH engines compute:
  * first 15 lowercase-hex chars of md5(utf8 bytes) parsed base-16, then
  * the affine family ((a*h + b) mod p) in plain int64 arithmetic.
  *
  * Every LSH/SimHash oracle depends on Spark's `conv(substring(md5(x),
  * 1, 15), 16, 10)` meaning exactly this model (it is also what DuckDB's
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` computes) — so a
  * Spark upgrade that changes `conv`, `substring`, or `md5` semantics
  * must fail HERE, in a unit test, before a driver run ever sees it.
  */
class HashFamilySpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def modelBaseHash(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  private def modelMember(i: Int, hm: Long): Long =
    (Dedup.seedA(i) * hm + Dedup.seedB(i)) % Dedup.HASH_P

  // deterministic scalacheck sample: printable ascii, unicode, whitespace
  // runs, and degenerate edges — one DataFrame pass for all of them
  private lazy val samples: Seq[String] = {
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(8, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', 'é', '中', '☃'))).map(_.mkString),
      Gen.chooseNum(0, 1000).map(n => "tok " * (n % 7) + n)))
    val fixed = Seq("", " ", "  ", "a", "terms of service", "\u0000", "é中🎈")
    fixed ++ gen.apply(Gen.Parameters.default, rng.Seed(42L)).get.distinct
  }

  test("baseHash equals the 15-hex-digit md5 model on arbitrary strings") {
    val rows = samples.toDF("s")
      .select(col("s"), Dedup.baseHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { case (s, h) =>
      assert(h == modelBaseHash(s), s"baseHash mismatch for ${s.take(40)}")
    }
  }

  test("Md5Prefix60 equals the built-in conv(substring(md5)) chain, both eval paths") {
    // codegen path: the custom expression vs the chain it replaced
    val rows = samples.toDF("s")
      .select(Dedup.baseHash(col("s")).as("h"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // interpreted path (no codegen): Literal eval must agree with the model
    samples.take(20).foreach { s =>
      val got = graft.expressions.Md5Prefix60(
        org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null)
      assert(got == modelBaseHash(s), s"interpreted mismatch for ${s.take(40)}")
    }
    // null in → null out (nullIntolerant)
    val n = Seq[Option[String]](None).toDF("s")
      .select(Dedup.baseHash(col("s")).as("h")).collect()
    assert(n.head.isNullAt(0))
    // binary input path (md5 is defined over bytes; strings implicit-cast)
    val b = samples.take(10).map(_.getBytes("UTF-8")).toDF("b")
      .select(Dedup.baseHash(col("b")).as("h"),
        conv(substring(md5(col("b")), 1, 15), 16, 10).cast("long").as("ref"))
      .collect()
    b.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("affine family members match the int64 model and stay in [0, p)") {
    val members = Seq(0, 7, 31)
    val cols = members.map(i =>
      ((lit(Dedup.seedA(i)) * (Dedup.baseHash(col("s")) % Dedup.HASH_P) +
        lit(Dedup.seedB(i))) % Dedup.HASH_P).as(s"m$i"))
    val rows = samples.toDF("s").select(col("s") +: cols: _*).collect()
    rows.foreach { r =>
      val hm = modelBaseHash(r.getString(0)) % Dedup.HASH_P
      members.zipWithIndex.foreach { case (i, j) =>
        val got = r.getLong(j + 1)
        assert(got == modelMember(i, hm), s"member $i mismatch for ${r.getString(0).take(40)}")
        assert(got >= 0 && got < Dedup.HASH_P)
      }
    }
  }

  test("seeds are distinct and in range across the whole signature") {
    val as = (0 until Dedup.SIG_N).map(Dedup.seedA)
    val bs = (0 until Dedup.SIG_N).map(Dedup.seedB)
    assert(as.distinct.size == Dedup.SIG_N)
    assert(bs.distinct.size == Dedup.SIG_N)
    assert((as ++ bs).forall(x => x >= 0 && x < Dedup.HASH_P))
  }
}
