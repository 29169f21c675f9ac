package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: schema contracts, mapPartitions batch shape, and
  * the deterministic stub kernels (decode / resize / frame-sample).
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("assets carry the canonical schema and real payload bytes") {
    val a = Multimodal.assets(spark, sf)
    assert(a.schema.fieldNames.toSeq ==
      Multimodal.assetSchema.fieldNames.toSeq)
    val r = a.orderBy("asset_id").select("asset_id", "payload").first()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("extractFeatures matches a driver-side application of the stub") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.assets(spark, sf))
      .orderBy("asset_id").collect()
    val raw = Multimodal.assets(spark, sf)
      .orderBy("asset_id").select("asset_id", "payload").collect()
    assert(feats.length == raw.length)
    feats.zip(raw).foreach { case (f, r) =>
      val payload = r.getAs[Array[Byte]]("payload")
      val (w, h, dur) = Multimodal.stubDecode(payload)
      assert(f.getInt(f.fieldIndex("n_bytes")) == payload.length)
      assert(f.getInt(f.fieldIndex("width")) == w)
      assert(f.getInt(f.fieldIndex("height")) == h)
      assert(f.getLong(f.fieldIndex("duration_ms")) == dur)
    }
  }

  test("sampleFrames emits exact payload slices at the sampling stride") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.assets(spark, sf))
      .collect().groupBy(_.getLong(0))
    val raw = Multimodal.assets(spark, sf)
      .select("asset_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(frames.nonEmpty)
    frames.foreach { case (id, fs) =>
      val payload = raw(id)
      fs.foreach { f =>
        val idx = f.getInt(1)
        assert(idx % 4 == 0)
        val expected = java.util.Arrays.copyOfRange(payload, idx * 64, (idx + 1) * 64)
        assert(java.util.Arrays.equals(f.getAs[Array[Byte]](2), expected))
        assert(f.getInt(3) == 64)
      }
      // dense sampled index set: 0, 4, ..., 4*(k-1)
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.toSeq == idxs.indices.map(_ * 4))
    }
  }

  test("m04: every planted perturbed copy is recovered by the banded phash join") {
    val d = "/root/testdata/sf0.01"
    val pairs = Multimodal.phashNearDupPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val plantedIds = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % Multimodal.PHASH_PLANT_EVERY === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.nonEmpty)
    // each planted (original, copy) pair must be found, within the gate
    plantedIds.foreach { id =>
      val hit = pairs.find(p =>
        p._1 == id && p._2 == id + Multimodal.PHASH_PLANT_OFFSET)
      assert(hit.isDefined, s"planted pair for $id missed")
      assert(hit.get._3 <= Multimodal.PHASH_MAX_HAMMING)
    }
    // and nothing beyond the Hamming gate leaks through
    pairs.foreach(p => assert(p._3 <= Multimodal.PHASH_MAX_HAMMING))
  }

  test("perceptualHash: identical payloads collide, a one-byte edit stays near") {
    val bytes = Array.tabulate(600)(i => ((i * 37 + 11) % 251).toByte)
    val same = Multimodal.perceptualHash(bytes.clone())
    assert(same == Multimodal.perceptualHash(bytes))
    val edited = bytes.clone(); edited(0) = 'X'.toByte
    val ham = java.lang.Long.bitCount(same ^ Multimodal.perceptualHash(edited))
    assert(ham <= Multimodal.PHASH_MAX_HAMMING, s"one-byte edit moved $ham bits")
    assert(Multimodal.perceptualHash(Array.emptyByteArray) == 0L)
    assert(Multimodal.perceptualHash(null) == 0L)
  }

  test("m05: a planted full copy shares every frame with its original, both fully marked") {
    val d = "/root/testdata/sf0.01"
    val out = Multimodal.frameDedupStats(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val planted = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % Multimodal.FRAME_PLANT_EVERY === 0
        && octet_length(col("text")) >= 64)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val orig = out(id)
      val copy = out(id + Multimodal.PHASH_PLANT_OFFSET)
      // identical payloads -> identical frame counts, all frames shared
      assert(orig._1 == copy._1)
      assert(orig == ((orig._1, orig._1, 1000L)), s"original $id: $orig")
      assert(copy == ((copy._1, copy._1, 1000L)), s"copy of $id: $copy")
    }
  }

  test("stubResize preserves aspect and bounds the long side") {
    assert(Multimodal.stubResize(1920, 1080, 256) == (256, 144))
    assert(Multimodal.stubResize(100, 50, 256) == (100, 50))
    assert(Multimodal.stubResize(0, 10, 256) == (0, 0))
    val (w, h) = Multimodal.stubResize(4000, 3000, 512)
    assert(math.max(w, h) == 512 && math.abs(w * 3000 - h * 4000) <= 4000)
  }
}
