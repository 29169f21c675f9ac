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

  test("real ImageIO decode: true dimensions + m04 near-dup recovery on decoded pixels") {
    import spark.implicits._
    // Deterministic per-id pseudo-random 24x24 RGB images, encoded as
    // REAL byte streams (ImageIO.write) — the payloads a production
    // asset table would hold. Every id % 5 == 0 gets a near-duplicate
    // copy re-hosted the way mirrors actually re-host: ONE pixel's red
    // channel nudged by +8 AND the container changed (PNG -> BMP).
    // Visually identical, byte-stream structurally unrelated
    // (compressed DEFLATE vs raw bitmap) — the case byte-form aHash
    // CANNOT catch and decoded-pixel aHash must.
    val side = 24
    def pix(id: Long, x: Int, y: Int): Int = {
      var z = id * 1000003L + y * 131L + x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffffffL).toInt
    }
    def encoded(id: Long, perturb: Boolean, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until side; x <- 0 until side) img.setRGB(x, y, pix(id, x, y))
      if (perturb) {
        val rgb = img.getRGB(3, 3)
        val r = math.min(255, ((rgb >> 16) & 0xff) + 8)
        img.setRGB(3, 3, (r << 16) | (rgb & 0xffff))
      }
      val bo = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bo), s"no JDK $fmt writer")
      bo.toByteArray
    }
    val n = 30L
    val offset = 1000000L
    val plantedIds = (0L until n).filter(_ % 5 == 0)
    val assets = ((0L until n).map(id => (id, encoded(id, perturb = false, "png"))) ++
      plantedIds.map(id => (id + offset, encoded(id, perturb = true, "bmp"))))
      .toDF("asset_id", "payload")

    // 1) the decoderFactory seam with the REAL codec: true dimensions out
    val feats = Multimodal.extractFeatures(spark, assets,
      Multimodal.imageIoDecoderFactory _).collect()
    assert(feats.nonEmpty && feats.forall(r =>
      r.getInt(2) == side && r.getInt(3) == side))
    // the stored bytes are a real compressed PNG stream, not raw pixels
    assert(feats.forall(r => r.getInt(1) != side * side * 3))
    // an undecodable payload degrades to (0,0), never throws
    val junk = Seq((99L, "not a png".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val jf = Multimodal.extractFeatures(spark, junk,
      Multimodal.imageIoDecoderFactory _).collect().head
    assert(jf.getInt(2) == 0 && jf.getInt(3) == 0)

    // 2) the EXISTING m04 band/join/confirm chain over TRUE pixels: the
    // perturbed re-encodes land within the Hamming gate, nothing else does
    val fp = Multimodal.perceptualHashes(assets, Multimodal.imageIoGrayPixels _)
    val pairs = Multimodal.phashPairsOf(fp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = plantedIds.map(id => (id, id + offset)).toSet
    planted.foreach(p => assert(pairs.contains(p), s"missed planted near-dup $p"))
    assert(pairs == planted, s"false positives: ${pairs -- planted}")

    // 3) and the byte-form aHash over the SAME assets genuinely cannot
    // see them (a PNG stream and a BMP stream of the same pixels share
    // nothing structurally) — the measured justification for decoding
    // before hashing
    val bytePairs = Multimodal.phashPairsOf(
      Multimodal.perceptualHashes(assets)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.forall(!bytePairs.contains(_)),
      "byte-form aHash saw a re-encoded pair — perturbation too weak to prove the decode matters")
  }

  test("real audio decode (javax.sound.sampled): true channels/rate/duration from WAV bytes") {
    import spark.implicits._
    // real PCM WAV streams via the JDK's own encoder (AudioSystem.write),
    // varied in the three dimensions a curation gate filters on
    def wav(id: Long): Array[Byte] = {
      val channels = if (id % 2 == 0) 1 else 2
      val rate = if (id % 3 == 0) 8000f else 16000f
      val nFrames = 200 + (id * 37 % 400).toInt
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      var i = 0
      while (i < pcm.length) { pcm(i) = ((id * 131 + i * 7) % 256 - 128).toByte; i += 1 }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bo = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bo)
      bo.toByteArray
    }
    val ids = 0L until 12L
    val assets = ids.map(id => (id, wav(id))).toDF("asset_id", "payload")
    val feats = Multimodal.extractFeatures(spark, assets,
      Multimodal.audioWavDecoderFactory _)
      .orderBy("asset_id").collect()
    assert(feats.length == ids.length)
    feats.zip(ids).foreach { case (r, id) =>
      val expChannels = if (id % 2 == 0) 1 else 2
      val expRate = if (id % 3 == 0) 8000 else 16000
      val nFrames = 200 + (id * 37 % 400).toInt
      assert(r.getInt(2) == expChannels, s"channels wrong for $id")
      assert(r.getInt(3) == expRate, s"rate wrong for $id")
      assert(r.getLong(4) == (nFrames * 1000L) / expRate,
        s"duration wrong for $id: ${r.getLong(4)}")
    }
    // undecodable payload degrades to zeros, never throws
    val junk = Seq((99L, Array.fill[Byte](64)(3))).toDF("asset_id", "payload")
    val jf = Multimodal.extractFeatures(spark, junk,
      Multimodal.audioWavDecoderFactory _).collect().head
    assert(jf.getInt(2) == 0 && jf.getInt(3) == 0 && jf.getLong(4) == 0L)
  }

  test("a real external codec (java.util.zip) drops into the mapPartitions decode seam") {
    // The stub kernels are documented stand-ins; the claim they stand in
    // FOR is that the seam — per-partition codec init, per-payload decode,
    // fixed output schema — holds for a genuinely external library. Prove
    // it with a real one available in the JRE: payloads are DEFLATE-
    // compressed, and the decoder is a STATEFUL java.util.zip.Inflater
    // created once per partition (the factory slot) and reset per row —
    // exactly how a JNI image/audio codec would ride here. Features from
    // inflate-then-measure over the compressed corpus must equal the stub
    // features over the original corpus (dims/duration are functions of
    // the decoded bytes), while n_bytes prices the stored (compressed)
    // payload.
    val deflate = udf { (b: Array[Byte]) =>
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val orig = Multimodal.assets(spark, sf)
    val compressed = orig.withColumn("payload", deflate(col("payload")))
    val got = Multimodal.extractFeatures(spark, compressed,
      ZipCodecSeam.inflaterDecoder _)
      .orderBy("asset_id").collect()
    val expect = Multimodal.extractFeatures(spark, orig)
      .orderBy("asset_id").collect()
    assert(got.length == expect.length && got.nonEmpty)
    got.zip(expect).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      // decoded-byte features identical; stored size is the compressed one
      assert(g.getInt(2) == e.getInt(2), s"width diverged for asset ${g.getLong(0)}")
      assert(g.getInt(3) == e.getInt(3))
      assert(g.getLong(4) == e.getLong(4))
    }
    // compression genuinely changed the stored bytes (the decode was real,
    // not an identity pass-through)
    assert(got.count(g => g.getInt(1) !=
      expect.find(_.getLong(0) == g.getLong(0)).get.getInt(1)) > got.length / 2)
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

  test("assetsFromFiles: raw files flow through the binaryFile source into the feature kernel") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val payloads = Map("clip1.mp4" -> Array.fill[Byte](64)(3),
      "clip2.MP4" -> Array.fill[Byte](128)(5), "img.png" -> Array.fill[Byte](32)(7))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes) }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"), Array[Byte](1))

    // glob prunes to the media files; the frame carries the canonical schema
    val a = Multimodal.assetsFromFiles(spark, dir, glob = Some("*.{mp4,MP4,png}"))
    assert(a.schema.fieldNames.toSeq == Multimodal.assetSchema.fieldNames.toSeq)
    val rows = a.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).distinct.length == 3)     // path-hash ids unique
    assert(rows.map(_.getString(1)).toSet == Set("mp4", "png")) // extension lowercased

    // and the SAME frame feeds extractFeatures' decoder seam end-to-end:
    // n_bytes prices the raw file sizes the loader delivered
    val feat = Multimodal.extractFeatures(spark, a).collect()
      .map(r => r.getInt(1)).sorted.toSeq
    assert(feat == Seq(32, 64, 128))

    // extension parsing anchors to the LAST path segment: extensionless
    // files fall back to "bin" instead of surfacing a path fragment
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "noext"), Array[Byte](9))
    val types = Multimodal.assetsFromFiles(spark, dir).collect()
      .map(_.getString(1)).toSet
    assert(types == Set("mp4", "png", "txt", "bin"))
  }

  test("stubResize preserves aspect and bounds the long side") {
    assert(Multimodal.stubResize(1920, 1080, 256) == (256, 144))
    assert(Multimodal.stubResize(100, 50, 256) == (100, 50))
    assert(Multimodal.stubResize(0, 10, 256) == (0, 0))
    val (w, h) = Multimodal.stubResize(4000, 3000, 512)
    assert(math.max(w, h) == 512 && math.abs(w * 3000 - h * 4000) <= 4000)
  }

  // ------------------------------------------------ m06 CDC chunking
  test("m06 resync: a prefix-shifted copy re-shares almost all chunks; fixed blocks share none") {
    import spark.implicits._
    // deterministic varied payload, ~2 KB
    val base = (0 until 400).map(i => s"w${i * 37 % 101}x${i}").mkString(" ")
    val shifted = "PREFIX-INSERTED-BYTES " + base
    val a = Seq((1L, base), (2L, shifted))
      .toDF("asset_id", "text")
      .select(col("asset_id"), lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
    val ch = Multimodal.cdcChunksOf(a).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val hA = ch.filter(_._1 == 1L).map(_._2).toSet
    val hB = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = (hA & hB).size.toDouble / hA.size
    assert(shared >= 0.8,
      s"content-defined boundaries must re-synchronize after the insert: shared=$shared")
    // the contrast: fixed 64-byte blocks of the same two payloads share ~0
    def blocks(s: String): Set[String] =
      s.getBytes("UTF-8").grouped(64).map(b => new String(b.map(_.toChar))).toSet
    val fixedShared = (blocks(base) & blocks(shifted)).size.toDouble / blocks(base).size
    assert(fixedShared < 0.1,
      s"fixed-size blocking mis-aligns forever after an insert: $fixedShared")
  }

  test("m06 kernel equals the built-in HOF reference row-for-row") {
    val a = Multimodal.assets(spark, "/root/testdata/sf0.001")
    val viaKernel = Multimodal.cdcChunksOf(a)
      .orderBy("asset_id", "h", "l").collect().map(_.toString).toSeq
    val viaHofs = Multimodal.cdcChunksReference(a)
      .orderBy("asset_id", "h", "l").collect().map(_.toString).toSeq
    assert(viaKernel == viaHofs)
  }

  test("m06 stats are internally consistent and detect the corpus's duplicate docs") {
    val row = Multimodal.cdcChunkStats(spark, "/root/testdata/sf0.001").collect().head
    val (nChunks, nDistinct) = (row.getLong(2), row.getLong(3))
    val (bytesTotal, bytesDistinct) = (row.getLong(4), row.getLong(5))
    assert(nDistinct <= nChunks && bytesDistinct <= bytesTotal)
    assert(row.getLong(6) == (nChunks - nDistinct) * 1000000L / nChunks)
    assert(row.getLong(7) == (bytesTotal - bytesDistinct) * 1000000L / bytesTotal)
    assert(nDistinct < nChunks, "the fixture corpus plants duplicate docs — dedup must be visible")
  }
}

/** A REAL external codec for the extractFeatures seam test: top-level
  * object (not an inner class of the suite) so the closure serializes
  * without dragging the ScalaTest instance along — the same constraint a
  * production JNI codec wrapper lives under.
  */
object ZipCodecSeam extends Serializable {
  /** Per-partition factory: one stateful Inflater, reset per payload. */
  def inflaterDecoder(): Array[Byte] => (Int, Int, Long) = {
    val inf = new java.util.zip.Inflater()
    payload =>
      if (payload == null) (0, 0, 0L)
      else {
        inf.reset()
        inf.setInput(payload)
        val out = new java.io.ByteArrayOutputStream(payload.length * 2)
        val buf = new Array[Byte](4096)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          // a truncated/corrupt stream would spin: fail loudly instead
          require(n > 0 || inf.finished() || !inf.needsInput(),
            "inflater stalled — corrupt payload")
          out.write(buf, 0, n)
        }
        Multimodal.stubDecode(out.toByteArray)
      }
  }

}
