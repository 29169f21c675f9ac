package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, with the decode/feature steps as per-partition batch
  * transforms.
  *
  * The actual image/audio codecs are NOT in this environment, so the decode
  * kernel is a clearly-marked deterministic stub — but everything Spark
  * cares about is real and tested: the schema contract, the binary column
  * handling, the mapPartitions batch shape (the Scala analogue of
  * `mapInPandas`: one iterator in, one iterator out, arrow-sized batches),
  * and the partitioning. Swapping the stub for a real JNI/ffmpeg decoder
  * changes zero plan structure.
  *
  * Scale notes: media blobs never enter a shuffle here — metadata extraction
  * is a narrow map; downstream joins should carry (asset_id, features), not
  * bytes. Feature extraction parallelism = input partitions.
  */
object Multimodal {

  /** Canonical media-asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  /** Documents → synthetic media assets (text bytes as the opaque payload).
    * Stand-in for `spark.read.format("binaryFile")` at 100 TB.
    */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(null).cast(IntegerType).as("meta_width"),
      lit(null).cast(IntegerType).as("meta_height"),
      lit(null).cast(LongType).as("meta_duration_ms"))

  /** The REAL file-ingest face the Scaladoc above stands in for: a
    * directory of raw media files → the canonical asset frame, via the
    * binaryFile source ([[graft.sources.FileSources.readBinaryFiles]] —
    * listing-time glob pruning, metadata filter pushdown, content never
    * decoded in the source). asset_id is the 60-bit md5 of the file path
    * — stable across re-listings and join-safe as a long; media_type is
    * the lowercased extension; metadata stays null until a codec fills it
    * through [[extractFeatures]]'s decoder seam.
    */
  def assetsFromFiles(s: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    // extension = trailing dot-run of the LAST path segment only — a
    // naive split('.').last would surface directory fragments for
    // dotted dirs (/data.v2/clip) or the whole URI for extensionless
    // files; no match falls back to "bin"
    val ext = lower(regexp_extract(col("path"), "\\.([^./\\\\]+)$", 1))
    graft.sources.FileSources.readBinaryFiles(s, dir, glob).select(
      Dedup.baseHash(col("path")).as("asset_id"),
      when(ext === "", lit("bin")).otherwise(ext).as("media_type"),
      col("content").as("payload"),
      lit(null).cast(IntegerType).as("meta_width"),
      lit(null).cast(IntegerType).as("meta_height"),
      lit(null).cast(LongType).as("meta_duration_ms"))
  }

  /** STUB decode kernel — deterministic fake standing in for an image/audio
    * decoder. Real implementation would decode `payload` (JPEG/PNG/WAV…)
    * and emit true dimensions; this derives them from byte statistics so
    * tests pin the plumbing. Marked prominently per the build contract.
    * A REAL decoder for the same seam exists: [[imageIoDecoderFactory]]
    * (JDK javax.imageio, true dimensions from actual PNG/BMP/GIF/JPEG
    * payloads); the stub stays the default because the synthetic corpus
    * payloads are UTF-8 text, which only the fake can "decode".
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Long) = {
    // ??? real codec goes here — deterministic fake below
    if (payload == null) (0, 0, 0L)
    else {
      val n = payload.length
      val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      (n % 1920, (n / 2) % 1080, sum % 100000L)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Batch feature extraction: mapPartitions (iterator-in/iterator-out, the
    * Scala analogue of mapInPandas) so a real decoder can amortize codec
    * init per partition, not per row.
    *
    * `decoderFactory` IS the codec seam: invoked ONCE per partition (the
    * codec-init slot), it returns the per-payload decode function. The
    * default wires [[stubDecode]]; MultimodalSpec drops a genuinely
    * external library (java.util.zip's Inflater, stateful and reused
    * across the partition's rows) into the same slot to prove the
    * iterator/schema contract holds beyond the stub.
    */
  def extractFeatures(s: SparkSession, assets: DataFrame,
      decoderFactory: () => Array[Byte] => (Int, Int, Long) =
        () => stubDecode): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      val decode = decoderFactory() // codec init, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, dur) = decode(payload)
        Row(id, if (payload == null) 0 else payload.length, w, h, dur)
      }
    }(enc)
  }

  /** STUB resize kernel — deterministic fake for an image resampler: maps
    * (w, h) to the target box preserving aspect via integer math. A real
    * implementation would transform `payload`; the contract (pure function
    * of payload+dims, applied per partition) is what the plan depends on.
    */
  def stubResize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    // ??? real resampler goes here — deterministic aspect-fit below
    if (w <= 0 || h <= 0) (0, 0)
    else {
      val side = math.max(w, h)
      if (side <= maxSide) (w, h)
      else (w * maxSide / side, h * maxSide / side)
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true),
    StructField("frame_bytes", IntegerType, nullable = false)))

  /** Frame sampling: every `stride`-th fixed-size window of the payload as
    * one "frame" (the byte-slicing shape of video frame extraction — a
    * real decoder would emit decoded frames; the partitioning, batch
    * iterator, and output schema are identical). mapPartitions so a codec
    * would init once per partition; blobs never shuffle.
    */
  def sampleFrames(s: SparkSession, assets: DataFrame, frameSize: Int = 64,
      stride: Int = 4): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty
        else {
          val nFrames = payload.length / frameSize
          (0 until nFrames by stride).iterator.map { f =>
            val frame = java.util.Arrays.copyOfRange(
              payload, f * frameSize, (f + 1) * frameSize)
            Row(id, f, frame, frame.length)
          }
        }
      }
    }(enc)
  }

  /** Oracle-checkable metadata query: binary payload stats via built-ins
    * only (octet_length / hex prefix), no stub involvement.
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("magic_hex"))
      .orderBy("doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
      |  hex(encode(substring(text, 1, 4))) AS magic_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m03: frame index/size stats per asset — the mapPartitions sampler's
    * output re-aggregated relationally. Frame byte content stays Spark-side
    * (BLOB slicing is not DuckDB-expressible); counts and index sums are
    * oracle-checkable because the slicing arithmetic is deterministic.
    */
  def frameStats(s: SparkSession, d: String): DataFrame =
    sampleFrames(s, assets(s, d))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_idx").cast("long")).as("idx_sum"),
        max(col("frame_bytes")).as("frame_bytes"))
      .orderBy("asset_id")

  val frameStatsSql: String =
    """WITH f AS (SELECT doc_id, strlen(text) // 64 AS nf FROM documents
      |           WHERE strlen(text) >= 64),
      |k AS (SELECT doc_id, nf, (nf - 1) // 4 AS m FROM f)
      |SELECT doc_id AS asset_id,
      |  CAST(m + 1 AS BIGINT) AS n_frames,
      |  CAST(((m * (m + 1)) // 2) * 4 AS BIGINT) AS idx_sum,
      |  64 AS frame_bytes
      |FROM k ORDER BY asset_id""".stripMargin

  /** m02 oracle: the stub decode kernel is pure byte arithmetic
    * (n % 1920, (n/2) % 1080, byte-sum % 100000 over the UTF-8 payload), so
    * DuckDB can reproduce it exactly — byte values come from pairs of hex
    * digits of the encoded payload. This pins the whole mapPartitions
    * plumbing (schema, null handling, per-row kernel application), not just
    * row counts; a real codec would revert m02 to rows-only + scalatest.
    */
  val mediaFeaturesSql: String =
    """WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
      |h AS (SELECT doc_id, hex(p) AS hx, octet_length(p) AS n FROM b),
      |s AS (SELECT doc_id, n,
      |        coalesce(list_sum([CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT)
      |                           FOR i IN range(1, n+1)]), 0) AS bsum
      |      FROM h)
      |SELECT doc_id AS asset_id, CAST(n AS INT) AS n_bytes,
      |  CAST(n % 1920 AS INT) AS width, CAST((n//2) % 1080 AS INT) AS height,
      |  CAST(bsum % 100000 AS BIGINT) AS duration_ms
      |FROM s ORDER BY asset_id""".stripMargin

  // ------------------------------------------------ perceptual-hash dedup
  /** Average-hash ("aHash") perceptual fingerprint over the raw payload:
    * the payload is cut into [[PHASH_BITS]] byte blocks and bit j is set
    * iff block j's mean byte value is >= the payload's global mean —
    * the block-vs-global-luminance comparison of image aHash, applied to
    * bytes (a real pipeline would hash decoded 8×8 grayscale; same
    * contract: pure function of payload, Hamming-comparable). Exact
    * integer compare (blockSum·n >= totalSum·blockLen), no floats, so
    * the DuckDB oracle reproduces it from hex pairs exactly. 60 bits
    * keeps the fingerprint positive in an int64 on both engines (the
    * baseHash convention).
    */
  val PHASH_BITS = 60

  def perceptualHash(payload: Array[Byte]): Long = {
    // ??? real decoded-image aHash goes here — byte-block aHash below
    if (payload == null || payload.length == 0) 0L
    else {
      val n = payload.length
      val sums = new Array[Long](PHASH_BITS)
      val cnts = new Array[Long](PHASH_BITS)
      var tot = 0L
      var i = 0
      while (i < n) {
        val v = (payload(i) & 0xff).toLong
        val j = (i.toLong * PHASH_BITS / n).toInt
        sums(j) += v; cnts(j) += 1; tot += v
        i += 1
      }
      var h = 0L
      var j = 0
      while (j < PHASH_BITS) {
        if (cnts(j) > 0 && sums(j) * n >= tot * cnts(j)) h |= 1L << j
        j += 1
      }
      h
    }
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** (asset_id, phash) via the mapPartitions batch kernel — blobs are
    * consumed where they sit and only 2 longs per asset ever move.
    *
    * `pixelsFactory` is the same once-per-partition codec seam as
    * [[extractFeatures]]' decoderFactory, here producing the byte array
    * the aHash actually folds: the default identity hashes the raw
    * payload (the registered m04 byte-form, oracle-reproducible);
    * [[imageIoGrayPixels]] drops a REAL decoder into the slot so the
    * SAME kernel folds true luminance pixels instead.
    */
  def perceptualHashes(assets: DataFrame,
      pixelsFactory: () => Array[Byte] => Array[Byte] =
        () => (b: Array[Byte]) => b): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      val pixels = pixelsFactory() // codec init, once per partition
      it.map { r =>
        Row(r.getLong(0), perceptualHash(pixels(r.getAs[Array[Byte]](1))))
      }
    }(enc)
  }

  /** m04: near-duplicate media by perceptual-hash Hamming distance — the
    * image-dedup face of the d09 shape (re-encoded/re-hosted copies of
    * one image differ in a few bytes, not in identity): banded pigeonhole
    * candidates (any pair within Hamming [[PHASH_MAX_HAMMING]] < #bands
    * agrees exactly on ≥ 1 of the [[PHASH_BANDS]] 15-bit bands), thin
    * self-join on (band, key), pair-distinct, exact popcount confirm.
    *
    * The synthetic corpus has no byte-level near-identical payloads, so —
    * the d06/d11 pattern — perturbed copies are PLANTED in-query (every
    * asset_id % [[PHASH_PLANT_EVERY]] == 0 reappears at id +
    * [[PHASH_PLANT_OFFSET]] with its first byte overwritten), identically
    * in the oracle; a one-byte change moves the global mean by < 1/4000
    * of a gray level, so only blocks sitting exactly on the mean can
    * flip — planted pairs land within the Hamming gate and exercise the
    * full band/join/confirm chain on real collisions.
    *
    * Scale shape: blobs never shuffle (the kernel folds each payload to
    * one long in place); the band table is (asset_id, band, key) longs;
    * candidates only from equal-(band, key) buckets — sub-quadratic
    * exactly as d09; the confirm re-joins two longs per candidate.
    */
  val PHASH_BANDS = 4
  val PHASH_BAND_BITS = 15
  val PHASH_MAX_HAMMING = 3
  val PHASH_PLANT_EVERY = 41
  val PHASH_PLANT_OFFSET = 1000000000000L

  /** Base + planted perturbed copies (first byte overwritten with 'X'). */
  def assetsWithPlants(s: SparkSession, d: String): DataFrame = {
    val base = assets(s, d)
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % PHASH_PLANT_EVERY === 0)
      .select(
        (col("doc_id") + PHASH_PLANT_OFFSET).as("asset_id"),
        lit("text/plain").as("media_type"),
        encode(concat(lit("X"), expr("substring(text, 2)")), "UTF-8").as("payload"),
        lit(null).cast(IntegerType).as("meta_width"),
        lit(null).cast(IntegerType).as("meta_height"),
        lit(null).cast(LongType).as("meta_duration_ms"))
    base.unionByName(planted)
  }

  def phashNearDupPairs(s: SparkSession, d: String): DataFrame =
    phashPairsOf(perceptualHashes(
      assetsWithPlants(s, d).filter(octet_length(col("payload")) > 0)))

  /** The band/join/confirm chain over an arbitrary (asset_id, phash)
    * frame — shared by the registered m04 (byte-form aHash) and the
    * real-decode pipeline (true-pixel aHash from [[imageIoGrayPixels]]),
    * so swapping the codec cannot change the dedup semantics.
    */
  def phashPairsOf(fp: DataFrame): DataFrame = {
    val banded = fp.select(col("asset_id"), col("phash"),
        explode(sequence(lit(0), lit(PHASH_BANDS - 1))).as("b"))
      .withColumn("key",
        call_function("shiftright", col("phash"),
          (col("b") * lit(PHASH_BAND_BITS)).cast("int"))
          .bitwiseAND(lit((1L << PHASH_BAND_BITS) - 1)))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
    pairs
      .withColumn("hamming",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= PHASH_MAX_HAMMING)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------- real-codec seam: ImageIO
  /** REAL image decode through the codec seam — `javax.imageio` is an
    * actual image library shipped with the JDK (PNG/BMP/GIF/JPEG), so
    * this instantiates [[extractFeatures]]' decoderFactory contract with
    * a true codec at zero external dependencies: per-partition init
    * disables ImageIO's temp-file cache (the codec-init slot the factory
    * exists for), then each payload decodes to its REAL dimensions.
    * Undecodable/empty payloads yield (0, 0, 0) rather than throwing —
    * a corpus-scale decode never dies on one corrupt blob; the caller
    * filters the (0, 0) rows into its quarantine path.
    */
  def imageIoDecoderFactory(): Array[Byte] => (Int, Int, Long) = {
    javax.imageio.ImageIO.setUseCache(false)
    (payload: Array[Byte]) => {
      val img = decodeImage(payload)
      if (img == null) (0, 0, 0L) else (img.getWidth, img.getHeight, 0L)
    }
  }

  /** Decoded row-major grayscale pixels (one byte per pixel, integer
    * BT.601 luminance (299r + 587g + 114b)/1000) — the TRUE-pixel input
    * that turns [[perceptualHash]]'s byte-block aHash into honest image
    * aHash: block mean vs global mean over actual luminance. Plugs into
    * [[perceptualHashes]]' pixelsFactory seam; undecodable payloads
    * yield an empty array (phash 0, filtered upstream like empty
    * payloads in m04).
    */
  def imageIoGrayPixels(): Array[Byte] => Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    (payload: Array[Byte]) => {
      val img = decodeImage(payload)
      if (img == null) Array.emptyByteArray
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
            i += 1
            x += 1
          }
          y += 1
        }
        out
      }
    }
  }

  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    if (payload == null || payload.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }

  /** REAL audio decode through the same seam — `javax.sound.sampled` is
    * the JDK's actual audio library (WAV/AIFF/AU containers): width=
    * channels, height=sample rate (Hz), duration from the frame count —
    * the three numbers an audio curation gate (mono/stereo split,
    * sample-rate floor, length window) filters on. Same degrade-to-zero
    * contract as [[imageIoDecoderFactory]] for undecodable blobs.
    */
  def audioWavDecoderFactory(): Array[Byte] => (Int, Int, Long) = {
    payload =>
      if (payload == null || payload.isEmpty) (0, 0, 0L)
      else {
        var in: javax.sound.sampled.AudioInputStream = null
        try {
          in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val rate = fmt.getFrameRate
          val durMs =
            if (frames >= 0 && rate > 0) (frames * 1000.0 / rate).toLong else 0L
          (fmt.getChannels, fmt.getSampleRate.toInt, durMs)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => (0, 0, 0L)
          case _: java.io.IOException => (0, 0, 0L)
        } finally if (in != null) in.close()
      }
  }

  /** m04 oracle: per-byte block sums from hex pairs (the m02 technique),
    * the same exact-integer bit rule, the same bands and popcount.
    */
  lazy val phashNearDupPairsSql: String =
    s"""WITH b AS (
      |  SELECT doc_id AS asset_id, encode(text) AS p FROM documents
      |  UNION ALL
      |  SELECT doc_id + $PHASH_PLANT_OFFSET, encode('X' || substring(text, 2))
      |  FROM documents WHERE doc_id % $PHASH_PLANT_EVERY = 0),
      |h AS (SELECT asset_id, hex(p) AS hx, octet_length(p) AS n FROM b
      |      WHERE octet_length(p) > 0),
      |by AS (SELECT asset_id, n, i,
      |         CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT) AS v,
      |         ((i-1)*$PHASH_BITS)//n AS blk
      |       FROM h, unnest(range(1, n+1)) r(i)),
      |bs AS (SELECT asset_id, n, blk, sum(v) AS sv, count(*) AS cv
      |       FROM by GROUP BY 1, 2, 3),
      |tt AS (SELECT asset_id, sum(v) AS tot FROM by GROUP BY 1),
      |ph AS (SELECT bs.asset_id,
      |         sum(CASE WHEN sv*n >= tot*cv THEN (CAST(1 AS BIGINT) << blk)
      |             ELSE 0 END) AS phash
      |       FROM bs JOIN tt USING (asset_id) GROUP BY 1),
      |bands AS (SELECT asset_id, phash, k AS band,
      |            (phash >> (k*$PHASH_BAND_BITS)) & ${(1L << PHASH_BAND_BITS) - 1} AS bk
      |          FROM ph, range(0, $PHASH_BANDS) r(k)),
      |cand AS (SELECT DISTINCT a.asset_id AS id_a, b2.asset_id AS id_b,
      |           a.phash AS pa, b2.phash AS pb
      |         FROM bands a JOIN bands b2
      |           ON a.band = b2.band AND a.bk = b2.bk
      |          AND a.asset_id < b2.asset_id)
      |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(pa, pb)) <= $PHASH_MAX_HAMMING
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------- frame-level dedup
  /** m05: cross-asset frame dedup — the video-dedup face of d13's marking
    * shape: a frame (fixed-size payload window from the m03 sampler)
    * that also occurs in ANOTHER asset marks re-used footage (re-uploads,
    * clipped copies, intro/outro templates); per-asset output is the
    * shared-frame damage report. The synthetic corpus has no cross-asset
    * byte-identical frames (documents are unique), so exact copies are
    * PLANTED (every asset_id % [[FRAME_PLANT_EVERY]] == 0 reappears
    * whole), identically in the oracle — a full copy shares ALL its
    * frames, exercising flag + rollup on real collisions.
    *
    * Frames fold to their 60-bit [[Dedup.baseHash]] IN the same stage
    * that slices them (the binary never crosses an exchange), and the
    * cross-asset test is d13's nested count windows — shared iff count
    * over (fh) > count over (fh, asset_id) — so the whole decision rides
    * ONE exchange of (fh, asset_id, frame_idx) longs. The oracle
    * reproduces frame hashes as md5 over char-substrings: the corpus is
    * pure ASCII (verified), so char slices == byte slices; a binary
    * corpus would keep the Spark side unchanged and move the oracle to
    * rows-only.
    */
  val FRAME_PLANT_EVERY = 43

  def frameDedupStats(s: SparkSession, d: String): DataFrame = {
    val base = assets(s, d)
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % FRAME_PLANT_EVERY === 0)
      .select(
        (col("doc_id") + PHASH_PLANT_OFFSET).as("asset_id"),
        lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast(IntegerType).as("meta_width"),
        lit(null).cast(IntegerType).as("meta_height"),
        lit(null).cast(LongType).as("meta_duration_ms"))
    val frames = sampleFrames(s, base.unionByName(planted))
      .select(col("asset_id"), col("frame_idx"),
        Dedup.baseHash(col("frame")).as("fh"))
    val wF = org.apache.spark.sql.expressions.Window.partitionBy(col("fh"))
    val wFA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fh"), col("asset_id"))
    frames
      .withColumn("shared",
        (count(lit(1)).over(wF) > count(lit(1)).over(wFA)).cast("long"))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("shared")).as("n_shared"))
      .select(col("asset_id"), col("n_frames"), col("n_shared"),
        floor(lit(1000.0) * col("n_shared") / col("n_frames"))
          .cast("long").as("shared_permille"))
      .orderBy("asset_id")
  }

  lazy val frameDedupStatsSql: String =
    s"""WITH b AS (
      |  SELECT doc_id AS asset_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $PHASH_PLANT_OFFSET, text FROM documents
      |  WHERE doc_id % $FRAME_PLANT_EVERY = 0),
      |f AS (SELECT asset_id, i AS frame_idx,
      |        CAST(concat('0x', substr(md5(substr(text, i*64 + 1, 64)), 1, 15))
      |          AS BIGINT) AS fh
      |      FROM b, unnest(range(0, strlen(text)//64, 4)) r(i)
      |      WHERE strlen(text) >= 64),
      |m AS (SELECT asset_id,
      |        count(*) OVER (PARTITION BY fh) AS cf,
      |        count(*) OVER (PARTITION BY fh, asset_id) AS cfa
      |      FROM f)
      |SELECT asset_id, count(*) AS n_frames,
      |  CAST(count(*) FILTER (cf > cfa) AS BIGINT) AS n_shared,
      |  CAST(floor(1000.0 * count(*) FILTER (cf > cfa) / count(*)) AS BIGINT)
      |    AS shared_permille
      |FROM m GROUP BY asset_id ORDER BY asset_id""".stripMargin

  // --------------------------------------------- m06 content-defined chunks
  /** Boundary window (bytes) and the boundary rate: a position ends a
    * chunk when the md5-60 of the 8-byte window ending there ≡ 0 mod 64,
    * i.e. expected chunk length ≈ 64 bytes.
    */
  val CDC_WINDOW = 8L
  val CDC_MASK = 64L

  /** m06: content-defined chunking dedup — the STORAGE-side dedup
    * technique for binary assets (LBFS/Rabin; what backup systems and
    * blob stores use): chunk boundaries are a pure function of local
    * CONTENT (a rolling-window hash test), so inserting bytes into an
    * asset shifts only the chunks that contain the edit — boundaries
    * re-synchronize right after it, and every later chunk still
    * deduplicates (fixed-size blocks would mis-align forever; pinned in
    * MultimodalSpec with a planted prefix-shifted copy). Output: per
    * media type, chunk counts, distinct-chunk counts, and the byte-level
    * dedup ratio a content-addressed store would achieve.
    *
    * Implementation is pure built-in HOFs over the asset's hex string
    * (1 byte = 2 ASCII chars, so character slicing is byte-exact in both
    * engines — DuckDB has no BLOB substr/md5): the boundary scan, the
    * chunk slicing, and the chunk fingerprints all happen INSIDE the
    * asset's row. Blobs never enter a shuffle (the m05 discipline); only
    * (media_type, chunk_hash, len) longs reach the exchanges, with
    * map-side combine. A production kernel would swap the per-position
    * md5 for a codegen gear hash — zero plan-structure change.
    */
  def cdcChunkStats(s: SparkSession, d: String): DataFrame =
    cdcChunkStatsOf(assets(s, d))

  /** Per-asset chunk rows (asset_id, media_type, h, l) — the chunk table
    * [[cdcChunkStatsOf]] aggregates. The boundary scan + chunk
    * fingerprints run in the codegen [[graft.expressions.CdcChunks]]
    * kernel (one pass per payload, inside the stage); the built-in-HOF
    * formulation below is the spec-pinned reference (measured 3.7 s →
    * 0.7 s at sf0.1 — the HOF chain paid interpreted lambda dispatch
    * plus a materialized hex column per position).
    */
  def cdcChunksOf(a: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnShim
    val chunks = ColumnShim.column(graft.expressions.CdcChunks(
      ColumnShim.expression(col("payload")), CDC_WINDOW.toInt, CDC_MASK))
    a.select(col("media_type"), col("asset_id"), explode(chunks).as("c"))
      .select(col("media_type"), col("asset_id"),
        col("c.h").as("h"), col("c.l").as("l"))
  }

  /** The pure-built-in formulation of [[cdcChunksOf]] — kept as the
    * cross-checkable reference the kernel is spec-pinned against
    * (MultimodalSpec: kernel ≡ reference row-for-row).
    */
  private[graft] def cdcChunksReference(a: DataFrame): DataFrame = {
    val b = a.select(col("media_type"), col("asset_id"),
        upper(hex(col("payload"))).as("hx"))
      .withColumn("len", expr("length(hx) div 2"))
    val bh = (w: org.apache.spark.sql.Column) => graft.operators.Dedup.baseHash(w)
    val mid = when(col("len") <= CDC_WINDOW, array().cast("array<bigint>"))
      .otherwise(filter(sequence(lit(CDC_WINDOW), col("len") - 1),
        i => bh(col("hx").substr(((i - CDC_WINDOW) * 2 + 1).cast("int"),
          lit(16))) % CDC_MASK === 0))
    val withBs = b.withColumn("bs",
      concat(array(lit(0L)), mid, array(col("len"))))
    val starts = slice(col("bs"), lit(1), size(col("bs")) - 1)
    val ends = slice(col("bs"), lit(2), size(col("bs")) - 1)
    val chunks = filter(
      zip_with(starts, ends, (s0, e0) => struct(
        bh(col("hx").substr((s0 * 2 + 1).cast("int"),
          ((e0 - s0) * 2).cast("int"))).as("h"),
        (e0 - s0).as("l"))),
      c => c.getField("l") > 0)
    withBs
      .select(col("media_type"), col("asset_id"), explode(chunks).as("c"))
      .select(col("media_type"), col("asset_id"),
        col("c.h").as("h"), col("c.l").as("l"))
  }

  def cdcChunkStatsOf(a: DataFrame): DataFrame = {
    val ex = cdcChunksOf(a)
    val perType = ex.groupBy("media_type").agg(
      countDistinct(col("asset_id")).as("n_assets"),
      count(lit(1)).as("n_chunks"),
      countDistinct(col("h")).as("n_distinct"),
      sum(col("l")).as("bytes_total"))
    val distinctBytes = ex.groupBy(col("media_type"), col("h"))
      .agg(max(col("l")).as("l"))
      .groupBy("media_type").agg(sum(col("l")).as("bytes_distinct"))
    perType.join(distinctBytes, "media_type")
      .select(col("media_type"), col("n_assets"), col("n_chunks"),
        col("n_distinct"), col("bytes_total"), col("bytes_distinct"),
        expr("((n_chunks - n_distinct) * 1000000) div n_chunks").as("dup_chunk_ppm"),
        expr("((bytes_total - bytes_distinct) * 1000000) div bytes_total").as("saved_ppm"))
      .orderBy("media_type")
  }

  lazy val cdcChunkStatsSql: String =
    s"""WITH a AS (SELECT doc_id AS asset_id, 'text/plain' AS media_type,
      |             upper(hex(encode(text))) AS hx FROM documents),
      |b AS (SELECT asset_id, media_type, hx, length(hx) // 2 AS len FROM a),
      |c AS (SELECT *, list_concat(list_concat([CAST(0 AS BIGINT)],
      |        [CAST(i AS BIGINT) FOR i IN range($CDC_WINDOW, CAST(len AS BIGINT))
      |         IF CAST(concat('0x', substr(md5(substr(hx, CAST(2*(i-$CDC_WINDOW)+1 AS INT), 16)),1,15)) AS BIGINT) % $CDC_MASK = 0]),
      |        [CAST(len AS BIGINT)]) AS bs FROM b),
      |ch0 AS (SELECT media_type, asset_id,
      |          unnest([struct_pack(
      |              h := CAST(concat('0x', substr(md5(substr(hx, CAST(2*bs[j]+1 AS INT), CAST(2*(bs[j+1]-bs[j]) AS INT))),1,15)) AS BIGINT),
      |              l := bs[j+1]-bs[j])
      |            FOR j IN range(1, len(bs)) IF bs[j+1] > bs[j]]) AS c
      |        FROM c),
      |ch AS (SELECT media_type, asset_id, c.h AS h, c.l AS l FROM ch0),
      |pt AS (SELECT media_type, CAST(count(DISTINCT asset_id) AS BIGINT) AS n_assets,
      |         CAST(count(*) AS BIGINT) AS n_chunks,
      |         CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
      |         CAST(sum(l) AS BIGINT) AS bytes_total
      |       FROM ch GROUP BY media_type),
      |db AS (SELECT media_type, CAST(sum(l) AS BIGINT) AS bytes_distinct FROM (
      |         SELECT media_type, h, max(l) AS l FROM ch GROUP BY media_type, h)
      |       GROUP BY media_type)
      |SELECT media_type, n_assets, n_chunks, n_distinct, bytes_total, bytes_distinct,
      |  ((n_chunks - n_distinct) * 1000000) // n_chunks AS dup_chunk_ppm,
      |  ((bytes_total - bytes_distinct) * 1000000) // bytes_total AS saved_ppm
      |FROM pt JOIN db USING (media_type) ORDER BY media_type""".stripMargin

  // --------------------------------------- m07 oracled real-codec decode
  /** m07: the real-codec seam, ORACLED — every other m-key runs the
    * deterministic stub through the oracle and proves the REAL codec only
    * in spec; m07 closes that gap by making an actual javax.imageio
    * decode hash-checkable. Each document becomes an 8×8 24-bit gray BMP
    * whose pixel i (row-major) is (doc_id·31 + i) mod 256, ENCODED with
    * ImageIO's BMP writer and DECODED back with ImageIO.read inside one
    * mapPartitions kernel (codec init once per partition, the
    * extractFeatures factory contract); the emitted width/height/sum/
    * min/max come from the DECODED BufferedImage. BMP is lossless 24-bit
    * and equal RGB channels make BT.601 luminance the gray value itself,
    * so DuckDB can predict every output from doc_id arithmetic over a
    * 64-element series WITHOUT decoding — if the real encode→decode path
    * dropped or shifted a single pixel anywhere in the corpus, the hash
    * check fails.
    *
    * Scale shape: a narrow map over the doc-id projection (payloads are
    * born and die inside the kernel — no binary column ever reaches an
    * exchange, the m-family invariant), then the terminal sort only.
    */
  def imageioRoundtrip(s: SparkSession, d: String): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("img_w", LongType, nullable = false),
      StructField("img_h", LongType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_min", LongType, nullable = false),
      StructField("px_max", LongType, nullable = false))))
    Tables.documents(s, d).select(col("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // codec init, once/partition
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64) {
          val g = (((id * 31 + i) % 256) + 256) % 256
          img.setRGB(i % 8, i / 8, (g << 16 | g << 8 | g).toInt)
          i += 1
        }
        val bo = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "bmp", bo),
          "JDK BMP writer missing")
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bo.toByteArray))
        var (sum, mn, mx) = (0L, 255L, 0L)
        var y = 0
        while (y < back.getHeight) {
          var x = 0
          while (x < back.getWidth) {
            val v = (back.getRGB(x, y) & 0xff).toLong // gray: b == g == r
            sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
            x += 1
          }
          y += 1
        }
        Row(id, back.getWidth.toLong, back.getHeight.toLong, sum, mn, mx)
      }
    }(enc).orderBy("doc_id")
  }

  /** m07 oracle: predicts the decoded pixels arithmetically — the gray
    * ramp (doc_id·31 + i) mod 256 over i ∈ [0, 64).
    */
  val imageioRoundtripSql: String =
    """SELECT doc_id, CAST(8 AS BIGINT) AS img_w, CAST(8 AS BIGINT) AS img_h,
      |  CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS px_sum,
      |  CAST(min((doc_id * 31 + i) % 256) AS BIGINT) AS px_min,
      |  CAST(max((doc_id * 31 + i) % 256) AS BIGINT) AS px_max
      |FROM documents CROSS JOIN generate_series(0, 63) t(i)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------- m08 oracled real WAV decode
  /** m08: the audio twin of m07 — the real javax.sound.sampled codec
    * inside the oracle loop. Each document becomes a 64-sample 16-bit
    * mono PCM WAV (sample i = ((doc_id·7 + i·13) mod 65536) − 32768, the
    * full signed range exercised including both extremes), ENCODED with
    * AudioSystem's WAVE writer and DECODED back with
    * AudioSystem.getAudioInputStream inside one mapPartitions kernel; the
    * emitted frame count, sample rate, and sample sum/min/max come from
    * the DECODED stream and format. PCM is lossless, so DuckDB predicts
    * every value from doc-id arithmetic — a container-header bug, an
    * endianness flip, or one clipped sample anywhere in the corpus fails
    * the hash check.
    *
    * Scale shape: identical to m07 — payloads are born and die inside
    * the kernel, no binary reaches an exchange, then the terminal sort.
    */
  def wavRoundtrip(s: SparkSession, d: String): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("s_sum", LongType, nullable = false),
      StructField("s_min", LongType, nullable = false),
      StructField("s_max", LongType, nullable = false))))
    Tables.documents(s, d).select(col("doc_id")).mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      it.map { r =>
        val id = r.getLong(0)
        val raw = new Array[Byte](128)
        var i = 0
        while (i < 64) {
          val v = ((((id * 7 + i * 13) % 65536) + 65536) % 65536 - 32768).toInt
          raw(2 * i) = (v & 0xff).toByte // little-endian signed PCM
          raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val bo = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, 64),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bo)
        val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bo.toByteArray))
        val f = back.getFormat
        val dec = back.readAllBytes()
        var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
        var j = 0
        while (j < dec.length) {
          val v = ((dec(j) & 0xff) | (dec(j + 1) << 8)).toLong
          sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
          j += 2
        }
        Row(id, back.getFrameLength, f.getSampleRate.toLong, sum, mn, mx)
      }
    }(enc).orderBy("doc_id")
  }

  /** m08 oracle: predicts the decoded PCM arithmetically — the signed
    * ramp ((doc_id·7 + i·13) mod 65536) − 32768 over i ∈ [0, 64).
    */
  val wavRoundtripSql: String =
    """SELECT doc_id, CAST(64 AS BIGINT) AS n_frames,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(sum((doc_id * 7 + i * 13) % 65536 - 32768) AS BIGINT) AS s_sum,
      |  CAST(min((doc_id * 7 + i * 13) % 65536 - 32768) AS BIGINT) AS s_min,
      |  CAST(max((doc_id * 7 + i * 13) % 65536 - 32768) AS BIGINT) AS s_max
      |FROM documents CROSS JOIN generate_series(0, 63) t(i)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------- m09 oracled multi-frame GIF sampling
  /** Frames per synthetic clip and the sampling stride for [[gifFrames]]. */
  val GIF_FRAMES = 8
  val FRAME_STRIDE = 2

  /** m09: the VIDEO face of the m07/m08 real-codec discipline —
    * multi-frame container round-trip plus frame-stride sampling, the
    * shape a real video pipeline has (decode container → sample every
    * k-th frame → per-frame features), with the JDK's one true
    * multi-frame codec: animated GIF through javax.imageio's sequence
    * writer. Each document becomes an 8-frame 8×8 clip (frame f, pixel i
    * = (doc_id·31 + f·97 + i) mod 256 over an explicit 256-gray palette
    * — GIF's LZW is lossless on palette indices, so the decode is
    * bit-predictable); the kernel ENCODES all 8 frames with
    * writeToSequence, then DECODES ONLY the sampled frames (stride
    * [[FRAME_STRIDE]]) via ImageReader.read(f) — the index-seek a real
    * frame sampler does, never a full-clip decode. Emitted stats come
    * from the decoded rasters; a dropped frame, palette remap, or LZW
    * bug anywhere in the corpus fails the hash.
    *
    * Scale shape: the m-family invariant — clips are born and die inside
    * one mapPartitions kernel (codec instances per partition, never per
    * row); no binary reaches an exchange; output is docs × 4 sampled
    * frames, then the terminal sort.
    */
  def gifFrames(s: SparkSession, d: String): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_min", LongType, nullable = false),
      StructField("px_max", LongType, nullable = false))))
    val nF = GIF_FRAMES; val stride = FRAME_STRIDE
    Tables.documents(s, d).select(col("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // explicit 256-entry gray palette: the writer stores indices as-is
      val grays = Array.tabulate[Byte](256)(g => g.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val id = r.getLong(0)
        val bo = new java.io.ByteArrayOutputStream()
        val out = javax.imageio.ImageIO.createImageOutputStream(bo)
        writer.setOutput(out)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nF) {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var i = 0
          while (i < 64) {
            raster.setSample(i % 8, i / 8, 0,
              ((id * 31 + f * 97 + i) % 256 + 256) % 256)
            i += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        out.close()
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bo.toByteArray))
        reader.setInput(in)
        val total = reader.getNumImages(true).toLong
        val rows = (0 until nF by stride).map { fi =>
          val back = reader.read(fi)
          var (sum, mn, mx) = (0L, 255L, 0L)
          var y = 0
          while (y < back.getHeight) {
            var x = 0
            while (x < back.getWidth) {
              val v = (back.getRGB(x, y) & 0xff).toLong
              sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
              x += 1
            }
            y += 1
          }
          Row(id, fi.toLong, total, sum, mn, mx)
        }
        in.close()
        rows
      }
    }(enc).orderBy("doc_id", "frame_idx")
  }

  /** m09 oracle: predicts every sampled frame's decoded pixels from the
    * ramp (doc_id·31 + f·97 + i) mod 256, f ∈ {0,2,4,6}, i ∈ [0,64).
    */
  val gifFramesSql: String =
    s"""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST($GIF_FRAMES AS BIGINT) AS n_frames,
      |  CAST(sum((doc_id * 31 + f * 97 + i) % 256) AS BIGINT) AS px_sum,
      |  CAST(min((doc_id * 31 + f * 97 + i) % 256) AS BIGINT) AS px_min,
      |  CAST(max((doc_id * 31 + f * 97 + i) % 256) AS BIGINT) AS px_max
      |FROM documents
      |CROSS JOIN generate_series(0, ${GIF_FRAMES - 1}, $FRAME_STRIDE) s(f)
      |CROSS JOIN generate_series(0, 63) t(i)
      |GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m09_gif_frames" -> (gifFrames _),
    "m08_wav_roundtrip" -> (wavRoundtrip _),
    "m07_imageio_roundtrip" -> (imageioRoundtrip _),
    "m06_cdc_chunks" -> (cdcChunkStats _),
    "m05_frame_dedup" -> (frameDedupStats _),
    "m04_phash_neardup" -> (phashNearDupPairs _),
    "m01_media_meta" -> (mediaMeta _),
    "m02_media_features" -> ((s: SparkSession, d: String) => {
      extractFeatures(s, assets(s, d)).orderBy("asset_id")
    }),
    "m03_frame_stats" -> (frameStats _))

  val oracles: Map[String, String] = Map(
    "m09_gif_frames" -> gifFramesSql,
    "m08_wav_roundtrip" -> wavRoundtripSql,
    "m07_imageio_roundtrip" -> imageioRoundtripSql,
    "m06_cdc_chunks" -> cdcChunkStatsSql,
    "m05_frame_dedup" -> frameDedupStatsSql,
    "m04_phash_neardup" -> phashNearDupPairsSql,
    "m01_media_meta" -> mediaMetaSql,
    "m02_media_features" -> mediaFeaturesSql,
    "m03_frame_stats" -> frameStatsSql)
}
