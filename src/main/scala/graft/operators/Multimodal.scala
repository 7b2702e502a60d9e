package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * Decode is REAL on the codec-free formats a JVM can parse natively:
  * 24-bit uncompressed BMP, 16-bit PCM WAV, and 8-bit grayscale PNG
  * (zlib via `java.util.zip` — [[decodeMediaFeatures]] parses headers,
  * verifies chunk CRCs, inflates IDAT, and walks pixel/sample payloads
  * byte for byte). The payload
  * GENERATOR ([[attachMediaPayload]]) renders those files from
  * parametric pixel/sample formulas, so the decode output is
  * analytically checkable by a SQL oracle that has no codec at all — a
  * wrong header offset, a missed row pad, or a bad endianness read all
  * surface as a hash mismatch. Compressed formats (JPEG/MP3/H.264)
  * would slot into the same `mapPartitions` batch shape via a codec
  * library; the container ships none.
  *
  * Scale: payloads stay columnar (parquet binary), metadata extraction is
  * pure column arithmetic (codegen'd), and the decode stage processes
  * rows partition-by-partition with no shuffle — exactly how a real
  * `mapInPandas`/Arrow decode fleet runs at 100 TB.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap documents into multimodal rows: payload = UTF-8 bytes of the
    * text (the sandbox's stand-in for real media bytes), metadata derived
    * deterministically (modality by id, synthetic dims from byte length).
    */
  def attachPayload(docs: DataFrame): DataFrame = {
    val nb = octet_length(col("text").cast("binary")).cast("long")
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        nb.as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum"),
        (nb % 640).cast("int").as("width"),
        ((nb * 7) % 480).cast("int").as("height"),
        (nb % 30 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** Column-level metadata projection (portable; this is what the oracle
    * checks).
    */
  def metadata(docs: DataFrame): DataFrame =
    attachPayload(docs).select(col("doc_id"),
      col("meta.modality").as("modality"), col("meta.n_bytes").as("n_bytes"),
      col("meta.checksum").as("checksum"), col("meta.width").as("width"),
      col("meta.height").as("height"), col("meta.n_frames").as("n_frames"))

  /** Frame sampling: ≤4 evenly spaced frame indices per "video" payload —
    * pure `sequence`/`explode`, no driver loop.
    */
  def frameSample(docs: DataFrame, maxFrames: Int = 4): DataFrame =
    attachPayload(docs)
      .filter(col("meta.modality") === "video")
      .withColumn("step",
        expr(s"greatest(1, (meta.n_frames + ${maxFrames - 1}) div $maxFrames)").cast("int"))
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, col("step"))).as("frame_idx"))

  /** Byte-level feature extraction: partition-wise batch processing over
    * the binary payload (whole-file statistics — cheap corpus screening
    * before the format-aware [[decodeMediaFeatures]] runs).
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    val withPayload = attachPayload(docs).select("doc_id", "payload")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("mean_byte", DoubleType),
      StructField("min_byte", IntegerType),
      StructField("max_byte", IntegerType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayload.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val (sum, mn, mx) = decodeBytes(bytes)
        Row(r.getAs[Long]("doc_id"),
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          mn, mx, bytes.length.toLong)
      }
    }(enc)
  }

  /** Whole-file byte statistics (sum, min, max as unsigned). */
  private def decodeBytes(bytes: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L; var mn = 256; var mx = -1
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      sum += u; if (u < mn) mn = u; if (u > mx) mx = u
      i += 1
    }
    (sum, if (mn == 256) 0 else mn, if (mx == -1) 0 else mx)
  }

  // ---- real media decode on codec-free formats (BMP / WAV) ----

  /** Render a deterministic media file per doc: `id%3==0` a 24-bit
    * uncompressed BMP (width `id%16+4`, height `id%9+3`, pixel byte k =
    * `(id*31 + k) % 256` laid out row-major with standard 4-byte row
    * padding), `id%3==1` a 16-bit PCM mono WAV at 8 kHz (`id%50+10`
    * samples, sample k = `(id*131 + k*17) % 65536 − 32768`), `id%3==2`
    * an 8-bit GRAYSCALE PNG (real zlib-deflated IDAT + CRC32 chunks;
    * width `id%16+4`, height `id%9+3`, pixel k = `(id*53 + k) % 256`).
    * The formulas are what make [[decodeMediaFeatures]] oracle-checkable
    * without a codec on the oracle side.
    */
  private[operators] def encodeMedia(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => encodeBmp(docId)
    case 1 => encodeWav(docId)
    case _ => encodePng(docId)
  }

  private[operators] def encodeBmp(docId: Long): Array[Byte] = {
    val w = (docId % 16 + 4).toInt
    val h = (docId % 9 + 3).toInt
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24) // BITMAPINFOHEADER
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var k = 0
    var y = 0
    while (y < h) {
      var i = 0
      while (i < rowBytes) { buf.put(((docId * 31 + k) % 256).toByte); k += 1; i += 1 }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  private[operators] def encodeWav(docId: Long): Array[Byte] = {
    val n = (docId % 50 + 10).toInt
    val dataSize = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      buf.putShort(((docId * 131 + k * 17) % 65536 - 32768).toShort)
      k += 1
    }
    buf.array()
  }

  /** An 8-bit grayscale PNG, for real: signature, IHDR (big-endian
    * dims), IDAT = zlib-deflated scanlines (filter byte 0 + `w` pixel
    * bytes per row), IEND, each chunk with its CRC32. Viewable by any
    * image tool; pixel k (row-major) = `(docId*53 + k) % 256`.
    */
  private[operators] def encodePng(docId: Long): Array[Byte] = {
    val w = (docId % 16 + 4).toInt
    val h = (docId % 9 + 3).toInt
    val raw = new Array[Byte](h * (1 + w)) // filter byte + w grayscale pixels
    var k = 0
    var y = 0
    while (y < h) {
      raw(y * (1 + w)) = 0 // filter: None
      var x = 0
      while (x < w) {
        raw(y * (1 + w) + 1 + x) = ((docId * 53 + k) % 256).toByte
        k += 1; x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new Array[Byte](raw.length + 64)
    val compLen = deflater.deflate(comp)
    deflater.end()
    require(deflater.finished, "IDAT payload exceeded deflate buffer")

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length) // BE by default
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, adaptive, no interlace
      .array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", comp.take(compLen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** (width, height, nPixels, sum, min, max) from an 8-bit grayscale
    * PNG — signature check, big-endian IHDR, chunk walk with CRC32
    * verification, zlib inflate of the concatenated IDAT stream, and
    * per-scanline filter handling (filter 0; others rejected — the
    * renderer never emits them).
    */
  /** Chunk walk + CRC verify + inflate + filter check, shared by the
    * stats and patch decoders: (w, h, raw scanlines incl. filter bytes).
    */
  private def pngScanlines(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    val sigOk = bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    require(sigOk, "not a PNG file")
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 12 <= bytes.length) {
      val len = buf.getInt(off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      require(off + 12 + len <= bytes.length, s"truncated $typ chunk")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(off + 8 + len), s"$typ CRC mismatch")
      typ match {
        case "IHDR" =>
          w = buf.getInt(off + 8); h = buf.getInt(off + 12)
          require(bytes(off + 16) == 8 && bytes(off + 17) == 0,
            "only 8-bit grayscale PNG supported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && idat.size() > 0, "missing IHDR/IDAT")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    val got = inflater.inflate(raw)
    require(inflater.finished && got == raw.length, "bad IDAT scanline volume")
    inflater.end()
    var y = 0
    while (y < h) {
      require(raw(y * (1 + w)) == 0, s"unsupported scanline filter ${raw(y * (1 + w))}")
      y += 1
    }
    (w, h, raw)
  }

  private[operators] def decodePng(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val (w, h, raw) = pngScanlines(bytes)
    var sum = 0L; var mn = 256L; var mx = -1L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = (raw(y * (1 + w) + 1 + x) & 0xff).toLong
        sum += u; if (u < mn) mn = u; if (u > mx) mx = u
        x += 1
      }
      y += 1
    }
    (w, h, w.toLong * h, sum, mn, mx)
  }

  /** (width, height, nPixelBytes, sum, min, max) from a 24-bit
    * uncompressed BMP — header fields at their documented offsets, pixel
    * rows read at the header's data offset with 4-byte padding skipped.
    */
  /** Validated 24-bit BMP geometry — (dataOffset, w, h, rowBytes, pad),
    * shared by the stats and patch decoders so the header contract
    * lives in one place.
    */
  private def bmpGeometry(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP file")
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(buf.getShort(28) == 24, s"unsupported bpp ${buf.getShort(28)}")
    require(buf.getInt(30) == 0, "compressed BMP unsupported")
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset + (rowBytes + pad) * h, "truncated pixel data")
    (dataOffset, w, h, rowBytes, pad)
  }

  private[operators] def decodeBmp(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val (dataOffset, w, h, rowBytes, pad) = bmpGeometry(bytes)
    var sum = 0L; var mn = 256L; var mx = -1L
    var y = 0
    while (y < h) {
      var i = 0
      val base = dataOffset + y * (rowBytes + pad)
      while (i < rowBytes) {
        val u = (bytes(base + i) & 0xff).toLong
        sum += u; if (u < mn) mn = u; if (u > mx) mx = u
        i += 1
      }
      y += 1
    }
    (w, h, rowBytes.toLong * h, sum, mn, mx)
  }

  /** (sampleRate, nSamples, sum, min, max) from a 16-bit PCM WAV —
    * walks the RIFF chunk list (fmt / data can appear in any order,
    * other chunks are skipped) rather than assuming the 44-byte layout.
    */
  private[operators] def decodeWav(bytes: Array[Byte]): (Int, Long, Long, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV file")
    var off = 12
    var sampleRate = -1; var bits = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val len = buf.getInt(off + 4)
      if (id == "fmt ") {
        require(buf.getShort(off + 8) == 1, "non-PCM WAV unsupported")
        channels = buf.getShort(off + 10)
        sampleRate = buf.getInt(off + 12)
        bits = buf.getShort(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(bits == 16 && channels == 1, s"unsupported PCM layout ${bits}bit×$channels")
    require(bytes.length >= dataOff + dataLen, "truncated sample data")
    val n = dataLen / 2
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    var k = 0
    while (k < n) {
      val v = buf.getShort(dataOff + k * 2).toLong
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      k += 1
    }
    (sampleRate, n.toLong, sum, mn, mx)
  }

  /** Attach the rendered media file as a binary payload column —
    * (doc_id, fmt, payload). Partition-wise generation, no shuffle.
    */
  def attachMediaPayload(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fmt", StringType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, Seq("bmp", "wav", "png")((id % 3).toInt), encodeMedia(id))
      }
    }(enc)
  }

  /** REAL format-aware decode over the binary payload column: BMP pixel
    * statistics / WAV sample statistics, parsed from the bytes
    * partition-by-partition (the `mapInPandas` batch shape). Columns not
    * applicable to a format are 0, keeping the frame null-free for the
    * hash gate. `mean_val` is the raw double `sum/n` — no rounding (see
    * the portability rules on integer-rational doubles).
    */
  def decodeMediaFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fmt", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("sample_rate", LongType),
      StructField("n_units", LongType),
      StructField("mean_val", DoubleType),
      StructField("min_val", LongType),
      StructField("max_val", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // positional getters: rows arriving from an upstream mapPartitions
    // carry no schema, so name-based access would throw
    media.select("doc_id", "fmt", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](2)
        r.getString(1) match {
          case "bmp" =>
            val (w, h, n, sum, mn, mx) = decodeBmp(bytes)
            Row(id, "bmp", w.toLong, h.toLong, 0L, n, sum.toDouble / n, mn, mx)
          case "wav" =>
            val (sr, n, sum, mn, mx) = decodeWav(bytes)
            Row(id, "wav", 0L, 0L, sr.toLong, n, sum.toDouble / n, mn, mx)
          case "png" =>
            val (w, h, n, sum, mn, mx) = decodePng(bytes)
            Row(id, "png", w.toLong, h.toLong, 0L, n, sum.toDouble / n, mn, mx)
        }
      }
    }(enc)
  }

  /** 2×2 AVERAGE-POOL patch grid over the REAL decoded pixels — the
    * resize/feature-extraction step after decode (a thumbnail embedding
    * in miniature). Pixel (x, y) pools into patch
    * (gx, gy) = ((2x) div w, (2y) div h) — balanced halves at any
    * dimension; patch value = floor-mean of pixel intensities, kept in
    * exact BIGINT (`sum div count`). Intensity: PNG = the grayscale
    * byte; BMP = the 3-channel byte sum (0..765), rows in STORAGE order
    * (BMP stores bottom-up — the grid is over the stored layout, not
    * the display orientation; documented, deterministic). WAV rows are
    * rejected — filter to images upstream.
    *
    * Same scale shape as [[decodeMediaFeatures]]: partition-wise decode
    * (the `mapInPandas` batch form), one row in → one row out, no
    * shuffle; the pooling is a single pass over the pixels it already
    * decoded.
    */
  def imagePatchFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fmt", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("q00", LongType), StructField("q01", LongType),
      StructField("q10", LongType), StructField("q11", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "fmt", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fmt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val sums = new Array[Long](4)
        val cnts = new Array[Long](4)
        var w = 0; var h = 0
        fmt match {
          case "png" =>
            val (pw, ph, raw) = pngScanlines(bytes)
            w = pw; h = ph
            require(w >= 2 && h >= 2, s"2x2 patch grid needs w,h >= 2, got ${w}x$h")
            var y = 0
            while (y < h) {
              val gy = (2 * y) / h
              var x = 0
              while (x < w) {
                val p = gy * 2 + (2 * x) / w
                sums(p) += (raw(y * (1 + w) + 1 + x) & 0xff).toLong
                cnts(p) += 1
                x += 1
              }
              y += 1
            }
          case "bmp" =>
            val (dataOffset, bw, bh, rowBytes, pad) = bmpGeometry(bytes)
            w = bw; h = bh
            require(w >= 2 && h >= 2, s"2x2 patch grid needs w,h >= 2, got ${w}x$h")
            var y = 0
            while (y < h) {
              val gy = (2 * y) / h
              val base = dataOffset + y * (rowBytes + pad)
              var x = 0
              while (x < w) {
                val p = gy * 2 + (2 * x) / w
                sums(p) += ((bytes(base + 3 * x) & 0xff) +
                  (bytes(base + 3 * x + 1) & 0xff) +
                  (bytes(base + 3 * x + 2) & 0xff)).toLong
                cnts(p) += 1
                x += 1
              }
              y += 1
            }
          case other => throw new IllegalArgumentException(
            s"imagePatchFeatures: not an image format: $other")
        }
        Row(id, fmt, w.toLong, h.toLong,
          sums(0) / cnts(0), sums(1) / cnts(1),
          sums(2) / cnts(2), sums(3) / cnts(3))
      }
    }(enc)
  }

  /** PERCEPTUAL IMAGE HASH (average hash): decode, average-pool the
    * pixel intensities into an 8×8 grid, and set bit (gy·8+gx) iff its
    * cell mean exceeds the image mean — the classic aHash, the
    * resize/re-encode-robust fingerprint an image dedup pipeline
    * blocks on. All arithmetic is exact BIGINT: the cell-vs-image
    * comparison is the cross-multiplication
    * `cellSum·totalCount > totalSum·cellCount` (no division, no
    * floats, empty cells — images narrower/shorter than 8 — compare
    * 0 > 0 and stay 0), so any engine reproduces the bits exactly and
    * the hash query carries a DuckDB oracle over the parametric pixel
    * formulas.
    *
    * The 64 bits are emitted as FOUR 16-bit band values `b0..b3`
    * (bits [16j, 16j+16)) rather than one packed word: BIGINT-safe in
    * every engine (bit 63 would wrap a signed 64-bit pack), and the
    * bands are exactly what the Hamming join ([[imageHashPairs]])
    * indexes — at scale the four (j, value) pairs are the stored
    * band index, SimHash-style.
    *
    * Intensity convention matches [[imagePatchFeatures]]: PNG = the
    * grayscale byte, BMP = the 3-channel byte sum over STORAGE order
    * rows. Same scale shape too: partition-wise decode, one row in →
    * one row out, no shuffle.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fmt", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("b0", LongType), StructField("b1", LongType),
      StructField("b2", LongType), StructField("b3", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "fmt", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fmt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var w = 0; var h = 0
        def cell(x: Int, y: Int, v: Long): Unit = {
          val p = ((8 * y) / h) * 8 + (8 * x) / w
          sums(p) += v; cnts(p) += 1
        }
        fmt match {
          case "png" =>
            val (pw, ph, raw) = pngScanlines(bytes)
            w = pw; h = ph
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                cell(x, y, (raw(y * (1 + w) + 1 + x) & 0xff).toLong)
                x += 1
              }
              y += 1
            }
          case "bmp" =>
            val (dataOffset, bw, bh, rowBytes, pad) = bmpGeometry(bytes)
            w = bw; h = bh
            var y = 0
            while (y < h) {
              val base = dataOffset + y * (rowBytes + pad)
              var x = 0
              while (x < w) {
                cell(x, y, ((bytes(base + 3 * x) & 0xff) +
                  (bytes(base + 3 * x + 1) & 0xff) +
                  (bytes(base + 3 * x + 2) & 0xff)).toLong)
                x += 1
              }
              y += 1
            }
          case other => throw new IllegalArgumentException(
            s"imageAHash: not an image format: $other")
        }
        var totalSum = 0L; var totalCnt = 0L
        var p = 0
        while (p < 64) { totalSum += sums(p); totalCnt += cnts(p); p += 1 }
        val bands = new Array[Long](4)
        p = 0
        while (p < 64) {
          if (sums(p) * totalCnt > totalSum * cnts(p))
            bands(p / 16) |= 1L << (p % 16)
          p += 1
        }
        Row(id, fmt, w.toLong, h.toLong, bands(0), bands(1), bands(2), bands(3))
      }
    }(enc)
  }

  /** Near-duplicate image pairs by aHash Hamming distance, banded: a
    * pair is a CANDIDATE iff it collides on one of the four 16-bit
    * bands, then the exact distance (4 × xor + bit_count, codegen'd)
    * filters. By pigeonhole the blocking is EXACT for `maxHamming ≤ 3`
    * (≤3 differing bits cannot touch all 4 bands); beyond that it is
    * the standard recall/cost trade, documented not hidden.
    *
    * Scale shape: explode to 4 band rows per image, candidates via the
    * text family's CAPPED bucket enumeration ([[Dedup.cappedPairs]]) —
    * a degenerate band bucket (a flat-image corpus hashing to all-zero
    * bands) emits linear ANCHOR pairs instead of exploding
    * quadratically, members reach each other transitively through the
    * anchor — then the distance filter runs on candidates only, never
    * all pairs.
    */
  def imageHashPairs(hashes: DataFrame, maxHamming: Int = 3,
                     maxBucket: Int = 256,
                     candidateBudgetPerDoc: Option[Int] =
                       Dedup.DefaultCandidateBudget): DataFrame = {
    val (bands, cap) = Dedup.resolveCap(bandRows(hashes),
      maxBucket, candidateBudgetPerDoc, bandsPerDoc = 4)
    imageHashPairsCore(hashes, bands, cap, maxHamming)
  }

  /** [[imageHashPairs]] with the bucket cap supplied by the caller — the
    * multimodal twin of
    * [[graft.operators.Dedup.incrementalNearDupsStoredWithCap]]: when
    * the image-hash store's band census is MAINTAINED
    * ([[graft.streaming.StreamingOps.changeFeedImageHashStoreCensus]]),
    * [[graft.operators.Dedup.capFromMaintainedCensus]] derives `cap`
    * from the census tables at batch-sized cost and this method never
    * re-aggregates the stored bands. Identical output to the
    * recomputing form at the same cap (spec-pinned).
    */
  def imageHashPairsWithCap(hashes: DataFrame, cap: Int,
                            maxHamming: Int = 3): DataFrame =
    imageHashPairsCore(hashes, bandRows(hashes), cap, maxHamming)

  private def bandRows(hashes: DataFrame): DataFrame =
    hashes.select(col("doc_id"),
      posexplode(array(Seq("b0", "b1", "b2", "b3").map(col): _*))
        .as(Seq("band_id", "band")))

  /** One (doc_id, bkey) row per 16-bit aHash band — `bkey` in the same
    * `band_id || '|' || band` form [[graft.operators.Dedup.storeBands]]
    * uses, so the maintained-census machinery (counts table bucketed by
    * `bkey`, size histogram, cap derivation) is shared verbatim between
    * the text and image stores.
    */
  def hashBands(hashes: DataFrame): DataFrame =
    bandRows(hashes)
      .select(col("doc_id"),
        concat_ws("|", col("band_id"), col("band")).as("bkey"))

  private def imageHashPairsCore(hashes: DataFrame, bands: DataFrame,
                                 cap: Int, maxHamming: Int): DataFrame = {
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val cand = Dedup.cappedPairs(bands, Seq("band_id", "band"), cap)
    val h = hashes.select(col("doc_id") +: bandCols.map(col): _*)
    val withSides = cand
      .join(h.toDF("doc_a" +: bandCols.map("a_" + _): _*), Seq("doc_a"))
      .join(h.toDF("doc_b" +: bandCols.map("b_" + _): _*), Seq("doc_b"))
    val hamming = bandCols.map(c =>
      bit_count(col(s"a_$c").bitwiseXOR(col(s"b_$c")))).reduce(_ + _)
    withSides.select(col("doc_a"), col("doc_b"),
        hamming.cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** (sampleRate, samples) from a 16-bit PCM mono WAV — the raw-sample
    * sibling of [[decodeWav]], for operators that need the waveform
    * itself rather than its scalar statistics.
    */
  private[operators] def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Int]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV file")
    var off = 12
    var sampleRate = -1; var bits = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val len = buf.getInt(off + 4)
      if (id == "fmt ") {
        require(buf.getShort(off + 8) == 1, "non-PCM WAV unsupported")
        channels = buf.getShort(off + 10)
        sampleRate = buf.getInt(off + 12)
        bits = buf.getShort(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(bits == 16 && channels == 1, s"unsupported PCM layout ${bits}bit×$channels")
    require(bytes.length >= dataOff + dataLen, "truncated sample data")
    val n = dataLen / 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) { out(k) = buf.getShort(dataOff + k * 2).toInt; k += 1 }
    (sampleRate, out)
  }

  /** Frame-level audio features over the REAL decoded waveform — the
    * standard first pass of any audio-curation pipeline (VAD gating,
    * silence trimming, clipping detection all read these): per
    * `frameLen`-sample frame, the sample count, ENERGY (Σv², exact
    * BIGINT), PEAK (max |v|), and ZERO-CROSSING count (sign changes
    * between consecutive samples; 0 counts as non-negative).
    *
    * Scale shape: the codec stays imperative (`mapPartitions`, the
    * `mapInPandas` batch form — one row per doc in and out), but the
    * framing and per-frame aggregation are RELATIONAL: `sequence` +
    * `slice` + higher-order `aggregate` over the samples array, all
    * codegen-friendly and map-side — no shuffle, no per-sample row
    * explosion (rows = frames, not samples). A 100 TB audio corpus
    * streams through at scan speed.
    */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 16): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val decSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", LongType),
      StructField("samples", ArrayType(IntegerType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(decSchema)
    val decoded = media.filter(col("fmt") === "wav")
      .select("doc_id", "fmt", "payload").mapPartitions { rows =>
        rows.map { r =>
          val (sr, samples) = decodeWavSamples(r.getAs[Array[Byte]](2))
          Row(r.getLong(0), sr.toLong, samples)
        }
      }(enc)
    decoded
      .withColumn("frame_id",
        explode(sequence(lit(0), expr(s"(size(samples) - 1) div $frameLen"))))
      .withColumn("fs",
        slice(col("samples"), col("frame_id") * lit(frameLen) + 1, lit(frameLen)))
      .select(col("doc_id"), col("sample_rate"), col("frame_id").cast(LongType).as("frame_id"),
        size(col("fs")).cast(LongType).as("n"),
        expr("aggregate(fs, CAST(0 AS BIGINT), (acc, v) -> acc + CAST(v AS BIGINT) * v)")
          .as("energy"),
        expr("aggregate(fs, CAST(0 AS BIGINT), (acc, v) -> greatest(acc, abs(CAST(v AS BIGINT))))")
          .as("peak"),
        expr("""aggregate(fs,
                 named_struct('prev', CAST(-1 AS INT), 'cnt', CAST(0 AS BIGINT)),
                 (st, v) -> named_struct(
                   'prev', CASE WHEN v < 0 THEN 1 ELSE 0 END,
                   'cnt', st.cnt + CASE WHEN st.prev >= 0
                     AND (CASE WHEN v < 0 THEN 1 ELSE 0 END) <> st.prev
                     THEN 1 ELSE 0 END),
                 st -> st.cnt)""").as("zero_cross"))
  }
}
