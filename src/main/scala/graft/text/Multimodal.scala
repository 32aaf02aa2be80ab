package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Extracted per-media features (the typed output schema a real decoder
  * would produce). */
case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    byte_mean: Double,
    distinct_bytes: Long,
    head_hash: Long)

/** A decoded-and-embedded media row: resized dims + feature vector. */
case class MediaVec(media_id: Long, rw: Int, rh: Int, feat: Array[Double])

/** REAL-decode features: exact integer channel sums + 2×2 average-pool
  * cell sums (row-major (cy, cx, channel)) from parsed PPM pixels. */
case class PpmFeatures(media_id: Long, w: Int, h: Int, n_pixels: Long,
                       sum_r: Long, sum_g: Long, sum_b: Long,
                       pool: Array[Long])

/** Exact-integer features of a gzip-DECODED text blob (byte count + byte
  * sum) — any decode defect moves one of them and reddens the hash. */
case class GzipFeatures(media_id: Long, n_bytes: Long, byte_sum: Long)

/** REAL-decode audio features from parsed PCM samples — all exact
  * integers: sum, sum of |s|, extremes, negative→non-negative zero
  * crossings. */
case class WavFeatures(media_id: Long, sample_rate: Int, n_samples: Long,
                       s_sum: Long, s_abs: Long, s_min: Int, s_max: Int,
                       n_zc: Long)

/** Multimodal column support (SURVEY §2 E56 [N]): media (image/audio/video)
  * travel as opaque `binary` columns beside typed metadata structs; decode /
  * feature-extract runs partition-batched over the binary payloads.
  *
  * The decode step is a STUB — media codecs are not available in this
  * container — but everything Spark-side is real: binary column handling,
  * the `mapPartitions` batch shape (one iterator per partition ≅ Arrow
  * batches under `mapInPandas`), the typed output Encoder, and partition
  * sizing. Swapping `decodeStub` for a JPEG/PCM decoder changes no plan
  * shape. At 100 TB the binary column rides its own parquet chunk pages, so
  * metadata-only queries never touch the blobs (column pruning).
  */
object Multimodal {

  /** STUB decoder: deterministic features from raw bytes, standing in for
    * e.g. image decode + pooling. Replace with a real codec off-container. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var hash = 1125899906842597L // deterministic FNV-ish rolling head hash
    val head = math.min(bytes.length, 16)
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    i = 0
    while (i < head) { hash = hash * 31 + (bytes(i) & 0xff); i += 1 }
    MediaFeatures(id, bytes.length.toLong,
      if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length,
      bytes.map(b => b & 0xff).distinct.length.toLong, hash)
  }

  /** Partition-batched feature extraction over (id, blob) rows. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      idCol: String, blobCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes)
      })
  }

  /** "Decode + resize + embed" over a 64-row BATCH — the vectorized-
    * decoder call shape (mapInPandas' Arrow batches, in Scala form): the
    * partition iterator is consumed in fixed batches, each handed to the
    * decoder as a unit. The stub here is md5-based ON PURPOSE: unlike
    * [[decodeStub]]'s FNV hash (q67, rows-only), md5 is computable in
    * SQL, so the WHOLE multimodal pipeline — binary payloads, batch
    * plumbing, typed Encoder, downstream aggregation — hash-checks
    * against a DuckDB twin (q252). Features are hex32/2^32 ∈ [0,1)
    * (exactly representable doubles); resize clamps to 224. */
  def decodeBatch(batch: Seq[(Long, Array[Byte], Int, Int)]): Seq[MediaVec] =
    batch.map { case (id, bytes, w, h) =>
      val feat = Array.tabulate(8) { k =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes ++ s":$k".getBytes("UTF-8"))
        val hex = d.take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      }
      MediaVec(id, math.min(w, 224), math.min(h, 224), feat)
    }

  /** Partition-batched decode: 64-row batches, typed output. */
  def extractVecs(spark: SparkSession, media: DataFrame, idCol: String,
                  blobCol: String, wCol: String, hCol: String): Dataset[MediaVec] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"),
        col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.grouped(64).flatMap(b => decodeBatch(b.toSeq)))
  }

  // ---- REAL pixel decode (round-13 upgrade over the md5 stub) ----

  /** Binary PPM (P6) encoder for deterministic synthetic images: header
    * (with a comment line, so the parser's comment handling is
    * load-bearing) + RGB raster where byte `idx` carries
    * `(id*7 + idx*13) mod 256` — a closed form an oracle recomputes
    * WITHOUT parsing bytes, which is what lets the real decode path
    * hash-check end to end (q256). */
  def synthPpm(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# synthetic $id\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = ((id * 7 + i.toLong * 13) % 256).toByte
      i += 1
    }
    out
  }

  /** REAL PPM (P6) parse: magic, whitespace/comment-tolerant header
    * (width, height, maxval), then the raw RGB raster. Throws on
    * malformed or truncated input — a decoder that silently pads is how
    * corrupt media poisons a training set. */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"PPM: $msg")
    def skipWs(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) fail(s"expected integer at byte $pos")
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      fail("not a P6 file")
    pos = 2
    val w = int(); val h = int(); val maxval = int()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    pos += 1 // the single whitespace byte terminating the header
    val n = w * h * 3
    if (pos + n > bytes.length)
      fail(s"truncated raster: need $n bytes, have ${bytes.length - pos}")
    val raster = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
    (w, h, raster)
  }

  /** Real per-image features from DECODED pixels, all exact integers so
    * the oracle's closed form matches bit for bit: per-channel sums over
    * the full raster plus 2×2 average-pool cell sums (the "resize"
    * path at provable grain) — `pool` is row-major (cy, cx, channel),
    * cell of pixel (x,y) = (2y/h, 2x/w). */
  def ppmFeatures(id: Long, bytes: Array[Byte]): PpmFeatures = {
    val (w, h, raster) = decodePpm(bytes)
    val sums = new Array[Long](3)
    val pool = new Array[Long](12)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val cell = (y * 2 / h) * 2 + (x * 2 / w)
      var c = 0
      while (c < 3) {
        val v = (raster(i * 3 + c) & 0xff).toLong
        sums(c) += v
        pool(cell * 3 + c) += v
        c += 1
      }
      i += 1
    }
    PpmFeatures(id, w, h, w.toLong * h, sums(0), sums(1), sums(2), pool)
  }

  /** Partition-batched REAL decode: same 64-row batch shape as
    * [[extractVecs]] (the vectorized-decoder call contract), but the
    * decoder parses actual image bytes instead of hashing them. */
  def extractPpm(spark: SparkSession, media: DataFrame, idCol: String,
                 blobCol: String): Dataset[PpmFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        ppmFeatures(id, bytes)
      }))
  }

  // ---- REAL audio decode (WAV/RIFF, 16-bit PCM) ----

  /** Canonical little-endian RIFF/WAVE encoder for deterministic
    * synthetic audio: fmt chunk (PCM, mono, 16-bit), an unknown `LIST`
    * chunk between fmt and data (so the parser's chunk walk is
    * load-bearing), then `data` with sample i carrying
    * `((id*31 + i*17) mod 65536) − 32768` — closed-form for the oracle,
    * exactly like [[synthPpm]]. */
  def synthWav(id: Long, n: Int, rateHz: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + n * 2)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val listPayload = "INFOgraft".getBytes("US-ASCII") // 9 bytes, odd → pad
    val dataSize = n * 2
    val riffSize = 4 + (8 + 16) + (8 + listPayload.length + 1) + (8 + dataSize)
    cc("RIFF"); u32(riffSize); cc("WAVE")
    cc("fmt "); u32(16)
    u16(1); u16(1); u32(rateHz); u32(rateHz * 2); u16(2); u16(16)
    cc("LIST"); u32(listPayload.length); out.write(listPayload); out.write(0)
    cc("data"); u32(dataSize)
    var i = 0
    while (i < n) {
      u16((((id * 31 + i.toLong * 17) % 65536) - 32768).toInt & 0xffff)
      i += 1
    }
    out.toByteArray
  }

  /** REAL WAV parse: RIFF/WAVE header, a chunk WALK (unknown chunks —
    * LIST, fact, cue — skipped by their declared size incl. the odd-size
    * pad byte, per the RIFF rule), fmt validation (PCM, mono, 16-bit),
    * then the signed little-endian sample run. Throws on anything
    * malformed or truncated. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"WAV: $msg")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long = (u16(p) & 0xffffL) | ((u16(p + 2) & 0xffffL) << 16)
    def cc(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "WAVE")
      fail("not a RIFF/WAVE file")
    var pos = 12
    var rate = -1
    var samples: Array[Int] = null
    while (pos + 8 <= bytes.length) {
      val id = cc(pos); val size = u32(pos + 4).toInt
      val body = pos + 8
      // A u32 whose low bits truncate to a negative Int would slip past
      // the truncation check below and walk `pos` BACKWARDS — loop forever
      // on malformed input. Reject it first (documented contract: throws
      // on anything malformed).
      if (size < 0) fail(s"'$id' chunk size out of range")
      if (body + size > bytes.length) fail(s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          val fmt = u16(body); val ch = u16(body + 2); val bits = u16(body + 14)
          if (fmt != 1) fail(s"unsupported audio format $fmt (want PCM)")
          if (ch != 1) fail(s"unsupported channel count $ch")
          if (bits != 16) fail(s"unsupported bit depth $bits")
          rate = u32(body + 4).toInt
        case "data" =>
          if (rate < 0) fail("data chunk before fmt")
          if (size % 2 != 0) fail("odd data size for 16-bit samples")
          samples = Array.tabulate(size / 2)(i => u16(body + i * 2).toShort.toInt)
        case _ => () // unknown chunk: skip by declared size
      }
      pos = body + size + (size & 1) // RIFF pads odd chunks to even
    }
    if (samples == null) fail("no data chunk")
    (rate, samples)
  }

  /** Exact integer audio features from DECODED samples. */
  def wavFeatures(id: Long, bytes: Array[Byte]): WavFeatures = {
    val (rate, s) = decodeWav(bytes)
    var sum = 0L; var abs = 0L; var zc = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < s.length) {
      val v = s(i)
      sum += v; abs += math.abs(v.toLong)
      if (v < mn) mn = v
      if (v > mx) mx = v
      if (i > 0 && s(i - 1) < 0 && v >= 0) zc += 1
      i += 1
    }
    WavFeatures(id, rate, s.length.toLong, sum, abs,
      if (s.isEmpty) 0 else mn, if (s.isEmpty) 0 else mx, zc)
  }

  /** Partition-batched REAL audio decode — same 64-row batch contract. */
  def extractWav(spark: SparkSession, media: DataFrame, idCol: String,
                 blobCol: String): Dataset[WavFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        wavFeatures(id, bytes)
      }))
  }

  // ---- REAL compressed-format decode (PNG, via JDK Inflater) ----
  //
  // The round-13 verdict's "compressed multimodal formats" delta: PPM/WAV
  // are uncompressed containers; PNG exercises a genuine codec — DEFLATE
  // decompression plus the scanline filter predictors — and the whole
  // codec stack is JDK stdlib (java.util.zip.{Inflater, Deflater, CRC32}),
  // so no new dependency. The synthetic encoder writes REAL spec-conformant
  // PNGs (8-byte signature, CRC'd IHDR/IDAT/IEND chunks, zlib stream,
  // per-row filter types cycling 0..4 so every predictor — None/Sub/Up/
  // Average/Paeth — is load-bearing on the decode path).

  /** PNG chunk writer: length + type + data + CRC32(type||data). */
  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    val t = typ.getBytes("US-ASCII")
    u32(data.length); out.write(t); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    u32(crc.getValue.toInt)
  }

  /** Paeth predictor (PNG spec §9.4) — shared by encoder and decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG encoder for deterministic synthetic images: 8-bit RGB
    * (color type 2), raw pixel byte idx carrying the SAME closed form as
    * [[synthPpm]] — `(id*7 + idx*13) mod 256` — so the oracle recomputes
    * decoded values without touching a byte. Row r is filtered with type
    * `r mod 5`, which forces the decoder through all five reconstruction
    * functions before the closed form can reappear. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val bpp = 3
    val stride = w * bpp
    val raw = Array.tabulate(h * stride)(i => ((id * 7 + i.toLong * 13) % 256).toByte)
    // Filter each scanline: out = raw - predictor (mod 256).
    val filtered = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) raw((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // zlib-wrap via Deflater (nowrap=false emits the 2-byte zlib header +
    // adler32 the PNG spec requires).
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
    defl.setInput(filtered); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream(zout.size() + 64)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = new Array[Byte](13)
    def be32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = ((v >>> 24) & 0xff).toByte; a(p + 1) = ((v >>> 16) & 0xff).toByte
      a(p + 2) = ((v >>> 8) & 0xff).toByte; a(p + 3) = (v & 0xff).toByte
    }
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filters, no interlace
    pngChunk(out, "IHDR", ihdr)
    // Split the zlib stream across two IDAT chunks when possible — IDAT
    // concatenation is part of the spec and must be load-bearing.
    val z = zout.toByteArray
    if (z.length > 8) {
      pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, z.length / 2))
      pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, z.length / 2, z.length))
    } else pngChunk(out, "IDAT", z)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL PNG decode: signature, chunk walk with CRC32 verification and
    * negative/truncation length guards (the untrusted-input discipline),
    * IHDR validation (8-bit RGB, no interlace), IDAT concatenation,
    * Inflater decompression, then scanline un-filtering through all five
    * predictor types. Returns (w, h, raw RGB raster). Throws on anything
    * malformed — bad magic, bad CRC, unknown filter, short zlib stream. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"PNG: $msg")
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    if (bytes.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), sig)) fail("bad signature")
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      if (pos + 8 > bytes.length) fail("truncated chunk header")
      val len = u32(pos)
      // 2^31-1 is the spec cap; a length that would truncate negative or
      // overrun the buffer must be rejected before pos moves (same guard
      // class as decodeWav / ProtoWire.skip).
      if (len > Int.MaxValue - 12) fail(s"chunk length out of range: $len")
      val n = len.toInt
      val body = pos + 8
      if (body + n + 4 > bytes.length) fail("truncated chunk body")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != u32(body + n)) fail(s"CRC mismatch in '$typ'")
      typ match {
        case "IHDR" =>
          if (n != 13) fail("bad IHDR length")
          w = u32(body).toInt; h = u32(body + 4).toInt
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          if (bytes(body + 8) != 8) fail("unsupported bit depth")
          if (bytes(body + 9) != 2) fail("unsupported color type (want RGB)")
          if (bytes(body + 12) != 0) fail("interlace unsupported")
        case "IDAT" =>
          if (w < 0) fail("IDAT before IHDR")
          idat.write(bytes, body, n)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: skip (CRC already verified)
      }
      pos = body + n + 4
    }
    if (w < 0) fail("no IHDR")
    val stride = w * 3
    val want = h * (stride + 1)
    val filtered = new Array[Byte](want)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < want && !infl.finished()) {
        val k = infl.inflate(filtered, got, want - got)
        if (k == 0 && infl.needsInput()) fail("zlib stream truncated")
        got += k
      }
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"zlib: ${e.getMessage}")
    } finally infl.end()
    if (got < want) fail(s"short raster: need $want filtered bytes, got $got")
    // Un-filter in place into the raw raster.
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (stride + 1)) & 0xff
      if (ft > 4) fail(s"unknown filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val v = filtered(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= 3) raw(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raw((y - 1) * stride + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, raw)
  }

  /** Exact-integer features from DECODED PNG pixels — identical feature
    * contract to [[ppmFeatures]], so the closed-form oracle is shared. */
  def pngFeatures(id: Long, bytes: Array[Byte]): PpmFeatures = {
    val (w, h, raster) = decodePng(bytes)
    val sums = new Array[Long](3)
    val pool = new Array[Long](12)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val cell = (y * 2 / h) * 2 + (x * 2 / w)
      var c = 0
      while (c < 3) {
        val v = (raster(i * 3 + c) & 0xff).toLong
        sums(c) += v
        pool(cell * 3 + c) += v
        c += 1
      }
      i += 1
    }
    PpmFeatures(id, w, h, w.toLong * h, sums(0), sums(1), sums(2), pool)
  }

  /** Partition-batched REAL PNG decode — same 64-row batch contract. */
  def extractPng(spark: SparkSession, media: DataFrame, idCol: String,
                 blobCol: String): Dataset[PpmFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        pngFeatures(id, bytes)
      }))
  }

  // ---- gzip corpus blobs (the compressed-TEXT face beside PNG's pixels) ----

  /** Real gzip encode (RFC 1952 member: header + DEFLATE + CRC32 + ISIZE)
    * via the JDK stream — the storage format crawl corpora actually ship
    * (WARC members, .jsonl.gz shards). */
  def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Real gzip decode with the loud-failure contract: the full stream is
    * drained so the trailing CRC32/ISIZE are VERIFIED (a truncated or
    * bit-flipped member throws — silently-padded text is how corrupt
    * shards poison a training set). */
  def gunzipBytes(bytes: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"gzip: ${e.getMessage}")
    }
  }

  /** Partition-batched gzip decode — the 64-row batch contract shared by
    * every decoder in this file. */
  def extractGzip(spark: SparkSession, media: DataFrame, idCol: String,
                  blobCol: String): Dataset[GzipFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, gz) =>
        val raw = gunzipBytes(gz)
        var s = 0L; var i = 0
        while (i < raw.length) { s += raw(i) & 0xff; i += 1 }
        GzipFeatures(id, raw.length.toLong, s)
      }))
  }

  /** Build the multimodal frame: blob + typed metadata + embedding struct
    * (documents ⋈ embeddings on doc_id = vec_id). */
  def multimodalTable(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"),
        struct(
          encode(col("text"), "utf-8").as("blob"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"),
          col("embedding").as("vec")).as("payload"))
}
