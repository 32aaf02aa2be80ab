package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (E56 [N]): binary payload round-trip, decode-stub
  * determinism, partition-batched extraction, metadata-only pruning. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("decodeStub is deterministic and byte-faithful") {
    val b = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(7L, b)
    val f2 = Multimodal.decodeStub(7L, b)
    assert(f1 == f2)
    assert(f1.n_bytes == 11L)
    assert(math.abs(f1.byte_mean - b.map(_ & 0xff).sum.toDouble / 11) < 1e-12)
    assert(f1.distinct_bytes == b.map(_ & 0xff).distinct.length)
  }

  test("extractFeatures runs partition-batched over binary payloads") {
    val mm = Multimodal.multimodalTable(
      graft.Tables.documents(spark, graft.TestSpark.SF),
      graft.Tables.embeddings(spark, graft.TestSpark.SF))
    val feats = Multimodal.extractFeatures(spark,
      mm.select($"doc_id", $"payload.blob".as("blob")), "doc_id", "blob")
    val joined = feats.toDF().join(
      graft.Tables.documents(spark, graft.TestSpark.SF),
      $"media_id" === $"doc_id")
    // n_bytes from the decoder must equal n_chars metadata (ASCII corpus)
    val mismatches = joined.filter($"n_bytes" =!= $"n_chars").count()
    assert(mismatches == 0)
  }

  test("empty payload handled") {
    val f = Multimodal.decodeStub(1L, Array.emptyByteArray)
    assert(f.n_bytes == 0L && f.byte_mean == 0.0 && f.distinct_bytes == 0L)
  }

  test("PPM: synth -> real parse roundtrips dims and raster exactly") {
    val bytes = Multimodal.synthPpm(42L, 5, 3)
    val (w, h, raster) = Multimodal.decodePpm(bytes)
    assert(w == 5 && h == 3 && raster.length == 45)
    assert((0 until 45).forall(i =>
      (raster(i) & 0xff) == ((42L * 7 + i * 13) % 256).toInt))
  }

  test("PPM: comment-tolerant header, arbitrary whitespace") {
    val raster = Array.tabulate[Byte](6)(i => (i * 10).toByte)
    val wire = "P6 # inline\n# full comment line\n 2\t1 \n255\n"
      .getBytes("US-ASCII") ++ raster
    val (w, h, r) = Multimodal.decodePpm(wire)
    assert(w == 2 && h == 1 && r.toSeq == raster.toSeq)
  }

  test("PPM: malformed input fails loudly (never pads)") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n1 1\n255\n".getBytes ++ Array[Byte](0))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePpm(Multimodal.synthPpm(1L, 4, 4).dropRight(5))
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.decodePpm("P6\n1 1\n65535\n".getBytes ++ new Array[Byte](6))
    }
  }

  test("WAV: synth -> real parse roundtrips rate and samples exactly") {
    val bytes = Multimodal.synthWav(9L, 20, 12000)
    val (rate, s) = Multimodal.decodeWav(bytes)
    assert(rate == 12000 && s.length == 20)
    assert((0 until 20).forall(i =>
      s(i) == ((9L * 31 + i * 17) % 65536 - 32768).toInt))
    // the LIST chunk between fmt and data was walked over, not tripped on
    assert(new String(bytes).contains("LIST"))
  }

  test("WAV: malformed input fails loudly") {
    intercept[IllegalArgumentException] { // not RIFF
      Multimodal.decodeWav("WAVERIFF0000".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      Multimodal.decodeWav(Multimodal.synthWav(1L, 10, 8000).dropRight(3))
    }
    intercept[IllegalArgumentException] { // stereo rejected
      val b = Multimodal.synthWav(1L, 4, 8000)
      b(22) = 2 // numChannels low byte inside fmt
      Multimodal.decodeWav(b)
    }
    intercept[IllegalArgumentException] { // negative u32 chunk size:
      // would walk pos BACKWARDS and loop forever if unchecked
      val b = "RIFF____WAVEJUNK".getBytes("US-ASCII") ++
        Array(0xF8, 0xFF, 0xFF, 0xFF).map(_.toByte) // size = -8 as Int
      Multimodal.decodeWav(b)
    }
  }

  test("WAV features: exact integer sums, extremes, zero crossings") {
    // id=0: v(i) = 17i - 32768 -> strictly increasing, all negative for
    // small i; no zero crossing until i reaches 1928
    val f = Multimodal.wavFeatures(0L, Multimodal.synthWav(0L, 10, 8000))
    assert(f.n_samples == 10 && f.sample_rate == 8000)
    assert(f.s_min == -32768 && f.s_max == -32768 + 9 * 17)
    assert(f.s_sum == (0 until 10).map(i => 17 * i - 32768).sum)
    assert(f.n_zc == 0)
    // a waveform that crosses: samples -1, 1 alternate via id choice is
    // hard to arrange with the formula, so check the rule directly on a
    // synthetic long run (values wrap mod 65536 -> crossings occur)
    val g = Multimodal.wavFeatures(7L, Multimodal.synthWav(7L, 5000, 8000))
    val vs = (0 until 5000).map(i => ((7L * 31 + i * 17) % 65536 - 32768).toInt)
    assert(g.n_zc == (1 until 5000).count(i => vs(i - 1) < 0 && vs(i) >= 0))
    assert(g.s_abs == vs.map(v => math.abs(v.toLong)).sum)
  }

  test("PNG: synth -> real decode roundtrips through DEFLATE + all 5 filters") {
    // h=7 covers filter types 0..4 plus repeats; w=5 exercises partial
    // left-neighbor windows (x < bpp on the first pixel of each row).
    val bytes = Multimodal.synthPng(42L, 5, 7)
    val (w, h, raster) = Multimodal.decodePng(bytes)
    assert(w == 5 && h == 7 && raster.length == 105)
    assert((0 until 105).forall(i =>
      (raster(i) & 0xff) == ((42L * 7 + i * 13) % 256).toInt))
    // the stream really was split across two IDAT chunks (concatenation
    // on the decode path is load-bearing)
    def countIdat(b: Array[Byte]): Int =
      b.sliding(4).count(_.sameElements("IDAT".getBytes("US-ASCII")))
    assert(countIdat(bytes) == 2)
  }

  test("PNG: 1x1 and single-row edge shapes decode") {
    val (w1, h1, r1) = Multimodal.decodePng(Multimodal.synthPng(3L, 1, 1))
    assert(w1 == 1 && h1 == 1 && r1.length == 3)
    assert((0 until 3).forall(i => (r1(i) & 0xff) == ((3L * 7 + i * 13) % 256).toInt))
    val (w2, h2, r2) = Multimodal.decodePng(Multimodal.synthPng(5L, 9, 1))
    assert(w2 == 9 && h2 == 1 && r2.length == 27)
  }

  test("PNG: malformed input fails loudly") {
    val good = Multimodal.synthPng(1L, 4, 4)
    intercept[IllegalArgumentException] { // bad signature
      Multimodal.decodePng("NOTAPNG!".getBytes ++ good.drop(8))
    }
    intercept[IllegalArgumentException] { // corrupt a raster byte -> CRC red
      val b = good.clone(); b(40) = (b(40) ^ 0xff).toByte
      Multimodal.decodePng(b)
    }
    intercept[IllegalArgumentException] { // truncated mid-IDAT
      Multimodal.decodePng(good.dropRight(16))
    }
    intercept[IllegalArgumentException] { // chunk length that would
      // truncate negative: reject before pos moves
      val b = good.clone()
      b(8) = 0xff.toByte; b(9) = 0xff.toByte // IHDR length -> huge
      Multimodal.decodePng(b)
    }
  }

  test("PNG features: shared closed form with PPM (same id, same sums)") {
    val viaPng = Multimodal.pngFeatures(7L, Multimodal.synthPng(7L, 2, 2))
    val viaPpm = Multimodal.ppmFeatures(7L, Multimodal.synthPpm(7L, 2, 2))
    assert(viaPng.sum_r == viaPpm.sum_r && viaPng.sum_g == viaPpm.sum_g &&
      viaPng.sum_b == viaPpm.sum_b)
    assert(viaPng.pool.toSeq == viaPpm.pool.toSeq)
  }

  test("gzip: roundtrip identity; truncation and bit flips fail loudly") {
    val raw = ("the quick brown fox " * 40).getBytes("UTF-8")
    val gz = Multimodal.gzipBytes(raw)
    assert(gz.length < raw.length, "DEFLATE must compress repetitive text")
    assert(Multimodal.gunzipBytes(gz).toSeq == raw.toSeq)
    intercept[IllegalArgumentException] { // truncated member: ISIZE/CRC gone
      Multimodal.gunzipBytes(gz.dropRight(6))
    }
    intercept[IllegalArgumentException] { // bit flip in the deflate body
      val b = gz.clone(); b(gz.length / 2) = (b(gz.length / 2) ^ 0x40).toByte
      Multimodal.gunzipBytes(b)
    }
    intercept[IllegalArgumentException] { // not a gzip member at all
      Multimodal.gunzipBytes("plainly not gzip".getBytes)
    }
  }

  test("PPM features: channel sums and 2x2 pool sums are exact integers") {
    // 2x2 image: every pixel lands in its own pool cell
    val bytes = Multimodal.synthPpm(7L, 2, 2)
    val f = Multimodal.ppmFeatures(7L, bytes)
    def v(i: Int) = ((7L * 7 + i * 13) % 256)
    assert(f.n_pixels == 4 && f.w == 2 && f.h == 2)
    assert(f.sum_r == v(0) + v(3) + v(6) + v(9))
    assert(f.sum_g == v(1) + v(4) + v(7) + v(10))
    assert(f.sum_b == v(2) + v(5) + v(8) + v(11))
    // pixel order: (0,0) (1,0) (0,1) (1,1) -> cells 0,1,2,3
    assert(f.pool.toSeq == Seq(
      v(0), v(1), v(2), v(3), v(4), v(5),
      v(6), v(7), v(8), v(9), v(10), v(11)))
  }
}
