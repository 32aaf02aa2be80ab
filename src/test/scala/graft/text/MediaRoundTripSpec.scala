package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips for the media codecs (the WireRoundTripSpec
  * discipline applied to PNG/gzip): the example-based batteries pin
  * specific malformations; these pin decode ∘ encode = id across the
  * generated input space — arbitrary dims (every w exercises the partial
  * left-neighbor window, every h ≥ 5 all five filter types), arbitrary
  * ids (every raster byte pattern), and for gzip arbitrary byte content
  * including incompressible noise and long runs. */
class MediaRoundTripSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: $res")
  }

  test("PNG: decode ∘ encode = id over dims × ids") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      id <- Gen.oneOf(Gen.choose(0L, 1L << 40), Gen.const(0L), Gen.const(Long.MaxValue))
    } yield (w, h, id)
    check("png", Prop.forAll(gen) { case (w, h, id) =>
      val (dw, dh, raster) = Multimodal.decodePng(Multimodal.synthPng(id, w, h))
      dw == w && dh == h && raster.length == w * h * 3 &&
        raster.indices.forall(i =>
          (raster(i) & 0xff) == (((id * 7 + i.toLong * 13) % 256 + 256) % 256).toInt)
    })
  }

  test("PNG: any single corrupted byte is rejected (CRC or structure)") {
    // every byte position in a small PNG: flipping it must either throw
    // or (only for a flip inside the 4-byte CRC of a chunk we skip —
    // impossible here, all chunks are load-bearing) never silently
    // change the raster
    val bytes = Multimodal.synthPng(9L, 4, 5)
    val gen = Gen.choose(8, bytes.length - 1) // past the signature
    check("pngCorrupt", Prop.forAll(gen) { pos =>
      val b = bytes.clone(); b(pos) = (b(pos) ^ 0x01).toByte
      try {
        val (w, h, raster) = Multimodal.decodePng(b)
        // decoding succeeded: the raster must still be the true one
        // (possible only if the flip landed in a bit the CRC... it can't;
        // fail loudly if it ever does)
        false
      } catch { case _: IllegalArgumentException => true }
    }, min = 60)
  }

  test("gzip: decode ∘ encode = id over arbitrary byte content") {
    val gen = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.choose(0, 4096).map(n => Array.fill[Byte](n)(7)), // long runs
      Gen.const(Array.emptyByteArray),
      Gen.choose(1, 2048).map { n => // incompressible-ish noise
        val a = new Array[Byte](n)
        new java.util.Random(n).nextBytes(a); a
      })
    check("gzip", Prop.forAll(gen) { raw =>
      Multimodal.gunzipBytes(Multimodal.gzipBytes(raw)).sameElements(raw)
    })
  }

  test("WAV/PPM: roundtrip over generated shapes") {
    val genWav = for {
      n <- Gen.choose(0, 400); r <- Gen.oneOf(8000, 12000, 44100)
      id <- Gen.choose(0L, 1L << 40)
    } yield (id, n, r)
    check("wav", Prop.forAll(genWav) { case (id, n, r) =>
      val (rate, s) = Multimodal.decodeWav(Multimodal.synthWav(id, n, r))
      rate == r && s.length == n &&
        s.indices.forall(i => s(i) == ((id * 31 + i.toLong * 17) % 65536 - 32768).toInt)
    })
    val genPpm = for {
      w <- Gen.choose(1, 20); h <- Gen.choose(1, 20)
      id <- Gen.choose(0L, 1L << 40)
    } yield (id, w, h)
    check("ppm", Prop.forAll(genPpm) { case (id, w, h) =>
      val (dw, dh, raster) = Multimodal.decodePpm(Multimodal.synthPpm(id, w, h))
      dw == w && dh == h &&
        raster.indices.forall(i => (raster(i) & 0xff) == ((id * 7 + i.toLong * 13) % 256).toInt)
    })
  }
}
