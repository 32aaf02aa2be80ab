package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The snappy block codec: golden bytes hand-assembled from the public
  * format description (so the DECOMPRESSOR is pinned to the spec and can
  * read any real encoder's output, including element types our own
  * compressor never emits), roundtrip on adversarial inputs, and loud
  * failure on malformed streams. */
class SnappySpec extends AnyFunSuite {

  test("golden: literal-only stream") {
    // len=5 ; literal tag (5-1)<<2 = 0x10 ; "hello"
    val wire = Array(0x05, 0x10) .map(_.toByte) ++ "hello".getBytes("US-ASCII")
    assert(new String(Snappy.decompress(wire), "US-ASCII") == "hello")
  }

  test("golden: copy-1 element (11-bit offset) — the RLE overlap case") {
    // "ab" then copy(offset=2, len=6) -> "abababab"
    // len=8 ; literal len2 tag 0x04 'a' 'b' ;
    // copy-1: tag = 1 | ((6-4)<<2) | ((2>>8)<<5) = 0x09, offset low = 2
    val wire = Array(0x08, 0x04, 'a'.toInt, 'b'.toInt, 0x09, 0x02).map(_.toByte)
    assert(new String(Snappy.decompress(wire), "US-ASCII") == "abababab")
  }

  test("golden: copy-2 and copy-4 elements decode") {
    // "abcd" + copy2(offset=4, len=4) + copy4(offset=8, len=2) = "abcdabcdab"
    val wire = Array(
      0x0A,                          // total 10
      0x0C, 'a'.toInt, 'b'.toInt, 'c'.toInt, 'd'.toInt, // literal 4
      0x0E, 0x04, 0x00,              // copy-2: tag 2|(3<<2), off LE16 = 4
      0x07, 0x08, 0x00, 0x00, 0x00   // copy-4: tag 3|(1<<2), off LE32 = 8
    ).map(_.toByte)
    assert(new String(Snappy.decompress(wire), "US-ASCII") == "abcdabcdab")
  }

  test("golden: long-literal length escapes (1- and 2-byte forms)") {
    val payload = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    // 61-byte literal: tag (60<<2), extra byte 60
    val wire1 = Array(61, 60 << 2, 60).map(_.toByte) ++ payload.take(61)
    assert(Snappy.decompress(wire1).toSeq == payload.take(61).toSeq)
    // 300-byte literal: tag (61<<2), extra LE16 = 299
    val wire2 = Array(0xAC, 0x02, 61 << 2, 0x2B, 0x01).map(_.toByte) ++ payload
    assert(Snappy.decompress(wire2).toSeq == payload.toSeq)
  }

  test("roundtrip: repetitive, random, tiny, empty, and >64-byte matches") {
    val rnd = new Random(7)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "x".getBytes,
      "abcabcabcabcabcabcabcabc".getBytes,
      ("__name__app_events_click" * 50).getBytes, // long match chains > 64
      Array.fill(100000)(42.toByte),              // max-range RLE
      Array.tabulate[Byte](70000)(i => (i % 7).toByte),
      rnd.nextBytes(33333),                       // incompressible
      rnd.nextBytes(3))
    cases.foreach { c =>
      val z = Snappy.compress(c)
      assert(Snappy.decompress(z).toSeq == c.toSeq, s"len ${c.length}")
    }
    // the repetitive case must actually compress (copies cap at 64
    // bytes per element — ~157 three-byte copy-2s for 10k of "ab")
    assert(Snappy.compress(("ab" * 5000).getBytes).length < 600)
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException] { // copy before any output
      Snappy.decompress(Array(0x04, 0x09, 0x02).map(_.toByte))
    }
    intercept[IllegalArgumentException] { // literal overruns declared total
      Snappy.decompress(Array(0x01, 0x10).map(_.toByte) ++ "hello".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated literal body
      Snappy.decompress(Array(0x05, 0x10, 'h'.toInt).map(_.toByte))
    }
    intercept[IllegalArgumentException] { // declared more than delivered
      Snappy.decompress(Array(0x63, 0x10).map(_.toByte) ++ "hello".getBytes)
    }
    intercept[IllegalArgumentException] { // 4-byte literal-length escape
      // that truncates to a NEGATIVE Int: must hit the uniform error
      // envelope, not a raw ArrayIndexOutOfBounds from arraycopy
      Snappy.decompress(
        Array(0x05, 0xFC, 0x00, 0x00, 0x00, 0x80).map(_.toByte))
    }
    intercept[IllegalArgumentException] { // zero-length escape (len = 0
      // after +1 on le(4) = -1) is equally malformed
      Snappy.decompress(
        Array(0x05, 0xFC, 0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte))
    }
  }
}
