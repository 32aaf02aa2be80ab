package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The protobuf wire codec itself: golden bytes (hand-assembled from the
  * public wire format, so the encoder is pinned to the spec and not just
  * to its own decoder), roundtrip identity, proto3-default tolerance,
  * and unknown-field skipping (forward compatibility — a real
  * WriteRequest may carry fields this schema subset doesn't model,
  * e.g. exemplars=3 / histograms=4). */
class ProtoWireSpec extends AnyFunSuite {
  import ProtoWire._

  private val fixture = Seq(
    Series(
      Seq(Label("__name__", "http_requests_total"), Label("job", "api")),
      Seq(Sample(1.5, 1704067200000L), Sample(2.5, 1704067215000L))),
    Series(
      Seq(Label("__name__", "up")),
      Seq(Sample(1.0, 1704067200000L))))

  test("roundtrip identity on a two-series request") {
    assert(decode(encode(fixture)) == fixture)
  }

  test("golden bytes: a minimal request matches the hand-assembled wire") {
    // WriteRequest{ts{label{name:"a",value:"b"}, sample{value:1.0,
    // timestamp:5}}}:
    //   0A          field1 LEN (timeseries)
    //   15          len 21 = label entry (2+6) + sample entry (2+11)
    //     0A 06     field1 LEN (label), len 6
    //       0A 01 61   name="a"
    //       12 01 62   value="b"
    //     12 0B     field2 LEN (sample), len 11 = (1+8) + (1+1)
    //       09 00..F0 3F  field1 I64 double 1.0 (LE)
    //       10 05         field2 VARINT ts=5
    val expected = Array(
      0x0A, 0x15,
      0x0A, 0x06, 0x0A, 0x01, 0x61, 0x12, 0x01, 0x62,
      0x12, 0x0B, 0x09, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xF0, 0x3F,
      0x10, 0x05).map(_.toByte)
    val got = encode(Seq(Series(Seq(Label("a", "b")), Seq(Sample(1.0, 5L)))))
    assert(got.toSeq == expected.toSeq)
    assert(decode(expected) ==
      Seq(Series(Seq(Label("a", "b")), Seq(Sample(1.0, 5L)))))
  }

  test("proto3 defaults: omitted fields read as 0 / empty string") {
    // a canonical Go encoder omits zero values: sample{} is empty bytes
    //   0A 04  timeseries len 4
    //     0A 00  empty label
    //     12 00  empty sample
    val wire = Array(0x0A, 0x04, 0x0A, 0x00, 0x12, 0x00).map(_.toByte)
    assert(decode(wire) ==
      Seq(Series(Seq(Label("", "")), Seq(Sample(0.0, 0L)))))
  }

  test("unknown fields skip cleanly on every wire type") {
    // timeseries carrying an unknown field 3 (LEN — e.g. exemplars),
    // an unknown varint field 7, and an unknown fixed32 field 8
    // around one real label
    val wire = Array(
      0x0A, 0x13,                         // len 19 = 4 + 2 + 5 + 8
      0x1A, 0x02, 0x08, 0x01,             // field3 LEN (2 bytes)
      0x38, 0x2A,                         // field7 VARINT 42
      0x45, 0x01, 0x02, 0x03, 0x04,       // field8 I32
      0x0A, 0x06, 0x0A, 0x01, 0x61, 0x12, 0x01, 0x62).map(_.toByte)
    assert(decode(wire) == Seq(Series(Seq(Label("a", "b")), Nil)))
  }

  test("truncated input fails loudly, never silently drops samples") {
    val full = encode(fixture)
    intercept[IllegalArgumentException] {
      decode(full.dropRight(3))
    }
  }

  test("crafted skip lengths fail loudly instead of looping forever") {
    // unknown LEN field 7 inside a Label whose varint length truncates
    // to a NEGATIVE Int (0xFFFFFFFF): an unguarded skip would move pos
    // backwards and spin `while (hasMore)` forever on an untrusted
    // /api/v1/write body. Must throw within the uniform envelope.
    val negLen = Array(
      0x0A, 0x08,                               // timeseries, len 8
      0x0A, 0x06,                               // labels, len 6
      0x3A, 0xFF, 0xFF, 0xFF, 0xFF, 0x0F).map(_.toByte) // field7 LEN 2^32-1
    intercept[IllegalArgumentException] { decode(negLen) }
    // unknown LEN field whose (positive) length overruns the buffer
    val overrun = Array(
      0x0A, 0x06, 0x0A, 0x04, 0x3A, 0x7F, 0x61, 0x62).map(_.toByte)
    intercept[IllegalArgumentException] { decode(overrun) }
    // unknown fixed64/fixed32 fields truncated at the buffer edge
    val truncF64 = Array(0x0A, 0x04, 0x0A, 0x02, 0x39, 0x01).map(_.toByte)
    intercept[IllegalArgumentException] { decode(truncF64) }
    val truncF32 = Array(0x0A, 0x04, 0x0A, 0x02, 0x3D, 0x01).map(_.toByte)
    intercept[IllegalArgumentException] { decode(truncF32) }
  }

  test("negative and large timestamps/values survive (varint 10-byte path)") {
    val s = Seq(Series(Seq(Label("n", "v")),
      Seq(Sample(-123.456, -1L), Sample(Double.MaxValue, Long.MaxValue))))
    assert(decode(encode(s)) == s)
  }

  // ---- remote-write 2.0 ----

  private val v2Fixture = RequestV2(
    Seq("", "__name__", "up", "job", "api", "trace_id", "t1"),
    Seq(
      SeriesV2(Seq(1, 2, 3, 4),
        Seq(Sample(1.0, 1704067200000L), Sample(2.0, 1704067215000L)),
        Seq(ExemplarV2(Seq(5, 6), 1.5, 1704067210000L))),
      SeriesV2(Seq(1, 2), Seq(Sample(0.0, 0L)), Nil)))

  test("v2 roundtrip: symbols, packed refs, samples, exemplars") {
    assert(decodeV2(encodeV2(v2Fixture)) == v2Fixture)
  }

  test("v2 golden: symbols land in field 4, packed labels_refs in LEN") {
    val req = RequestV2(Seq("a"), Seq(SeriesV2(Seq(300), Nil, Nil)))
    // symbols: tag (4<<3)|2 = 0x22, len 1, 'a'
    // timeseries: tag (5<<3)|2 = 0x2A, len 4:
    //   packed refs: tag 0x0A, len 2, varint 300 = AC 02
    val expected = Array(
      0x22, 0x01, 'a'.toInt,
      0x2A, 0x04, 0x0A, 0x02, 0xAC, 0x02).map(_.toByte)
    assert(encodeV2(req).toSeq == expected.toSeq)
    assert(decodeV2(expected) == req)
  }

  test("v2 decoder accepts the UNPACKED labels_refs spelling") {
    // series: two unpacked wiretype-0 field-1 entries: 08 01 08 02
    val wire = Array(0x2A, 0x04, 0x08, 0x01, 0x08, 0x02).map(_.toByte)
    assert(decodeV2(wire) == RequestV2(Nil, Seq(SeriesV2(Seq(1, 2), Nil, Nil))))
  }

  test("v2 decoder skips unknown fields (metadata=5, created_timestamp=6)") {
    // series with field 5 (LEN, 2 bytes) and field 6 (varint) around refs
    val wire = Array(0x2A, 0x0A,
      0x2A, 0x02, 0x08, 0x01,  // metadata (skipped)
      0x30, 0x07,              // created_timestamp (skipped)
      0x0A, 0x02, 0x01, 0x02).map(_.toByte)
    assert(decodeV2(wire) == RequestV2(Nil, Seq(SeriesV2(Seq(1, 2), Nil, Nil))))
  }

  test("remote-read messages: request + response roundtrip, enum forms") {
    val req = ReadRequestPb(
      Seq(ReadQueryPb(1000L, 2000L, Seq(
        MatcherPb(0, "__name__", "up"), MatcherPb(2, "job", "a.*"))),
        ReadQueryPb(0L, 0L, Seq(MatcherPb(3, "x", "y")))),
      acceptedTypes = Seq(1, 0))
    assert(decodeReadRequest(encodeReadRequest(req)) == req)
    // golden: one query, EQ matcher (type 0 omitted as proto3 default)
    //   0A 0E (query len 14): 08 E8 07 (start=1000), 1A 09 matcher:
    //     12 01 61 (name "a"), 12?? no: name field 2, value field 3
    val g = ReadRequestPb(Seq(ReadQueryPb(1000L, 0L,
      Seq(MatcherPb(0, "a", "b")))), Nil)
    val expected = Array(
      0x0A, 0x0B,
      0x08, 0xE8, 0x07,
      0x1A, 0x06, 0x12, 0x01, 'a'.toInt, 0x1A, 0x01, 'b'.toInt)
      .map(_.toByte)
    assert(encodeReadRequest(g).toSeq == expected.toSeq)
    // unpacked accepted_response_types spelling decodes too
    val unpacked = Array(0x10, 0x01, 0x10, 0x00).map(_.toByte)
    assert(decodeReadRequest(unpacked) == ReadRequestPb(Nil, Seq(1, 0)))
    // response roundtrip reuses the v1 TimeSeries shapes
    val resp = Seq(fixture, Nil)
    assert(decodeReadResponse(encodeReadResponse(resp)) == resp)
  }

  test("v2 histograms: zigzag sint fields, packed deltas, roundtrip + golden") {
    val h = HistogramPb(countInt = 5, sum = 2.5, schema = 3,
      zeroCountInt = 1,
      negSpans = Seq((-2, 1)), negDeltas = Seq(1L),
      posSpans = Seq((0, 2), (3, 1)), posDeltas = Seq(2L, -1L, 4L),
      timestamp = 1704067200000L)
    val req = RequestV2(Seq("", "__name__", "lat"),
      Seq(SeriesV2(Seq(1, 2), Nil, Nil, Seq(h))))
    assert(decodeV2(encodeV2(req)) == req)
    // golden: a minimal histogram — schema -1 (zigzag 1), one pos span
    // (offset -3 -> zigzag 5, length 2), packed deltas [1, -2] -> [02, 03]
    val g = HistogramPb(0, 0.0, -1, 0, Nil, Nil, Seq((-3, 2)), Seq(1L, -2L), 0L)
    val expected = Array(
      0x19, 0, 0, 0, 0, 0, 0, 0, 0,   // sum=0.0 fixed64 (field 3)
      0x20, 0x01,                     // schema sint32 zigzag(-1)=1
      0x5A, 0x04, 0x08, 0x05, 0x10, 0x02, // pos span: off zz(-3)=5, len 2
      0x62, 0x02, 0x02, 0x03          // packed deltas zz(1)=2, zz(-2)=3
    ).map(_.toByte)
    val got = {
      // isolate the histogram message bytes via a series wrapper
      val series = decodeV2(encodeV2(RequestV2(Nil,
        Seq(SeriesV2(Nil, Nil, Nil, Seq(g)))))).timeseries.head
      assert(series.histograms == Seq(g))
      encodeV2(RequestV2(Nil, Seq(SeriesV2(Nil, Nil, Nil, Seq(g)))))
    }
    // 2A <len> 1A <len> <histogram bytes>
    assert(got.drop(4).toSeq == expected.toSeq, got.map(b => f"$b%02X").mkString(" "))
    // unpacked delta spelling decodes too: field 12 varint entries
    val unpacked = Array(0x2A, 0x06, 0x1A, 0x04, 0x60, 0x02, 0x60, 0x03)
      .map(_.toByte)
    assert(decodeV2(unpacked).timeseries.head.histograms.head.posDeltas ==
      Seq(1L, -2L))
  }

  test("chunked transport: ChunkedReadResponse pb + uvarint/CRC32C framing") {
    val m = ChunkedReadResponsePb(Seq(ChunkedSeriesPb(
      Seq(Label("__name__", "cpu"), Label("job", "a")),
      Seq(ChunkPb(1000L, 2000L, 1, Seq[Byte](1, 2, 3)),
        ChunkPb(3000L, 4000L, 1, Seq[Byte](-1, 0, 127))))), 2L)
    assert(decodeChunkedReadResponse(encodeChunkedReadResponse(m)) == m)
    // framing roundtrip over multiple messages, CRC verified
    val msgs = Seq(encodeChunkedReadResponse(m), Array[Byte](9, 9))
    val framed = frameMessages(msgs)
    val back = unframeMessages(framed)
    assert(back.map(_.toSeq) == msgs.map(_.toSeq))
    // golden CRC32C: "123456789" -> 0xE3069283 (the Castagnoli check value)
    assert(crc32c("123456789".getBytes("US-ASCII")) == 0xE3069283L)
    // corrupt payload byte -> CRC rejection
    val bad = framed.clone(); bad(framed.length - 1) = (bad.last ^ 1).toByte
    intercept[IllegalArgumentException] { unframeMessages(bad) }
    // truncated frame -> loud failure
    intercept[IllegalArgumentException] {
      unframeMessages(framed.dropRight(1).take(framed.length - 3))
    }
  }

  test("v1+v2 wires through snappy: the full Content-Encoding stack") {
    val pb = encode(fixture)
    assert(Snappy.decompress(Snappy.compress(pb)).toSeq == pb.toSeq)
    val pb2 = encodeV2(v2Fixture)
    assert(decodeV2(Snappy.decompress(Snappy.compress(pb2))) == v2Fixture)
  }
}
