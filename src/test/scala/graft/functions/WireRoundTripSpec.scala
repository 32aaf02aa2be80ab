package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips for the wire codecs — the golden-byte suites pin
  * the encodings to the public specs at specific points; these pin the
  * codecs across the generated input space (string contents incl.
  * unicode, extreme numerics, empty collections, deep nesting, packed
  * run lengths, snappy match structure on low-entropy inputs). */
class WireRoundTripSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---------- generators ----------
  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.const("host zone"),           // space
    Gen.const("метрика.έξι"),         // multi-byte UTF-8 + dot
    Gen.const("a|b{}\\\"\n"))         // wire-hostile characters
  private val genTs: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 1800000000000L), Gen.const(0L), Gen.const(-1L),
    Gen.const(Long.MaxValue), Gen.const(Long.MinValue))
  private val genVal: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e6, 1e6), Gen.const(0.0), Gen.const(-0.0),
    Gen.const(Double.MaxValue), Gen.const(Double.MinValue),
    Gen.const(Double.PositiveInfinity), Gen.const(Double.NaN))

  private val genLabel: Gen[ProtoWire.Label] =
    for (n <- genStr; v <- genStr) yield ProtoWire.Label(n, v)
  private val genSample: Gen[ProtoWire.Sample] =
    for (v <- genVal; t <- genTs) yield ProtoWire.Sample(v, t)
  private val genSeries: Gen[ProtoWire.Series] = for {
    ls <- Gen.listOfN(3, genLabel).flatMap(l => Gen.someOf(l)).map(_.toSeq)
    ss <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, genSample))
  } yield ProtoWire.Series(ls, ss)

  test("v1 WriteRequest: decode ∘ encode = id over the generated space") {
    // NaN-safe comparison: compare bit patterns, not doubles
    def canon(s: Seq[ProtoWire.Series]) = s.map(ts => (ts.labels,
      ts.samples.map(x =>
        (java.lang.Double.doubleToLongBits(x.value), x.timestamp))))
    check("writeRequest", Prop.forAll(Gen.listOfN(4, genSeries)) { ss =>
      canon(ProtoWire.decode(ProtoWire.encode(ss))) == canon(ss)
    })
  }

  private val genHist: Gen[ProtoWire.HistogramPb] = for {
    cnt <- Gen.choose(0L, 1L << 40)
    sum <- Gen.choose(-1e9, 1e9)
    schema <- Gen.choose(-4, 8)
    zc <- Gen.choose(0L, 1000L)
    nSpans <- Gen.choose(0, 3)
    negSpans <- Gen.listOfN(nSpans,
      Gen.zip(Gen.choose(-100, 100), Gen.choose(0, 10)))
    negDeltas <- Gen.listOfN(nSpans * 2, Gen.choose(-500L, 500L))
    pSpans <- Gen.choose(0, 3)
    posSpans <- Gen.listOfN(pSpans,
      Gen.zip(Gen.choose(-100, 100), Gen.choose(0, 10)))
    posDeltas <- Gen.listOfN(pSpans * 2, Gen.choose(-500L, 500L))
    ts <- Gen.choose(0L, 1800000000000L)
  } yield ProtoWire.HistogramPb(cnt, sum, schema, zc,
    negSpans, negDeltas, posSpans, posDeltas, ts)

  private val genSeriesV2: Gen[ProtoWire.SeriesV2] = for {
    refs <- Gen.listOf(Gen.choose(0, 1 << 20)).map(_.take(8))
    ss <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, genSample))
    ex <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, for {
      r <- Gen.listOfN(2, Gen.choose(0, 100))
      v <- Gen.choose(-1e6, 1e6); t <- Gen.choose(0L, 1800000000000L)
    } yield ProtoWire.ExemplarV2(r, v, t)))
    hs <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, genHist))
  } yield ProtoWire.SeriesV2(refs, ss, ex, hs)

  test("v2 Request: decode ∘ encode = id incl. histograms/exemplars") {
    val gen = for {
      syms <- Gen.listOf(genStr).map(_.take(10))
      ts <- Gen.listOfN(3, genSeriesV2)
    } yield ProtoWire.RequestV2(syms, ts)
    // NaN-safe: doubles compared by bit pattern
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    def canon(r: ProtoWire.RequestV2) = (r.symbols, r.timeseries.map(ts =>
      (ts.labelsRefs,
        ts.samples.map(s => (bits(s.value), s.timestamp)),
        ts.exemplars.map(e => (e.labelsRefs, bits(e.value), e.timestamp)),
        ts.histograms.map(h => h.copy(sum = 0.0) -> bits(h.sum)))))
    check("requestV2", Prop.forAll(gen) { req =>
      canon(ProtoWire.decodeV2(ProtoWire.encodeV2(req))) == canon(req)
    })
  }

  test("ReadRequest/ReadResponse: decode ∘ encode = id") {
    val genMatcher = for {
      t <- Gen.choose(0, 3); n <- genStr; v <- genStr
    } yield ProtoWire.MatcherPb(t, n, v)
    val genQ = for {
      s <- genTs; e <- genTs; ms <- Gen.listOfN(2, genMatcher)
    } yield ProtoWire.ReadQueryPb(s, e, ms)
    val gen = for {
      qs <- Gen.listOfN(2, genQ)
      at <- Gen.listOf(Gen.choose(0, 1)).map(_.take(3))
    } yield ProtoWire.ReadRequestPb(qs, at)
    check("readRequest", Prop.forAll(gen) { req =>
      ProtoWire.decodeReadRequest(ProtoWire.encodeReadRequest(req)) == req
    })
  }

  // snappy: structured generators biased toward matches (runs, repeats)
  private val genBytes: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray),
    Gen.choose(0, 4000).map(n => Array.fill(n)(7.toByte)),
    for {
      unit <- Gen.listOfN(9, Gen.choose(-128, 127).map(_.toByte))
      reps <- Gen.choose(1, 600)
    } yield Array.fill(reps)(unit).flatten.toArray,
    Gen.choose(0, 70000).map(n => Array.tabulate[Byte](n)(i => (i % 13).toByte)))

  test("snappy: decompress ∘ compress = id across match structures") {
    check("snappy", Prop.forAll(genBytes) { b =>
      java.util.Arrays.equals(Snappy.decompress(Snappy.compress(b)), b)
    }, min = 200)
  }

  test("chunked framing: unframe ∘ frame = id over message lists") {
    val gen = Gen.listOfN(3,
      Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    check("framing", Prop.forAll(gen) { msgs =>
      ProtoWire.unframeMessages(ProtoWire.frameMessages(msgs))
        .zip(msgs).forall { case (a, b) => java.util.Arrays.equals(a, b) } &&
        ProtoWire.unframeMessages(ProtoWire.frameMessages(msgs)).length == msgs.length
    })
  }
}
