package graft.metrics

import graft.functions.Postings
import org.scalatest.funsuite.AnyFunSuite

/** Postings codec: roundtrip on edge lists, byte-length closed form,
  * strict-monotonicity enforcement. */
class PostingsSpec extends AnyFunSuite {

  private def rt(ids: Array[Long]): Unit =
    assert(Postings.decode(Postings.encode(ids)).toSeq == ids.toSeq)

  test("roundtrip: empty, single, dense, sparse, huge ids") {
    rt(Array.empty)
    rt(Array(0L))
    rt(Array(0L, 1L, 2L, 3L))
    rt(Array(5L, 131L, 1000000L, 123456789012345L))
    rt(Array.tabulate(1000)(i => i.toLong * 7 + 3))
    rt(Array(Long.MaxValue - 1, Long.MaxValue))
  }

  test("byte length equals the closed form") {
    def uv(x: Long): Int =
      (java.lang.Long.toBinaryString(math.max(x, 0L)).length + 6) / 7
    val ids = Array(3L, 4L, 131L, 20000L)
    val expect = uv(4) + uv(3) + uv(1) + uv(127) + uv(19869)
    assert(Postings.encode(ids).length == expect)
    // a dense list costs ~1 byte per posting
    val dense = Array.tabulate(500)(i => 1000L + i)
    assert(Postings.encode(dense).length == uv(500) + uv(1000) + 499)
  }

  test("non-increasing ids are rejected loudly") {
    intercept[IllegalArgumentException](Postings.encode(Array(5L, 5L)))
    intercept[IllegalArgumentException](Postings.encode(Array(5L, 4L)))
  }
}
