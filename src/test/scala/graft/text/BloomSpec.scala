package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-math Bloom filter: no false negatives, sane false-positive
  * rate at the designed load, build bounded by the bitmap. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives; FP rate near theory at designed load") {
    val n = 20000 // ~2% of 2^20 bits per probe → theoretical FP ~ (k·n/m)^k
    val keys = (0L until n).toDF("h")
    val bitmap = Bloom.build(keys, "h", 4)
    assert(bitmap.length == Bloom.Words)
    val members = keys.filter(Bloom.mightContain(bitmap, col("h"), 4)).count()
    assert(members == n, "bloom dropped a member — impossible by construction")
    val probes = 20000
    val nonMembers = (1000000L until 1000000L + probes).toDF("h")
    val fp = nonMembers.filter(Bloom.mightContain(bitmap, col("h"), 4)).count()
    val load = 1.0 - math.exp(-4.0 * n / Bloom.Bits)
    val theory = math.pow(load, 4)
    assert(fp.toDouble / probes < theory * 3 + 0.001,
      s"FP rate ${fp.toDouble / probes} far above theoretical $theory")
  }

  test("bitmap words: only set bits, deterministic rebuild") {
    val keys = Seq(7L, 8L, 9L).toDF("h")
    val a = Bloom.build(keys, "h", 4)
    val b = Bloom.build(keys.repartition(5), "h", 4)
    assert(a.toSeq == b.toSeq) // partitioning cannot move a bit
    assert(a.count(_ != 0L) <= 12) // ≤ k·n words touched
  }
}
