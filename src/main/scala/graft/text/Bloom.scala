package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A zero-UDF Bloom filter in plain column math — the broadcast-side
  * pre-filter a 100 TB decontamination join needs (ship an MB-scale
  * bitmap to every task instead of shuffling the corpus's shingles into
  * a join).
  *
  * Build is DISTRIBUTED: each key contributes its k probe positions,
  * positions aggregate per 64-bit word with `bit_or` — the shuffle is
  * bounded by the BITMAP size (m/64 rows), never the corpus — and only
  * the finished words (m/8 bytes) come to the driver, the same
  * model-sized-collect class as the Ivf/PQ codebooks. The probe is a
  * literal-array lookup (`element_at` + bit test) ANDed over the k
  * probes — map-side, codegen'd, no join.
  *
  * Probes derive from md5 (byte-identical in DuckDB), so candidate sets
  * are cross-engine EXACT: a bloom bit is set iff some build-side key
  * maps a probe onto it, which the oracle replicates as a positions
  * semi-join. No false negatives by construction; false positives are
  * whatever the k md5 probes collide on — deterministic, not tuned
  * away. */
object Bloom {

  /** m = 2^20 bits (128 KiB) as 16384 longs; k = 4 probes. */
  val Words = 16384
  val Bits: Long = Words.toLong * 64L

  /** The i-th probe position of a (long) key: an independent 48-bit
    * md5 hash mod m. */
  def position(h: Column, i: Int): Column =
    pmod(TextOps.md5Hash48(h.cast("string"), s"bl$i"), lit(Bits))

  /** All k probe positions. */
  def positions(h: Column, k: Int): Column =
    array((0 until k).map(position(h, _)): _*)

  /** Distributed build: bitmap words via bit_or per word index. */
  def build(keys: DataFrame, keyCol: String, k: Int): Array[Long] = {
    val words = keys
      .select(explode(positions(col(keyCol), k)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("bits"))
      .collect()
    val arr = new Array[Long](Words)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Map-side membership probe against a built bitmap. */
  def mightContain(bitmap: Array[Long], h: Column, k: Int): Column = {
    val lut = typedlit(bitmap.toSeq)
    (0 until k).map { i =>
      val pos = position(h, i)
      val word = element_at(lut, (pos / 64).cast("int") + 1)
      // shiftright with a COLUMN shift needs the SQL form; sign-safe
      // because we mask to one bit
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0
    }.reduce(_ && _)
  }
}
