package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators (SURVEY §2 E52–E55 [N]): tokenization,
  * shingling, deterministic cross-engine hashing, MinHash, SimHash, quality
  * signals. Everything is built from codegen'd builtins (no Scala UDFs) so
  * the hot paths stay inside whole-stage codegen, and every hash derives
  * from md5 — available byte-identically in Spark and DuckDB — so dedup
  * results are oracle-checkable.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-shingles. Guarded: Spark's `sequence(1, k)` counts DOWN
    * when k < 1, so short docs must short-circuit to an empty array. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** 48-bit deterministic hash from md5 — stable across engines (DuckDB:
    * `CAST(concat('0x', substr(md5(x),1,12)) AS BIGINT)`). */
  def md5Hash48(c: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + "|"), c)), 1, 12), 16, 10).cast("long")

  /** Max slots derivable from the two md5s: 64 hex chars / 8 per slot. */
  val MinhashMaxK: Int = 8

  /** MinHash base hashes: TWO md5s per shingle (seeds "mhA"/"mhB"),
    * concatenated into 64 hex chars = 256 independent bits, then pre-parsed
    * into `MinhashMaxK` non-overlapping 32-bit longs. The k permutations
    * cost 2 md5s per shingle (not k) while every slot gets genuinely
    * independent hash bits. (An earlier affine-map family over ONE 48-bit
    * hash never wrapped mod p, so all slots were monotone in the same min —
    * a degenerate estimator.) Parsing happens HERE, once per shingle — the
    * nested transform binds the hex string as a lambda variable, so the
    * md5s aren't re-evaluated per chunk, and `minhashSignature`'s fold then
    * touches only longs. Keep this as its own column (e.g. `withColumn`):
    * a non-cheap alias is not inlined by CollapseProject, so downstream
    * multi-reference stays one evaluation. */
  def minhashBase(shing: Column): Column =
    transform(
      transform(shing, sh =>
        concat(md5(concat(lit("mhA|"), sh)), md5(concat(lit("mhB|"), sh)))),
      s => transform(sequence(lit(0), lit(MinhashMaxK - 1)),
        j => conv(substring(s, j * 8 + 1, lit(8)), 16, 10).cast("long")))

  /** MinHash signature: sig_j = min over shingles of the j-th 32-bit chunk —
    * ONE fold over the chunk arrays (element-wise `least` against a
    * MaxValue-seeded accumulator), not k separate array walks. Chunks of
    * independent md5 output bits are independent hash functions, so per-slot
    * agreement is a faithful Bernoulli(J) sample; 32-bit values make
    * shingle-collisions ~2^-32 (negligible at corpus scale). Mirrored
    * bit-for-bit in DuckDB via `substr(md5 || md5, j*8+1, 8)`. Empty
    * shingle sets yield all-null slots (= `list_min([])` in the oracle). */
  def minhashSignature(baseChunks: Column, k: Int): Column = {
    require(k <= MinhashMaxK, s"minhashSignature supports k <= $MinhashMaxK")
    val folded = aggregate(
      baseChunks,
      array_repeat(lit(Long.MaxValue), k),
      // slice: zip_with pads the shorter side with nulls, so a k < MaxK
      // accumulator would silently grow back to MaxK slots.
      (acc, x) => zip_with(acc, if (k < MinhashMaxK) slice(x, 1, k) else x,
        (a, b) => least(a, b)))
    when(size(baseChunks) > 0, folded)
      .otherwise(array((0 until k).map(_ => lit(null).cast("long")): _*))
  }

  /** LSH band key: hash of the signature slice for one band. Docs sharing a
    * band key are near-dup candidates — the join is then an equi-join on
    * (band, key), never an all-pairs comparison (the 100 TB path). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))): _*)

  /** 32-bit SimHash over distinct tokens (SQL-expressed so DuckDB can mirror
    * it bit-for-bit): per bit b, majority vote of token-hash bits. */
  val simhash32Sql: String =
    """aggregate(
      |  sequence(0, 31),
      |  0L,
      |  (acc, b) -> acc + IF(
      |    aggregate(__hs, 0L, (s, h) -> s + IF((shiftright(h, b) % 2) = 1, 1L, -1L)) > 0,
      |    shiftleft(1L, b), 0L))""".stripMargin

  /** Token hash column feeding simhash: 32-bit md5-derived per distinct token. */
  def tokenHashes(toks: Column): Column =
    transform(array_distinct(toks), t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** Jaccard similarity of two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Stopword ratio over tokens. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** Exact-dedup key: sha256 of the raw text (E52). */
  def exactKey(text: Column): Column = sha2(text, 256)

  /** Distinct character bigrams of the first `cap` chars — the n-gram
    * features for the language-ID heuristic (E55 [N]). SQL-expressed (via
    * expr) because the DataFrame `substring` only takes literal positions;
    * the SQL function accepts column args. Texts shorter than 2 chars have
    * NO bigrams — an empty array, not a spurious ''/single-char feature
    * (which would pollute profiles as a shared fake bigram). */
  def charBigramsSql(textCol: String, cap: Int = 100): String =
    s"""CASE WHEN length($textCol) >= 2 THEN
       |  array_distinct(transform(
       |    sequence(1, least(length($textCol), $cap) - 1),
       |    i -> substring($textCol, i, 2)))
       |ELSE CAST(array() AS array<string>) END""".stripMargin
}
