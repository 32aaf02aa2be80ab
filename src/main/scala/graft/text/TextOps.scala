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

  /** MinHash base hashes: ONE md5 per shingle (not k) — the k permutations
    * come from `minhashSignature`'s universal-hash family over these. */
  def minhashBase(shing: Column): Column =
    transform(shing, sh => md5Hash48(sh, "mh"))

  /** Mersenne prime 2^61−1 for the universal hash family; a_j·h stays well
    * under 2^63 for 48-bit h and small odd a_j (no bigint overflow in
    * either engine). */
  val MinhashP: Long = 2305843009213693951L

  /** MinHash signature via universal hashing: sig_j = min over shingles of
    * (a_j·h + b_j) mod p with h the single md5-derived base hash — k
    * permutations cost k multiply-adds per shingle instead of k md5s
    * (the difference between hash-bound and scan-bound at corpus scale). */
  def minhashSignature(baseHashes: Column, k: Int): Column =
    array((0 until k).map { j =>
      val a = 2L * j + 3L; val b = 7919L * (j + 1)
      array_min(transform(baseHashes, h => pmod(h * lit(a) + lit(b), lit(MinhashP))))
    }: _*)

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
    * the SQL function accepts column args. */
  def charBigramsSql(textCol: String, cap: Int = 100): String =
    s"""array_distinct(transform(
       |  sequence(1, greatest(least(length($textCol), $cap) - 1, 1)),
       |  i -> substring($textCol, i, 2)))""".stripMargin
}
