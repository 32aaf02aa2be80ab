package graft.queries

import graft.Tables._
import graft.text.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-3 training-data curation depth [N]: repetition-based quality
  * signals (the Gopher-rules family), PII scrubbing, and unigram-LM
  * cross-entropy scoring — the three filters a 100 TB corpus pass runs
  * between dedup and sampling.
  *
  * Cross-engine determinism rules (same as TextQueries): FP values that
  * feed comparisons or sums are either single-expression computations
  * (bit-identical in both engines) or rounded-then-DECIMAL-summed so
  * accumulation order can't flip a digit; every shuffle is keyed by
  * (lang | doc_id | token) — nothing here is all-pairs.
  */
object CurationQueries {

  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("toks", TextOps.tokens(col("text")))

  /** The q209 hash-linear classifier's per-doc sigmoid score `p` (6 dp)
    * — shared by the per-lang rollup (q209) and the threshold-sweep
    * calibration face (q261). */
  private def classifierScores(s: SparkSession, d: String): DataFrame =
    docsWithTokens(s, d)
      .select(col("lang"), col("doc_id"),
        explode(concat(col("toks"), TextOps.shingles(col("toks"), 2))).as("f"))
      .withColumn("b", pmod(TextOps.md5Hash48(col("f"), "qc"), lit(256)))
      .withColumn("w_milli",
        pmod(TextOps.md5Hash48(col("b").cast("string"), "qw"), lit(2001)) - 1000)
      .groupBy(col("lang"), col("doc_id"))
      .agg(count(lit(1)).as("nf"), sum(col("w_milli")).as("sw"))
      .withColumn("sc", col("sw").cast("double") / (col("nf") * 1000.0))
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("sc"))), 6))

  /** The q92 near-dup cluster pipeline (banded MinHash LSH candidates →
    * signature-verify → pointer-doubling connected components), shared
    * with the canonical-selection face (q190). */
  /** The banded-candidate → signature-verified near-dup pair list that
    * feeds the component fold (and q266's leakage accounting). */
  private def dedupPairs(s: SparkSession, d: String): DataFrame = {
    val sig = docsWithTokens(s, d)
      .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
      .select(col("lang"), col("doc_id"),
        TextOps.minhashSignature(col("bh"), 8).as("sig"))
    val banded = sig.select(col("lang"), col("doc_id"), col("sig"),
      explode(TextOps.bandKeys(col("sig"), 4, 2)).as("bk"))
    val lhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id1"), col("sig").as("sig1"))
    val rhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id2"), col("sig").as("sig2"))
    lhs.join(rhs, Seq("lang", "bk")).filter(col("id1") < col("id2"))
      .filter(aggregate(
        zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v) >= 4)
      .select(col("id1"), col("id2")).distinct()
  }

  private def dedupComponents(s: SparkSession, d: String): DataFrame = {
    val nodes = documents(s, d).select(col("lang"), col("doc_id"))
    graft.text.Components.connectedComponents(nodes, dedupPairs(s, d), "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style repetition signals per doc, rolled up per language:
    // duplicate-word fraction, top-bigram mass, mean word length, and the
    // count of docs a repetition gate would drop. The bigram mode goes
    // through an explode + two keyed aggs (doc grain) rather than a per-doc
    // O(n²) array walk — the 100 TB shape.
    "q86_quality_signals" -> ((s, d) => {
      val docs = docsWithTokens(s, d)
        .withColumn("n_toks", size(col("toks")))
        .filter(col("n_toks") >= 2)
        .withColumn("dup_frac",
          lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
            col("n_toks").cast("double"))
        .withColumn("mean_word_len",
          length(regexp_replace(col("text"), "\\s", "")).cast("double") /
            col("n_toks").cast("double"))
      // Non-distinct word bigrams -> per-doc top-bigram mass.
      val bigrams = docs.select(col("lang"), col("doc_id"),
        explode(transform(sequence(lit(1), col("n_toks") - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bg"))
      val topMass = bigrams.groupBy(col("lang"), col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lang"), col("doc_id"))
        .agg((max(col("cnt")).cast("double") /
          sum(col("cnt")).cast("double")).as("top_bg_frac"))
      docs.join(topMass, Seq("lang", "doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(round(col("dup_frac"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_dup_frac"),
          round(sum(round(col("top_bg_frac"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_top_bg_frac"),
          round(sum(round(col("mean_word_len"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_word_len"),
          sum(when(col("dup_frac") > 0.3 || col("top_bg_frac") > 0.18, 1)
            .otherwise(0)).as("n_flagged"))
        .orderBy(col("lang"))
    }),

    // PII scrub: deterministic synthetic PII (the fixture corpus is clean
    // word soup) injected into every third doc, then redacted with the
    // standard email/phone regexes; output counts redactions and byte
    // deltas — all integers, so the parity check is FP-free. regexes are
    // shared Java/RE2 syntax; DuckDB needs the 'g' flag to match Spark's
    // replace-all semantics.
    "q87_pii_scrub" -> ((s, d) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "\\+1-555-[0-9]{4}"
      val aug = documents(s, d)
        .withColumn("aug",
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("Contact u"), col("doc_id"), lit("@example.com or +1-555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
              lit(". "), col("text")))
            .otherwise(col("text")))
        .withColumn("n_emails",
          size(regexp_extract_all(col("aug"), lit(emailPat), lit(0))).cast("long"))
        .withColumn("n_phones",
          size(regexp_extract_all(col("aug"), lit(phonePat), lit(0))).cast("long"))
        .withColumn("scrubbed",
          regexp_replace(regexp_replace(col("aug"), emailPat, "[EMAIL]"),
            phonePat, "[PHONE]"))
      aug.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_phones")).as("n_phones"),
          sum(length(col("aug")) - length(col("scrubbed"))).cast("long").as("len_delta"),
          sum(when(col("n_emails") + col("n_phones") === 0, 1).otherwise(0)).as("n_clean"))
        .orderBy(col("lang"))
    }),

    // Unigram-LM cross-entropy per doc (perplexity proxy), rolled up per
    // language. p(tok|lang) from corpus counts; doc score = -mean log p.
    // Per-token log-probs are rounded to 9 dp and DECIMAL-summed per doc
    // (order-independent), the per-doc mean is one double division, and the
    // language rollup DECIMAL-sums the rounded doc scores — the same
    // determinism route as q75. Shuffles: (lang,tok) agg, (lang,tok) join,
    // (doc) agg, (lang) agg — all keyed.
    "q88_perplexity" -> ((s, d) => {
      val tok = docsWithTokens(s, d)
        .select(col("lang"), col("doc_id"), explode(col("toks")).as("tok"))
      val freq = tok.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
        .withColumn("logp",
          round(log(col("cnt").cast("double") / col("tot").cast("double")), 9)
            .cast("decimal(28,9)"))
      val doc = tok.join(freq.select(col("lang"), col("tok"), col("logp")), Seq("lang", "tok"))
        .groupBy(col("lang"), col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("logp")).as("s"))
        .withColumn("ce", round(-col("s").cast("double") / col("n"), 6))
      doc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("ce").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_ce"),
          round(max(col("ce")), 6).as("max_ce"),
          sum(when(col("ce") > 7.0, 1).otherwise(0)).as("n_high"))
        .orderBy(col("lang"))
    }),

    // Dedup CLUSTERS from LSH candidate pairs: transitive closure via
    // iterative min-label propagation (graft.text.Components) — a~b, b~c
    // lands a,b,c in ONE cluster even when a,c never share a band. The
    // oracle computes the same closure with a recursive CTE. Outputs are
    // all integers (cluster counts/sizes).
    "q92_dedup_clusters" -> ((s, d) => {
      val comp = dedupComponents(s, d)
      val sizes = comp.groupBy(col("lang"), col("component"))
        .agg(count(lit(1)).as("sz"))
      sizes.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clusters"),
          max(col("sz")).as("max_cluster_size"),
          sum(when(col("sz") >= 2, col("sz")).otherwise(0)).as("n_docs_multi"))
        .orderBy(col("lang"))
    }),

    // Quality-aware CANONICAL selection over the q92 dedup clusters —
    // real-pipeline dedup keeps the BEST representative, not the
    // smallest id: per cluster, the doc with the most characters wins
    // (ties to the smaller id, a total order). Reports what the policy
    // keeps/drops per language and how often quality-keep differs from
    // naive min-id-keep. Same banded-LSH + pointer-doubling closure as
    // q92 (never corpus-quadratic); the selection itself is one window
    // over cluster members.
    "q190_quality_canonical" -> ((s, d) => {
      val comp = dedupComponents(s, d)
      val withQ = comp.join(
        documents(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val byC = Window.partitionBy(col("component"))
      val w = byC.orderBy(col("n_chars").desc, col("doc_id"))
      val ranked = withQ.withColumn("rn", row_number().over(w))
        .withColumn("min_id", min(col("doc_id")).over(byC))
        .withColumn("csz", count(lit(1)).over(byC))
      ranked.groupBy(col("lang"))
        .agg(countDistinct(col("component")).as("n_clusters"),
          count(lit(1)).as("n_docs"),
          sum(when(col("rn") =!= 1, 1).otherwise(0)).as("n_dropped"),
          sum(when(col("rn") === 1, col("n_chars")).otherwise(0)).as("chars_kept"),
          sum(when(col("rn") =!= 1, col("n_chars")).otherwise(0)).as("chars_dropped"),
          sum(when(col("rn") === 1 && col("csz") >= 2 &&
            col("doc_id") =!= col("min_id"), 1).otherwise(0))
            .as("n_quality_beats_minid"))
        .orderBy(col("lang"))
    }),

    // Zipf / vocabulary coverage: how many frequency-ranked terms cover
    // 50/90/99% of each language's token mass. The thresholds are integer
    // cross-multiplications (cum*2 >= total etc.) — no FP anywhere.
    "q93_vocab_coverage" -> ((s, d) => {
      val tok = docsWithTokens(s, d)
        .select(col("lang"), explode(col("toks")).as("tok"))
      val freq = tok.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok"))
      val ranked = freq
        .withColumn("rnk", row_number().over(w))
        .withColumn("cum", sum(col("cnt"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      ranked.groupBy(col("lang"))
        .agg(count(lit(1)).as("vocab_size"),
          min(when(col("cum") * 2 >= col("total"), col("rnk"))).as("n_terms_50"),
          min(when(col("cum") * 10 >= col("total") * 9, col("rnk"))).as("n_terms_90"),
          min(when(col("cum") * 100 >= col("total") * 99, col("rnk"))).as("n_terms_99"))
        .orderBy(col("lang"))
    }),

    // Gopher duplicate-n-gram CHARACTER fraction (Rae et al. 2021,
    // A1.1): per doc, the fraction of characters covered by n-grams that
    // occur more than once, as the no-overlap-discount upper bound
    // Σ cnt_g·len(g) / len(text) capped at 1 (the cheap distributed form;
    // exact overlap sweeps are a per-doc post-pass in real pipelines).
    // n is the operator's parameter — the paper runs n=5..10 on web text;
    // the fixture's short word-soup docs carry their repetition at
    // n∈{2,3}, so the battery pins those. Explode → two keyed aggs at
    // (doc, gram) then (doc) grain — never a per-doc O(n²) array walk.
    "q151_dup_ngram_chars" -> ((s, d) => {
      def frac(n: Int) = {
        val docs = docsWithTokens(s, d)
          .withColumn("nc", length(trim(col("text"))))
          .filter(size(col("toks")) >= n)
        docs.select(col("lang"), col("doc_id"), col("nc"),
            explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
              i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
          .groupBy(col("lang"), col("doc_id"), col("nc"), col("g"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("lang"), col("doc_id"), col("nc"))
          .agg(least(lit(1.0),
            sum(when(col("cnt") >= 2, col("cnt") * length(col("g")))
              .otherwise(0)).cast("double") / col("nc").cast("double"))
            .as(s"frac$n"))
          .drop("nc")
      }
      frac(2).join(frac(3), Seq("lang", "doc_id"), "left")
        .na.fill(0.0, Seq("frac3"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(round(col("frac2"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_dup2_frac"),
          round(sum(round(col("frac3"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_dup3_frac"),
          sum(when(col("frac2") > 0.2, 1).otherwise(0)).as("n_flagged"))
        .orderBy(col("lang"))
    }),

    // Cross-doc repeated-passage mining (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better" — the ExactSubstr
    // shape): 13-gram spans appearing in MORE THAN ONE document, then
    // maximal runs of consecutive duplicated positions per doc
    // (gaps-and-islands) = the duplicated passages. The gram table is
    // keyed by the gram itself (a distinct-hash-sized frame at corpus
    // scale, never all-pairs); the islands window is per-doc (bounded by
    // doc length). Span token length = run + 12.
    "q152_repeated_passages" -> ((s, d) => {
      val n = 13
      val toks = docsWithTokens(s, d).filter(size(col("toks")) >= n)
      // shuffle 8-byte gram hashes, not ~80-byte 13-gram strings: the
      // dup-detection agg and the candidate join only need equality, and
      // a 64-bit collision at corpus scale (~n²/2⁶⁵) is far below the
      // gate's noise floor (documented; the oracle groups by the string)
      val grams = toks.select(col("lang"), col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(n)))))))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "gh")
      val dupG = grams.groupBy(col("gh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("gh"))
      val dupPos = grams.join(dupG, "gh")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val spans = dupPos
        .withColumn("grp", col("p") - row_number().over(w))
        .groupBy(col("lang"), col("doc_id"), col("grp"))
        .agg((count(lit(1)) + (n - 1)).as("span_toks"))
      spans.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs_affected"),
          count(lit(1)).as("n_spans"),
          sum(col("span_toks")).as("sum_span_toks"),
          max(col("span_toks")).as("max_span_toks"))
        .orderBy(col("lang"))
    }),

    // Training-example packing (the GPT concat-and-chunk form): docs are
    // packed in doc_id order into fixed 256-token examples WITHIN a
    // bounded packing unit (source × shard-of-8) — the shard key bounds
    // the sequential cumsum a packer fundamentally needs, so units pack
    // in parallel and no window partition grows with the corpus. A doc
    // whose [start, end) token interval crosses a 256 boundary is split
    // across examples (the boundary-split accounting below).
    "q153_sequence_packing" -> ((s, d) => {
      val seqLen = 256
      val docs = docsWithTokens(s, d)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
        .withColumn("n_toks", size(col("toks")))
      val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      val packed = docs
        .withColumn("end", sum(col("n_toks")).over(w))
        .withColumn("start", col("end") - col("n_toks"))
        .withColumn("split_doc",
          (floor(col("start") / seqLen) =!= floor((col("end") - 1) / seqLen))
            .cast("int"))
      packed.groupBy(col("source"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("shard_toks"),
          sum(col("split_doc")).as("n_split_docs"))
        .withColumn("n_examples",
          ceil(col("shard_toks").cast("double") / seqLen).cast("long"))
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("shard_toks")).as("total_toks"),
          sum(col("n_split_docs")).as("n_split_docs"),
          sum(col("n_examples")).as("n_examples"))
        .orderBy(col("source"))
    }),

    // Temperature-weighted source mixing (the multilingual/multi-corpus
    // sampling rule, e.g. XLM-R §3.1: q_s ∝ p_s^α): per-LANG keep
    // probability p_s = min(1, N·cnt_s^α / Σ_k cnt_k^α / cnt_s) at
    // α = 0.5, N = 250, applied as the SAME deterministic md5 gate the
    // split/sample family uses — reruns and engines agree doc-by-doc.
    // sqrt is IEEE-correctly-rounded (identical in both engines), and the
    // gate compares integers, so the oracle is exact. Two keyed aggs +
    // one broadcast join; the gate itself is map-side.
    "q154_temperature_mixing" -> ((s, d) => {
      val docs = documents(s, d)
      val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      // totw: round-then-DECIMAL-sum so accumulation order can't flip a
      // digit of the downstream floor(p·10⁴) gate
      val tot = cnts.agg(
        sum(round(sqrt(col("cnt")), 6).cast("decimal(18,6)"))
          .cast("double").as("totw"))
      val probs = cnts.crossJoin(broadcast(tot))
        .withColumn("p", least(lit(1.0),
          lit(250.0) * sqrt(col("cnt")) / col("totw") / col("cnt")))
        .withColumn("thresh", floor(col("p") * 10000).cast("long"))
        .select(col("lang"), col("cnt"), col("thresh"))
      docs.join(broadcast(probs), Seq("lang"))
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("mix|"), col("doc_id"))), 1, 12), 16, 10)
            .cast("long"), lit(10000)))
        .withColumn("kept", col("bucket") < col("thresh"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("thresh")).as("thresh_bp"),
          sum(when(col("kept"), 1).otherwise(0)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // The full Gopher quality GATE battery (Rae et al. 2021 A1.2) —
    // every doc-level rule as an explicit verdict, rolled up per (lang,
    // source) with per-rule drop counts and the surviving-doc count.
    // All six rules are integer/ratio column math over one tokenize
    // pass — map-side at scan speed, one keyed agg. Rules: word count
    // ∈ [50, 100k]; mean word length ∈ [3, 10]; symbol-to-word ratio
    // (#/…) ≤ 0.1; ≥ 80% of words contain an alphabetic char; ≥ 2
    // DISTINCT Gopher stop words ("the be to of and that have with");
    // (the bullet/ellipsis LINE rules degenerate on the single-line
    // fixture corpus and are folded into the symbol rule's face).
    "q168_gopher_gates" -> ((s, d) => {
      val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val docs = documents(s, d)
        .withColumn("toks", graft.text.TextOps.tokens(col("text")))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("mean_wl",
          length(regexp_replace(col("text"), "\\s", "")).cast("double") /
            col("n_toks").cast("double"))
        .withColumn("sym_ratio",
          (size(split(col("text"), "#", -1)) - 1 +
            size(split(col("text"), "…", -1)) - 1).cast("double") /
            col("n_toks").cast("double"))
        .withColumn("alpha_frac",
          size(filter(col("toks"), t => t.rlike("[A-Za-z]"))).cast("double") /
            col("n_toks").cast("double"))
        .withColumn("n_stop",
          size(array_intersect(col("toks"),
            array(stop.map(lit): _*))))
        .withColumn("ok_wc", col("n_toks") >= 50 && col("n_toks") <= 100000)
        .withColumn("ok_wl", col("mean_wl") >= 3.0 && col("mean_wl") <= 10.0)
        .withColumn("ok_sym", col("sym_ratio") <= 0.1)
        .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
        .withColumn("ok_stop", col("n_stop") >= 2)
      docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("ok_wc"), 1).otherwise(0)).as("drop_wordcount"),
          sum(when(!col("ok_wl"), 1).otherwise(0)).as("drop_wordlen"),
          sum(when(!col("ok_sym"), 1).otherwise(0)).as("drop_symbol"),
          sum(when(!col("ok_alpha"), 1).otherwise(0)).as("drop_alpha"),
          sum(when(!col("ok_stop"), 1).otherwise(0)).as("drop_stopword"),
          sum(when(col("ok_wc") && col("ok_wl") && col("ok_sym") &&
            col("ok_alpha") && col("ok_stop"), 1).otherwise(0)).as("n_keep"))
        .orderBy(col("lang"), col("source"))
    }),

    // DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    // the pretraining-data selection standard): hash every token into
    // B=256 buckets (md5-derived, so DuckDB replicates the hash exactly),
    // estimate Laplace-smoothed bucket distributions for the TARGET
    // (lang='en', the "quality domain" stand-in) and the RAW corpus, then
    // score each doc log w = Σ_tok (log p_t − log p_r) and Gumbel-top-k
    // resample: key = logw + Gumbel(md5-uniform(doc)) ≡ sampling ∝ w,
    // derandomized the repo way (hash-derived uniforms, 9-dp-rounded logs,
    // decimal sums) so both engines rank identically. Scale: the bucket
    // table is 256 rows broadcast; the corpus sees one explode + two keyed
    // aggs — no all-pairs, no driver loop.
    "q185_dsir_importance" -> ((s, d) => {
      val B = 256
      val tok = docsWithTokens(s, d)
        .select(col("lang"), col("doc_id"), explode(col("toks")).as("tok"))
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("dsir|"), col("tok"))), 1, 12),
            16, 10).cast("long"), lit(B)))
      // ONE corpus pass for both distributions (raw + target as a
      // conditional sum in the same agg); totals via an unpartitioned
      // window over the 256-row bucket table, not a second corpus pass.
      val counts = tok.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val wAll = Window.partitionBy()
      // per-bucket log-ratio with Laplace smoothing, 9-dp-pinned
      val ratios = counts
        .withColumn("tot_r", sum(col("cr")).over(wAll))
        .withColumn("tot_t", sum(col("ct")).over(wAll))
        .select(col("bucket"), round(
          log((col("ct") + 1).cast("double") / (col("tot_t") + B)) -
            log((col("cr") + 1).cast("double") / (col("tot_r") + B)), 9)
          .cast("decimal(28,9)").as("lr"))
      val logw = tok.join(broadcast(ratios), Seq("bucket"))
        .groupBy(col("lang"), col("doc_id"))
        .agg(sum(col("lr")).as("logw"))
      // Gumbel key from the doc's own hash: u ∈ (0,1) md5-derived,
      // g = −ln(−ln u) — libm outputs 9-dp-pinned before the sum so the
      // ranking doubles are bit-identical cross-engine
      val u = (pmod(conv(substring(md5(concat(lit("gum|"), col("doc_id"))),
        1, 12), 16, 10).cast("long"), lit(1000000L)).cast("double") + 0.5) /
        1000000.0
      val keyed = logw.withColumn("key",
        col("logw").cast("double") + round(-log(-log(u)), 9))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("key").desc, col("doc_id"))
      keyed.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("logw").cast("double"), 6).as("logw"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Retrieval-grade DOCUMENT CHUNKING (the RAG/embedding-pipeline
    // primitive): fixed 64-token windows at stride 48 (16-token overlap),
    // short docs = one chunk, chunk identity = md5 of the joined window.
    // Chunk starts come from integer math (1 + max(0, (len−17) div 48)
    // chunks) so both engines cut identical windows; duplicate-chunk
    // fraction per language is the cross-doc redundancy a chunk-level
    // dedup would remove. One explode per chunk (bounded by corpus
    // tokens / 48), two keyed aggs — no self-joins.
    "q186_doc_chunking" -> ((s, d) => {
      val docs = docsWithTokens(s, d)
        .withColumn("len", size(col("toks"))).filter(col("len") > 0)
        .withColumn("n_chunks",
          lit(1) + greatest(lit(0L), expr("(len - 17) div 48")))
      val chunks = docs
        .select(col("lang"), col("doc_id"), col("toks"), col("len"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("i"))
        .withColumn("chunk_toks",
          slice(col("toks"), (col("i") * 48 + 1).cast("int"), lit(64)))
        .withColumn("chunk_len", size(col("chunk_toks")))
        .withColumn("h", md5(concat_ws(" ", col("chunk_toks"))))
      chunks.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          countDistinct(col("h")).as("n_unique_chunks"),
          round(sum(col("chunk_len").cast("decimal(18,0)")).cast("double") /
            count(lit(1)), 6).as("avg_chunk_toks"))
        .withColumn("dup_fraction",
          round(lit(1.0) - col("n_unique_chunks").cast("double") /
            col("n_chunks").cast("double"), 6))
        .orderBy(col("lang"))
    }),

    // CCNet head/middle/tail bucketing (Wenzek et al. 2020): per
    // language, rank docs by the q88 unigram-LM cross-entropy (the CCNet
    // quality proxy — lower = closer to the LM = "head") on the total
    // order (ce, doc_id), cut into terciles with ntile(3), report each
    // bucket's size, mean score, and character share. ntile's
    // extra-row-to-first-groups rule is identical in Spark and DuckDB,
    // and the ce doubles are the q88 determinism route, so the cut is
    // reproducible. One window per lang partition — state is a
    // language's docs, never the corpus.
    "q187_ccnet_buckets" -> ((s, d) => {
      val tok = docsWithTokens(s, d)
        .select(col("lang"), col("doc_id"), explode(col("toks")).as("tok"))
      val freq = tok.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
        .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
        .withColumn("logp",
          round(log(col("cnt").cast("double") / col("tot").cast("double")), 9)
            .cast("decimal(28,9)"))
      val doc = tok.join(freq.select(col("lang"), col("tok"), col("logp")), Seq("lang", "tok"))
        .groupBy(col("lang"), col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("logp")).as("s"))
        .withColumn("ce", round(-col("s").cast("double") / col("n"), 6))
      val chars = documents(s, d).select(col("doc_id"), col("n_chars"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("ce"), col("doc_id"))
      doc.withColumn("bucket_i", ntile(3).over(w))
        .withColumn("bucket",
          when(col("bucket_i") === 1, "head")
            .when(col("bucket_i") === 2, "middle").otherwise("tail"))
        .join(chars, Seq("doc_id"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("ce").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_ce"),
          sum(col("n_chars")).as("n_chars"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // [N] Interpolated bigram-LM cross-entropy (the q88 unigram model's
    // Jelinek-Mercer extension, λ=0.7): per-language bigram conditionals
    // P(w2|w1) = c(w1,w2)/c(w1,·) mixed with the unigram P(w2). Both
    // count tables key by (lang, word) / (lang, w1, w2) — never
    // doc-cardinality joins — and the per-doc scoring join streams the
    // corpus bigram instances against the broadcast-scale prob table.
    // FP route identical to q88: round(ln, 9) → DECIMAL sums → round 6.
    "q197_bigram_lm" -> ((s, d) => {
      val tok = docsWithTokens(s, d)
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), col("doc_id"), col("toks"))
      val bg = tok.select(col("lang"), col("doc_id"),
          explode(expr("transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
        .select(col("lang"), col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val uni = tok.select(col("lang"), explode(col("toks")).as("w2"))
        .groupBy(col("lang"), col("w2")).agg(count(lit(1)).as("ucnt"))
        .withColumn("utot", sum(col("ucnt")).over(Window.partitionBy(col("lang"))))
      val big = bg.groupBy(col("lang"), col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
        .withColumn("ptot",
          sum(col("bcnt")).over(Window.partitionBy(col("lang"), col("w1"))))
      val probs = big.join(uni, Seq("lang", "w2"))
        .withColumn("p",
          lit(0.7) * (col("bcnt").cast("double") / col("ptot")) +
            lit(0.3) * (col("ucnt").cast("double") / col("utot")))
        .withColumn("logp", round(log(col("p")), 9).cast("decimal(28,9)"))
        .select(col("lang"), col("w1"), col("w2"), col("logp"))
      val doc = bg.join(probs, Seq("lang", "w1", "w2"))
        .groupBy(col("lang"), col("doc_id"))
        .agg(count(lit(1)).as("nb"), sum(col("logp")).as("sl"))
        .withColumn("ce", round(-col("sl").cast("double") / col("nb"), 6))
      doc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("ce").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_ce"),
          round(min(col("ce")), 6).as("min_ce"),
          round(max(col("ce")), 6).as("max_ce"))
        .orderBy(col("lang"))
    }),

    // [N] Model-based quality classification (the fastText-shaped linear
    // filter of FineWeb-Edu/CCNet pipelines): hashed unigram+bigram
    // features into 256 buckets, per-bucket weights derived inline from
    // the bucket hash (no weight table to ship), doc score = mean weight
    // → sigmoid. The integer milli-weight sum keeps scoring exact until
    // ONE final division, so the FP surface is a single sigmoid per doc
    // (rounded 6 dp). Inference is one explode + one keyed agg —
    // map-side partial, classifier-at-scan-speed, the 100 TB shape. The
    // rule-based (q168), LM-based (q88/q187), and classifier-based
    // curation archetypes are now all present.
    "q209_quality_classifier" -> ((s, d) => {
      classifierScores(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p") > 0.5, 1).otherwise(0)).as("n_keep"),
          round(sum(col("p").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_p"),
          round(min(col("p")), 6).as("min_p"),
          round(max(col("p")), 6).as("max_p"))
        .orderBy(col("lang"))
    }),

    // [N] UniMax language-balanced sampling (Chung et al. 2023): spread
    // a token budget uniformly across languages, capping each at E_max
    // epochs of its corpus. The sequential waterfill has a CLOSED FORM
    // on cap-ascending order — languages before the first index where
    // cap exceeds the running fair share hit their caps, everything
    // after splits the remainder equally — so it's two windows over the
    // per-language count table (|langs| rows), zero recursion. Budget =
    // 1.5x total tokens (the multilingual upsampling posture), E_max = 2
    // — low-resource languages hit their 2-epoch caps, the head language
    // absorbs the remaining fair share.
    "q207_unimax_sampling" -> ((s, d) => {
      val counts = docsWithTokens(s, d)
        .select(col("lang"), explode(col("toks")).as("tok"))
        .groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .withColumn("cap", col("c") * 2)
      val budget = counts.agg(
        (sum(col("c")) * 3).as("b3"), count(lit(1)).as("n_langs"))
        .select(expr("b3 div 2").as("budget"), col("n_langs"))
      val w = Window.orderBy(col("cap"), col("lang"))
      val ranked = counts.crossJoin(broadcast(budget))
        .withColumn("i", row_number().over(w))
        .withColumn("cs", coalesce(sum(col("cap")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("fair",
          (col("budget") - col("cs")).cast("double") /
            (col("n_langs") - col("i") + 1))
        .withColumn("over", col("cap").cast("double") > col("fair"))
      val sw = ranked.filter(col("over"))
        .orderBy(col("i")).limit(1)
        .select(col("i").as("sw_i"), col("fair").as("sw_fair"))
      // left join on TRUE, not crossJoin: an all-capped corpus has no
      // switch row and must keep every language at its cap
      ranked.join(broadcast(sw), lit(true), "left")
        .withColumn("alloc",
          when(col("sw_i").isNull || col("i") < col("sw_i"),
            col("cap").cast("double")).otherwise(col("sw_fair")))
        .select(col("lang"), col("c").as("n_tokens"), col("cap"),
          col("over").as("hit_fair_share"),
          round(col("alloc"), 4).as("alloc_tokens"),
          round(col("alloc") / col("c"), 6).as("epochs"))
        .orderBy(col("lang"))
    }),

    // DETERMINISTIC corpus shuffle + shard assignment — the data-ordering
    // pass between curation and training: every run of the pipeline must
    // produce the SAME global permutation (resumable training, auditable
    // data order), so the shuffle key is md5(doc_id), sharding is
    // HASH-RANGE (shard = first hex nibble) rather than round-robin —
    // round-robin needs a global rank (one-partition window, the q99
    // anti-pattern); hash ranges need nothing global and bound skew by
    // hash uniformity, which the output MEASURES (max/min shard load vs
    // the uniform ideal). Within a shard the write order is the hash
    // order (the shard's own deterministic shuffle); head_doc pins it.
    // [N] Length-bucketed batch assembly — the training data-loader's
    // dynamic-padding op: width-64 length buckets, per-(bucket, shard)
    // doc_id order, a 4096-token budget → floor(budget/cap) examples per
    // batch (min 1 so oversized docs get singleton batches), batch_id by
    // integer division on the rank — every step a closed form, no
    // recursion, one shuffle on the (bucket, shard) key, and the shard
    // (the q153 rule) bounds every window partition at corpus scale.
    // Waste accounting is EXACT integers under both padding policies —
    // static (pad to the bucket cap) and dynamic (pad to the batch max)
    // — the numbers a capacity planner actually compares.
    "q260_length_bucketed_batches" -> ((s, d) => {
      val budget = 4096
      val docs = docsWithTokens(s, d)
        .select(col("doc_id"), greatest(size(col("toks")), lit(1)).as("n_toks"))
        .withColumn("bucket", expr("(n_toks - 1) div 64"))
        .withColumn("cap", (col("bucket") + 1) * 64)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      val w = Window.partitionBy(col("bucket"), col("shard"))
        .orderBy(col("doc_id"))
      val batched = docs
        .withColumn("rk", row_number().over(w))
        .withColumn("per_batch",
          greatest(expr(s"$budget div cap"), lit(1L)))
        .withColumn("batch_id", expr("(rk - 1) div per_batch"))
      val perBatch = batched
        .groupBy(col("bucket"), col("cap"), col("shard"), col("batch_id"))
        .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("toks"),
          max(col("n_toks")).as("bmax"))
      perBatch.groupBy(col("bucket"), col("cap"))
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("toks")).as("sum_tokens"),
          sum(col("n") * col("cap") - col("toks")).as("waste_static"),
          sum(col("n") * col("bmax") - col("toks")).as("waste_dynamic"))
        .orderBy(col("bucket"))
    }),

    // [N] Classifier threshold sweep (precision/recall/F1 calibration —
    // how a filtering threshold is actually chosen): q209's sigmoid
    // scores against a deterministic reference label (lang = 'en'),
    // swept over 20 thresholds WITHOUT a thresholds × docs cross join —
    // scores land in 20 exact DECIMAL buckets (p ∈ (k/20, (k+1)/20]),
    // one keyed agg, then suffix sums over the 20-row bucket table give
    // TP/PP at every threshold (the unpartitioned window runs at
    // 20-row grain, never data grain). PR/F1 divisions are int/int
    // double ops, identical in both engines.
    "q261_threshold_sweep" -> ((s, d) => {
      val scored = classifierScores(s, d)
        .select(col("doc_id"), col("p"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        // bucket j: p in (j/20, (j+1)/20]; DECIMAL product keeps the
        // boundary exact (double p*20 rounds 0.15*20 up past 3)
        .withColumn("j", greatest(
          ceil(col("p").cast("decimal(9,6)") * 20) - 1, lit(0L)))
      val buckets = scored.groupBy(col("j"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val wDesc = Window.orderBy(col("j").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = scored.agg(sum(col("y")).as("all_pos"),
        count(lit(1)).as("all_n"))
      buckets
        .withColumn("pp", sum(col("n")).over(wDesc))
        .withColumn("tp", sum(col("pos")).over(wDesc))
        .crossJoin(broadcast(totals))
        .select(
          round(col("j").cast("double") / 20, 2).as("threshold"),
          col("pp").as("predicted_pos"), col("tp"),
          round(col("tp").cast("double") / col("pp"), 6).as("precision"),
          round(col("tp").cast("double") / col("all_pos"), 6).as("recall"),
          round(lit(2.0) * col("tp") /
            (col("pp") + col("all_pos")), 6).as("f1"))
        .orderBy(col("threshold"))
    }),

    // [N] LEAKAGE-FREE dataset splits — the train/test hygiene rule a
    // near-dup corpus demands: a naive per-doc hash split puts a
    // document's near-duplicate on the other side of the boundary (the
    // classic eval-contamination bug); splitting by the doc's near-dup
    // COMPONENT id instead keeps every cluster whole. Both splits are
    // computed side by side over q92's verified pair list and component
    // fold; `leak_aware` is STRUCTURALLY zero (same component → same
    // split) and the oracle proves it blind, while `leak_naive` counts
    // the real cross-split near-dup pairs the naive rule leaks. Scale
    // shape: the q92 machinery (banded candidates only, pointer-doubling
    // components) + two broadcast-joined pair lookups.
    "q266_leakage_free_split" -> ((s, d) => {
      val pairs = graft.CacheBag.register(dedupPairs(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nodes = documents(s, d).select(col("lang"), col("doc_id"))
      val comp = graft.text.Components.connectedComponents(
        nodes, pairs, "doc_id")
      def splitOf(c: org.apache.spark.sql.Column) =
        when(pmod(TextOps.md5Hash48(c.cast("string"), "split"), lit(10)) < 2,
          lit("test")).otherwise(lit("train"))
      val assigned = graft.CacheBag.register(comp
        .withColumn("split_naive", splitOf(col("doc_id")))
        .withColumn("split_aware", splitOf(col("component")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val leaks = pairs
        .join(assigned.select(col("doc_id").as("id1"),
          col("split_naive").as("n1"), col("split_aware").as("a1")), "id1")
        .join(assigned.select(col("doc_id").as("id2"),
          col("split_naive").as("n2"), col("split_aware").as("a2")), "id2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("n1") =!= col("n2"), 1L).otherwise(0L))
            .as("leak_naive"),
          sum(when(col("a1") =!= col("a2"), 1L).otherwise(0L))
            .as("leak_aware"))
      assigned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("component")).as("n_components"),
          sum(when(col("split_aware") === "test", 1L).otherwise(0L))
            .as("n_test_aware"),
          sum(when(col("split_naive") === "test", 1L).otherwise(0L))
            .as("n_test_naive"))
        .crossJoin(broadcast(leaks))
        .orderBy(col("lang"))
    }),

    // [N] Output-integrity shard MANIFEST — the reproducibility artifact
    // a curated-corpus export ships beside its shards: per shard (q245's
    // md5 hash-range assignment), doc/char accounting plus an ORDER-
    // INVARIANT content fingerprint — bit_xor and sum of per-doc 48-bit
    // content hashes (+ min/max) — so a re-export, a copy, or a
    // different engine can verify byte-level content equality without
    // any ordering contract. Order invariance is what makes the
    // fingerprint one keyed agg with map-side partials (a concat-based
    // digest would need a global sort); one shuffle on the shard key at
    // any scale, manifest is 16 rows.
    "q262_shard_manifest" -> ((s, d) => {
      val hashed = documents(s, d)
        .withColumn("shard",
          conv(substring(md5(concat(lit("shuf|"), col("doc_id"))), 1, 1),
            16, 10).cast("int"))
        .withColumn("h", TextOps.md5Hash48(col("text"), "mf"))
      hashed.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          expr("bit_xor(h)").as("h_xor"),
          sum(col("h")).as("h_sum"),
          min(col("h")).as("h_min"), max(col("h")).as("h_max"))
        .orderBy(col("shard"))
    }),

    "q245_corpus_shuffle_shards" -> ((s, d) => {
      val hashed = docsWithTokens(s, d)
        .withColumn("h", md5(concat(lit("shuf|"), col("doc_id"))))
        .withColumn("shard",
          conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
      val perShard = hashed.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          min_by(col("doc_id"), col("h")).as("head_doc"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing) // 16 rows
      perShard
        .withColumn("skew",
          round(col("n_tokens").cast("double") * 16 /
            sum(col("n_tokens")).over(wAll), 6))
        .orderBy(col("shard"))
    }),

    // [N] C4-style line-level cleaning (Raffel et al. 2020 §2.2): the
    // fixture corpus has no line structure, so lines are RENDERED
    // deterministically first (md5-seeded breaks every ~7 tokens,
    // punctuation on 4/5 of lines, rare lorem-ipsum / curly-brace /
    // javascript injections — the repo's synthetic-fixture pattern),
    // then the published rules apply: keep lines ending in terminal
    // punctuation with ≥5 words and no "javascript"; drop whole docs
    // containing "lorem ipsum" or "{", or with <3 surviving lines.
    // Everything is per-(doc, line) keyed aggregation — the render is
    // map-side except one (doc_id, line_idx) groupBy; no corpus-wide
    // shuffle beyond the final 20-row source rollup. All-integer output.
    "q198_c4_clean" -> ((s, d) => {
      val wLine = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val toks = docsWithTokens(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .withColumn("brk",
          (conv(substring(md5(concat(lit("ln|"), col("doc_id"), lit("|"), col("pos"))),
            1, 6), 16, 10).cast("long") % 7 === 0).cast("int"))
        .withColumn("line_idx", sum(col("brk")).over(wLine))
      val lines = toks
        .groupBy(col("doc_id"), col("source"), col("line_idx"))
        .agg(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("base"))
        .withColumn("h2",
          conv(substring(md5(concat(lit("c4|"), col("doc_id"), lit("|"), col("line_idx"))),
            1, 6), 16, 10).cast("long"))
        .withColumn("deco",
          when(col("h2") % 97 === 0, concat(col("base"), lit(" lorem ipsum dolor")))
            .when(col("h2") % 89 === 0, concat(col("base"), lit(" { var x }")))
            .when(col("h2") % 83 === 0, concat(col("base"), lit(" enable javascript please")))
            .otherwise(col("base")))
        .withColumn("line",
          when(col("h2") % 5 =!= 0, concat(col("deco"), lit("."))).otherwise(col("deco")))
        .withColumn("kept_line",
          col("line").endsWith(".") && size(split(col("line"), " ")) >= 5 &&
            !col("line").contains("javascript"))
      val docs = lines.groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("line").contains("lorem ipsum"), 1).otherwise(0)).as("n_lorem"),
          sum(when(col("line").contains("{"), 1).otherwise(0)).as("n_brace"),
          sum(when(col("kept_line"), 1).otherwise(0)).as("n_kept_lines"),
          sum(when(col("kept_line"), length(col("line"))).otherwise(0)).as("kept_chars"))
        .withColumn("status",
          when(col("n_lorem") > 0, "drop_lorem")
            .when(col("n_brace") > 0, "drop_brace")
            .when(col("n_kept_lines") < 3, "drop_short")
            .otherwise("kept"))
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("status") === "kept", 1).otherwise(0)).as("n_docs_kept"),
          sum(when(col("status") === "drop_lorem", 1).otherwise(0)).as("n_drop_lorem"),
          sum(when(col("status") === "drop_brace", 1).otherwise(0)).as("n_drop_brace"),
          sum(when(col("status") === "drop_short", 1).otherwise(0)).as("n_drop_short"),
          sum(col("n_lines")).as("n_lines_total"),
          sum(when(col("status") === "kept", col("n_kept_lines")).otherwise(0))
            .as("n_lines_kept"),
          sum(when(col("status") === "kept", col("kept_chars")).otherwise(0))
            .as("n_chars_kept"))
        .orderBy(col("source"))
    }),

    // CCNet LINE-level dedup (Wenzek et al. 2020 §3.1 — the removal pass
    // CCNet runs BEFORE LM bucketing; q186 only MEASURES chunk
    // redundancy, this one REMOVES it): every repeated line keeps only
    // its first occurrence in (doc_id, position) order; later copies are
    // dropped and the survivors' character mass is re-accounted per
    // language. The synthetic corpus has no newlines, so a "line" is a
    // fixed 8-token paragraph chunk cut by integer math (both engines
    // slice identically). First-winner selection is a keyed min(struct)
    // — partial-aggregated and skew-safe on hot boilerplate lines (the
    // r10-prescribed shape over a windowed row_number), then a
    // hash-keyed join marks survivors; nothing is corpus-quadratic.
    "q218_line_dedup" -> ((s, d) => {
      val docs = documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("arr", split(col("text"), " "))
        .withColumn("len", size(col("arr"))).filter(col("len") > 0)
      // lines are CUT inside one projection (transform over the chunk
      // indices) so the explode emits only the line strings — exploding
      // the chunk index first would copy the full token array into
      // every chunk row, a ~70× row-size blowup at this cut length
      val lines = docs
        .select(col("lang"), col("doc_id"), posexplode(expr(
          "transform(sequence(0L, (len - 1) div 8), " +
            "c -> array_join(slice(arr, cast(c * 8 + 1 as int), 8), ' '))"))
          .as(Seq("c", "line")))
        .select(col("lang"), col("doc_id"), col("c"), md5(col("line")).as("h"),
          length(col("line")).as("line_chars"))
      val firsts = lines.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("c"))).as("first"))
      lines.join(firsts, "h")
        .withColumn("kept",
          col("doc_id") === col("first.doc_id") && col("c") === col("first.c"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_lines"),
          sum(when(!col("kept"), 1).otherwise(0)).as("n_dropped"),
          sum(when(col("kept"), col("line_chars")).otherwise(0)).as("n_chars_kept"),
          round(avg(when(col("kept"), 1.0).otherwise(0.0)), 6).as("keep_ratio"))
        .orderBy(col("lang"))
    }),

    // CROSS-SOURCE DUPLICATION MATRIX (the RedPajama/SlimPajama-style
    // provenance report a multi-source corpus merge needs: which feeds
    // duplicate WHICH): line-grain content hashes (q218's 8-token cut)
    // reduced to distinct (hash, source) pairs, then a hash-keyed
    // self-join emits each source pair sharing a hash — the join's
    // per-group fan-out is bounded by sources-per-hash (≤ |sources|,
    // never corpus rows), the property that keeps provenance analysis
    // off the all-pairs cliff. Pair overlap is reported as shared-hash
    // count + Jaccard over the two sources' distinct-hash sets.
    "q228_source_overlap" -> ((s, d) => {
      val lines = documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("arr", split(col("text"), " "))
        .withColumn("len", size(col("arr"))).filter(col("len") > 0)
        .select(col("source"), explode(expr(
          "transform(sequence(0L, (len - 1) div 8), " +
            "c -> array_join(slice(arr, cast(c * 8 + 1 as int), 8), ' '))"))
          .as("line"))
        .select(col("source"), md5(col("line")).as("h"))
      // hs feeds three consumers (per-source totals + both join sides);
      // persist the md5 explode once — CacheBag drains it post-action
      val hs = graft.CacheBag.register(
        lines.select(col("h"), col("source")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val perSrc = hs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_distinct"))
      val a = hs.select(col("h"), col("source").as("src_a"))
      val b = hs.select(col("h"), col("source").as("src_b"))
      a.join(b, "h").filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(perSrc.select(col("source").as("src_a"),
          col("n_distinct").as("na")), "src_a")
        .join(perSrc.select(col("source").as("src_b"),
          col("n_distinct").as("nb")), "src_b")
        .withColumn("jacc", round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6))
        .select(col("src_a"), col("src_b"), col("n_shared"), col("jacc"))
        .orderBy(col("src_a"), col("src_b"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Same line hashes, same distinct (hash, source) reduction and
    // hash-keyed pair join.
    "q228_source_overlap" ->
      """WITH docs AS (
        |  SELECT source, string_split(text, ' ') AS arr FROM documents
        |  WHERE len(string_split(text, ' ')) > 0
        |), lines AS (
        |  SELECT source,
        |    md5(array_to_string(arr[(c*8+1):(c*8+8)], ' ')) AS h
        |  FROM (SELECT source, arr,
        |          unnest(range(0, ((len(arr) - 1) // 8) + 1)) AS c
        |        FROM docs)
        |), hs AS (
        |  SELECT DISTINCT h, source FROM lines
        |), per_src AS (
        |  SELECT source, count(*) AS n_distinct FROM hs GROUP BY 1
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT p.src_a, p.src_b, p.n_shared,
        |  round(CAST(p.n_shared AS DOUBLE) /
        |    (pa.n_distinct + pb.n_distinct - p.n_shared), 6) AS jacc
        |FROM pairs p
        |JOIN per_src pa ON pa.source = p.src_a
        |JOIN per_src pb ON pb.source = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    // Same 8-token cut (range is end-exclusive, hence the +1), same
    // min(struct) first-winner; 0/1 doubles under avg sum exactly in
    // both engines.
    "q218_line_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS arr,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents WHERE len(string_split(text, ' ')) > 0
        |), lines AS (
        |  SELECT lang, doc_id, c,
        |    md5(array_to_string(arr[(c*8+1):(c*8+8)], ' ')) AS h,
        |    length(array_to_string(arr[(c*8+1):(c*8+8)], ' ')) AS line_chars
        |  FROM (SELECT lang, doc_id, arr,
        |          unnest(range(0, ((n - 1) // 8) + 1)) AS c
        |        FROM docs)
        |), firsts AS (
        |  SELECT h, min(struct_pack(doc_id := doc_id, c := c)) AS f
        |  FROM lines GROUP BY 1
        |), m AS (
        |  SELECT l.lang, l.doc_id, l.line_chars,
        |    (l.doc_id = firsts.f.doc_id AND l.c = firsts.f.c) AS kept
        |  FROM lines l JOIN firsts USING (h)
        |)
        |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(sum(CASE WHEN kept THEN line_chars ELSE 0 END) AS BIGINT)
        |    AS n_chars_kept,
        |  round(avg(CASE WHEN kept THEN 1.0 ELSE 0.0 END), 6) AS keep_ratio
        |FROM m GROUP BY 1 ORDER BY lang""".stripMargin,
    "q86_quality_signals" ->
      """WITH docs AS (
        |  SELECT lang, doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), base AS (
        |  SELECT lang, doc_id, toks, len(toks) AS n_toks,
        |    1.0 - len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS dup_frac,
        |    length(regexp_replace(text, '\s', '', 'g'))::DOUBLE / len(toks)::DOUBLE
        |      AS mean_word_len
        |  FROM docs WHERE len(toks) >= 2
        |), bg AS (
        |  SELECT lang, doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ')
        |            for i in generate_series(1, len(toks) - 1)]) AS bg
        |  FROM base
        |), bgc AS (
        |  SELECT lang, doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2, 3
        |), top_mass AS (
        |  SELECT lang, doc_id,
        |    max(cnt)::DOUBLE / sum(cnt)::DOUBLE AS top_bg_frac
        |  FROM bgc GROUP BY 1, 2
        |)
        |SELECT b.lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(round(b.dup_frac, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_dup_frac,
        |  round(CAST(sum(CAST(round(t.top_bg_frac, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_top_bg_frac,
        |  round(CAST(sum(CAST(round(b.mean_word_len, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_word_len,
        |  CAST(sum(CASE WHEN b.dup_frac > 0.3 OR t.top_bg_frac > 0.18
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM base b JOIN top_mass t ON b.lang = t.lang AND b.doc_id = t.doc_id
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    "q87_pii_scrub" ->
      """WITH aug AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      concat('Contact u', doc_id, '@example.com or +1-555-',
        |             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), '. ', text)
        |    ELSE text END AS aug
        |  FROM documents
        |), scrub AS (
        |  SELECT lang, aug,
        |    len(regexp_extract_all(aug,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS n_phones,
        |    regexp_replace(regexp_replace(aug,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS scrubbed
        |  FROM aug
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
        |  CAST(sum(n_phones) AS BIGINT) AS n_phones,
        |  CAST(sum(length(aug) - length(scrubbed)) AS BIGINT) AS len_delta,
        |  CAST(sum(CASE WHEN n_emails + n_phones = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clean
        |FROM scrub GROUP BY lang ORDER BY lang""".stripMargin,

    "q88_perplexity" ->
      """WITH tok AS (
        |  SELECT lang, doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT lang, tok, count(*) AS cnt FROM tok GROUP BY 1, 2
        |), lp AS (
        |  SELECT lang, tok,
        |    CAST(round(ln(cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY lang))::DOUBLE), 9)
        |      AS DECIMAL(28,9)) AS logp
        |  FROM freq
        |), doc AS (
        |  SELECT t.lang, t.doc_id, count(*) AS n, sum(lp.logp) AS s
        |  FROM tok t JOIN lp ON t.lang = lp.lang AND t.tok = lp.tok
        |  GROUP BY 1, 2
        |), ce AS (
        |  SELECT lang, doc_id, round(-CAST(s AS DOUBLE) / n, 6) AS ce FROM doc
        |)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(ce AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_ce,
        |  round(max(ce), 6) AS max_ce,
        |  CAST(sum(CASE WHEN ce > 7.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM ce GROUP BY lang ORDER BY lang""".stripMargin,

    "q92_dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT lang, doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM t
        |), base AS (
        |  SELECT lang, doc_id,
        |    list_transform(sh, s ->
        |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
        |  FROM sh
        |), sig AS (
        |  SELECT lang, doc_id,
        |    [list_min(list_transform(bh, s ->
        |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
        |     for j in generate_series(0, 7)] AS sig
        |  FROM base
        |), banded AS (
        |  SELECT lang, doc_id, sig, b AS band,
        |    concat(sig[b*2+1], ',', sig[b*2+2]) AS key
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bands
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM banded a JOIN banded b
        |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id
        |  WHERE len([i for i in generate_series(1, 8) if a.sig[i] = b.sig[i]]) >= 4
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), lbl AS (
        |  SELECT d.lang, d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
        |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
        |  GROUP BY d.lang, d.doc_id
        |), sizes AS (
        |  SELECT lang, component, count(*) AS sz FROM lbl GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_clusters, max(sz) AS max_cluster_size,
        |  CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT) AS n_docs_multi
        |FROM sizes GROUP BY lang ORDER BY lang""".stripMargin,

    // q92's closure + a per-cluster (n_chars DESC, doc_id) ranking: the
    // quality-keep policy and its delta vs naive min-id keep.
    "q190_quality_canonical" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT lang, doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM t
        |), base AS (
        |  SELECT lang, doc_id,
        |    list_transform(sh, s ->
        |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
        |  FROM sh
        |), sig AS (
        |  SELECT lang, doc_id,
        |    [list_min(list_transform(bh, s ->
        |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
        |     for j in generate_series(0, 7)] AS sig
        |  FROM base
        |), banded AS (
        |  SELECT lang, doc_id, sig, b AS band,
        |    concat(sig[b*2+1], ',', sig[b*2+2]) AS key
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bands
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM banded a JOIN banded b
        |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id
        |  WHERE len([i for i in generate_series(1, 8) if a.sig[i] = b.sig[i]]) >= 4
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), lbl AS (
        |  SELECT d.lang, d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
        |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
        |  GROUP BY d.lang, d.doc_id
        |), withq AS (
        |  SELECT l.lang, l.doc_id, l.component, d.n_chars
        |  FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
        |), ranked AS (
        |  SELECT lang, doc_id, component, n_chars,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    min(doc_id) OVER (PARTITION BY component) AS min_id,
        |    count(*) OVER (PARTITION BY component) AS csz
        |  FROM withq
        |)
        |SELECT lang,
        |  CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rn <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_kept,
        |  CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_dropped,
        |  CAST(sum(CASE WHEN rn = 1 AND csz >= 2 AND doc_id <> min_id
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_beats_minid
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,

    "q93_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT lang, tok, count(*) AS cnt FROM tok GROUP BY 1, 2
        |), ranked AS (
        |  SELECT lang, cnt,
        |    row_number() OVER w AS rnk,
        |    sum(cnt) OVER (w ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS total
        |  FROM freq
        |  WINDOW w AS (PARTITION BY lang ORDER BY cnt DESC, tok)
        |)
        |SELECT lang, count(*) AS vocab_size,
        |  min(CASE WHEN cum * 2 >= total THEN rnk END) AS n_terms_50,
        |  min(CASE WHEN cum * 10 >= total * 9 THEN rnk END) AS n_terms_90,
        |  min(CASE WHEN cum * 100 >= total * 99 THEN rnk END) AS n_terms_99
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,

    "q151_dup_ngram_chars" ->
      """WITH t AS (
        |  SELECT lang, doc_id, length(trim(text)) AS nc,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), f2 AS (
        |  SELECT lang, doc_id, least(1.0,
        |      CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) ELSE 0 END)
        |        AS DOUBLE) / nc) AS frac2
        |  FROM (
        |    SELECT lang, doc_id, nc, g, count(*) AS cnt FROM (
        |      SELECT lang, doc_id, nc,
        |        unnest([array_to_string(toks[i:i+1], ' ')
        |                for i in generate_series(1, len(toks) - 1)]) AS g
        |      FROM t WHERE len(toks) >= 2)
        |    GROUP BY ALL)
        |  GROUP BY lang, doc_id, nc
        |), f3 AS (
        |  SELECT lang, doc_id, least(1.0,
        |      CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) ELSE 0 END)
        |        AS DOUBLE) / nc) AS frac3
        |  FROM (
        |    SELECT lang, doc_id, nc, g, count(*) AS cnt FROM (
        |      SELECT lang, doc_id, nc,
        |        unnest([array_to_string(toks[i:i+2], ' ')
        |                for i in generate_series(1, len(toks) - 2)]) AS g
        |      FROM t WHERE len(toks) >= 3)
        |    GROUP BY ALL)
        |  GROUP BY lang, doc_id, nc
        |)
        |SELECT f2.lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(round(frac2, 6) AS DECIMAL(18,6))) AS DOUBLE) /
        |    count(*), 6) AS avg_dup2_frac,
        |  round(CAST(sum(CAST(round(coalesce(frac3, 0.0), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*), 6) AS avg_dup3_frac,
        |  CAST(sum(CASE WHEN frac2 > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM f2 LEFT JOIN f3 USING (lang, doc_id)
        |GROUP BY f2.lang ORDER BY f2.lang""".stripMargin,

    "q152_repeated_passages" ->
      """WITH t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT lang, doc_id, i AS p, array_to_string(toks[i:i+12], ' ') AS g
        |  FROM t, unnest(generate_series(1, len(toks) - 12)) AS u(i)
        |  WHERE len(toks) >= 13
        |), dup AS (
        |  SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        |), pos AS (
        |  SELECT g.lang, g.doc_id, g.p,
        |    g.p - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.p) AS grp
        |  FROM g JOIN dup USING (g)
        |), spans AS (
        |  SELECT lang, doc_id, grp, count(*) + 12 AS span_toks
        |  FROM pos GROUP BY lang, doc_id, grp
        |)
        |SELECT lang, count(DISTINCT doc_id) AS n_docs_affected,
        |  count(*) AS n_spans,
        |  CAST(sum(span_toks) AS BIGINT) AS sum_span_toks,
        |  CAST(max(span_toks) AS BIGINT) AS max_span_toks
        |FROM spans GROUP BY lang ORDER BY lang""".stripMargin,

    "q153_sequence_packing" ->
      """WITH d AS (
        |  SELECT source, doc_id, doc_id % 8 AS shard,
        |    len(string_split_regex(trim(text), '\s+')) AS n_toks
        |  FROM documents
        |), packed AS (
        |  SELECT source, shard, n_toks,
        |    sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS e
        |  FROM d
        |), marked AS (
        |  SELECT source, shard, n_toks,
        |    CASE WHEN (e - n_toks) // 256 <> (e - 1) // 256 THEN 1 ELSE 0 END
        |      AS split_doc
        |  FROM packed
        |), per_shard AS (
        |  SELECT source, shard, count(*) AS n_docs, sum(n_toks) AS shard_toks,
        |    sum(split_doc) AS n_split_docs,
        |    CAST(ceil(CAST(sum(n_toks) AS DOUBLE) / 256) AS BIGINT) AS n_examples
        |  FROM marked GROUP BY source, shard
        |)
        |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(shard_toks) AS BIGINT) AS total_toks,
        |  CAST(sum(n_split_docs) AS BIGINT) AS n_split_docs,
        |  CAST(sum(n_examples) AS BIGINT) AS n_examples
        |FROM per_shard GROUP BY source ORDER BY source""".stripMargin,

    "q154_temperature_mixing" ->
      """WITH cnts AS (
        |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
        |), tot AS (
        |  SELECT CAST(sum(CAST(round(sqrt(cnt), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS totw FROM cnts
        |), probs AS (
        |  SELECT lang, cnt,
        |    CAST(floor(least(1.0, 250.0 * sqrt(cnt) / totw / cnt) * 10000)
        |      AS BIGINT) AS thresh
        |  FROM cnts, tot
        |), gated AS (
        |  SELECT d.lang, p.thresh,
        |    (CAST(concat('0x', substr(md5(concat('mix|', d.doc_id)), 1, 12))
        |       AS BIGINT) % 10000) < p.thresh AS kept
        |  FROM documents d JOIN probs p USING (lang)
        |)
        |SELECT lang, count(*) AS n_docs, max(thresh) AS thresh_bp,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM gated GROUP BY lang ORDER BY lang""".stripMargin,

    // Same six verdicts from the same integer arithmetic: ratios are
    // int/int divisions (bit-identical across engines), stop-word count
    // walks the FIXED 8-word list so each word counts once iff present
    // (= Spark's distinct array_intersect size).
    "q168_gopher_gates" ->
      """WITH t AS (
        |  SELECT lang, source, text,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), m AS (
        |  SELECT lang, source, len(toks) AS n_toks,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      / len(toks) AS mean_wl,
        |    CAST(len(string_split(text, '#')) - 1
        |       + len(string_split(text, '…')) - 1 AS DOUBLE)
        |      / len(toks) AS sym_ratio,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS DOUBLE) / len(toks) AS alpha_frac,
        |    len(list_filter(['the','be','to','of','and','that','have','with'],
        |      sw -> list_contains(toks, sw))) AS n_stop
        |  FROM t
        |), v AS (
        |  SELECT lang, source,
        |    n_toks BETWEEN 50 AND 100000 AS ok_wc,
        |    mean_wl BETWEEN 3.0 AND 10.0 AS ok_wl,
        |    sym_ratio <= 0.1 AS ok_sym,
        |    alpha_frac >= 0.8 AS ok_alpha,
        |    n_stop >= 2 AS ok_stop
        |  FROM m
        |)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN NOT ok_wc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_wordcount,
        |  CAST(sum(CASE WHEN NOT ok_wl THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_wordlen,
        |  CAST(sum(CASE WHEN NOT ok_sym THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_symbol,
        |  CAST(sum(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_alpha,
        |  CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_stopword,
        |  CAST(sum(CASE WHEN ok_wc AND ok_wl AND ok_sym AND ok_alpha
        |    AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |FROM v GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    // Same md5 bucket/uniform derivations, Laplace smoothing, 9-dp log
    // pins and decimal sums as the engine — the Gumbel-top-k ranking
    // doubles are bit-identical, so the selected docs match exactly.
    "q185_dsir_importance" ->
      """WITH tok AS (
        |  SELECT lang, doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), b AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x', substr(md5('dsir|' || tok), 1, 12)) AS BIGINT)
        |      % 256 AS bucket
        |  FROM tok
        |), raw AS (
        |  SELECT bucket, count(*) AS cr FROM b GROUP BY 1
        |), tgt AS (
        |  SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1
        |), tots AS (
        |  SELECT (SELECT sum(cr) FROM raw) AS tot_r,
        |         (SELECT sum(ct) FROM tgt) AS tot_t
        |), ratios AS (
        |  SELECT r.bucket,
        |    CAST(round(
        |      ln((coalesce(t.ct, 0) + 1)::DOUBLE / ((tots.tot_t + 256)::DOUBLE)) -
        |      ln((r.cr + 1)::DOUBLE / ((tots.tot_r + 256)::DOUBLE)), 9)
        |      AS DECIMAL(28,9)) AS lr
        |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tots
        |), logw AS (
        |  SELECT b.lang, b.doc_id, sum(ratios.lr) AS logw
        |  FROM b JOIN ratios USING (bucket) GROUP BY 1, 2
        |), keyed AS (
        |  SELECT lang, doc_id, logw,
        |    CAST(logw AS DOUBLE) + round(-ln(-ln(
        |      ((CAST(concat('0x', substr(md5('gum|' || doc_id), 1, 12)) AS BIGINT)
        |        % 1000000)::DOUBLE + 0.5) / 1000000.0)), 9) AS key
        |  FROM logw
        |), ranked AS (
        |  SELECT lang, doc_id, logw,
        |    row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id)
        |      AS rank
        |  FROM keyed
        |)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
        |  round(CAST(logw AS DOUBLE), 6) AS logw
        |FROM ranked WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    // Integer chunk math ((len−17) // 48 under a greatest-0 guard makes
    // DuckDB's floor and Spark's truncation agree), 1-based inclusive
    // list_slice ≡ Spark slice(start, 64), md5 chunk identity.
    "q186_doc_chunking" ->
      """WITH tok AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), docs AS (
        |  SELECT lang, doc_id, toks, len(toks) AS len,
        |    1 + greatest(0, (len(toks) - 17) // 48) AS n_chunks
        |  FROM tok WHERE len(toks) > 0
        |), starts AS (
        |  SELECT lang, doc_id, toks,
        |    unnest(range(0, n_chunks)) AS i
        |  FROM docs
        |), chunks AS (
        |  SELECT lang, doc_id,
        |    list_slice(toks, i*48 + 1, i*48 + 64) AS chunk_toks
        |  FROM starts
        |), c2 AS (
        |  SELECT lang, doc_id, len(chunk_toks) AS chunk_len,
        |    md5(array_to_string(chunk_toks, ' ')) AS h
        |  FROM chunks
        |)
        |SELECT lang,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_chunks,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_unique_chunks,
        |  round(CAST(sum(CAST(chunk_len AS DECIMAL(18,0))) AS DOUBLE)
        |    / count(*), 6) AS avg_chunk_toks,
        |  round(1.0 - count(DISTINCT h)::DOUBLE / count(*)::DOUBLE, 6)
        |    AS dup_fraction
        |FROM c2 GROUP BY 1 ORDER BY lang""".stripMargin,

    // The q88 determinism route feeds ntile(3) on the (ce, doc_id) total
    // order; NTILE's extra-row-to-first-groups rule is the SQL standard
    // in both engines, so the tercile cut is identical.
    "q187_ccnet_buckets" ->
      """WITH tok AS (
        |  SELECT lang, doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT lang, tok, count(*) AS cnt FROM tok GROUP BY 1, 2
        |), lp AS (
        |  SELECT lang, tok,
        |    CAST(round(ln(cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY lang))::DOUBLE), 9)
        |      AS DECIMAL(28,9)) AS logp
        |  FROM freq
        |), doc AS (
        |  SELECT t.lang, t.doc_id, count(*) AS n, sum(lp.logp) AS s
        |  FROM tok t JOIN lp ON t.lang = lp.lang AND t.tok = lp.tok
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT lang, doc_id, round(-CAST(s AS DOUBLE) / n, 6) AS ce FROM doc
        |), cut AS (
        |  SELECT lang, doc_id, ce,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY ce, doc_id) AS bi
        |  FROM scored
        |)
        |SELECT c.lang,
        |  CASE bi WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
        |    AS bucket,
        |  count(*) AS n_docs,
        |  round(CAST(sum(CAST(ce AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |    AS avg_ce,
        |  CAST(sum(d.n_chars) AS BIGINT) AS n_chars
        |FROM cut c JOIN documents d USING (doc_id)
        |GROUP BY 1, 2 ORDER BY c.lang, bucket""".stripMargin,

    "q197_bigram_lm" ->
      """WITH t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), f AS (
        |  SELECT lang, doc_id, toks FROM t WHERE len(toks) >= 2
        |), bg AS (
        |  SELECT lang, doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM f, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |), uni AS (
        |  SELECT lang, w2, count(*) AS ucnt,
        |    sum(count(*)) OVER (PARTITION BY lang) AS utot
        |  FROM (SELECT lang, tok AS w2 FROM f, unnest(toks) AS u(tok))
        |  GROUP BY lang, w2
        |), big AS (
        |  SELECT lang, w1, w2, count(*) AS bcnt,
        |    sum(count(*)) OVER (PARTITION BY lang, w1) AS ptot
        |  FROM bg GROUP BY lang, w1, w2
        |), probs AS (
        |  SELECT big.lang, big.w1, big.w2,
        |    CAST(round(ln(
        |      0.7 * (big.bcnt::DOUBLE / big.ptot) +
        |      0.3 * (uni.ucnt::DOUBLE / uni.utot)), 9) AS DECIMAL(28,9)) AS logp
        |  FROM big JOIN uni ON big.lang = uni.lang AND big.w2 = uni.w2
        |), doc AS (
        |  SELECT bg.lang, bg.doc_id, count(*) AS nb, sum(p.logp) AS sl
        |  FROM bg JOIN probs p
        |    ON bg.lang = p.lang AND bg.w1 = p.w1 AND bg.w2 = p.w2
        |  GROUP BY 1, 2
        |), ce AS (
        |  SELECT lang, doc_id, round(-CAST(sl AS DOUBLE) / nb, 6) AS ce FROM doc
        |)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(ce AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |    AS avg_ce,
        |  round(min(ce), 6) AS min_ce, round(max(ce), 6) AS max_ce
        |FROM ce GROUP BY lang ORDER BY lang""".stripMargin,

    "q209_quality_classifier" ->
      """WITH t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), feats AS (
        |  SELECT lang, doc_id, f FROM (
        |    SELECT lang, doc_id,
        |      list_concat(toks,
        |        list_distinct([array_to_string(toks[i:i+1], ' ')
        |          for i in generate_series(1, len(toks) - 1)])) AS fs
        |    FROM t
        |  ), unnest(fs) AS u(f)
        |), w AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x', substr(md5('qw|' ||
        |      (CAST(concat('0x', substr(md5('qc|' || f), 1, 12)) AS BIGINT) % 256)
        |      ), 1, 12)) AS BIGINT) % 2001 - 1000 AS w_milli
        |  FROM feats
        |), doc AS (
        |  SELECT lang, doc_id, count(*) AS nf, sum(w_milli) AS sw
        |  FROM w GROUP BY 1, 2
        |), p AS (
        |  SELECT lang,
        |    round(1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (nf * 1000.0)))), 6)
        |      AS p
        |  FROM doc
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  round(CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |    AS avg_p,
        |  round(min(p), 6) AS min_p, round(max(p), 6) AS max_p
        |FROM p GROUP BY 1 ORDER BY lang""".stripMargin,

    "q207_unimax_sampling" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents
        |), counts AS (
        |  SELECT lang, count(*) AS c, count(*) * 2 AS cap FROM tok GROUP BY 1
        |), b AS (
        |  SELECT (sum(c) * 3) // 2 AS budget, count(*) AS n_langs FROM counts
        |), ranked AS (
        |  SELECT counts.*, b.budget, b.n_langs,
        |    row_number() OVER w AS i,
        |    coalesce(sum(cap) OVER (ORDER BY cap, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
        |  FROM counts, b
        |  WINDOW w AS (ORDER BY cap, lang)
        |), f AS (
        |  SELECT *, CAST(budget - cs AS DOUBLE) / (n_langs - i + 1) AS fair,
        |    CAST(cap AS DOUBLE) >
        |      CAST(budget - cs AS DOUBLE) / (n_langs - i + 1) AS over
        |  FROM ranked
        |), sw AS (
        |  SELECT i AS sw_i, fair AS sw_fair FROM f WHERE over ORDER BY i LIMIT 1
        |)
        |SELECT f.lang, f.c AS n_tokens, CAST(f.cap AS BIGINT) AS cap,
        |  f.over AS hit_fair_share,
        |  round(CASE WHEN sw.sw_i IS NULL OR f.i < sw.sw_i
        |    THEN CAST(f.cap AS DOUBLE) ELSE sw.sw_fair END, 4) AS alloc_tokens,
        |  round(CASE WHEN sw.sw_i IS NULL OR f.i < sw.sw_i
        |    THEN CAST(f.cap AS DOUBLE) ELSE sw.sw_fair END / f.c, 6) AS epochs
        |FROM f LEFT JOIN sw ON TRUE ORDER BY f.lang""".stripMargin,

    // Same md5 permutation key, same nibble ranges; skew = share of the
    // uniform ideal. All aggregation integer except the one ratio.
    // Same width-64 bucketing, same shard-bounded rank division, exact
    // integer waste under both padding policies.
    "q260_length_bucketed_batches" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    greatest(len(string_split_regex(trim(text), '\s+')), 1) AS n_toks
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_toks,
        |    (n_toks - 1) // 64 AS bucket,
        |    ((n_toks - 1) // 64 + 1) * 64 AS cap,
        |    doc_id % 8 AS shard
        |  FROM d
        |), r AS (
        |  SELECT *, greatest(4096 // cap, 1) AS per_batch,
        |    row_number() OVER (PARTITION BY bucket, shard ORDER BY doc_id)
        |      AS rk
        |  FROM b
        |), pb AS (
        |  SELECT bucket, cap, shard, (rk - 1) // per_batch AS batch_id,
        |    count(*) AS n, sum(n_toks) AS toks, max(n_toks) AS bmax
        |  FROM r GROUP BY 1, 2, 3, 4
        |)
        |SELECT bucket, cap, CAST(sum(n) AS BIGINT) AS n_docs,
        |  count(*) AS n_batches,
        |  CAST(sum(toks) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n * cap - toks) AS BIGINT) AS waste_static,
        |  CAST(sum(n * bmax - toks) AS BIGINT) AS waste_dynamic
        |FROM pb GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    // q209's exact scoring chain, then DECIMAL-bucketed suffix sums —
    // F1 = 2TP/(PP + P), the integer-safe identity.
    "q261_threshold_sweep" ->
      """WITH t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), feats AS (
        |  SELECT lang, doc_id, f FROM (
        |    SELECT lang, doc_id,
        |      list_concat(toks,
        |        list_distinct([array_to_string(toks[i:i+1], ' ')
        |          for i in generate_series(1, len(toks) - 1)])) AS fs
        |    FROM t
        |  ), unnest(fs) AS u(f)
        |), w AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x', substr(md5('qw|' ||
        |      (CAST(concat('0x', substr(md5('qc|' || f), 1, 12)) AS BIGINT) % 256)
        |      ), 1, 12)) AS BIGINT) % 2001 - 1000 AS w_milli
        |  FROM feats
        |), doc AS (
        |  SELECT lang, doc_id, count(*) AS nf, sum(w_milli) AS sw
        |  FROM w GROUP BY 1, 2
        |), p AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    round(1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (nf * 1000.0)))), 6)
        |      AS p
        |  FROM doc
        |), jb AS (
        |  SELECT greatest(CAST(ceil(CAST(p AS DECIMAL(9,6)) * 20) AS BIGINT)
        |      - 1, 0) AS j,
        |    count(*) AS n, sum(y) AS pos
        |  FROM p GROUP BY 1
        |), sw2 AS (
        |  SELECT j, n, pos,
        |    sum(n) OVER (ORDER BY j DESC ROWS UNBOUNDED PRECEDING) AS pp,
        |    sum(pos) OVER (ORDER BY j DESC ROWS UNBOUNDED PRECEDING) AS tp
        |  FROM jb
        |)
        |SELECT round(CAST(j AS DOUBLE) / 20, 2) AS threshold,
        |  CAST(pp AS BIGINT) AS predicted_pos, CAST(tp AS BIGINT) AS tp,
        |  round(CAST(tp AS DOUBLE) / pp, 6) AS precision,
        |  round(CAST(tp AS DOUBLE) /
        |    (SELECT sum(y) FROM p), 6) AS recall,
        |  round(2.0 * tp / (pp + (SELECT sum(y) FROM p)), 6) AS f1
        |FROM sw2 ORDER BY threshold""".stripMargin,

    // q92's closure chain + both split rules; leak_aware is proved zero
    // BLIND (the oracle recomputes components and splits from scratch).
    "q266_leakage_free_split" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT lang, doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM t
        |), base AS (
        |  SELECT lang, doc_id,
        |    list_transform(sh, s ->
        |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
        |  FROM sh
        |), sig AS (
        |  SELECT lang, doc_id,
        |    [list_min(list_transform(bh, s ->
        |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
        |     for j in generate_series(0, 7)] AS sig
        |  FROM base
        |), banded AS (
        |  SELECT lang, doc_id, sig, b AS band,
        |    concat(sig[b*2+1], ',', sig[b*2+2]) AS key
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bands
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM banded a JOIN banded b
        |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id
        |  WHERE len([i for i in generate_series(1, 8) if a.sig[i] = b.sig[i]]) >= 4
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), lbl AS (
        |  SELECT d.lang, d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
        |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
        |  GROUP BY d.lang, d.doc_id
        |), spl AS (
        |  SELECT lang, doc_id, component,
        |    CASE WHEN CAST(concat('0x', substr(md5('split|' || doc_id), 1, 12))
        |        AS BIGINT) % 10 < 2 THEN 'test' ELSE 'train' END AS sn,
        |    CASE WHEN CAST(concat('0x', substr(md5('split|' || component), 1,
        |        12)) AS BIGINT) % 10 < 2 THEN 'test' ELSE 'train' END AS sa
        |  FROM lbl
        |), lk AS (
        |  SELECT count(*) AS n_pairs,
        |    CAST(coalesce(sum(CASE WHEN s1.sn <> s2.sn THEN 1 END), 0)
        |      AS BIGINT) AS leak_naive,
        |    CAST(coalesce(sum(CASE WHEN s1.sa <> s2.sa THEN 1 END), 0)
        |      AS BIGINT) AS leak_aware
        |  FROM pairs p JOIN spl s1 ON p.id1 = s1.doc_id
        |    JOIN spl s2 ON p.id2 = s2.doc_id
        |)
        |SELECT s.lang, count(*) AS n_docs,
        |  count(DISTINCT s.component) AS n_components,
        |  CAST(sum(CASE WHEN s.sa = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test_aware,
        |  CAST(sum(CASE WHEN s.sn = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test_naive,
        |  lk.n_pairs, lk.leak_naive, lk.leak_aware
        |FROM spl s CROSS JOIN lk
        |GROUP BY s.lang, lk.n_pairs, lk.leak_naive, lk.leak_aware
        |ORDER BY s.lang""".stripMargin,

    // Same hashes, same order-invariant folds — any content or
    // membership drift flips h_xor/h_sum.
    "q262_shard_manifest" ->
      """WITH h AS (
        |  SELECT CAST(concat('0x', substr(md5('shuf|' || doc_id), 1, 1))
        |      AS BIGINT) AS shard,
        |    CAST(concat('0x', substr(md5('mf|' || text), 1, 12))
        |      AS BIGINT) AS hv,
        |    len(text) AS nc
        |  FROM documents
        |)
        |SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS n_chars,
        |  bit_xor(hv) AS h_xor,
        |  CAST(sum(hv) AS BIGINT) AS h_sum,
        |  min(hv) AS h_min, max(hv) AS h_max
        |FROM h GROUP BY 1 ORDER BY shard""".stripMargin,

    "q245_corpus_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5('shuf|' || doc_id) AS h,
        |    CAST(concat('0x', substr(md5('shuf|' || doc_id), 1, 1))
        |      AS INT) AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM documents
        |), per AS (
        |  SELECT shard, count(*) AS n_docs, sum(n_toks) AS n_tokens,
        |    (min(struct_pack(h := h, d := doc_id))).d AS head_doc,
        |    min(h) AS min_h, max(h) AS max_h
        |  FROM h GROUP BY 1
        |)
        |SELECT shard, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  head_doc, min_h, max_h,
        |  round(CAST(n_tokens AS DOUBLE) * 16 / sum(n_tokens) OVER (), 6)
        |    AS skew
        |FROM per ORDER BY shard""".stripMargin,

    "q198_c4_clean" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, source, i - 1 AS pos, toks[i] AS tok,
        |    CASE WHEN CAST(concat('0x',
        |        substr(md5('ln|' || doc_id || '|' || (i - 1)), 1, 6))
        |      AS BIGINT) % 7 = 0 THEN 1 ELSE 0 END AS brk
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        |), li AS (
        |  SELECT doc_id, source, pos, tok,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS line_idx
        |  FROM tok
        |), l0 AS (
        |  SELECT doc_id, source, line_idx, string_agg(tok, ' ' ORDER BY pos) AS base
        |  FROM li GROUP BY 1, 2, 3
        |), l1 AS (
        |  SELECT doc_id, source, base,
        |    CAST(concat('0x', substr(md5('c4|' || doc_id || '|' || line_idx), 1, 6))
        |      AS BIGINT) AS h2
        |  FROM l0
        |), l2 AS (
        |  SELECT doc_id, source, h2,
        |    CASE WHEN h2 % 97 = 0 THEN base || ' lorem ipsum dolor'
        |         WHEN h2 % 89 = 0 THEN base || ' { var x }'
        |         WHEN h2 % 83 = 0 THEN base || ' enable javascript please'
        |         ELSE base END AS deco
        |  FROM l1
        |), l3 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN h2 % 5 <> 0 THEN deco || '.' ELSE deco END AS line
        |  FROM l2
        |), l4 AS (
        |  SELECT doc_id, source, line,
        |    (ends_with(line, '.') AND len(string_split(line, ' ')) >= 5
        |      AND NOT contains(line, 'javascript')) AS kept_line
        |  FROM l3
        |), docs AS (
        |  SELECT doc_id, source, count(*) AS n_lines,
        |    sum(CASE WHEN contains(line, 'lorem ipsum') THEN 1 ELSE 0 END) AS n_lorem,
        |    sum(CASE WHEN contains(line, '{') THEN 1 ELSE 0 END) AS n_brace,
        |    sum(CASE WHEN kept_line THEN 1 ELSE 0 END) AS n_kept_lines,
        |    sum(CASE WHEN kept_line THEN length(line) ELSE 0 END) AS kept_chars
        |  FROM l4 GROUP BY 1, 2
        |), st AS (
        |  SELECT source,
        |    CASE WHEN n_lorem > 0 THEN 'drop_lorem'
        |         WHEN n_brace > 0 THEN 'drop_brace'
        |         WHEN n_kept_lines < 3 THEN 'drop_short'
        |         ELSE 'kept' END AS status,
        |    n_lines, n_kept_lines, kept_chars
        |  FROM docs
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_kept,
        |  CAST(sum(CASE WHEN status = 'drop_lorem' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_drop_lorem,
        |  CAST(sum(CASE WHEN status = 'drop_brace' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_drop_brace,
        |  CAST(sum(CASE WHEN status = 'drop_short' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_drop_short,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines_total,
        |  CAST(sum(CASE WHEN status = 'kept' THEN n_kept_lines ELSE 0 END)
        |    AS BIGINT) AS n_lines_kept,
        |  CAST(sum(CASE WHEN status = 'kept' THEN kept_chars ELSE 0 END)
        |    AS BIGINT) AS n_chars_kept
        |FROM st GROUP BY source ORDER BY source""".stripMargin
  )
}
