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
      val sig = docsWithTokens(s, d)
        .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
        .select(col("lang"), col("doc_id"),
          TextOps.minhashSignature(col("bh"), 8).as("sig"))
      val banded = sig.select(col("lang"), col("doc_id"), col("sig"),
        explode(TextOps.bandKeys(col("sig"), 4, 2)).as("bk"))
      val lhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id1"), col("sig").as("sig1"))
      val rhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id2"), col("sig").as("sig2"))
      val pairs = lhs.join(rhs, Seq("lang", "bk")).filter(col("id1") < col("id2"))
        .filter(aggregate(
          zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) >= 4)
        .select(col("id1"), col("id2")).distinct()
      val nodes = documents(s, d).select(col("lang"), col("doc_id"))
      val comp = graft.text.Components.connectedComponents(nodes, pairs, "doc_id")
      val sizes = comp.groupBy(col("lang"), col("component"))
        .agg(count(lit(1)).as("sz"))
      sizes.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clusters"),
          max(col("sz")).as("max_cluster_size"),
          sum(when(col("sz") >= 2, col("sz")).otherwise(0)).as("n_docs_multi"))
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
    })
  )

  val oracle: Map[String, String] = Map(
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
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin
  )
}
