package graft.queries

import graft.Tables._
import graft.functions.VectorFunctions
import graft.text.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline queries (SURVEY §2 E52–E56 [N]) over `documents` and
  * `embeddings`: exact + near dedup (n-gram Jaccard, MinHash+LSH, SimHash),
  * embedding similarity search (brute-force + LSH-bucketed ANN), text
  * analysis, multimodal column plumbing.
  *
  * All hashing is md5-derived so DuckDB reproduces it bit-for-bit; all
  * pair generation goes through an equi-join key (group, band bucket, or
  * LSH bucket) — never an unkeyed cross join — which is what keeps these
  * plans alive at 100 TB.
  */
object TextQueries {

  /** Tokenized docs, repartitioned first: the source is a single parquet
    * row-group (1 scan partition), and the md5-heavy shingle/signature
    * projections run map-side BEFORE any join shuffle — without an explicit
    * repartition they would execute single-threaded. At 100 TB the scan has
    * thousands of natural splits and this becomes a no-op choice. */
  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("toks", TextOps.tokens(col("text")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E52: exact dedup via content hash.
    "q47_exact_dedup" -> ((s, d) => {
      documents(s, d)
        .withColumn("h", TextOps.exactKey(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("h"))).as("n_dups"))
        .orderBy(col("lang"))
    }),

    // E53: n-gram Jaccard near-dup — candidates through MinHash-LSH band
    // buckets (8 bands × 1 row: recall reaches down to jacc ≈ 0.1), exact
    // Jaccard computed ONLY on candidates. Pair generation is an equi-join
    // on (lang, source, band key); a previous all-pairs-within-block form
    // was O(n²) in the largest block — at open-domain scale one ("en",
    // "web") block is most of the corpus, so that plan dies while this one
    // stays linear in candidates. Shingle-less docs (< 3 tokens) can't be
    // near-dups under this metric and drop before banding.
    //
    // Two deliberate materialization choices, measured at sf0.1:
    //  - persist SIG (ids + 8 longs, the q74 bounded-checkpoint shape),
    //    so the 2-md5s-per-shingle chain runs once for both self-join
    //    sides. Persisting the shingle ARRAYS instead costs more than it
    //    saves (nested-string columnar cache build ≈ 4-6 s).
    //  - exact-Jaccard verification re-shingles ONLY candidate docs,
    //    selected by a broadcast id join BEFORE the shingle projection —
    //    the 100 TB shape: fetch candidates from the doc store by id,
    //    never re-process the corpus to verify a few pairs.
    "q48_ngram_jaccard" -> ((s, d) => {
      val toks = docsWithTokens(s, d)
      // q74's proven chain shape: shingles feed minhashBase's transform
      // INPUT (evaluated once, not per lambda element) and bh is a named
      // non-cheap column. The shingle-less gate is `size(toks) >= 3` —
      // cheap and BEFORE the chain. (A filter phrased on the signature
      // column gets pushed below the projection and inlines the whole
      // interpreted md5 chain into the predicate: measured 9 s by itself.)
      val sig = graft.CacheBag.register(toks
        .filter(size(col("toks")) >= 3)
        .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
        .select(col("lang"), col("source"), col("doc_id"),
          TextOps.minhashSignature(col("bh"), 8).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val banded = sig.select(col("lang"), col("source"), col("doc_id"),
        explode(TextOps.bandKeys(col("sig"), 8, 1)).as("bk"))
      val a = banded.select(col("lang"), col("source"), col("bk"), col("doc_id").as("id1"))
      val b = banded.select(col("lang"), col("source"), col("bk"), col("doc_id").as("id2"))
      // cand is persisted (pairs of ids — tiny): it feeds both the
      // candidate-doc id list and the final verification join, and without
      // the persist the band self-join + distinct would run twice.
      val cand = graft.CacheBag.register(
        a.join(b, Seq("lang", "source", "bk")).filter(col("id1") < col("id2"))
          .select(col("lang"), col("source"), col("id1"), col("id2")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val candIds = cand.select(
        explode(array(col("id1"), col("id2"))).as("doc_id")).distinct()
      // candSh is read TWICE (the id1 and id2 sides of the verify join);
      // persist it so candidate docs re-tokenize + re-shingle once, not
      // twice (guide §2.4). Bounded: candidate ids × one shingle array —
      // the same candidate-only frame a 100 TB run would fetch by id.
      val candSh = graft.CacheBag.register(
        toks.join(broadcast(candIds), Seq("doc_id"))
          .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      cand
        .join(candSh.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
        .join(candSh.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
        .withColumn("jacc", TextOps.jaccard(col("sh1"), col("sh2")))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("jacc") >= 0.5, 1).otherwise(0)).as("n_dups"),
          round(sum(round(col("jacc"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as("sum_jacc"),
          round(max(col("jacc")), 6).as("max_jacc"))
        .orderBy(col("lang"), col("source"))
    }),

    // COUNT-MIN SKETCH heavy hitters — the streaming-sketch family
    // member beside Bloom (q180) and HLL (q70): d=4 hash rows × w=16
    // buckets (narrow on purpose: the ~41-word synthetic vocabulary
    // must actually collide for the overestimate column to measure the
    // accuracy/width tradeoff), each cell a keyed count; a token's estimate is the MIN
    // over its 4 cells, ≥ exact by construction and equal when no
    // collision inflates all four rows. All-integer arithmetic → exact
    // cross-engine hashing, no FP surface at all. The output reports
    // the true top-20 tokens' exact counts beside their CMS estimates
    // and the overestimate — the accuracy/width tradeoff a 100 TB
    // heavy-hitter pass buys: the sketch is d·w cells regardless of
    // vocabulary size, and the build is one explode + one keyed agg.
    "q232_countmin_heavy_hitters" -> ((s, d) => {
      val toks = docsWithTokens(s, d)
        .select(explode(col("toks")).as("tok"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      val top = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      val hashed = toks
        .select(col("tok"), explode(expr("sequence(0, 3)")).as("i"))
        .withColumn("bucket", conv(substring(md5(concat(lit("cms"),
          col("i").cast("string"), lit("|"), col("tok"))), 1, 6), 16, 10)
          .cast("long") % 16)
      val cells = hashed.groupBy(col("i"), col("bucket"))
        .agg(count(lit(1)).as("cell"))
      top.select(col("tok"), col("exact_cnt"),
          explode(expr("sequence(0, 3)")).as("i"))
        .withColumn("bucket", conv(substring(md5(concat(lit("cms"),
          col("i").cast("string"), lit("|"), col("tok"))), 1, 6), 16, 10)
          .cast("long") % 16)
        .join(broadcast(cells), Seq("i", "bucket"))
        .groupBy(col("tok"), col("exact_cnt"))
        .agg(min(col("cell")).as("cms_est"))
        .withColumn("overestimate", col("cms_est") - col("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // NEAR-DUP DECONTAMINATION — the fuzzy half of the decon story
    // (q180's Bloom pass catches EXACT n-gram overlap; GPT-3/Llama-class
    // pipelines additionally drop training docs NEAR-duplicating an eval
    // document). The eval set is constructed as PERTURBED COPIES of
    // every 37th train doc (last 5 tokens cut — a leaked benchmark
    // answer with light edits), so the mechanism is load-bearing by
    // construction: each eval doc MUST re-find its source. MinHash band
    // collisions (8×1, recall-oriented) generate only train×eval
    // candidates — never train×train, the asymmetric-join economy of
    // decontamination vs dedup — and exact Jaccard on candidate shingle
    // sets verifies at ≥ 0.5. Per-language report keeps every lang
    // (left join + fill) so "nothing contaminated" is a stated result.
    "q229_neardup_decontamination" -> ((s, d) => {
      val base = docsWithTokens(s, d).filter(size(col("toks")) >= 3)
      val train = base.withColumn("is_eval", lit(false))
      val eval_ = base.filter(col("doc_id") % 37 === 0 &&
          size(col("toks")) >= 10)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("toks", slice(col("toks"), lit(1), size(col("toks")) - 5))
        .withColumn("is_eval", lit(true))
      val marked = train.select(col("lang"), col("doc_id"), col("toks"),
          col("is_eval"))
        .unionByName(eval_.select(col("lang"), col("doc_id"), col("toks"),
          col("is_eval")))
      val sig = graft.CacheBag.register(marked
        .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
        .select(col("lang"), col("doc_id"), col("is_eval"),
          TextOps.minhashSignature(col("bh"), 8).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val banded = sig.select(col("lang"), col("doc_id"), col("is_eval"),
        explode(TextOps.bandKeys(col("sig"), 8, 1)).as("bk"))
      // cand persisted (pair ids — tiny), the q48 discipline: it feeds
      // BOTH the candidate-id broadcast and the verify join; unpersisted,
      // the asymmetric band join + distinct ran twice (21 exchanges —
      // the round-11 audit's one open shuffle note; 17 after)
      val cand = graft.CacheBag.register(banded.filter(!col("is_eval"))
        .select(col("lang"), col("bk"), col("doc_id").as("train_id"))
        .join(banded.filter(col("is_eval"))
          .select(col("lang"), col("bk"), col("doc_id").as("eval_id")),
          Seq("lang", "bk"))
        .select(col("lang"), col("train_id"), col("eval_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val candIds = cand.select(
        explode(array(col("train_id"), col("eval_id"))).as("doc_id")).distinct()
      val candSh = marked.join(broadcast(candIds), Seq("doc_id"))
        .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
      val verified = cand
        .join(candSh.select(col("doc_id").as("train_id"), col("sh").as("sh1")),
          Seq("train_id"))
        .join(candSh.select(col("doc_id").as("eval_id"), col("sh").as("sh2")),
          Seq("eval_id"))
        .withColumn("jacc", TextOps.jaccard(col("sh1"), col("sh2")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_candidate_pairs"),
          countDistinct(when(col("jacc") >= 0.5, col("train_id")))
            .as("n_contaminated_train"),
          round(max(col("jacc")), 6).as("max_jacc"))
      // per-lang totals from the PERSISTED sig frame (same row set as
      // marked — both sit above the size-gate), not a tokenize re-run
      sig.groupBy(col("lang"))
        .agg(sum(when(col("is_eval"), 1).otherwise(0)).as("n_eval"),
          sum(when(!col("is_eval"), 1).otherwise(0)).as("n_train"))
        .join(verified, Seq("lang"), "left")
        .na.fill(0L, Seq("n_candidate_pairs", "n_contaminated_train"))
        .na.fill(0.0, Seq("max_jacc"))
        .orderBy(col("lang"))
    }),

    // E53 scale path: MinHash (k=8) + LSH banding (4 bands × 2 rows) —
    // candidate pairs only where a band bucket collides.
    "q49_minhash_lsh" -> ((s, d) => {
      val sig = docsWithTokens(s, d)
        .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
        .select(col("lang"), col("doc_id"),
          TextOps.minhashSignature(col("bh"), 8).as("sig"))
      val banded = sig.select(col("lang"), col("doc_id"), col("sig"),
        explode(TextOps.bandKeys(col("sig"), 4, 2)).as("bk"))
      val a = banded.select(col("lang"), col("bk"), col("doc_id").as("id1"), col("sig").as("sig1"))
      val bnd = banded.select(col("lang"), col("bk"), col("doc_id").as("id2"), col("sig").as("sig2"))
      a.join(bnd, Seq("lang", "bk")).filter(col("id1") < col("id2"))
        .select(col("lang"), col("id1"), col("id2"),
          aggregate(zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).as("n_equal"))
        .distinct()
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_candidates"),
          round(avg(col("n_equal").cast("double") / 8.0), 6).as("avg_est_sim"))
        .orderBy(col("lang"))
    }),

    // E53: SimHash near-dup — 32-bit signatures, Hamming-≤3 close pairs
    // via byte banding: 4 bands × 8 bits. A pair within Hamming ≤ 3
    // differs in ≤ 3 of the 4 bytes, so it shares ≥ 1 byte position
    // (pigeonhole) → banded candidates have recall 1.0 for the threshold
    // and the banded plan provably equals the all-pairs answer (which is
    // what the oracle computes). Candidate generation is an equi-join on
    // (lang, source, band, byte) — 1/256 collision rate per band — never
    // the old all-pairs-within-block shape. Outputs are all integers:
    // no FP rounding surface at all.
    "q50_simhash" -> ((s, d) => {
      // The signature frame (ids + one long) is persisted: both sides of
      // the band self-join consume it, and the simhash fold (32-bit
      // majority vote over every token hash) is the expensive part.
      val sh = graft.CacheBag.register(docsWithTokens(s, d)
        .withColumn("__hs", TextOps.tokenHashes(col("toks")))
        .withColumn("simhash", expr(TextOps.simhash32Sql))
        .select(col("lang"), col("source"), col("doc_id"), col("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val banded = sh.select(col("lang"), col("source"), col("doc_id"), col("simhash"),
          explode(expr(
            "transform(sequence(0, 3), b -> " +
              "struct(b AS band, CAST(shiftright(simhash, b * 8) % 256 AS INT) AS pfx))")).as("bk"))
        .select(col("lang"), col("source"), col("doc_id"), col("simhash"),
          col("bk.band").as("band"), col("bk.pfx").as("pfx"))
      val a = banded.select(col("lang"), col("source"), col("band"), col("pfx"),
        col("doc_id").as("id1"), col("simhash").as("h1"))
      val b = banded.select(col("lang"), col("source"), col("band"), col("pfx"),
        col("doc_id").as("id2"), col("simhash").as("h2"))
      a.join(b, Seq("lang", "source", "band", "pfx")).filter(col("id1") < col("id2"))
        // Hamming filter BEFORE the pair-dedup: template corpora cluster,
        // so byte buckets are skewed and the raw join output is orders of
        // magnitude larger than the close set — the bit_count filter is
        // codegen'd and cuts the distinct's shuffle to close pairs only.
        .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("lang"), col("id1"), col("id2"), col("hamming")).distinct()
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_close"),
          sum(col("hamming")).as("sum_hamming"),
          min(col("hamming")).as("min_hamming"))
        .orderBy(col("lang"))
    }),

    // E54: brute-force top-k cosine similarity search — query vectors
    // vec_id ∈ {0,1,2} against the whole corpus, via the native
    // VecCosine codegen expression (single fused pass, no allocation).
    "q51_embedding_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", VectorFunctions.vecCosine(col("embedding"), col("qv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // E54 scale path: LSH-bucketed ANN — 4 data-derived hyperplanes →
    // 16 sign buckets; search only the query's bucket. HASH-GREEN via
    // FLOOR units since round 15: every sign bit and every ranking runs
    // on Σ floor(term·1e9) integer units (VecDotUnits/VecD2Units in
    // floorMode). Unlike round(term, 9) — whose half-up boundary two
    // round() implementations can disagree on (the r14 driver-oracle
    // hash mismatch) — floor of one IEEE product is bit-identical in
    // every engine, so the oracle's unnest + CAST(floor(x·1e9) AS BIGINT)
    // formulation reproduces it in ANY DuckDB version. dist2 is the
    // DOUBLE units/1e9 (one correctly-rounded division, both engines).
    "q52_ann_lsh_buckets" -> ((s, d) => {
      val emb = embeddings(s, d)
      val planes = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("plane_id"), col("embedding").as("pv"))
      val bucketed = emb.crossJoin(broadcast(planes))
        .withColumn("bit",
          when(VectorFunctions.vecDotFloor(col("embedding"), col("pv")) > 0, 1)
            .otherwise(0))
        .groupBy(col("vec_id"), col("embedding"))
        .agg(sum(col("bit") * pow(lit(2), col("plane_id"))).cast("long").as("bucket"))
      val q = bucketed.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"), col("bucket"))
      val cand = bucketed.join(q, "bucket").filter(col("vec_id") =!= col("query_id"))
        .withColumn("u", VectorFunctions.vecD2Floor(col("embedding"), col("qv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("u"), col("vec_id"))
      cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"),
          (col("u") / lit(1e9)).as("dist2"),
          col("bucket"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // E55: language breakdown + quality signals.
    "q53_lang_quality" -> ((s, d) => {
      docsWithTokens(s, d)
        .withColumn("stop_ratio", TextOps.stopwordRatio(col("toks"), Seq("the", "a")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(avg(size(col("toks"))), 6).as("avg_tokens"),
          round(avg(col("stop_ratio")), 6).as("avg_stop_ratio"),
          sum(when(col("n_chars") < 200, 1).otherwise(0)).as("n_short"))
        .orderBy(col("lang"))
    }),

    // E55: token statistics — explode to token grain, count + distinct +
    // a BPE-ish subword proxy (vowel-run count via regexp_extract_all).
    "q54_token_stats" -> ((s, d) => {
      val docs = docsWithTokens(s, d)
        .withColumn("n_subwords", size(expr("regexp_extract_all(text, '[aeiou]+', 0)")).cast("long"))
      val tok = docs.select(col("lang"), col("n_subwords"), col("doc_id"),
        explode(col("toks")).as("tok"))
      tok.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct_tokens"),
          round(avg(length(col("tok"))), 6).as("avg_tok_len"))
        .join(docs.groupBy(col("lang")).agg(sum(col("n_subwords")).as("n_subwords")), "lang")
        .select(col("lang"), col("n_tokens"), col("n_distinct_tokens"),
          col("avg_tok_len"), col("n_subwords"))
        .orderBy(col("lang"))
    }),

    // E55: positional-weight fingerprint over the first 64 chars —
    // deterministic rolling-hash stand-in, identical in both engines.
    "q55_doc_fingerprint" -> ((s, d) => {
      documents(s, d)
        .withColumn("fp", expr(
          """aggregate(
            |  transform(sequence(1, least(length(text), 64)),
            |    i -> CAST(i AS BIGINT) * ascii(substring(text, i, 1))),
            |  0L, (acc, x) -> acc + x) % 2147483647""".stripMargin).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct_fp"),
          sum(col("fp")).as("fp_sum"))
        .orderBy(col("lang"))
    }),

    // E54 [N] scale path #2: IVF ANN — inverted lists by nearest centroid,
    // search only nprobe probed lists. HASH-GREEN via FLOOR units since
    // round 15: every ranking decision (assignment argmin, probe order,
    // final top-k) runs on Σ floor(term·1e9) integer d² units — floor of
    // one IEEE multiply is bit-identical in every engine, unlike the
    // round(term, 9) half-up boundary that made the r14 driver's DuckDB
    // disagree with the local one. dist2 = DOUBLE units/1e9. The
    // trained-kmeans variant stays cosine/spec-verified (TextOpsSpec).
    "q72_ann_ivf" -> ((s, d) => {
      // Raw emb feeds the centroid collect + query broadcast (pruned scans);
      // only the corpus side of the assignment is repartitioned for map-side
      // parallelism (the test parquet is a single row-group).
      val emb = embeddings(s, d)
      graft.text.Ivf.searchD2(emb,
        queryIds = Seq(0L, 1L, 2L), k = 3, nCentroids = 8, nprobe = 2,
        corpus = Some(emb.repartition(s.sparkContext.defaultParallelism)),
        floorMode = true)
        .orderBy(col("query_id"), col("rank"))
    }),

    // E55 [N]: language-ID — char-bigram profiles trained per language,
    // docs classified by profile overlap; output is the confusion matrix.
    // The exploded (lang, doc_id, bigram) frame feeds BOTH train and
    // classify on different keys ((lang,bg) agg vs bg-join + doc_id agg),
    // so it is computed once and persisted — bounded (ids + 2-char
    // bigrams, no text), same rationale as q74's signature frame. Without
    // it the explode of up-to-99 bigrams × every doc runs twice.
    "q71_langid" -> ((s, d) => {
      val docs = documents(s, d).repartition(s.sparkContext.defaultParallelism)
      val exploded = graft.CacheBag.register(
        graft.text.LangId.explodedFeatures(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val profiles = graft.text.LangId.trainProfilesFrom(exploded)
      graft.text.LangId.classifyFrom(exploded,
          docs.select(col("doc_id"), col("lang")), profiles)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // [N] flagship corpus curation: the full training-data cleaning chain
    // as ONE declarative plan — quality gate → exact dedup (keep lowest
    // doc_id per content hash) → MinHash+LSH near-dup removal (drop the
    // higher doc_id of any candidate pair with estimated sim >= 0.5) →
    // per-(lang, source) survivor rollup. Every pair-generation step is
    // keyed (hash group or LSH bucket): no unkeyed cross join anywhere, so
    // the same plan prunes identically at 100 TB.
    "q74_corpus_curation" -> ((s, d) => {
      // Tokens are materialized as a named column up front (measured
      // fastest; an inline tokens() inside shingles' HOF lambdas would
      // re-split per element).
      val quality = docsWithTokens(s, d)
        .filter(col("n_chars") >= 100 && size(col("toks")) >= 15)
      val wExact = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val exact = quality
        .withColumn("h", TextOps.exactKey(col("text")))
        .withColumn("rn", row_number().over(wExact)).filter(col("rn") === 1)
        .drop("rn", "h")
      // Signature frame carries the survivor columns and is PERSISTED: it
      // feeds two consumers on different keys ((lang, band) self-join vs
      // doc_id anti-join), so exchange reuse can't collapse them — without
      // the persist the whole tokenize→sha→window→minhash chain runs
      // twice (measured: 5 parquet scans of documents, ~35% more time).
      // The persisted frame is bounded — ids, dims, and an 8-long sig; NO
      // text/token columns — which is exactly what a 100 TB corpus run
      // would checkpoint between the pair stage and the survivor stage.
      // CacheBag-registered: the harness unpersists it after the action.
      val sig = graft.CacheBag.register(exact
        .withColumn("bh", TextOps.minhashBase(TextOps.shingles(col("toks"), 3)))
        .select(col("lang"), col("source"), col("n_chars"), col("doc_id"),
          TextOps.minhashSignature(col("bh"), 8).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val banded = sig.select(col("lang"), col("doc_id"), col("sig"),
        explode(TextOps.bandKeys(col("sig"), 4, 2)).as("bk"))
      val lhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id1"), col("sig").as("sig1"))
      val rhs = banded.select(col("lang"), col("bk"), col("doc_id").as("id2"), col("sig").as("sig2"))
      val drops = lhs.join(rhs, Seq("lang", "bk")).filter(col("id1") < col("id2"))
        .filter(aggregate(
          zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) >= 4)
        .select(col("id2").as("doc_id"))
      // no distinct on drops: left_anti is set-semantics on the right side
      // already, so deduplicating first would just add a shuffle.
      sig.select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
        .join(drops, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang"), col("source"))
    }),

    // E55 depth: TF-IDF top terms per language. tf = n_td/len_d,
    // idf = ln((N+1)/(df_t+1)) (smoothed); per-language relevance = sum of
    // per-doc tf·idf, pre-rounded into decimals so the cross-engine sum is
    // exact, ranked top-3 with term tiebreak. Three aggregations + one
    // term-keyed join — every shuffle is on (doc), (term) or (lang, term);
    // the corpus-size scalar rides in as a broadcast, not a driver count.
    "q75_tfidf" -> ((s, d) => {
      // len_d rides through the explode (functionally dependent on doc_id,
      // so adding it to the tf grouping key is free). df_t is a KEYED agg
      // over tf (already (doc, term) distinct) joined back on tok — not a
      // count-over-tok window: a window agg gets no map-side partial
      // aggregation, so a hot stopword's every (doc, term) row would land
      // on one task at scale, while groupBy keeps the partial-agg path
      // and is skew-safe.
      val tok = docsWithTokens(s, d)
        .select(col("lang"), col("doc_id"), size(col("toks")).as("len_d"),
          explode(col("toks")).as("tok"))
      val tf = tok.groupBy(col("lang"), col("doc_id"), col("len_d"), col("tok"))
        .agg(count(lit(1)).as("n_td"))
      val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
      val ndocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val contrib = tf
        .join(dfT, Seq("tok"))
        .crossJoin(broadcast(ndocs))
        .withColumn("tfidf", round(
          col("n_td").cast("double") / col("len_d").cast("double") *
            log((col("n_docs") + 1).cast("double") / (col("df_t") + 1).cast("double")),
          9).cast("decimal(28,9)"))
      val byLang = contrib.groupBy(col("lang"), col("tok"))
        .agg(sum(col("tfidf")).as("rel"))
      val w = Window.partitionBy(col("lang")).orderBy(col("rel").desc, col("tok"))
      byLang.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("lang"), col("rank").cast("long").as("rank"), col("tok"),
          round(col("rel").cast("double"), 6).as("relevance"))
        .orderBy(col("lang"), col("rank"))
    }),

    // [N] reproducible stratified sampling: hash-gate per doc (md5 of the
    // id, NOT rand() — reruns, engines, and backfills all agree), with
    // per-language rates broadcast in as a tiny dim. The sample decision is
    // a map-side projection; no shuffle beyond the rollup.
    "q79_hash_sample" -> ((s, d) => {
      import s.implicits._
      val rates = Seq(("en", 30), ("de", 20), ("fr", 20), ("es", 10), ("zh", 50))
        .toDF("lang", "rate")
      val gated = documents(s, d)
        .join(broadcast(rates), Seq("lang"), "left")
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("smp|"), col("doc_id"))), 1, 12), 16, 10)
            .cast("long"), lit(100)))
        .withColumn("sampled", col("bucket") < coalesce(col("rate"), lit(0)))
      gated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("sampled"), 1).otherwise(0)).as("n_sampled"),
          round(sum(when(col("sampled"), col("n_chars")).otherwise(0)).cast("double") /
            sum(col("n_chars")).cast("double"), 6).as("char_fraction"))
        .orderBy(col("lang"))
    }),

    // [N] reproducible train/val/test split: the same hash gate carved into
    // 80/10/10 ranges — every engine and every rerun assigns each doc to
    // the same split, which is what makes downstream eval hermetic.
    "q80_dataset_split" -> ((s, d) => {
      val split = documents(s, d)
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("split|"), col("doc_id"))), 1, 12), 16, 10)
            .cast("long"), lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
      split.groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .orderBy(col("lang"), col("split"))
    }),

    // [N] decontamination: test-split docs sharing ANY 8-token shingle
    // with a train doc are eval leakage. Both sides reduce to distinct
    // 48-bit shingle hashes, so the check is an equi-join on the hash —
    // at corpus scale the train side is a distinct-hash table (orders of
    // magnitude smaller than text), never an all-pairs comparison.
    "q81_decontamination" -> ((s, d) => {
      // NOT persisted: a round-11 experiment persisting this shared frame
      // (MEMORY_AND_DISK) made q180 2x faster in isolation but measurably
      // degraded a dozen LATER bench queries (q5x/q6x consistently 3-5x
      // on identical code, reverting recovered them) — the cache's
      // storage-memory footprint outlives the blocking drain's benefit
      // at this suite density. Recompute-per-consumer is the stable shape.
      val split = docsWithTokens(s, d)
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("split|"), col("doc_id"))), 1, 12), 16, 10)
            .cast("long"), lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .withColumn("sh8",
          transform(TextOps.shingles(col("toks"), 8), sh => TextOps.md5Hash48(sh, "dc")))
      val trainHashes = split.filter(col("split") === "train")
        .select(explode(col("sh8")).as("h")).distinct()
      val testSh = split.filter(col("split") === "test")
        .select(col("lang"), col("doc_id"), explode(col("sh8")).as("h"))
      val contaminated = testSh.join(trainHashes, "h")
        .select(col("lang"), col("doc_id")).distinct()
      split.filter(col("split") === "test")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_test"))
        .join(contaminated.groupBy(col("lang")).agg(count(lit(1)).as("n_contaminated")),
          Seq("lang"), "left")
        .select(col("lang"), col("n_test"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .orderBy(col("lang"))
    }),

    // Bloom-accelerated decontamination — q81's semantics behind a
    // broadcast BLOOM pre-filter (graft.text.Bloom: distributed bit_or
    // bitmap build bounded by the 128 KiB bitmap, map-side literal-array
    // probe, zero UDFs). At 100 TB this is the shape that survives: the
    // test side drops to bloom candidates BEFORE the verify join, so the
    // exact join's build side is the only corpus-sized shuffle left.
    // No false negatives ⇒ n_contaminated must EQUAL q81's; candidates
    // (with the md5 probes' deterministic false positives) are also
    // oracle-replicated via a positions semi-join.
    "q180_bloom_decontamination" -> ((s, d) => {
      import graft.text.Bloom
      val K = 4
      // not persisted — same revert rationale as q81 above
      val split = docsWithTokens(s, d)
        .withColumn("bucket",
          pmod(conv(substring(md5(concat(lit("split|"), col("doc_id"))), 1, 12), 16, 10)
            .cast("long"), lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .withColumn("sh8",
          transform(TextOps.shingles(col("toks"), 8), sh => TextOps.md5Hash48(sh, "dc")))
      // trainHashes is PERSISTED (longs only — the q48/q74 bounded-persist
      // discipline, NOT the reverted nested-array split frame): it feeds
      // two consumers (the Bloom bitmap build and the exact verify join),
      // and each recompute pays the full train-side tokenize→shingle→md5
      // chain. Guide §2.4/§5: one materialization, two reads.
      val trainHashes = graft.CacheBag.register(
        split.filter(col("split") === "train")
          .select(explode(col("sh8")).as("h")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val bitmap = Bloom.build(trainHashes, "h", K)
      val testSh = split.filter(col("split") === "test")
        .select(col("lang"), col("doc_id"), explode(col("sh8")).as("h"))
      val cand = testSh.filter(Bloom.mightContain(bitmap, col("h"), K))
      // ONE pass over the test-side chain: the candidate-doc count and the
      // contaminated-doc count differ only in whether a candidate hash is
      // confirmed by trainHashes, so a left join carrying a hit flag +
      // one doc-grain agg computes both (the earlier two-consumer form —
      // distinct + separate verify-join-distinct — ran the whole test
      // tokenize→shingle→md5→4-probe chain twice; guide §2.3/§2.4).
      // Identical sets by construction: n_candidate_docs counts distinct
      // candidate docs, n_contaminated those with ≥1 verified hash.
      val perDoc = cand
        .join(trainHashes.withColumn("__hit", lit(1)), Seq("h"), "left")
        .groupBy(col("lang"), col("doc_id"))
        .agg(max(col("__hit")).as("__hit"))
      val candAgg = perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_candidate_docs"),
          sum(when(col("__hit") === 1, 1L).otherwise(0L)).as("n_contaminated"))
      split.filter(col("split") === "test")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_test"))
        .join(candAgg, Seq("lang"), "left")
        .select(col("lang"), col("n_test"),
          coalesce(col("n_candidate_docs"), lit(0L)).as("n_candidate_docs"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .orderBy(col("lang"))
    }),

    // Matryoshka-truncation ANN (MRL, Kusupati et al. 2022): rank by
    // cosine over only the FIRST 16 of 64 dims — the speed/recall dial
    // an MRL-trained embedding ships with (cosine is scale-invariant,
    // so no renorm needed). Output: the 16-dim top-5 per query with an
    // `in_full_top5` marker against the 64-dim ranking — the recall
    // face is IN the result, cross-engine hashed. Same broadcast-q
    // cross-join shape as q51; at scale the truncated pass reads a
    // quarter of the vector bytes. Each ranking is its own SINGLE-rank
    // window + filter so Spark's WindowGroupLimit pushdown caps every
    // partition at 5 rows before the sort — two rankings in ONE window
    // would defeat the pushdown and full-sort the corpus per query —
    // then the 64-dim top-5 id set (k·|q| rows) joins the marker on.
    "q181_matryoshka_ann" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val base = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
      val w16 = Window.partitionBy(col("query_id"))
        .orderBy(col("sim16").desc, col("vec_id"))
      val top16 = base
        .withColumn("sim16", VectorFunctions.vecCosine(
          slice(col("embedding"), 1, 16), slice(col("qv"), 1, 16)))
        .withColumn("r16", row_number().over(w16))
        .filter(col("r16") <= 5)
      val w64 = Window.partitionBy(col("query_id"))
        .orderBy(col("sim64").desc, col("vec_id"))
      val top64 = base
        .withColumn("sim64",
          VectorFunctions.vecCosine(col("embedding"), col("qv")))
        .withColumn("r64", row_number().over(w64))
        .filter(col("r64") <= 5)
        .select(col("query_id").as("q64"), col("vec_id").as("v64"))
      top16.join(broadcast(top64),
          col("query_id") === col("q64") && col("vec_id") === col("v64"),
          "left")
        .select(col("query_id"), col("r16").cast("long").as("rank"),
          col("vec_id"), round(col("sim16"), 6).as("sim16"),
          col("v64").isNotNull.as("in_full_top5"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // [N] BM25 retrieval scoring (Robertson/Lucene form, k1=1.2 b=0.75):
    // corpus stats (N, avgdl) in one tiny agg, term df from the per-doc
    // tf frame, idf = ln(1 + (N - df + 0.5)/(df + 0.5)). The query-term
    // filter lands BEFORE the tf groupBy, so only matching postings
    // shuffle — at 100 TB the posting-list build touches |terms| keys,
    // never the corpus vocabulary — and df/stats broadcast. Top-k is
    // orderBy+limit (distributed takeOrdered), not a global window; the
    // rank number attaches on the 20 survivors. Per-term scores take the
    // q88 determinism route (round 9dp → DECIMAL sum → round 6dp).
    "q196_bm25" -> ((s, d) => {
      val terms = Seq("spark", "vector", "customer")
      val docs = docsWithTokens(s, d)
        .select(col("doc_id"), col("lang"), col("toks"),
          size(col("toks")).cast("long").as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("lang"), col("dl"), explode(col("toks")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("lang"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfs), Seq("tok")).crossJoin(broadcast(stats))
        .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs"))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("tfc",
          col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))))
        .withColumn("term_score", round(col("idf") * col("tfc"), 9).cast("decimal(28,9)"))
      val top = scored.groupBy(col("doc_id"), col("lang"))
        .agg(round(sum(col("term_score")).cast("double"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .select(col("rank"), col("doc_id"), col("lang"), col("score"))
        .orderBy(col("rank"))
    }),

    // DISTRIBUTED BPE TRAINER (3 merge iterations) — the tokenizer-
    // training inner loop at corpus scale (Sennrich et al. 2016): pair
    // counts over the DISTINCT-WORD table weighted by word frequency
    // (corpus size never re-enters after the first keyed agg), best pair
    // = argmax (count, then lexicographic pair — a total order), merge
    // applied to every word's symbol array as a left fold that is
    // provably scan-equivalent (a merged symbol a+b can never equal the
    // left symbol a, so fold-chaining ≡ the i+=2 scan; the only
    // ambiguous case, runs of an (a,a) pair, resolves to the same
    // leftmost-greedy parity in both). One driver round-trip per
    // iteration collects ONE (pair, count) row — the same bounded-
    // scalar discipline as Pq.train's Lloyd step. All counts integer →
    // the argmax and everything downstream is hash-provable.
    "q244_bpe_trainer" -> ((s, d) => {
      // PERSISTED: the distinct-word table is the anchor of FOUR actions
      // (three per-merge argmax collects + the final symbol rollup), and
      // every one re-ran the corpus scan + explode + groupBy without it
      // (guide §2.4). The frame is vocabulary-sized (distinct words ×
      // (count + char array)), the same driver-bounded class as the BPE
      // merge table itself.
      val words = graft.CacheBag.register(docsWithTokens(s, d)
        .select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        // split to characters; Spark's split(limit=-1) keeps a trailing
        // "" element that DuckDB's string_split does not — strip it
        .withColumn("sym", array_remove(split(col("w"), ""), ""))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      def pairCounts(df: DataFrame): DataFrame = df
        .select(col("wc"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
      def mergeCol(sym: org.apache.spark.sql.Column, a: String,
                   b: String): org.apache.spark.sql.Column =
        aggregate(sym, array().cast("array<string>"), (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
      var cur = words
      val iters = Seq.newBuilder[(Int, String, String, Long)]
      for (it <- 1 to 3) {
        val best = pairCounts(cur)
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .collect()(0)
        val (a, b, c) = (best.getString(0), best.getString(1), best.getLong(2))
        iters += ((it, a, b, c))
        cur = cur.withColumn("sym", mergeCol(col("sym"), a, b))
      }
      import s.implicits._
      val meta = iters.result()
        .toDF("iter", "pair_a", "pair_b", "pair_count")
      val fin = cur
        .agg(sum(col("wc") * size(col("sym"))).cast("long")
          .as("n_symbols_after"),
          sum(col("wc")).cast("long").as("n_word_occurrences"),
          count(lit(1)).as("n_distinct_words"))
      meta.crossJoin(broadcast(fin)).orderBy(col("iter"))
    }),

    // HYBRID RETRIEVAL with RECIPROCAL RANK FUSION — the fusion every
    // RAG/retrieval stack runs over a lexical and a vector leg (RRF,
    // Cormack et al. SIGIR'09; the Elasticsearch/Vespa default):
    // rrf(d) = Σ_legs 1/(60 + rank_leg(d)) over each leg's top-20,
    // fused top-5 per query. Legs reuse the committed rankers: BM25
    // (q196's exact factor chain, per-query term sets) and cosine
    // top-k (q51's shape). Determinism: both legs' ranks are already
    // hash-provable; the fusion is two exact reciprocals summed and a
    // doc_id tiebreak — so the FUSED ranking is oracle-checkable too.
    // Scale: each leg is its own keyed top-k (group-limit pushdown),
    // the fuse is a |q|·20-row full outer join — never corpus-sized.
    "q241_hybrid_rrf" -> ((s, d) => {
      import s.implicits._
      val qterms = Seq((0L, "spark"), (0L, "vector"), (1L, "customer"),
        (1L, "join"), (2L, "window"), (2L, "filter")).toDF("query_id", "tok")
      val docs = docsWithTokens(s, d)
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .join(broadcast(qterms), Seq("tok"))
        .groupBy(col("query_id"), col("doc_id"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfs = tf.select(col("tok"), col("doc_id")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfs), Seq("tok"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs"))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))))
        .withColumn("tfc",
          col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
              lit(0.75) * col("dl") / col("avgdl"))))
        .withColumn("term_score",
          round(col("idf") * col("tfc"), 9).cast("decimal(28,9)"))
      val wq = Window.partitionBy(col("query_id"))
        .orderBy(col("lex_score").desc, col("doc_id"))
      val lex = scored.groupBy(col("query_id"), col("doc_id"))
        .agg(round(sum(col("term_score")).cast("double"), 6).as("lex_score"))
        .withColumn("lex_rank", row_number().over(wq).cast("long"))
        .filter(col("lex_rank") <= 20)
        .select(col("query_id"), col("doc_id"), col("lex_rank"))
      val emb = embeddings(s, d)
      val qv = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val wv = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val vec = emb.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim",
          graft.functions.VectorFunctions.vecCosine(col("embedding"), col("qv")))
        .withColumn("vec_rank", row_number().over(wv).cast("long"))
        .filter(col("vec_rank") <= 20)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("vec_rank"))
      val fused = lex.join(vec, Seq("query_id", "doc_id"), "full")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 9))
      val wf = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(wf).cast("long"))
        .filter(col("rank") <= 5)
        .na.fill(-1L, Seq("lex_rank", "vec_rank"))
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
          col("lex_rank"), col("vec_rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // E56: multimodal column — struct(text payload as opaque binary,
    // typed metadata, embedding); scalar projections for the oracle.
    "q56_multimodal" -> ((s, d) => {
      val docs = documents(s, d)
      val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .withColumn("payload", struct(
          encode(col("text"), "utf-8").as("blob"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"),
          col("embedding").as("vec")))
        .select(col("doc_id"),
          octet_length(col("payload.blob")).cast("long").as("n_bytes"),
          col("payload.meta.lang").as("lang"),
          size(col("payload.vec")).cast("long").as("dim"),
          round(element_at(col("payload.vec"), 1).cast("double"), 6).as("e1"))
        .orderBy(col("doc_id"))
    })
  )

  private val shinglesSqlDuck: String =
    """list_distinct([array_to_string(toks[i:i+2], ' ')
      |  for i in generate_series(1, len(toks) - 2)])""".stripMargin

  val oracle: Map[String, String] = Map(
    "q47_exact_dedup" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT sha256(text)) AS n_distinct,
        |  count(*) - count(DISTINCT sha256(text)) AS n_dups
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q48_ngram_jaccard" ->
      s"""WITH t AS (
         |  SELECT lang, source, doc_id,
         |    string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |), sh AS (
         |  -- the shingle-less gate: len(toks) >= 3 <=> non-empty shingles
         |  SELECT lang, source, doc_id, $shinglesSqlDuck AS sh FROM t
         |  WHERE len(toks) >= 3
         |), base AS (
         |  SELECT lang, source, doc_id, sh,
         |    list_transform(sh, s ->
         |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
         |  FROM sh
         |), sig AS (
         |  SELECT lang, source, doc_id, sh,
         |    [list_min(list_transform(bh, s ->
         |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
         |     for j in generate_series(0, 7)] AS sig
         |  FROM base
         |), banded AS (
         |  SELECT lang, source, doc_id, sh, b AS band,
         |    CAST(sig[b+1] AS VARCHAR) AS key
         |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) bands
         |), cand AS (
         |  SELECT DISTINCT a.lang, a.source, a.doc_id AS id1, b.doc_id AS id2,
         |    len(list_intersect(a.sh, b.sh))::DOUBLE /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE AS jacc
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.source = b.source
         |    AND a.band = b.band AND a.key = b.key
         |    AND a.doc_id < b.doc_id
         |)
         |SELECT lang, source, count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
         |  round(CAST(sum(CAST(round(jacc, 6) AS DECIMAL(18,6))) AS DOUBLE), 4)
         |    AS sum_jacc,
         |  round(max(jacc), 6) AS max_jacc
         |FROM cand GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // Same 4×16 cells, same min-over-rows estimate; pure integers.
    "q232_countmin_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), exact AS (
        |  SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY 1
        |), top AS (
        |  SELECT * FROM exact ORDER BY exact_cnt DESC, tok LIMIT 20
        |), hashed AS (
        |  SELECT tok, i,
        |    CAST(concat('0x', substr(md5(concat('cms', i, '|', tok)), 1, 6))
        |      AS BIGINT) % 16 AS bucket
        |  FROM toks, (SELECT unnest(generate_series(0, 3)) AS i)
        |), cells AS (
        |  SELECT i, bucket, count(*) AS cell FROM hashed GROUP BY 1, 2
        |), topb AS (
        |  SELECT t.tok, t.exact_cnt, ix.i,
        |    CAST(concat('0x',
        |      substr(md5(concat('cms', ix.i, '|', t.tok)), 1, 6))
        |      AS BIGINT) % 16 AS bucket
        |  FROM top t, (SELECT unnest(generate_series(0, 3)) AS i) ix
        |), est AS (
        |  SELECT tb.tok, tb.exact_cnt, min(c.cell) AS cms_est
        |  FROM topb tb JOIN cells c ON c.i = tb.i AND c.bucket = tb.bucket
        |  GROUP BY 1, 2
        |)
        |SELECT tok, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
        |  CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
        |FROM est ORDER BY exact_cnt DESC, tok""".stripMargin,

    // Same chain as q48's oracle with the eval/train split and the
    // asymmetric train×eval candidate join.
    "q229_neardup_decontamination" ->
      s"""WITH raw AS (
         |  SELECT lang, doc_id,
         |    string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |), t AS (
         |  SELECT lang, doc_id, FALSE AS is_eval, toks
         |  FROM raw WHERE len(toks) >= 3
         |  UNION ALL
         |  SELECT lang, doc_id + 1000000 AS doc_id, TRUE AS is_eval,
         |    toks[1:len(toks) - 5] AS toks
         |  FROM raw WHERE doc_id % 37 = 0 AND len(toks) >= 10
         |), sh AS (
         |  SELECT lang, doc_id, is_eval, $shinglesSqlDuck AS sh FROM t
         |), base AS (
         |  SELECT lang, doc_id, is_eval, sh,
         |    list_transform(sh, s ->
         |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
         |  FROM sh
         |), sig AS (
         |  SELECT lang, doc_id, is_eval, sh,
         |    [list_min(list_transform(bh, s ->
         |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
         |     for j in generate_series(0, 7)] AS sig
         |  FROM base
         |), banded AS (
         |  SELECT lang, doc_id, is_eval, sh, b AS band,
         |    CAST(sig[b+1] AS VARCHAR) AS key
         |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) bands
         |), cand AS (
         |  SELECT DISTINCT a.lang, a.doc_id AS train_id, b.doc_id AS eval_id,
         |    len(list_intersect(a.sh, b.sh))::DOUBLE /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE
         |      AS jacc
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
         |  WHERE NOT a.is_eval AND b.is_eval
         |), v AS (
         |  SELECT lang, count(*) AS n_candidate_pairs,
         |    count(DISTINCT CASE WHEN jacc >= 0.5 THEN train_id END)
         |      AS n_contaminated_train,
         |    round(max(jacc), 6) AS max_jacc
         |  FROM cand GROUP BY 1
         |), tot AS (
         |  SELECT lang,
         |    CAST(sum(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
         |    CAST(sum(CASE WHEN NOT is_eval THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_train
         |  FROM sh GROUP BY 1
         |)
         |SELECT tot.lang, tot.n_eval, tot.n_train,
         |  coalesce(v.n_candidate_pairs, 0) AS n_candidate_pairs,
         |  coalesce(v.n_contaminated_train, 0) AS n_contaminated_train,
         |  coalesce(v.max_jacc, 0.0) AS max_jacc
         |FROM tot LEFT JOIN v USING (lang)
         |ORDER BY tot.lang""".stripMargin,

    "q49_minhash_lsh" ->
      s"""WITH t AS (
         |  SELECT lang, doc_id, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |), sh AS (
         |  SELECT lang, doc_id, $shinglesSqlDuck AS sh FROM t
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
         |), cand AS (
         |  SELECT DISTINCT a.lang, a.doc_id AS id1, b.doc_id AS id2,
         |    len([i for i in generate_series(1, 8) if a.sig[i] = b.sig[i]]) AS n_equal
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
         |    AND a.doc_id < b.doc_id
         |)
         |SELECT lang, count(*) AS n_candidates,
         |  round(avg(n_equal::DOUBLE / 8.0), 6) AS avg_est_sim
         |FROM cand GROUP BY lang ORDER BY lang""".stripMargin,

    "q50_simhash" ->
      """WITH t AS (
        |  SELECT lang, source, doc_id,
        |    list_transform(list_distinct(string_split_regex(trim(text), '\s+')),
        |      tok -> CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)) AS hs
        |  FROM documents
        |), sim AS (
        |  SELECT lang, source, doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END
        |                                  for h in hs]) > 0
        |              THEN (1::BIGINT << b) ELSE 0 END
        |              for b in generate_series(0, 31)])::BIGINT AS simhash
        |  FROM t
        |), pairs AS (
        |  -- all-pairs is exact here and PROVABLY equals the engine's
        |  -- byte-banded candidates for hamming <= 3 (pigeonhole over
        |  -- 4 bytes); the oracle runs at sf0.01 where quadratic is fine.
        |  SELECT a.lang, bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |  FROM sim a JOIN sim b ON a.lang = b.lang AND a.source = b.source
        |    AND a.doc_id < b.doc_id
        |)
        |SELECT lang, count(*) AS n_close,
        |  CAST(sum(hamming) AS BIGINT) AS sum_hamming,
        |  min(hamming) AS min_hamming
        |FROM pairs WHERE hamming <= 3
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q51_embedding_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, vec_id, round(sim, 6) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Floor-unit twin of the Spark plan: sign bits and ranks from per-dim
    // Σ CAST(floor(term·1e9) AS BIGINT) sums (≡ VecDotUnits/VecD2Units in
    // floorMode bit for bit, in ANY DuckDB version — floor of one IEEE
    // product has no round() boundary); dist2 = DOUBLE units/1e9.
    "q52_ann_lsh_buckets" ->
      """WITH comps AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), dots AS (
        |  SELECT c.vec_id, p.vec_id AS plane_id,
        |    sum(CAST(floor((c.x * p.x) * 1e9) AS BIGINT)) AS dot
        |  FROM comps c JOIN comps p ON p.dim = c.dim AND p.vec_id < 4
        |  GROUP BY 1, 2
        |), buckets AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dot > 0 THEN power(2, plane_id) ELSE 0 END)
        |      AS BIGINT) AS bucket
        |  FROM dots GROUP BY 1
        |), q AS (
        |  SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id < 3
        |), cand AS (
        |  SELECT q.query_id, b.vec_id, q.bucket,
        |    sum(CAST(floor(((c.x - qc.x) * (c.x - qc.x)) * 1e9) AS BIGINT)) AS u
        |  FROM q JOIN buckets b ON b.bucket = q.bucket
        |    AND b.vec_id <> q.query_id
        |  JOIN comps c ON c.vec_id = b.vec_id
        |  JOIN comps qc ON qc.vec_id = q.query_id AND qc.dim = c.dim
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT query_id, vec_id, bucket, u,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY u, vec_id) AS rank
        |  FROM cand
        |)
        |SELECT query_id, rank, vec_id, CAST(u AS BIGINT) / 1e9 AS dist2, bucket
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // IVF on floor-unit d²: assignment argmin, probe order, and final
    // top-k all on Σ CAST(floor(term·1e9) AS BIGINT) sums (≡ VecD2Units
    // floorMode — engine-version-proof); dist2 = DOUBLE units/1e9.
    "q72_ann_ivf" ->
      """WITH comps AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), cents AS (
        |  SELECT vec_id AS cid, dim, x AS c FROM comps WHERE vec_id < 8
        |), assigned AS (
        |  SELECT vec_id, (min(struct_pack(d := d2, cid := cid))).cid AS list_id
        |  FROM (
        |    SELECT p.vec_id, s.cid,
        |      sum(CAST(floor(((p.x - s.c) * (p.x - s.c)) * 1e9)
        |        AS BIGINT)) AS d2
        |    FROM comps p JOIN cents s USING (dim) GROUP BY 1, 2
        |  ) GROUP BY 1
        |), probe AS (
        |  SELECT query_id, cid AS list_id FROM (
        |    SELECT q.vec_id AS query_id, s.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        sum(CAST(floor(((q.x - s.c) * (q.x - s.c)) * 1e9)
        |          AS BIGINT)), s.cid) AS crn
        |    FROM comps q JOIN cents s USING (dim)
        |    WHERE q.vec_id IN (0, 1, 2)
        |    GROUP BY q.vec_id, s.cid
        |  ) WHERE crn <= 2
        |), cand AS (
        |  SELECT pr.query_id, a.vec_id, a.list_id,
        |    sum(CAST(floor(((c.x - qc.x) * (c.x - qc.x)) * 1e9)
        |      AS BIGINT)) AS u
        |  FROM probe pr JOIN assigned a ON a.list_id = pr.list_id
        |    AND a.vec_id <> pr.query_id
        |  JOIN comps c ON c.vec_id = a.vec_id
        |  JOIN comps qc ON qc.vec_id = pr.query_id AND qc.dim = c.dim
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT query_id, vec_id, list_id, u,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY u, vec_id) AS rank
        |  FROM cand
        |)
        |SELECT query_id, rank, vec_id, CAST(u AS BIGINT) / 1e9 AS dist2, list_id
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q53_lang_quality" ->
      """WITH t AS (
        |  SELECT lang, n_chars, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(len(toks)), 6) AS avg_tokens,
        |  round(avg(CASE WHEN len(toks) > 0
        |    THEN len(list_filter(toks, t -> t IN ('the', 'a')))::DOUBLE / len(toks)::DOUBLE
        |    ELSE 0.0 END), 6) AS avg_stop_ratio,
        |  CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q54_token_stats" ->
      """WITH docs AS (
        |  SELECT lang, doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |    len(regexp_extract_all(text, '[aeiou]+')) AS n_subwords
        |  FROM documents
        |), tok AS (
        |  SELECT lang, unnest(toks) AS tok FROM docs
        |)
        |SELECT t.lang, t.n_tokens, t.n_distinct_tokens, t.avg_tok_len, s.n_subwords
        |FROM (
        |  SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct_tokens,
        |    round(avg(length(tok)), 6) AS avg_tok_len
        |  FROM tok GROUP BY lang
        |) t JOIN (
        |  SELECT lang, CAST(sum(n_subwords) AS BIGINT) AS n_subwords FROM docs GROUP BY lang
        |) s ON t.lang = s.lang
        |ORDER BY t.lang""".stripMargin,

    "q55_doc_fingerprint" ->
      """WITH t AS (
        |  SELECT lang,
        |    list_sum([CAST(i AS BIGINT) * ascii(substring(text, i, 1))
        |              for i in generate_series(1, least(length(text), 64))])
        |      % 2147483647 AS fp
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct_fp,
        |  CAST(sum(fp) AS BIGINT) AS fp_sum
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q71_langid" ->
      """WITH feats AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(text) >= 2 THEN
        |      list_distinct([substring(text, i, 2)
        |        for i in generate_series(1, least(length(text), 100) - 1)])
        |    ELSE [] END AS bigrams
        |  FROM documents
        |), exploded AS (
        |  SELECT doc_id, lang, unnest(bigrams) AS bg FROM feats
        |), freq AS (
        |  SELECT lang, bg, count(*) AS df FROM exploded GROUP BY 1, 2
        |), prof AS (
        |  SELECT lang AS profile_lang, bg FROM (
        |    SELECT lang, bg, row_number() OVER (PARTITION BY lang ORDER BY df DESC, bg) AS rnk
        |    FROM freq
        |  ) WHERE rnk <= 20
        |), scored AS (
        |  SELECT e.doc_id, e.lang, p.profile_lang, count(*) AS score
        |  FROM exploded e JOIN prof p ON e.bg = p.bg GROUP BY 1, 2, 3
        |), argmax AS (
        |  SELECT doc_id, profile_lang AS predicted FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rn
        |    FROM scored
        |  ) WHERE rn = 1
        |), pred AS (
        |  SELECT d.lang, coalesce(a.predicted, 'unknown') AS predicted
        |  FROM documents d LEFT JOIN argmax a ON d.doc_id = a.doc_id
        |)
        |SELECT lang, predicted, count(*) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,

    "q74_corpus_curation" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, n_chars, text,
         |    string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |), quality AS (
         |  SELECT * FROM t WHERE n_chars >= 100 AND len(toks) >= 15
         |), exact AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
         |    FROM quality
         |  ) WHERE rn = 1
         |), sh AS (
         |  SELECT lang, source, doc_id, n_chars, $shinglesSqlDuck AS sh FROM exact
         |), base AS (
         |  SELECT lang, source, doc_id, n_chars,
         |    list_transform(sh, s ->
         |      concat(md5(concat('mhA|', s)), md5(concat('mhB|', s)))) AS bh
         |  FROM sh
         |), sig AS (
         |  SELECT lang, source, doc_id, n_chars,
         |    [list_min(list_transform(bh, s ->
         |       CAST(concat('0x', substr(s, j*8 + 1, 8)) AS BIGINT)))
         |     for j in generate_series(0, 7)] AS sig
         |  FROM base
         |), banded AS (
         |  SELECT lang, doc_id, sig, b AS band,
         |    concat(sig[b*2+1], ',', sig[b*2+2]) AS key
         |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bands
         |), drops AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
         |    AND a.doc_id < b.doc_id
         |  WHERE len([i for i in generate_series(1, 8) if a.sig[i] = b.sig[i]]) >= 4
         |)
         |SELECT lang, source, count(*) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |FROM sig
         |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q75_tfidf" ->
      """WITH tok AS (
        |  SELECT lang, doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), len AS (
        |  SELECT doc_id, count(*) AS len_d FROM tok GROUP BY doc_id
        |), tf AS (
        |  SELECT lang, doc_id, tok, count(*) AS n_td FROM tok GROUP BY 1, 2, 3
        |), dfreq AS (
        |  SELECT tok, count(*) AS df_t FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), contrib AS (
        |  SELECT tf.lang, tf.tok,
        |    CAST(round(
        |      tf.n_td::DOUBLE / len.len_d::DOUBLE *
        |        ln((n.n_docs + 1)::DOUBLE / (dfreq.df_t + 1)::DOUBLE),
        |      9) AS DECIMAL(28,9)) AS tfidf
        |  FROM tf JOIN len USING (doc_id) JOIN dfreq USING (tok) CROSS JOIN n
        |), by_lang AS (
        |  SELECT lang, tok, sum(tfidf) AS rel FROM contrib GROUP BY 1, 2
        |), ranked AS (
        |  SELECT lang, tok, rel,
        |    row_number() OVER (PARTITION BY lang ORDER BY rel DESC, tok) AS rank
        |  FROM by_lang
        |)
        |SELECT lang, rank, tok, round(CAST(rel AS DOUBLE), 6) AS relevance
        |FROM ranked WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    "q79_hash_sample" ->
      """WITH rates AS (
        |  SELECT * FROM (VALUES ('en', 30), ('de', 20), ('fr', 20), ('es', 10), ('zh', 50))
        |    AS t(lang, rate)
        |), gated AS (
        |  SELECT d.lang, d.n_chars,
        |    (CAST(concat('0x', substr(md5(concat('smp|', d.doc_id)), 1, 12)) AS BIGINT) % 100)
        |      < coalesce(r.rate, 0) AS sampled
        |  FROM documents d LEFT JOIN rates r ON d.lang = r.lang
        |)
        |SELECT lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  round(CAST(sum(CASE WHEN sampled THEN n_chars ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(n_chars) AS DOUBLE), 6) AS char_fraction
        |FROM gated GROUP BY lang ORDER BY lang""".stripMargin,

    "q80_dataset_split" ->
      """WITH b AS (
        |  SELECT lang, n_chars, doc_id,
        |    CAST(concat('0x', substr(md5(concat('split|', doc_id)), 1, 12)) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |), sp AS (
        |  SELECT lang, n_chars, doc_id,
        |    CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b
        |)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  count(DISTINCT doc_id) AS n_distinct
        |FROM sp GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q81_decontamination" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(concat('0x', substr(md5(concat('split|', doc_id)), 1, 12)) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, lang, toks,
        |    CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM t
        |), sh AS (
        |  SELECT doc_id, lang, split,
        |    list_distinct([CAST(concat('0x',
        |        substr(md5(concat('dc|', array_to_string(toks[i:i+7], ' '))), 1, 12)) AS BIGINT)
        |      for i in generate_series(1, len(toks) - 7)]) AS hs
        |  FROM sp
        |), train_h AS (
        |  SELECT DISTINCT unnest(hs) AS h FROM sh WHERE split = 'train'
        |), test_h AS (
        |  SELECT lang, doc_id, unnest(hs) AS h FROM sh WHERE split = 'test'
        |), contaminated AS (
        |  SELECT DISTINCT e.lang, e.doc_id
        |  FROM test_h e JOIN train_h t ON e.h = t.h
        |)
        |SELECT s.lang, count(*) AS n_test,
        |  coalesce(any_value(c.n), 0)::BIGINT AS n_contaminated
        |FROM sh s LEFT JOIN (
        |  SELECT lang, count(*) AS n FROM contaminated GROUP BY lang
        |) c ON s.lang = c.lang
        |WHERE s.split = 'test'
        |GROUP BY s.lang ORDER BY s.lang""".stripMargin,

    // q81's CTEs + the bloom face: a bitmap bit is set iff some train
    // hash maps a probe onto it, so membership = every probe position
    // present in the train position SET (duplicated positions in one
    // hash's probe list match iff the position is present — exactly the
    // engine's ANDed bit tests).
    "q180_bloom_decontamination" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(concat('0x', substr(md5(concat('split|', doc_id)), 1, 12)) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, lang, toks,
        |    CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM t
        |), sh AS (
        |  SELECT doc_id, lang, split,
        |    list_distinct([CAST(concat('0x',
        |        substr(md5(concat('dc|', array_to_string(toks[i:i+7], ' '))), 1, 12)) AS BIGINT)
        |      for i in generate_series(1, len(toks) - 7)]) AS hs
        |  FROM sp
        |), train_h AS (
        |  SELECT DISTINCT unnest(hs) AS h FROM sh WHERE split = 'train'
        |), train_pos AS (
        |  SELECT DISTINCT unnest([
        |    CAST(concat('0x', substr(md5(concat('bl0|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl1|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl2|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl3|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576]) AS p
        |  FROM train_h
        |), test_h AS (
        |  SELECT lang, doc_id, unnest(hs) AS h FROM sh WHERE split = 'test'
        |), test_probes AS (
        |  SELECT lang, doc_id, h, unnest([
        |    CAST(concat('0x', substr(md5(concat('bl0|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl1|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl2|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576,
        |    CAST(concat('0x', substr(md5(concat('bl3|', CAST(h AS VARCHAR))), 1, 12)) AS BIGINT) % 1048576]) AS p
        |  FROM test_h
        |), cand AS (
        |  SELECT lang, doc_id, h FROM (
        |    SELECT tp.lang, tp.doc_id, tp.h, count(*) AS hits
        |    FROM test_probes tp JOIN train_pos USING (p)
        |    GROUP BY 1, 2, 3
        |  ) WHERE hits = 4
        |), cd AS (
        |  SELECT lang, count(DISTINCT doc_id) AS n_candidate_docs
        |  FROM cand GROUP BY 1
        |), contaminated AS (
        |  SELECT c.lang, count(DISTINCT c.doc_id) AS n
        |  FROM cand c JOIN train_h t ON c.h = t.h GROUP BY 1
        |)
        |SELECT s.lang, count(*) AS n_test,
        |  coalesce(any_value(cd.n_candidate_docs), 0)::BIGINT AS n_candidate_docs,
        |  coalesce(any_value(co.n), 0)::BIGINT AS n_contaminated
        |FROM sh s
        |LEFT JOIN cd ON s.lang = cd.lang
        |LEFT JOIN contaminated co ON s.lang = co.lang
        |WHERE s.split = 'test'
        |GROUP BY s.lang ORDER BY s.lang""".stripMargin,

    // Three chained merge blocks, each: weighted pair counts → argmax
    // (cnt desc, pair asc) → leftmost-greedy merge via gaps-and-islands
    // parity (the scan-equivalent of the engine's fold; runs longer
    // than one match only occur for (a,a) pairs and resolve to the same
    // even offsets).
    "q244_bpe_trainer" ->
      """WITH w0 AS (
        |  SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  GROUP BY 1
        |), s0 AS (
        |  SELECT w AS word, wc, string_split(w, '') AS sym FROM w0
        |), p1 AS (
        |  SELECT sym[i] AS a, sym[i + 1] AS b, sum(wc) AS cnt
        |  FROM s0, unnest(generate_series(1, len(sym) - 1)) AS g(i)
        |  GROUP BY 1, 2
        |), b1 AS (SELECT * FROM p1 ORDER BY cnt DESC, a, b LIMIT 1
        |), e1 AS (
        |  SELECT word, wc, g.i, sym[g.i] AS sm
        |  FROM s0, unnest(generate_series(1, len(sym))) AS g(i)
        |), m1 AS (
        |  SELECT e1.*, b1.a, b1.b,
        |    coalesce(sm = b1.a AND lead(sm) OVER w = b1.b, false) AS mt
        |  FROM e1 CROSS JOIN b1
        |  WINDOW w AS (PARTITION BY word ORDER BY i)
        |), n1 AS (
        |  SELECT *, (mt AND NOT coalesce(lag(mt) OVER w, false)) AS newrun
        |  FROM m1 WINDOW w AS (PARTITION BY word ORDER BY i)
        |), r1 AS (
        |  SELECT *, sum(CASE WHEN newrun THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY word ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM n1
        |), k1 AS (
        |  SELECT *, CASE WHEN mt THEN
        |    (i - min(CASE WHEN mt THEN i END)
        |      OVER (PARTITION BY word, rid)) % 2 = 0 ELSE false END AS kept
        |  FROM r1
        |), d1 AS (
        |  SELECT *, coalesce(lag(kept)
        |    OVER (PARTITION BY word ORDER BY i), false) AS dropped
        |  FROM k1
        |), s1 AS (
        |  SELECT word, any_value(wc) AS wc,
        |    list(CASE WHEN kept THEN a || b ELSE sm END ORDER BY i)
        |      FILTER (WHERE NOT dropped) AS sym
        |  FROM d1 GROUP BY word
        |), p2 AS (
        |  SELECT sym[i] AS a, sym[i + 1] AS b, sum(wc) AS cnt
        |  FROM s1, unnest(generate_series(1, len(sym) - 1)) AS g(i)
        |  GROUP BY 1, 2
        |), b2 AS (SELECT * FROM p2 ORDER BY cnt DESC, a, b LIMIT 1
        |), e2 AS (
        |  SELECT word, wc, g.i, sym[g.i] AS sm
        |  FROM s1, unnest(generate_series(1, len(sym))) AS g(i)
        |), m2 AS (
        |  SELECT e2.*, b2.a, b2.b,
        |    coalesce(sm = b2.a AND lead(sm) OVER w = b2.b, false) AS mt
        |  FROM e2 CROSS JOIN b2
        |  WINDOW w AS (PARTITION BY word ORDER BY i)
        |), n2 AS (
        |  SELECT *, (mt AND NOT coalesce(lag(mt) OVER w, false)) AS newrun
        |  FROM m2 WINDOW w AS (PARTITION BY word ORDER BY i)
        |), r2 AS (
        |  SELECT *, sum(CASE WHEN newrun THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY word ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM n2
        |), k2 AS (
        |  SELECT *, CASE WHEN mt THEN
        |    (i - min(CASE WHEN mt THEN i END)
        |      OVER (PARTITION BY word, rid)) % 2 = 0 ELSE false END AS kept
        |  FROM r2
        |), d2 AS (
        |  SELECT *, coalesce(lag(kept)
        |    OVER (PARTITION BY word ORDER BY i), false) AS dropped
        |  FROM k2
        |), s2 AS (
        |  SELECT word, any_value(wc) AS wc,
        |    list(CASE WHEN kept THEN a || b ELSE sm END ORDER BY i)
        |      FILTER (WHERE NOT dropped) AS sym
        |  FROM d2 GROUP BY word
        |), p3 AS (
        |  SELECT sym[i] AS a, sym[i + 1] AS b, sum(wc) AS cnt
        |  FROM s2, unnest(generate_series(1, len(sym) - 1)) AS g(i)
        |  GROUP BY 1, 2
        |), b3 AS (SELECT * FROM p3 ORDER BY cnt DESC, a, b LIMIT 1
        |), e3 AS (
        |  SELECT word, wc, g.i, sym[g.i] AS sm
        |  FROM s2, unnest(generate_series(1, len(sym))) AS g(i)
        |), m3 AS (
        |  SELECT e3.*, b3.a, b3.b,
        |    coalesce(sm = b3.a AND lead(sm) OVER w = b3.b, false) AS mt
        |  FROM e3 CROSS JOIN b3
        |  WINDOW w AS (PARTITION BY word ORDER BY i)
        |), n3 AS (
        |  SELECT *, (mt AND NOT coalesce(lag(mt) OVER w, false)) AS newrun
        |  FROM m3 WINDOW w AS (PARTITION BY word ORDER BY i)
        |), r3 AS (
        |  SELECT *, sum(CASE WHEN newrun THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY word ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM n3
        |), k3 AS (
        |  SELECT *, CASE WHEN mt THEN
        |    (i - min(CASE WHEN mt THEN i END)
        |      OVER (PARTITION BY word, rid)) % 2 = 0 ELSE false END AS kept
        |  FROM r3
        |), d3 AS (
        |  SELECT *, coalesce(lag(kept)
        |    OVER (PARTITION BY word ORDER BY i), false) AS dropped
        |  FROM k3
        |), s3 AS (
        |  SELECT word, any_value(wc) AS wc,
        |    list(CASE WHEN kept THEN a || b ELSE sm END ORDER BY i)
        |      FILTER (WHERE NOT dropped) AS sym
        |  FROM d3 GROUP BY word
        |), fin AS (
        |  SELECT CAST(sum(wc * len(sym)) AS BIGINT) AS n_symbols_after,
        |    CAST(sum(wc) AS BIGINT) AS n_word_occurrences,
        |    count(*) AS n_distinct_words
        |  FROM s3
        |), meta AS (
        |  SELECT 1 AS iter, a AS pair_a, b AS pair_b,
        |    CAST(cnt AS BIGINT) AS pair_count FROM b1
        |  UNION ALL SELECT 2, a, b, CAST(cnt AS BIGINT) FROM b2
        |  UNION ALL SELECT 3, a, b, CAST(cnt AS BIGINT) FROM b3
        |)
        |SELECT m.iter, m.pair_a, m.pair_b, m.pair_count,
        |  f.n_symbols_after, f.n_word_occurrences, f.n_distinct_words
        |FROM meta m CROSS JOIN fin f ORDER BY m.iter""".stripMargin,

    // Both legs' committed chains + the same two reciprocals; VALUES
    // carries the per-query term sets; -1 fills a leg the doc missed.
    "q241_hybrid_rrf" ->
      """WITH qterms AS (
        |  SELECT * FROM (VALUES (0, 'spark'), (0, 'vector'), (1, 'customer'),
        |    (1, 'join'), (2, 'window'), (2, 'filter')) AS t(query_id, tok)
        |), d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), docs AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
        |), stats AS (
        |  SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM docs
        |), tf AS (
        |  SELECT q.query_id, docs.doc_id, docs.dl, u.tok, count(*) AS tf
        |  FROM docs, unnest(toks) AS u(tok)
        |  JOIN qterms q ON q.tok = u.tok
        |  GROUP BY 1, 2, 3, 4
        |), dfs AS (
        |  SELECT tok, count(*) AS df
        |  FROM (SELECT DISTINCT tok, doc_id FROM tf) GROUP BY 1
        |), sc AS (
        |  SELECT tf.query_id, tf.doc_id,
        |    CAST(round(
        |      ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
        |      (tf.tf * 2.2 /
        |        (tf.tf + 1.2 * (1.0 - 0.75 +
        |           0.75 * tf.dl / (CAST(stats.tot_dl AS DOUBLE) / stats.n_docs)))),
        |      9) AS DECIMAL(28,9)) AS term_score
        |  FROM tf JOIN dfs ON tf.tok = dfs.tok CROSS JOIN stats
        |), lexs AS (
        |  SELECT query_id, doc_id,
        |    round(CAST(sum(term_score) AS DOUBLE), 6) AS lex_score
        |  FROM sc GROUP BY 1, 2
        |), lex AS (
        |  SELECT query_id, doc_id, lex_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY lex_score DESC, doc_id) AS lex_rank
        |    FROM lexs
        |  ) WHERE lex_rank <= 20
        |), q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), vsc AS (
        |  SELECT q.query_id, e.vec_id AS doc_id,
        |    list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
        |), vec AS (
        |  SELECT query_id, doc_id, vec_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, doc_id) AS vec_rank
        |    FROM vsc
        |  ) WHERE vec_rank <= 20
        |), fused AS (
        |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
        |    coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    round(coalesce(1.0 / (60 + l.lex_rank), 0.0) +
        |          coalesce(1.0 / (60 + v.vec_rank), 0.0), 9) AS rrf,
        |    coalesce(l.lex_rank, -1) AS lex_rank,
        |    coalesce(v.vec_rank, -1) AS vec_rank
        |  FROM lex l FULL OUTER JOIN vec v
        |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
        |)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf,
        |  CAST(lex_rank AS BIGINT) AS lex_rank,
        |  CAST(vec_rank AS BIGINT) AS vec_rank
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf DESC, doc_id) AS rank
        |  FROM fused
        |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q196_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), docs AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
        |), stats AS (
        |  SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM docs
        |), tf AS (
        |  SELECT doc_id, lang, dl, tok, count(*) AS tf
        |  FROM docs, unnest(toks) AS u(tok)
        |  WHERE tok IN ('spark', 'vector', 'customer')
        |  GROUP BY 1, 2, 3, 4
        |), dfs AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT tf.doc_id, tf.lang,
        |    CAST(round(
        |      ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
        |      (tf.tf * 2.2 /
        |        (tf.tf + 1.2 * (1.0 - 0.75 +
        |           0.75 * tf.dl / (CAST(stats.tot_dl AS DOUBLE) / stats.n_docs)))),
        |      9) AS DECIMAL(28,9)) AS term_score
        |  FROM tf JOIN dfs ON tf.tok = dfs.tok CROSS JOIN stats
        |), agg AS (
        |  SELECT doc_id, lang, round(CAST(sum(term_score) AS DOUBLE), 6) AS score
        |  FROM sc GROUP BY 1, 2
        |)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, lang, score
        |FROM agg ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q181_matryoshka_ann" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_cosine_similarity(
        |      list_transform(e.embedding[1:16], x -> CAST(x AS DOUBLE)),
        |      q.qv[1:16]) AS sim16,
        |    list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim64
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, sim16,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim16 DESC, vec_id) AS r16,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim64 DESC, vec_id) AS r64
        |  FROM scored
        |)
        |SELECT query_id, r16 AS rank, vec_id, round(sim16, 6) AS sim16,
        |  (r64 <= 5) AS in_full_top5
        |FROM ranked WHERE r16 <= 5 ORDER BY query_id, rank""".stripMargin,

    "q56_multimodal" ->
      """SELECT d.doc_id,
        |  octet_length(encode(d.text)) AS n_bytes,
        |  d.lang,
        |  len(e.embedding) AS dim,
        |  round(CAST(e.embedding[1] AS DOUBLE), 6) AS e1
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
