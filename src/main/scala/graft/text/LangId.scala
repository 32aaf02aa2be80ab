package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Language identification by character-n-gram profiles (E55 [N]): the
  * classic heuristic — build a top-K bigram frequency profile per language
  * from a labeled corpus, classify a document to the profile with the
  * largest feature overlap. Everything is relational (explode → count →
  * rank → join → argmax), so training and inference are each one Spark
  * plan; the profile table is tiny and broadcast at inference.
  *
  * Train and classify both consume the SAME exploded feature frame
  * (doc_id, lang, bg): callers that need both — the confusion-matrix query
  * — compute [[explodedFeatures]] once, persist it (bounded: ids + 2-char
  * bigrams, no text), and feed [[trainProfilesFrom]] + [[classifyFrom]]
  * from it. The docs-taking overloads exist for single-sided use and specs.
  *
  * Determinism for the oracle: profile ranking ties break on bigram text;
  * classification ties break on language name.
  */
object LangId {

  /** Per-doc distinct bigram features. */
  def features(docs: DataFrame, cap: Int = 100): DataFrame =
    docs.withColumn("bigrams", expr(TextOps.charBigramsSql("text", cap)))

  /** Exploded feature frame: one row per (lang, doc_id, bigram). This is
    * the frame worth persisting when both train and classify consume it —
    * the explode of up-to-(cap−1) bigrams × every doc is the expensive
    * part of both plans. */
  def explodedFeatures(docs: DataFrame, cap: Int = 100): DataFrame =
    features(docs, cap)
      .select(col("lang"), col("doc_id"), explode(col("bigrams")).as("bg"))

  /** Train: top-K bigrams per language by document frequency. */
  def trainProfiles(docs: DataFrame, topK: Int = 20, cap: Int = 100): DataFrame =
    trainProfilesFrom(explodedFeatures(docs, cap), topK)

  /** Train from a pre-exploded feature frame (see [[explodedFeatures]]). */
  def trainProfilesFrom(exploded: DataFrame, topK: Int = 20): DataFrame = {
    val freq = exploded.groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang")).orderBy(col("df").desc, col("bg"))
    freq.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select(col("lang").as("profile_lang"), col("bg"))
  }

  /** Classify: score = |doc bigrams ∩ profile|, argmax over languages.
    * Docs sharing no bigram with ANY profile (empty/exotic text) are kept:
    * every doc contributes a score-0 "unknown" baseline row into the same
    * argmax, which any real profile match (score ≥ 1) beats. Union-into-
    * the-existing-window costs no extra shuffle, where a left-join-back of
    * the argmax result would re-shuffle at doc grain. */
  def classify(docs: DataFrame, profiles: DataFrame, cap: Int = 100): DataFrame =
    classifyFrom(explodedFeatures(docs, cap),
      docs.select(col("doc_id"), col("lang")), profiles)

  /** Classify from a pre-exploded feature frame; `docIds` supplies the
    * score-0 baseline rows (a pruned (doc_id, lang) scan — cheap). */
  def classifyFrom(exploded: DataFrame, docIds: DataFrame,
                   profiles: DataFrame): DataFrame = {
    val scored = exploded.join(broadcast(profiles), Seq("bg"))
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(count(lit(1)).as("score"))
    val baseline = docIds.select(col("doc_id"), col("lang"),
      lit("unknown").as("profile_lang"), lit(0L).as("score"))
    // argmax as ONE hash aggregation (min_by over the (−score,
    // profile_lang) struct — struct ordering is field-by-field, so this
    // is exactly "highest score, language name breaks ties", the same row
    // the previous row_number()-over-sorted-window form kept): a hash agg
    // does map-side partial aggregation and never sorts, where the window
    // sorted every doc's rows after the shuffle (guide §2.3/§4).
    scored.unionByName(baseline)
      .groupBy(col("doc_id"), col("lang"))
      .agg(min_by(col("profile_lang"),
        struct((-col("score")).as("ns"), col("profile_lang"))).as("predicted"))
      .select(col("doc_id"), col("lang"), col("predicted"))
  }
}
