package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 coverage queries (q82–q88): the
  * oracle proves cross-engine equality; these prove the numbers mean what
  * they claim. */
class ReshapeCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val SF = TestSpark.SF

  test("q82 pivot: wide grid preserves the event multiset (q82/q83 round trip)") {
    val events = Tables.events(spark, SF)
    val total = events.count()
    val wide = ReshapeQueries.queries("q82_pivot")(spark, SF)
    val typeCols = Seq("click", "error", "purchase", "signup", "view")
    // One row per day, and the cells sum back to every event exactly once.
    assert(wide.count() ==
      events.select(date_trunc("day", col("ts"))).distinct().count())
    val cellSum = wide.select(typeCols.map(c => sum(col(c))).reduce(_ + _).as("s"))
      .collect()(0).getLong(0)
    assert(cellSum == total, s"pivot cells sum $cellSum != $total events")
    // Unpivot totals equal a direct long-form aggregation.
    val unpiv = ReshapeQueries.queries("q83_unpivot")(spark, SF)
      .select("event_type", "total").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unpiv == direct, s"unpivot $unpiv != direct $direct")
  }

  test("q84 setops_all: bag semantics (except = max(a-b,0), intersect = min(a,b))") {
    val li = Tables.lineitem(spark, SF)
    val aCnt = li.filter(col("l_quantity") < 25)
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bCnt = li.filter(col("l_discount") > 0.05)
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = ReshapeQueries.queries("q84_setops_all")(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val keys = (aCnt.keySet ++ bCnt.keySet).toSeq
    keys.foreach { k =>
      val (a, b) = (aCnt.getOrElse(k, 0L), bCnt.getOrElse(k, 0L))
      assert(got.getOrElse(("except_all", k._1, k._2), 0L) == math.max(a - b, 0L),
        s"except_all wrong at $k")
      assert(got.getOrElse(("intersect_all", k._1, k._2), 0L) == math.min(a, b),
        s"intersect_all wrong at $k")
    }
  }

  test("q85 sessionize: sessions partition the events; gaps within sessions <= 1h") {
    val events = Tables.events(spark, SF)
    val out = ReshapeQueries.queries("q85_sessionize")(spark, SF).collect()
    val totalEvents = out.map(r => r.getLong(r.fieldIndex("n_events_total"))).sum
    assert(totalEvents == events.count(), "session buckets must cover every event")
    // Reconstruct sessions and assert no intra-session gap exceeds the 1h cut.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 3600000000L, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val badGaps = sess.filter(col("new_sess") === 0 && col("gap") > 3600000000L).count()
    assert(badGaps == 0)
    val nSessions = sess.select("user_id", "sess_id").distinct().count()
    assert(out.map(r => r.getLong(r.fieldIndex("n_sessions"))).sum == nSessions)
  }

  test("q86 quality signals: fractions bounded, flags consistent") {
    val rows = CurationQueries.queries("q86_quality_signals")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dup, top, wl) = (r.getDouble(r.fieldIndex("avg_dup_frac")),
        r.getDouble(r.fieldIndex("avg_top_bg_frac")),
        r.getDouble(r.fieldIndex("avg_word_len")))
      assert(dup >= 0.0 && dup <= 1.0, s"dup_frac out of range: $dup")
      assert(top > 0.0 && top <= 1.0, s"top_bg_frac out of range: $top")
      assert(wl > 0.0, s"word len must be positive: $wl")
      assert(r.getLong(r.fieldIndex("n_flagged")) <= r.getLong(r.fieldIndex("n_docs")))
    }
  }

  test("q87 pii scrub: redaction complete, counts match the injection rule") {
    val docs = Tables.documents(spark, SF)
    val injected = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = CurationQueries.queries("q87_pii_scrub")(spark, SF).collect()
    out.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      // exactly one email + one phone injected per doc_id % 3 == 0 doc
      assert(r.getLong(r.fieldIndex("n_emails")) == injected.getOrElse(lang, 0L))
      assert(r.getLong(r.fieldIndex("n_phones")) == injected.getOrElse(lang, 0L))
      assert(r.getLong(r.fieldIndex("len_delta")) > 0 || injected.getOrElse(lang, 0L) == 0)
    }
    // Scrub is a fixpoint: re-extracting PII from scrubbed text finds nothing.
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val scrubbed = docs
      .withColumn("aug",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("Contact u"), col("doc_id"), lit("@example.com or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(". "), col("text"))).otherwise(col("text")))
      .withColumn("scrubbed", regexp_replace(col("aug"), emailPat, "[EMAIL]"))
      .filter(size(regexp_extract_all(col("scrubbed"), lit(emailPat), lit(0))) > 0)
    assert(scrubbed.count() == 0, "emails survived the scrub")
  }

  test("q151/q152: dup-ngram fractions bounded; passage spans are >= 13-token maximal runs") {
    val q151 = CurationQueries.queries("q151_dup_ngram_chars")(spark, SF).collect()
    q151.foreach { r =>
      val (f2, f3) = (r.getDouble(r.fieldIndex("avg_dup2_frac")),
        r.getDouble(r.fieldIndex("avg_dup3_frac")))
      assert(f2 >= 0 && f2 <= 1 && f3 >= 0 && f3 <= 1)
      assert(r.getLong(r.fieldIndex("n_flagged")) <= r.getLong(r.fieldIndex("n_docs")))
    }
    val q152 = CurationQueries.queries("q152_repeated_passages")(spark, SF).collect()
    assert(q152.nonEmpty, "fixture plants near-dup docs; spans must exist")
    q152.foreach { r =>
      val (nSpans, sumToks, maxToks) = (r.getLong(r.fieldIndex("n_spans")),
        r.getLong(r.fieldIndex("sum_span_toks")), r.getLong(r.fieldIndex("max_span_toks")))
      // every span is a maximal run of >= 1 duplicated 13-gram
      assert(maxToks >= 13 && sumToks >= 13 * nSpans)
      assert(r.getLong(r.fieldIndex("n_docs_affected")) <= nSpans)
    }
    // a cross-doc gram touches >= 2 docs somewhere in the corpus
    assert(q152.map(_.getLong(1)).sum >= 2)
  }

  test("q153 packing: token totals tie out exactly; split docs bounded by examples") {
    val out = CurationQueries.queries("q153_sequence_packing")(spark, SF).collect()
    val expected = Tables.documents(spark, SF)
      .select(col("source"), size(split(trim(col("text")), "\\s+")).as("n"))
      .groupBy("source").agg(sum(col("n")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      assert(r.getLong(r.fieldIndex("total_toks")) == expected(src),
        s"$src token total drifted")
      // a doc can only split where an example boundary exists
      assert(r.getLong(r.fieldIndex("n_split_docs")) <=
        r.getLong(r.fieldIndex("n_examples")))
      // 8 shards, each adds at most one partially-filled trailing example
      val minEx = (expected(src) + 255) / 256
      assert(r.getLong(r.fieldIndex("n_examples")) >= minEx &&
        r.getLong(r.fieldIndex("n_examples")) <= minEx + 8)
    }
  }

  test("q154 temperature mixing: alpha=0.5 flattens — rarer langs keep a higher fraction") {
    val out = CurationQueries.queries("q154_temperature_mixing")(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // thresh is anti-monotone in corpus count: p_s ∝ cnt^(α-1), α<1
    val byCnt = out.sortBy(_._2)
    byCnt.sliding(2).foreach { case Array((l1, c1, t1, _), (l2, c2, t2, _)) =>
      if (c1 < c2) assert(t1 >= t2, s"$l1(cnt=$c1) thresh $t1 < $l2(cnt=$c2) thresh $t2")
    }
    out.foreach { case (_, n, t, kept) =>
      assert(t >= 0 && t <= 10000 && kept <= n)
    }
  }

  test("q88 perplexity: ce bounded by ln(vocab mass), uniform-doc sanity") {
    val out = CurationQueries.queries("q88_perplexity")(spark, SF).collect()
    val tok = Tables.documents(spark, SF)
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val totals = tok.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val (avg, max) = (r.getDouble(r.fieldIndex("avg_ce")), r.getDouble(r.fieldIndex("max_ce")))
      assert(avg > 0 && avg <= max)
      // -mean log p <= ln(total tokens): p >= 1/total for every token.
      assert(max <= math.log(totals(lang).toDouble) + 1e-6,
        s"$lang ce $max exceeds ln(${totals(lang)})")
    }
  }

  test("q168 Gopher gates: verdicts bounded and union-consistent") {
    val rows = CurationQueries.queries("q168_gopher_gates")(spark, SF).collect()
    assert(rows.nonEmpty)
    val dropCols = Seq("drop_wordcount", "drop_wordlen", "drop_symbol",
      "drop_alpha", "drop_stopword")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val keep = r.getAs[Long]("n_keep")
      val drops = dropCols.map(r.getAs[Long](_))
      drops.foreach(d => assert(d >= 0 && d <= n))
      assert(keep >= 0 && keep <= n)
      // union bound: every non-kept doc fails at least one rule
      assert(keep >= n - drops.sum, s"keep $keep < n $n - sum ${drops.sum}")
      // a doc failing any single rule is not kept
      assert(keep <= n - drops.max)
    }
    // the fixture corpus actually exercises the gates: some group drops
    // on the stop-word rule (most soup docs carry only "the")
    assert(rows.map(_.getAs[Long]("drop_stopword")).sum > 0)
  }
}
