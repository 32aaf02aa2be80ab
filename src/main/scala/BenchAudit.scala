import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Mechanical plan/perf regression gate. Compares every declared batch
  * query's physical plan against `tools/plan_baseline.json` (exchange
  * count per query, recorded with `--record`) and the latest
  * `bench_full.json` wall times against `tools/bench_baseline.json` —
  * so a plan regression (a new shuffle, a new cartesian) or a >2×
  * per-query slowdown fails LOUDLY instead of drifting unnoticed across
  * rounds (round 7 shipped a broken build because nothing mechanical
  * gated the snapshot; this is the plan-level analogue for performance).
  *
  * The bench artifact is self-defending against box load: `graft.Bench`
  * runs a fixed calibration probe before and after the suite and stamps
  * both costs into `bench_full.json`. When the worse probe exceeds 1.5×
  * its recorded `__probe__` baseline, the run is CONTAMINATED — wall-time
  * drift is then reported but NOT fatal (plan regressions still are;
  * plans don't depend on load). Round 8's driver-recorded 122.8 s vs the
  * judge's 54.4 s re-run of identical code is the failure this closes.
  *
  *   sbt "runMain BenchAudit"               # audit vs recorded baselines
  *   sbt "runMain BenchAudit --record"      # refresh both baselines
  *   sbt "runMain BenchAudit --plans-only"  # refresh ONLY plan baselines
  *                                          # (keeps a two-run bench
  *                                          # baseline from merge_baseline.py)
  *
  * Exit 1 on any regression; new queries are reported and pass (record
  * them once reviewed). Baselines are committed so the next round diffs
  * against this round's accepted state.
  */
object BenchAudit {
  private val planPath = "tools/plan_baseline.json"
  private val benchBasePath = "tools/bench_baseline.json"
  private val benchCurrentPath = "bench_full.json"

  private val mapper = new ObjectMapper()

  /** Strict parse: malformed JSON in a gate input must fail LOUDLY — an
    * empty map here would silently disarm the gate. */
  def parseJson(text: String, what: String): JsonNode =
    try mapper.readTree(text)
    catch { case e: Throwable =>
      throw new IllegalArgumentException(s"[benchaudit] $what is not valid JSON: ${e.getMessage}")
    }

  private def numericFields(node: JsonNode): Map[String, Double] =
    node.properties().asScala
      .filter(_.getValue.isNumber)
      .map(e => e.getKey -> e.getValue.asDouble())
      .toMap

  /** Top-level `"key": number` pairs of a JSON object (the shape this
    * object writes its own baseline files in). Non-object input fails. */
  def parseFlat(text: String, what: String): Map[String, Double] = {
    val root = parseJson(text, what)
    if (!root.isObject)
      throw new IllegalArgumentException(s"[benchaudit] $what: expected a JSON object, got ${root.getNodeType}")
    numericFields(root)
  }

  /** Per-query medians + the probe verdict statistic from
    * `bench_full.json` (None for a pre-probe-era artifact). Round-11
    * artifacts carry the interleaved `probe.samples` array — the
    * statistic is its MEDIAN (sustained load moves the median; single
    * samples jitter 0.07–0.27 s on a quiet box, and bursts are covered
    * by the per-query suspect stamps). Pre-round-11 artifacts fall back
    * to the worse of the start/end bracket, as before. */
  def parseBenchFull(text: String): (Map[String, Double], Option[Double]) = {
    val root = parseJson(text, benchCurrentPath)
    val queries = Option(root.get("queries")).filter(_.isObject)
      .map(numericFields).getOrElse(Map.empty[String, Double])
    val probe = Option(root.get("probe")).filter(_.isObject).flatMap { p =>
      val interleaved = Option(p.get("samples")).filter(_.isArray)
        .map(_.asScala.toSeq.filter(_.isNumber).map(_.asDouble())).getOrElse(Nil)
      if (interleaved.nonEmpty) {
        val s = interleaved.sorted
        Some(if (s.length % 2 == 1) s(s.length / 2)
             else (s(s.length / 2 - 1) + s(s.length / 2)) / 2)
      } else {
        val vals = Seq("start", "end").flatMap(k =>
          Option(p.get(k)).filter(_.isNumber).map(_.asDouble()))
        if (vals.isEmpty) None else Some(vals.max)
      }
    }
    (queries, probe)
  }

  /** Median of the IO-probe samples (round-11 artifacts; None before).
    * The CPU probe is blind to IO/page-cache contention — judged
    * separately against `__probe_io__`. */
  def parseBenchIo(text: String): Option[Double] = {
    val root = parseJson(text, benchCurrentPath)
    Option(root.get("probe")).filter(_.isObject).flatMap { p =>
      val s = Option(p.get("io_samples")).filter(_.isArray)
        .map(_.asScala.toSeq.filter(_.isNumber).map(_.asDouble()).sorted)
        .getOrElse(Nil)
      if (s.isEmpty) None
      else Some(if (s.length % 2 == 1) s(s.length / 2)
                else (s(s.length / 2 - 1) + s(s.length / 2)) / 2)
    }
  }

  /** Round-11/12 self-defense extras from `bench_full.json`: per-query
    * MIN-of-reps, the suspect list (rep spread >3× — some reps ran under
    * load) and the haze list (a contiguous execution-order band
    * uniformly elevated vs baseline — round 12's probe-invisible load
    * signature). All empty for older artifacts. */
  def parseBenchExtras(text: String): (Map[String, Double], Set[String], Set[String]) = {
    val root = parseJson(text, benchCurrentPath)
    val mins = Option(root.get("mins")).filter(_.isObject)
      .map(numericFields).getOrElse(Map.empty[String, Double])
    def names(field: String) = Option(root.get(field)).filter(_.isArray)
      .map(_.asScala.toSeq.filter(_.isTextual).map(_.asText()).toSet)
      .getOrElse(Set.empty[String])
    (mins, names("suspect"), names("haze_suspect"))
  }

  /** Per-query EFFECTIVE wall time of one artifact: min-of-reps for
    * suspect/haze-stamped queries (the quiet rep measures the code),
    * the median otherwise. */
  def effectiveTimes(text: String): Map[String, Double] = {
    val (queries, _) = parseBenchFull(text)
    val (mins, suspect, haze) = parseBenchExtras(text)
    queries.map { case (q, med) =>
      q -> (if ((suspect(q) || haze(q)) && mins.contains(q))
        math.min(mins(q), med) else med)
    }
  }

  private def readFile(path: String): Option[String] =
    if (!Files.exists(Paths.get(path))) None
    else Some(new String(Files.readAllBytes(Paths.get(path)), UTF_8))

  private def writeFlat(path: String, m: Map[String, Double]): Unit = {
    val body = m.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        val s = if (v == v.toLong.toDouble) v.toLong.toString else v.toString
        s"""  "$k": $s"""
      }
      .mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(path), body.getBytes(UTF_8)): Unit
  }

  def main(args: Array[String]): Unit = {
    val plansOnly = args.contains("--plans-only")
    val record = args.contains("--record") || plansOnly
    val spark = ExplainAudit.auditSession()
    val d = "/root/testdata/sf0.01"
    val current = ExplainAudit.batchQueryNames
      .map(q => q -> ExplainAudit.metricsFor(spark, q, d)).toMap
    spark.stop()

    val (benchNowAll, probeNow) = readFile(benchCurrentPath)
      .map(parseBenchFull).getOrElse((Map.empty[String, Double], None))

    if (record) {
      writeFlat(planPath, current.map { case (q, m) => q -> m.exchanges.toDouble })
      if (plansOnly) {
        println(s"[benchaudit] recorded ${current.size} plan baselines -> $planPath " +
          "(bench baselines untouched)")
        return
      }
      val existing = readFile(benchBasePath)
        .map(parseFlat(_, benchBasePath)).getOrElse(Map.empty[String, Double])
      // record EFFECTIVE times (min-of-reps for suspect/haze-stamped
      // queries) — a load-inflated median must not become the baseline
      val fresh = readFile(benchCurrentPath).map(effectiveTimes)
        .getOrElse(benchNowAll)
        .filter { case (k, _) => current.contains(k) || k.startsWith("s") }
      // A loaded recorder must not SOFTEN the gate: when the probe says
      // the run is contaminated, keep every existing wall baseline (and
      // the clean probe cost) and adopt only genuinely NEW queries —
      // their first baseline is then conservative (slow), which the
      // next clean --record tightens.
      val loaded = (probeNow, existing.get("__probe__")) match {
        case (Some(n), Some(b)) => b > 0 && n > 1.5 * b
        case _ => false
      }
      val bench =
        if (loaded)
          existing.filter { case (k, _) => k == "__probe__" || fresh.contains(k) } ++
            fresh.filter { case (k, _) => !existing.contains(k) }
        else fresh ++ probeNow.map("__probe__" -> _)
      writeFlat(benchBasePath, bench)
      println(s"[benchaudit] recorded ${current.size} plan baselines -> $planPath, " +
        s"${bench.size} bench baselines -> $benchBasePath" +
        probeNow.map(p => f" (probe $p%.2fs)").getOrElse(" (no probe in bench_full.json)") +
        (if (loaded) " [probe contaminated: existing wall baselines kept]" else ""))
      return
    }

    val planBase = readFile(planPath).map(parseFlat(_, planPath)).getOrElse(Map.empty)
    val benchBase = readFile(benchBasePath).map(parseFlat(_, benchBasePath)).getOrElse(Map.empty)
    val benchNow = benchNowAll.filter { case (k, _) => k.startsWith("q") || k.startsWith("s") }

    // Contamination verdict: probe sample median vs recorded clean cost,
    // on EITHER axis (CPU probe or IO probe).
    val probeBase = benchBase.get("__probe__")
    val cpuLoaded = (probeNow, probeBase) match {
      case (Some(now), Some(base)) if base > 0 && now > 1.5 * base =>
        println(f"[benchaudit] CONTAMINATED RUN — CPU probe median $now%.2fs vs recorded $base%.2fs " +
          "(>1.5x): box was loaded; wall-time drift below is reported but NOT gated")
        true
      case _ => false
    }
    val ioNow = readFile(benchCurrentPath).flatMap(parseBenchIo)
    val ioLoaded = (ioNow, benchBase.get("__probe_io__")) match {
      case (Some(now), Some(base)) if base > 0 && now > 1.5 * base =>
        println(f"[benchaudit] CONTAMINATED RUN — IO probe median $now%.2fs vs recorded $base%.2fs " +
          "(>1.5x): IO/page-cache contention; wall-time drift reported but NOT gated")
        true
      case _ => false
    }
    val contaminated = cpuLoaded || ioLoaded

    val failures = Seq.newBuilder[String]
    val notes = Seq.newBuilder[String]
    current.toSeq.sortBy(_._1).foreach { case (q, m) =>
      if (m.cartesian > 0) failures += s"$q: CARTESIAN PRODUCT (${m.cartesian})"
      planBase.get(q) match {
        case None => notes += s"$q: new query (no plan baseline; run --record)"
        case Some(base) if m.exchanges > base.toInt =>
          failures += s"$q: exchanges ${base.toInt} -> ${m.exchanges} (plan regression)"
        case Some(base) if m.exchanges < base.toInt =>
          notes += s"$q: exchanges ${base.toInt} -> ${m.exchanges} (improved; re-record)"
        case _ => ()
      }
    }
    // wall-time drift: >2× AND >0.5 s absolute (sub-second queries jitter).
    // Streaming-replay queries (s*) gate at 3×: their cost is micro-batch
    // scheduler/state-store timing, not plan cost, and back-to-back runs
    // of identical code were measured at ~2× spread with a quiet probe
    // (s61 1.95 s → 6.9 s within one session, round 9).
    // On a contaminated run these are informational — the probe already
    // proved the clock, not the code, is at fault. A SUSPECT query (rep
    // spread >3× — some reps hit load the probes missed) gates on its
    // MIN-of-reps: the quiet rep measures the code, the median measures
    // the box.
    val (benchMins, benchSuspect, benchHaze) = readFile(benchCurrentPath)
      .map(parseBenchExtras)
      .getOrElse((Map.empty[String, Double], Set.empty[String], Set.empty[String]))
    // Cross-run gating (round 12): `--cross <path>` names a SECOND bench
    // artifact (another run of the same code — e.g. the driver's run next
    // to a local re-run). Both round-12 runs self-stamped clean while
    // carrying disjoint 2–5× load-haze bands; the per-query minimum
    // across the two runs was clean everywhere — so when a second sample
    // exists, drift gates on the cross-run minimum of effective times.
    val crossPath = args.sliding(2).collectFirst {
      case Array("--cross", p) => p }
    val crossEff: Map[String, Double] = crossPath.flatMap(readFile)
      .map(effectiveTimes).getOrElse(Map.empty)
    if (crossPath.isDefined && crossEff.isEmpty)
      println(s"[benchaudit] WARNING: --cross ${crossPath.get} unreadable/empty — single-run gating")
    if (benchHaze.nonEmpty)
      println(s"[benchaudit] haze_suspect band (${benchHaze.size} queries, " +
        "gated on min-of-reps/cross-run min): " +
        benchHaze.toSeq.sorted.mkString(", "))
    benchNow.foreach { case (q, t0) =>
      benchBase.get(q).foreach { b =>
        val suspect = benchSuspect.contains(q) || benchHaze.contains(q)
        val own = if (suspect) math.min(benchMins.getOrElse(q, t0), t0) else t0
        val t = crossEff.get(q).map(math.min(own, _)).getOrElse(own)
        val factor = if (q.startsWith("s")) 3.0 else 2.0
        val tag =
          (if (benchHaze.contains(q)) ", min-of-reps (haze band)"
           else if (benchSuspect.contains(q)) ", min-of-reps (suspect spread)"
           else "") +
            (if (crossEff.contains(q)) ", cross-run min" else "")
        if (t > factor * b && t - b > 0.5) {
          if (contaminated) notes += f"$q: wall time $b%.2fs -> $t%.2fs (>${factor}%.0fx, contaminated run$tag)"
          else failures += f"$q: wall time $b%.2fs -> $t%.2fs (>${factor}%.0fx drift$tag)"
        } else if (b > 2 * t && b - t > 0.5)
          notes += f"$q: wall time $b%.2fs -> $t%.2fs (improved$tag)"
      }
    }

    val ns = notes.result()
    if (ns.nonEmpty) println(ns.map("[note] " + _).mkString("\n"))
    val fs = failures.result()
    if (fs.isEmpty) {
      println(s"[benchaudit] OK — ${current.size} plans vs baseline, " +
        s"${benchNow.count(p => benchBase.contains(p._1))} wall times checked" +
        (if (contaminated) " (contaminated run: wall-time gate suspended)" else ""))
    } else {
      println(fs.map("[benchaudit] FAIL " + _).mkString("\n"))
      sys.exit(1)
    }
  }
}
