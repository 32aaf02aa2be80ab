import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Mechanical plan/perf regression gate. Compares every declared batch
  * query's physical plan against `tools/plan_baseline.json` (exchange
  * count per query, recorded with `--record`) and the latest
  * `bench_full.json` wall times against `tools/bench_baseline.json` —
  * so a plan regression (a new shuffle, a new cartesian) or a >2×
  * per-query slowdown fails LOUDLY instead of drifting unnoticed across
  * rounds (round 7 shipped a broken build because nothing mechanical
  * gated the snapshot; this is the plan-level analogue for performance).
  *
  *   sbt "runMain BenchAudit"            # audit vs recorded baselines
  *   sbt "runMain BenchAudit --record"   # refresh both baselines
  *
  * Exit 1 on any regression; new queries are reported and pass (record
  * them once reviewed). Baselines are committed so the next round diffs
  * against this round's accepted state.
  */
object BenchAudit {
  private val planPath = "tools/plan_baseline.json"
  private val benchBasePath = "tools/bench_baseline.json"
  private val benchCurrentPath = "bench_full.json"

  /** Flat `"key": number` pairs from a one-level JSON object (both
    * baseline files are written by this object in exactly that shape;
    * bench_full.json nests one level but its query keys are unique). */
  private def numPairs(path: String): Map[String, Double] =
    if (!Files.exists(Paths.get(path))) Map.empty
    else "\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+)".r
      .findAllMatchIn(new String(Files.readAllBytes(Paths.get(path)), UTF_8))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

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
    val record = args.contains("--record")
    val spark = ExplainAudit.auditSession()
    val d = "/root/testdata/sf0.01"
    val current = ExplainAudit.batchQueryNames
      .map(q => q -> ExplainAudit.metricsFor(spark, q, d)).toMap
    spark.stop()

    if (record) {
      writeFlat(planPath, current.map { case (q, m) => q -> m.exchanges.toDouble })
      val bench = numPairs(benchCurrentPath)
        .filter { case (k, _) => current.contains(k) || k.startsWith("s") }
      writeFlat(benchBasePath, bench)
      println(s"[benchaudit] recorded ${current.size} plan baselines -> $planPath, " +
        s"${bench.size} bench baselines -> $benchBasePath")
      return
    }

    val planBase = numPairs(planPath)
    val benchBase = numPairs(benchBasePath)
    val benchNow = numPairs(benchCurrentPath)
      .filter { case (k, _) => k.startsWith("q") || k.startsWith("s") }

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
    // wall-time drift: >2× AND >0.5 s absolute (sub-second queries jitter)
    benchNow.foreach { case (q, t) =>
      benchBase.get(q).foreach { b =>
        if (t > 2 * b && t - b > 0.5)
          failures += f"$q: wall time $b%.2fs -> $t%.2fs (>2x drift)"
        else if (b > 2 * t && b - t > 0.5)
          notes += f"$q: wall time $b%.2fs -> $t%.2fs (improved)"
      }
    }

    val ns = notes.result()
    if (ns.nonEmpty) println(ns.map("[note] " + _).mkString("\n"))
    val fs = failures.result()
    if (fs.isEmpty) {
      println(s"[benchaudit] OK — ${current.size} plans vs baseline, " +
        s"${benchNow.count(p => benchBase.contains(p._1))} wall times within 2x")
    } else {
      println(fs.map("[benchaudit] FAIL " + _).mkString("\n"))
      sys.exit(1)
    }
  }
}
