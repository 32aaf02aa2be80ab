package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus `relabel_configs` — the scrape/remote-write label rewrite
  * pipeline (prometheus/model/relabel/relabel.go), re-expressed as pure
  * column transformations so a rule chain compiles into ONE projection +
  * filter per action (all codegen'd; no UDFs, no row callbacks).
  *
  * Semantics follow upstream exactly:
  *  - the working value of a rule is `source_labels` joined by
  *    `separator` (default ";"), with an absent/null label contributing
  *    the empty string;
  *  - `regex` is FULLY ANCHORED (`^(?:re)$`), as upstream compiles it;
  *  - `replace` assigns `replacement` (with `$1`… group refs) to
  *    `target_label` ONLY when the regex matches — otherwise the rule is
  *    a no-op for that row (the target keeps its previous value);
  *  - `keep` / `drop` filter rows (a dropped scrape target / series);
  *  - `keepequal` / `dropequal` (2.41+) compare the concatenated source
  *    against the CURRENT value of `target_label`;
  *  - `lowercase` / `uppercase` (2.36+) write the case-mapped
  *    concatenated source into `target_label` unconditionally;
  *  - `hashmod` writes `sum64(md5(value)) % modulus` — upstream's
  *    `sum64` shifts byte i by `(16-i-1)*8` bits into a uint64, which
  *    zeroes the first eight md5 bytes (Go shifts ≥64 yield 0), so the
  *    value is the LAST EIGHT md5 bytes as a big-endian unsigned 64-bit
  *    integer. Replicated exactly via hex → decimal(20,0) → pmod, which
  *    also keeps the oracle twin a pure SQL expression;
  *  - `labelmap` / `labeldrop` / `labelkeep` act on label NAMES — with a
  *    fixed relational schema these resolve at PLAN TIME to column
  *    renames/drops (the schema is the label set), not row work.
  *
  * Scale: every action is map-side (no shuffle, no driver state); a
  * 20-rule chain is one WholeStageCodegen span over the scan.
  */
object Relabel {

  /** One relabel rule; defaults mirror the upstream config defaults. */
  final case class Rule(action: String,
                        sourceLabels: Seq[String] = Nil,
                        separator: String = ";",
                        regex: String = "(.*)",
                        targetLabel: String = "",
                        replacement: String = "$1",
                        modulus: Long = 0L)

  private def anchored(re: String): String = s"^(?:$re)$$"

  /** The rule's working value: source labels joined by the separator,
    * null labels contributing "" (upstream: absent label = empty). */
  private def joined(r: Rule): Column =
    concat_ws(r.separator,
      r.sourceLabels.map(l => coalesce(col(l).cast("string"), lit(""))): _*)

  /** upstream sum64(md5(v)) % modulus: last 8 md5 bytes as big-endian
    * uint64 — hex chars 17..32 of the digest, via decimal(20,0) since
    * the unsigned range overflows LongType. */
  private def hashmod(v: Column, modulus: Long): Column =
    pmod(conv(substring(md5(v), 17, 16), 16, 10).cast("decimal(20,0)"),
      lit(modulus).cast("decimal(20,0)")).cast("long")

  /** Apply one rule to a frame whose label columns ARE its columns.
    * Filter actions return a filtered frame; value actions return a
    * frame with `target_label` written (added if absent). */
  def applyRule(df: DataFrame, r: Rule): DataFrame = r.action match {
    case "keep" => df.filter(joined(r).rlike(anchored(r.regex)))
    case "drop" => df.filter(!joined(r).rlike(anchored(r.regex)))
    case "keepequal" =>
      df.filter(joined(r) === coalesce(col(r.targetLabel).cast("string"), lit("")))
    case "dropequal" =>
      df.filter(joined(r) =!= coalesce(col(r.targetLabel).cast("string"), lit("")))
    case "replace" =>
      val v = joined(r)
      val prev: Column =
        if (df.columns.contains(r.targetLabel)) col(r.targetLabel).cast("string")
        else lit(null).cast("string")
      df.withColumn(r.targetLabel,
        when(v.rlike(anchored(r.regex)),
          regexp_replace(v, anchored(r.regex), r.replacement))
          .otherwise(prev))
    case "lowercase" => df.withColumn(r.targetLabel, lower(joined(r)))
    case "uppercase" => df.withColumn(r.targetLabel, upper(joined(r)))
    case "hashmod" =>
      require(r.modulus > 0, "hashmod needs a positive modulus")
      df.withColumn(r.targetLabel, hashmod(joined(r), r.modulus))
    case "labeldrop" =>
      df.drop(df.columns.filter(_.matches(anchored(r.regex))): _*)
    case "labelkeep" =>
      df.select(df.columns.filter(_.matches(anchored(r.regex))).map(col): _*)
    case "labelmap" =>
      // copy each matching label to the replacement-expanded name
      df.columns.filter(_.matches(anchored(r.regex))).foldLeft(df) { (d, c) =>
        d.withColumn(c.replaceAll(anchored(r.regex), r.replacement), col(c))
      }
    case other =>
      throw new IllegalArgumentException(s"unknown relabel action: $other")
  }

  /** Apply a rule chain in order (upstream processes rules serially;
    * later rules see earlier rules' writes). */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df)(applyRule)
}
