package graft.metrics

import graft.metrics.PromQlParser._

/** Canonical PromQL printer — the engine's `/api/v1/format_query` body
  * (the Prometheus prettifier endpoint, stable since 2.46) and the
  * production half of the parser round-trip property
  * (`parse(format(ast)) == ast`, PromQlRoundTripSpec). The canonical
  * form parenthesizes every binary operand and prints an explicit
  * `group_left ()` for an empty copy list (a '(' straight after the
  * keyword always binds as the label list — the parser's documented
  * Prometheus-matching rule), so the output re-parses unambiguously
  * regardless of operator precedence in the original. */
object PromQlFormat {

  /** Parse, then print canonically — the format_query contract. */
  def format(query: String): String = format(parse(query))

  /** Largest-exact-unit duration: 3900 → "1h5m", 45 → "45s", 0 → "0s". */
  def durS(sec: Long): String =
    if (sec == 0) "0s"
    else {
      val units = Seq("w" -> 604800L, "d" -> 86400L, "h" -> 3600L,
        "m" -> 60L, "s" -> 1L)
      val sb = new StringBuilder
      var rest = sec
      for ((u, span) <- units) {
        val n = rest / span
        if (n > 0) { sb.append(n).append(u); rest -= n * span }
      }
      sb.toString
    }

  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""

  private def num(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Legacy-charset names print bare; anything else (UTF-8 names,
    * Prometheus 3.x) prints as a quoted string inside the braces. */
  private def bareName(n: String): Boolean =
    n.nonEmpty && (n.head.isLetter || n.head == '_' || n.head == ':') &&
      n.forall(c => c.isLetterOrDigit || c == '_' || c == ':')

  /** by/without/on/ignoring label list, quoting UTF-8 names (3.x). */
  private def labelList(ls: Seq[String]): String =
    ls.map(l => if (bareName(l)) l else str(l)).mkString(", ")

  private def formatSel(s: Selector): String = {
    val quotedMetric = s.metric.filterNot(bareName)
    val items = quotedMetric.map(str).toSeq ++
      s.matchers.map(m =>
        s"${if (bareName(m.label)) m.label else str(m.label)}${m.op}${str(m.value)}")
    val ms = if (items.isEmpty) "" else items.mkString("{", ", ", "}")
    val at = s.at.map {
      case AtTs(a) => s" @ $a"
      case AtStart => " @ start()"
      case AtEnd   => " @ end()"
    }.getOrElse("")
    val off =
      if (s.offsetSec == 0) ""
      else if (s.offsetSec < 0) s" offset -${durS(-s.offsetSec)}"
      else s" offset ${durS(s.offsetSec)}"
    s"${s.metric.filter(bareName).getOrElse("")}$ms$at$off"
  }

  private def formatMatching(m: Option[(Boolean, Seq[String])],
                             g: Option[Grp]): String = {
    val mm = m.map { case (isOn, ls) =>
      s"${if (isOn) "on" else "ignoring"} (${labelList(ls)}) "
    }.getOrElse("")
    val gg = g.map { grp =>
      s"${if (grp.left) "group_left" else "group_right"} (${labelList(grp.copy)}) "
    }.getOrElse("")
    mm + gg
  }

  def format(ast: Ast): String = ast match {
    case s: Selector => formatSel(s)
    case ScalarLit(v) => if (v < 0) s"($v)" else v.toString
    case TimeFn => "time()"
    case RangeVec(sel, w, None) => s"${formatSel(sel)}[${durS(w)}]"
    case RangeVec(sel, w, Some(m)) => s"${formatSel(sel)}[${durS(w)}] $m"
    case ExtRange(m, fn, sel, w) =>
      s"$fn(${formatSel(sel)}[${durS(w)}] $m)"
    case RangeFn("holt_winters", sel, w, Some(sf), Some(tf)) =>
      s"holt_winters(${formatSel(sel)}[${durS(w)}], $sf, $tf)"
    case RangeFn("predict_linear", sel, w, Some(p), None) =>
      s"predict_linear(${formatSel(sel)}[${durS(w)}], ${num(p)})"
    case RangeFn(fn, sel, w, Some(p), None) =>
      s"$fn($p, ${formatSel(sel)}[${durS(w)}])"
    case RangeFn(fn, sel, w, _, _) => s"$fn(${formatSel(sel)}[${durS(w)}])"
    case SortFn(desc, child, Nil) =>
      s"${if (desc) "sort_desc" else "sort"}(${format(child)})"
    case SortFn(desc, child, ls) =>
      val fn = if (desc) "sort_by_label_desc" else "sort_by_label"
      s"$fn(${format(child)}, ${ls.map(str).mkString(", ")})"
    case LimitK(k, by, child) =>
      val tail = if (by.isEmpty) "" else s" by (${labelList(by)})"
      s"limitk($k, ${format(child)})$tail"
    case LimitRatio(r, child) => s"limit_ratio($r, ${format(child)})"
    case InfoFn(child, Nil) => s"info(${format(child)})"
    case InfoFn(child, ms) =>
      val sel = ms.map(m =>
          s"${if (bareName(m.label)) m.label else str(m.label)}${m.op}${str(m.value)}")
        .mkString("{", ", ", "}")
      s"info(${format(child)}, $sel)"
    case ScalarFn(child) => s"scalar(${format(child)})"
    case VectorFn(child) => s"vector(${format(child)})"
    case TimeComp(fn, child) => s"$fn(${child.map(format).getOrElse("")})"
    case AggBy(fn, by, child, without) =>
      val kw = if (without) "without" else "by"
      s"$fn $kw (${labelList(by)}) (${format(child)})"
    case AggQuantile(phi, by, child, without) =>
      val kw = if (without) "without" else "by"
      s"quantile $kw (${labelList(by)}) ($phi, ${format(child)})"
    case TopK(k, by, child, bottom) =>
      val fn = if (bottom) "bottomk" else "topk"
      val tail = if (by.isEmpty) "" else s" by (${labelList(by)})"
      s"$fn($k, ${format(child)})$tail"
    case BinOp(op, lhs, rhs, m, g, bool) =>
      val b = if (bool) "bool " else ""
      s"(${format(lhs)}) $op $b${formatMatching(m, g)}(${format(rhs)})"
    case HistQuantile(q, child) => s"histogram_quantile($q, ${format(child)})"
    case HistFn("fraction", child, Some(lo), Some(hi)) =>
      s"histogram_fraction(${num(lo)}, ${num(hi)}, ${format(child)})"
    case HistFn(fn, child, _, _) => s"histogram_$fn(${format(child)})"
    case VecFn(fn, child, Nil) => s"$fn(${format(child)})"
    case VecFn(fn, child, args) =>
      s"$fn(${format(child)}, ${args.map(num).mkString(", ")})"
    case LabelFn("label_replace", child, dst, repl, srcs, regex) =>
      s"label_replace(${format(child)}, ${str(dst)}, ${str(repl)}, " +
        s"${str(srcs.head)}, ${str(regex)})"
    case LabelFn(fn, child, dst, sep, srcs, _) =>
      s"$fn(${format(child)}, ${str(dst)}, ${str(sep)}, " +
        srcs.map(str).mkString(", ") + ")"
    case Absent(sel) => s"absent(${formatSel(sel)})"
    case TimestampFn(sel) => s"timestamp(${formatSel(sel)})"
    case CountValues(label, by, child, without) =>
      val kw = if (without) "without" else "by"
      s"count_values $kw (${by.mkString(", ")}) (${str(label)}, ${format(child)})"
    case Subquery(child, r, st, off, at) =>
      val atS = at.map {
        case AtTs(a) => s" @ $a"
        case AtStart => " @ start()"
        case AtEnd   => " @ end()"
      }.getOrElse("")
      val offS =
        if (off == 0) ""
        else if (off < 0) s" offset -${durS(-off)}"
        else s" offset ${durS(off)}"
      s"(${format(child)})[${durS(r)}:${durS(st)}]$atS$offS"
    case RangeSub(fn, sub, None) => s"$fn(${format(sub)})"
    case RangeSub(fn, sub, Some(p)) => s"$fn($p, ${format(sub)})"
  }
}
