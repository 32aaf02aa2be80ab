package graft.metrics

import PromQlParser._

/** `/api/v1/parse_query` (Prometheus 3.x experimental): the parsed AST
  * rendered as the upstream `translateAST` JSON shape — node `type`s
  * `vectorSelector` / `matrixSelector` / `call` / `aggregation` /
  * `binaryExpr` / `subquery` / `numberLiteral` / `stringLiteral`,
  * durations and offsets in MILLISECONDS, `timestamp` the `@` pin (ms)
  * and `startOrEnd` its start()/end() form, matchers carrying an
  * explicit `__name__` matcher like upstream. Documented divergences:
  * `matrixSelector` flattens the selector fields (upstream does too),
  * and scalar parameters keep this engine's canonical argument order. */
object PromQlJson {

  private def esc(s: String): String = MetricsServer.jsonEscape(s)

  private def num(v: Double): String = {
    val s = if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString else v.toString
    s"""{"type":"numberLiteral","val":"$s"}"""
  }

  private def str(v: String): String =
    s"""{"type":"stringLiteral","val":"${esc(v)}"}"""

  private def matchers(sel: Selector): String = {
    val all = sel.metric.map(m => Matcher("__name__", "=", m)).toSeq ++
      sel.matchers
    all.map(m =>
      s"""{"name":"${esc(m.label)}","type":"${esc(m.op)}","value":"${esc(m.value)}"}""")
      .mkString("[", ",", "]")
  }

  private def atFields(at: Option[At], offsetSec: Long): String = {
    val ts = at match {
      case Some(AtTs(sec)) => (sec * 1000L).toString
      case _               => "null"
    }
    val soe = at match {
      case Some(AtStart) => "\"start\""
      case Some(AtEnd)   => "\"end\""
      case _             => "null"
    }
    s""""offset":${offsetSec * 1000L},"timestamp":$ts,"startOrEnd":$soe"""
  }

  private def vecSel(s: Selector): String =
    s"""{"type":"vectorSelector","name":"${esc(s.metric.getOrElse(""))}",""" +
      s""""matchers":${matchers(s)},${atFields(s.at, s.offsetSec)}}"""

  private def matSel(s: Selector, windowSec: Long): String =
    s"""{"type":"matrixSelector","name":"${esc(s.metric.getOrElse(""))}",""" +
      s""""matchers":${matchers(s)},"range":${windowSec * 1000L},""" +
      s"""${atFields(s.at, s.offsetSec)}}"""

  private def matSelMode(s: Selector, windowSec: Long, mode: String): String =
    s"""{"type":"matrixSelector","name":"${esc(s.metric.getOrElse(""))}",""" +
      s""""matchers":${matchers(s)},"range":${windowSec * 1000L},""" +
      s""""timeRangeMode":"${esc(mode)}",""" +
      s"""${atFields(s.at, s.offsetSec)}}"""

  private def call(fn: String, args: Seq[String]): String =
    s"""{"type":"call","func":{"name":"${esc(fn)}"},""" +
      s""""args":${args.mkString("[", ",", "]")}}"""

  private def aggregation(op: String, grouping: Seq[String], without: Boolean,
                          expr: String, param: Option[String]): String =
    s"""{"type":"aggregation","op":"${esc(op)}","expr":$expr,""" +
      s""""param":${param.getOrElse("null")},""" +
      s""""grouping":${grouping.map(g => "\"" + esc(g) + "\"").mkString("[", ",", "]")},""" +
      s""""without":$without}"""

  def json(a: Ast): String = a match {
    case s: Selector      => vecSel(s)
    case RangeVec(s, w, None) => matSel(s, w)
    case RangeVec(s, w, Some(m)) => matSelMode(s, w, m)
    // extended range selectors (3.5 experimental): the modifier rides the
    // matrix selector as `timeRangeMode` (SAMPLES-era absent = default)
    case ExtRange(m, fn, s, w) => call(fn, Seq(matSelMode(s, w, m)))
    case RangeFn(fn, s, w, p, p2) =>
      val ps = Seq(p, p2).flatten.map(num)
      fn match {
        case "quantile_over_time" => call(fn, ps :+ matSel(s, w))
        case _                    => call(fn, matSel(s, w) +: ps)
      }
    case Subquery(c, range, step, off, at) =>
      s"""{"type":"subquery","expr":${json(c)},"range":${range * 1000L},""" +
        s""""step":${step * 1000L},${atFields(at, off)}}"""
    case RangeSub(fn, sub, p) =>
      val ps = p.toSeq.map(num)
      fn match {
        case "quantile_over_time" => call(fn, ps :+ json(sub))
        case _                    => call(fn, json(sub) +: ps)
      }
    case AggBy(fn, by, c, without) => aggregation(fn, by, without, json(c), None)
    case TopK(k, by, c, bottom) =>
      aggregation(if (bottom) "bottomk" else "topk", by, without = false,
        json(c), Some(num(k.toDouble)))
    case AggQuantile(phi, by, c, without) =>
      aggregation("quantile", by, without, json(c), Some(num(phi)))
    case CountValues(label, by, c, without) =>
      aggregation("count_values", by, without, json(c), Some(str(label)))
    case LimitK(k, by, c) =>
      aggregation("limitk", by, without = false, json(c), Some(num(k.toDouble)))
    case LimitRatio(r, c) =>
      aggregation("limit_ratio", Nil, without = false, json(c), Some(num(r)))
    case VecFn(fn, c, args)  => call(fn, json(c) +: args.map(num))
    case SortFn(desc, c, by) =>
      if (by.isEmpty) call(if (desc) "sort_desc" else "sort", Seq(json(c)))
      else call(if (desc) "sort_by_label_desc" else "sort_by_label",
        json(c) +: by.map(str))
    case LabelFn(fn, c, dst, sepOrRepl, srcs, regex) =>
      val args = fn match {
        case "label_replace" =>
          Seq(json(c), str(dst), str(sepOrRepl), str(srcs.head), str(regex))
        case _ => Seq(json(c), str(dst), str(sepOrRepl)) ++ srcs.map(str)
      }
      call(fn, args)
    case HistQuantile(q, c) => call("histogram_quantile", Seq(num(q), json(c)))
    case HistFn(fn, c, lo, hi) =>
      call(s"histogram_$fn", (lo.toSeq ++ hi.toSeq).map(num) :+ json(c))
    case Absent(s)      => call("absent", Seq(vecSel(s)))
    case TimestampFn(s) => call("timestamp", Seq(vecSel(s)))
    case TimeComp(fn, c) => call(fn, c.toSeq.map(json))
    case ScalarFn(c)    => call("scalar", Seq(json(c)))
    case VectorFn(c)    => call("vector", Seq(json(c)))
    case InfoFn(c, dataSel) =>
      call("info", json(c) +: (if (dataSel.isEmpty) Nil
        else Seq(vecSel(Selector(None, dataSel)))))
    case BinOp(op, l, r, matching, group, bool) =>
      val card = group match {
        case Some(Grp(true, _))  => "many-to-one"
        case Some(Grp(false, _)) => "one-to-many"
        case None                => "one-to-one"
      }
      val (on, lbls) = matching.map { case (isOn, ls) => (isOn, ls) }
        .getOrElse((false, Nil))
      val include = group.map(_.copy).getOrElse(Nil)
      s"""{"type":"binaryExpr","op":"${esc(op)}","lhs":${json(l)},""" +
        s""""rhs":${json(r)},"matching":{"card":"$card",""" +
        s""""matchingLabels":${lbls.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")},""" +
        s""""on":$on,"include":${include.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")}},""" +
        s""""bool":$bool}"""
    case ScalarLit(v) => num(v)
    case TimeFn       => call("time", Nil)
  }

  def json(query: String): String = json(parse(query))
}
