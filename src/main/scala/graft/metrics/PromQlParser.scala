package graft.metrics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PromQL front-end for the engine's query service (P14): parses a
  * practical PromQL subset and compiles it onto the [[PromQl]] DataFrame
  * transforms, so a user of the reference's Prometheus query path can run
  * their query STRINGS against the engine (the reference consumed
  * `query_range` pulls and PromQL exprs; `reference/CHANGELOG.md:10,90`).
  *
  * Supported grammar (instant-query evaluation at a fixed time T):
  * {{{
  *   expr     := agg | range | selector
  *   agg      := ('sum'|'avg'|'min'|'max'|'count') by? '(' expr ')' by?
  *             | 'topk' '(' INT ',' expr ')' by?
  *   by       := 'by' '(' label (',' label)* ')'
  *   range    := ('rate'|'increase'|'sum_over_time'|'avg_over_time'|
  *                'max_over_time'|'min_over_time'|'count_over_time')
  *               '(' selector '[' DURATION ']' ')'
  *   selector := metric matchers? | matchers
  *   matcher  := label ('='|'!='|'=~'|'!~') STRING
  * }}}
  *
  * Semantics follow Prometheus: the metric name selects on the source's
  * `metricCol`; regex matchers are fully anchored; a bare selector is an
  * instant vector with staleness lookback; range functions aggregate the
  * trailing window (T−w, T] per series, with [[PromQl.counterIncrease]]'s
  * reset rule inside `rate`/`increase`.
  *
  * Determinism contract (oracle-checkable outputs): every sum routes
  * through round-6 DECIMAL accumulation; `rate`/`avg` end in ONE double
  * division; `topk` requires explicit total-order tie-breaking on the
  * series key. All compiled plans are single-pass grouped aggregations or
  * windows keyed by the series key — the same shapes as the hand-built
  * q89–q97, so the 100 TB posture is inherited.
  */
object PromQlParser {

  /** Binding of a sample frame to the Prometheus data model. */
  final case class PromSource(df: DataFrame, metricCol: String,
                              seriesKey: Seq[String], tsCol: String,
                              orderCol: String, valueCol: String)

  // ---------- AST ----------
  sealed trait Ast
  final case class Matcher(label: String, op: String, value: String)
  final case class Selector(metric: Option[String], matchers: Seq[Matcher]) extends Ast
  final case class RangeFn(fn: String, sel: Selector, windowSec: Long) extends Ast
  final case class AggBy(fn: String, by: Seq[String], child: Ast) extends Ast
  final case class TopK(k: Int, by: Seq[String], child: Ast) extends Ast

  // ---------- Lexer ----------
  private sealed trait Tok
  private final case class Ident(s: String) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Num(n: Long) extends Tok
  private final case class Dur(seconds: Long) extends Tok
  private final case class Sym(s: String) extends Tok

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_' || c == ':') {
        val j = q.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_' || ch == ':'), i)
        val end = if (j < 0) q.length else j
        out += Ident(q.substring(i, end)); i = end
      } else if (c.isDigit) {
        val j = q.indexWhere(ch => !ch.isDigit, i)
        val end = if (j < 0) q.length else j
        val n = q.substring(i, end).toLong
        if (end < q.length && "smhd".contains(q(end))) {
          val mult = q(end) match {
            case 's' => 1L; case 'm' => 60L; case 'h' => 3600L; case 'd' => 86400L
          }
          out += Dur(n * mult); i = end + 1
        } else { out += Num(n); i = end }
      } else if (c == '"' || c == '\'') {
        val end = q.indexOf(c, i + 1)
        require(end > 0, s"unterminated string at $i in: $q")
        out += Str(q.substring(i + 1, end)); i = end + 1
      } else if (c == '!' || c == '=') {
        val two = q.substring(i, math.min(i + 2, q.length))
        if (two == "!=" || two == "=~" || two == "!~") { out += Sym(two); i += 2 }
        else { out += Sym("="); i += 1 }
      } else { out += Sym(c.toString); i += 1 }
    }
    out.result()
  }

  // ---------- Parser (recursive descent over the token list) ----------
  private final class P(var toks: List[Tok], query: String) {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PromQL parse error: $msg in: $query")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => fail("unexpected end of input")
    }
    def expect(sym: String): Unit = next() match {
      case Sym(`sym`) => ()
      case other => fail(s"expected '$sym', got $other")
    }

    private val aggFns = Set("sum", "avg", "min", "max", "count")
    private val rangeFns = Set("rate", "increase", "delta", "irate",
      "sum_over_time", "avg_over_time", "max_over_time", "min_over_time",
      "count_over_time")

    def parseExpr(): Ast = peek match {
      case Some(Ident("topk")) =>
        next(); expect("(")
        val k = next() match {
          case Num(n) => n.toInt
          case other => fail(s"topk expects an integer k, got $other")
        }
        expect(",")
        val child = parseExpr()
        expect(")")
        TopK(k, parseByOpt(), child)
      case Some(Ident(fn)) if aggFns(fn) && !selectorAhead =>
        next()
        val byBefore = parseByOpt()
        expect("(")
        val child = parseExpr()
        expect(")")
        val byAfter = parseByOpt()
        AggBy(fn, if (byBefore.nonEmpty) byBefore else byAfter, child)
      case Some(Ident(fn)) if rangeFns(fn) =>
        next(); expect("(")
        val sel = parseSelector()
        expect("[")
        val w = next() match {
          case Dur(s) => s
          case other => fail(s"expected a duration like 6h, got $other")
        }
        expect("]"); expect(")")
        RangeFn(fn, sel, w)
      case _ => parseSelector()
    }

    /** An aggregate keyword can also be a metric NAME (`sum{...}` is a
      * valid selector) — treat it as an aggregation only when followed by
      * '(' or 'by'. */
    private def selectorAhead: Boolean = toks match {
      case _ :: Sym("{") :: _ => true
      case _ :: Nil => true
      case _ => false
    }

    def parseByOpt(): Seq[String] = peek match {
      case Some(Ident("by")) =>
        next(); expect("(")
        val labels = Seq.newBuilder[String]
        var done = false
        while (!done) next() match {
          case Ident(l) => labels += l
            peek match {
              case Some(Sym(",")) => next()
              case Some(Sym(")")) => next(); done = true
              case other => fail(s"expected ',' or ')' in by-clause, got $other")
            }
          case other => fail(s"expected a label in by-clause, got $other")
        }
        labels.result()
      case _ => Seq.empty
    }

    def parseSelector(): Selector = {
      val metric = peek match {
        case Some(Ident(m)) => next(); Some(m)
        case _ => None
      }
      val matchers = peek match {
        case Some(Sym("{")) =>
          next()
          val ms = Seq.newBuilder[Matcher]
          var done = peek.contains(Sym("}"))
          if (done) next()
          while (!done) {
            val label = next() match {
              case Ident(l) => l
              case other => fail(s"expected a label name, got $other")
            }
            val op = next() match {
              case Sym(o) if Set("=", "!=", "=~", "!~")(o) => o
              case other => fail(s"expected a matcher operator, got $other")
            }
            val v = next() match {
              case Str(s) => s
              case other => fail(s"expected a quoted value, got $other")
            }
            ms += Matcher(label, op, v)
            next() match {
              case Sym(",") => ()
              case Sym("}") => done = true
              case other => fail(s"expected ',' or '}', got $other")
            }
          }
          ms.result()
        case _ => Seq.empty
      }
      if (metric.isEmpty && matchers.isEmpty) fail("empty selector")
      Selector(metric, matchers)
    }
  }

  def parse(query: String): Ast = {
    val p = new P(lex(query), query)
    val ast = p.parseExpr()
    if (p.toks.nonEmpty) p.fail(s"trailing tokens ${p.toks}")
    ast
  }

  // ---------- Compiler ----------
  private def decSum(c: Column): Column =
    sum(round(c, 6).cast("decimal(18,6)")).cast("double")

  private def matcherCond(src: PromSource, sel: Selector): Column = {
    val metricCond = sel.metric.map(m => col(src.metricCol) === lit(m))
    val ms = sel.matchers.map { m =>
      m.op match {
        case "="  => col(m.label) === lit(m.value)
        case "!=" => col(m.label) =!= lit(m.value)
        // Prometheus regex matchers are fully anchored
        case "=~" => col(m.label).cast("string").rlike(s"^(?:${m.value})$$")
        case "!~" => !col(m.label).cast("string").rlike(s"^(?:${m.value})$$")
      }
    }
    (metricCond.toSeq ++ ms).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Evaluate `query` as an instant query at `evalTs`. Returns a vector
    * frame: label columns + `value` (+ `rank` under topk). */
  def eval(src: PromSource, query: String, evalTs: String,
           lookback: String = "5 MINUTES"): DataFrame =
    compile(src, parse(query), evalTs, lookback)

  private def compile(src: PromSource, ast: Ast, evalTs: String,
                      lookback: String): DataFrame = ast match {
    case sel: Selector =>
      PromQl.instantVector(src.df.filter(matcherCond(src, sel)), src.seriesKey,
          src.tsCol, src.orderCol, evalTs, lookback)
        .select(src.seriesKey.map(col) :+ col(src.valueCol).as("value"): _*)

    case RangeFn(fn, sel, w) =>
      val t = to_timestamp(lit(evalTs))
      val inWindow = src.df.filter(matcherCond(src, sel))
        .filter(col(src.tsCol) <= t &&
          col(src.tsCol) > t - expr(s"INTERVAL $w SECONDS"))
      val keyCols = src.seriesKey.map(col)
      val v = col(src.valueCol)
      fn match {
        case "rate" | "increase" =>
          // reset-aware increase over the range window; rate normalizes
          // per second (counterIncrease emits 0 for the window's first
          // sample — Prometheus's no-extrapolation baseline)
          val inc = PromQl.counterIncrease(inWindow, src.seriesKey,
            src.tsCol, src.orderCol, src.valueCol)
          val total = decSum(col("inc"))
          inc.groupBy(keyCols: _*)
            .agg((if (fn == "rate") total / w.toDouble else total).as("value"))
        case "delta" =>
          // gauge delta: last − first sample in the window (baseline form,
          // no boundary extrapolation); series order is (ts, orderCol)
          val ord = struct(col(src.tsCol), col(src.orderCol))
          inWindow.groupBy(keyCols: _*)
            .agg((max_by(v, ord) - min_by(v, ord)).as("value"))
        case "irate" =>
          // instantaneous rate from the LAST TWO samples, reset-aware;
          // Δt in integer micros then one double division — both engines
          // compute the identical quotient
          val w2 = Window.partitionBy(keyCols: _*)
            .orderBy(col(src.tsCol).desc, col(src.orderCol).desc)
          inWindow.withColumn("__rn", row_number().over(w2))
            .filter(col("__rn") <= 2)
            .groupBy(keyCols: _*)
            .agg(
              max(when(col("__rn") === 1, v)).as("__v1"),
              max(when(col("__rn") === 2, v)).as("__v2"),
              max(when(col("__rn") === 1, unix_micros(col(src.tsCol)))).as("__t1"),
              max(when(col("__rn") === 2, unix_micros(col(src.tsCol)))).as("__t2"))
            .filter(col("__v2").isNotNull) // a lone sample has no rate
            .select(keyCols :+
              (when(col("__v1") < col("__v2"), col("__v1"))
                .otherwise(col("__v1") - col("__v2")) /
                ((col("__t1") - col("__t2")) / 1000000.0)).as("value"): _*)
        case "sum_over_time" =>
          inWindow.groupBy(keyCols: _*).agg(decSum(v).as("value"))
        case "count_over_time" =>
          inWindow.groupBy(keyCols: _*)
            .agg(count(lit(1)).cast("double").as("value"))
        case "avg_over_time" =>
          inWindow.groupBy(keyCols: _*)
            .agg((decSum(v) / count(lit(1))).as("value"))
        case "max_over_time" =>
          inWindow.groupBy(keyCols: _*).agg(max(v).as("value"))
        case "min_over_time" =>
          inWindow.groupBy(keyCols: _*).agg(min(v).as("value"))
      }

    case AggBy(fn, by, child) =>
      val vec = compile(src, child, evalTs, lookback)
      val gcols = by.map(col)
      val v = col("value")
      val agg = fn match {
        case "sum"   => decSum(v)
        case "avg"   => decSum(v) / count(lit(1))
        case "min"   => min(v)
        case "max"   => max(v)
        case "count" => count(lit(1)).cast("double")
      }
      if (by.isEmpty) vec.agg(agg.as("value"))
      else vec.groupBy(gcols: _*).agg(agg.as("value"))

    case TopK(k, by, child) =>
      val vec = compile(src, child, evalTs, lookback)
      // total order: ties on every non-value label column
      val tieCols = vec.columns.filterNot(c => c == "value" || by.contains(c)).toSeq
      PromQl.topk(vec, k, by, "value", tieCols)
  }
}
