package graft.metrics

import graft.metrics.PromQlParser._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Parser round-trip property: for every generatable AST,
  * `parse(print(ast)) == ast`. This mechanically pins operator
  * precedence, modifier binding (`bool`, `on`/`ignoring`,
  * `group_left`/`group_right` copy lists, `by`/`without`, `offset`),
  * duration lexing, unary-sign folding, and the subquery suffix — the
  * grammar corners a hand-written example suite samples thinly.
  *
  * The printer is the PRODUCTION `PromQlFormat.format` (the
  * `/api/v1/format_query` body), so the property also certifies the
  * endpoint: it parenthesizes every binary operand and prints an explicit
  * `group_left ()` for an empty copy list (a '(' after the keyword is
  * ALWAYS the label list, so a parenthesized rhs would otherwise bind
  * as copy labels — the parser's documented Prometheus-matching rule).
  */
class PromQlRoundTripSpec extends AnyFunSuite {

  // The printer under test IS the production one — the format_query body.
  private def print(ast: Ast): String = PromQlFormat.format(ast)

  // ---------- generators ----------
  private val labels = Gen.oneOf("job", "env", "pod", "zone")
  // matcher positions additionally cover "host zone": a UTF-8 label name
  // (3.x) that must round-trip through the quoted form (by/on lists keep
  // legacy-charset labels — the engine quotes only inside braces)
  private val matcherLabels = Gen.oneOf("job", "env", "pod", "zone", "host zone")
  // "http.requests" (UTF-8 name, 3.x) round-trips quoted-in-braces
  private val metrics = Gen.oneOf("cpu", "mem", "http_requests_total",
    "http.requests")
  private val durations = Gen.oneOf(60L, 300L, 3600L)
  private val scalars = Gen.oneOf(0.5, 2.0, 100.0, -3.5)
  private val phis = Gen.oneOf(0.5, 0.9, 0.99)

  private val genMatcher: Gen[Matcher] = for {
    l <- matcherLabels
    op <- Gen.oneOf("=", "!=", "=~", "!~")
    v <- Gen.oneOf("prod", "a.c", "x1")
  } yield Matcher(l, op, v)

  private val genSelector: Gen[Selector] = for {
    metric <- Gen.option(metrics)
    n <- Gen.choose(if (metric.isEmpty) 1 else 0, 2)
    ms <- Gen.listOfN(n, genMatcher)
    off <- Gen.oneOf(0L, 60L, -3600L) // negative = Grafana timeshift form
    at <- Gen.frequency(6 -> Gen.const(Option.empty[At]),
      2 -> Gen.const(Some(AtTs(1705316400L)): Option[At]),
      1 -> Gen.const(Some(AtStart): Option[At]),
      1 -> Gen.const(Some(AtEnd): Option[At]))
  } yield Selector(metric, ms.distinctBy(_.label), off, at)

  private val overTime = Gen.oneOf("sum_over_time", "avg_over_time",
    "max_over_time", "min_over_time", "count_over_time", "last_over_time",
    "present_over_time", "stddev_over_time", "stdvar_over_time",
    "mad_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
    "ts_of_last_over_time")

  private val genRangeFn: Gen[Ast] = for {
    kind <- Gen.choose(0, 3)
    fn <- kind match {
      case 0 => Gen.oneOf("rate", "increase", "delta", "irate", "idelta",
        "deriv", "resets", "changes", "absent_over_time")
      case _ => overTime
    }
    sel <- genSelector
    w <- durations
  } yield RangeFn(fn, sel, w)

  private val genHoltWinters: Gen[Ast] = for {
    sel <- genSelector; w <- durations
    sf <- Gen.oneOf(0.1, 0.5); tf <- Gen.oneOf(0.25, 0.75)
  } yield RangeFn("holt_winters", sel, w, Some(sf), Some(tf))

  private val genQuantOverTime: Gen[Ast] = for {
    phi <- phis; sel <- genSelector; w <- durations
  } yield RangeFn("quantile_over_time", sel, w, Some(phi))

  private val genPredict: Gen[Ast] = for {
    sel <- genSelector; w <- durations; h <- Gen.oneOf(600.0, 3600.0)
  } yield RangeFn("predict_linear", sel, w, Some(h))

  private def genAst(depth: Int): Gen[Ast] =
    if (depth <= 0)
      Gen.oneOf(genSelector, genRangeFn, genQuantOverTime, genPredict,
        genHoltWinters)
    else Gen.frequency(
      3 -> genSelector,
      3 -> genRangeFn,
      1 -> genQuantOverTime,
      1 -> genPredict,
      1 -> genHoltWinters,
      1 -> genAst(depth - 1).map(c => SortFn(desc = true, c)),
      1 -> genAst(depth - 1).map(c => SortFn(desc = false, c)),
      1 -> (for {
        desc <- Gen.oneOf(true, false)
        ls <- Gen.listOfN(2, labels).map(_.distinct)
        child <- genAst(depth - 1)
      } yield SortFn(desc, child, ls)),
      1 -> (for {
        k <- Gen.choose(1, 5)
        by <- Gen.oneOf(Seq.empty[String], Seq("job"))
        child <- genAst(depth - 1)
      } yield LimitK(k, by, child)),
      1 -> (for {
        r <- Gen.oneOf(0.25, 0.5, -0.75, 1.0)
        child <- genAst(depth - 1)
      } yield LimitRatio(r, child)),
      1 -> (for {
        child <- genAst(depth - 1)
        ms <- Gen.frequency(1 -> Gen.const(Seq.empty[Matcher]),
          2 -> Gen.listOfN(1, genMatcher))
      } yield InfoFn(child, ms)),
      1 -> (for {
        fn <- Gen.oneOf("count", "sum", "avg", "stddev", "stdvar")
        child <- Gen.frequency(2 -> (genSelector: Gen[Ast]),
          1 -> genRangeFn)
      } yield HistFn(fn, child)),
      1 -> (for {
        lo <- Gen.oneOf(-2.5, 0.0, 1.0)
        hi <- Gen.oneOf(10.0, 100.0)
        child <- genSelector
      } yield HistFn("fraction", child, Some(lo), Some(hi))),
      1 -> genAst(depth - 1).map(ScalarFn(_)),
      1 -> Gen.frequency(2 -> scalars.map(v => ScalarLit(v): Ast),
        1 -> Gen.const(TimeFn: Ast),
        1 -> genAst(depth - 1).map(c => ScalarFn(c): Ast)).map(VectorFn(_)),
      1 -> (for {
        fn <- Gen.oneOf("minute", "hour", "day_of_week", "day_of_month",
          "day_of_year", "days_in_month", "month", "year")
        child <- Gen.frequency(1 -> Gen.const(Option.empty[Ast]),
          1 -> genAst(depth - 1).map(Some(_): Option[Ast]))
      } yield TimeComp(fn, child)),
      2 -> (for {
        fn <- Gen.oneOf("sum", "avg", "min", "max", "count", "stddev",
          "stdvar", "group")
        by <- Gen.listOfN(2, labels).map(_.distinct)
        without <- Gen.oneOf(true, false)
        child <- genAst(depth - 1)
      } yield AggBy(fn, by, child, without)),
      1 -> (for {
        phi <- phis
        by <- Gen.listOfN(1, labels)
        child <- genAst(depth - 1)
      } yield AggQuantile(phi, by, child)),
      1 -> (for {
        k <- Gen.choose(1, 5)
        by <- Gen.listOfN(1, labels)
        bottom <- Gen.oneOf(true, false)
        child <- genAst(depth - 1)
      } yield TopK(k, by, child, bottom)),
      3 -> (for {
        arith <- Gen.oneOf("+", "-", "*", "/", "%", "^", "atan2")
        cmp <- Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
        set <- Gen.oneOf("and", "or", "unless")
        kind <- Gen.choose(0, 2)
        op = kind match { case 0 => arith; case 1 => cmp; case 2 => set }
        bool <- if (kind == 1) Gen.oneOf(true, false) else Gen.const(false)
        m <- Gen.option(for {
          isOn <- Gen.oneOf(true, false)
          ls <- Gen.listOfN(2, labels).map(_.distinct)
        } yield (isOn, ls))
        // group modifiers require an explicit matching clause and apply
        // to arithmetic/comparison only (the parser attaches them there)
        g <- if (kind != 2 && m.isDefined)
          Gen.option(for {
            left <- Gen.oneOf(true, false)
            copy <- Gen.listOfN(1, Gen.oneOf("tier", "team")).map(_.distinct)
            empty <- Gen.oneOf(true, false)
          } yield Grp(left, if (empty) Nil else copy))
        else Gen.const(None)
        lhs <- Gen.frequency(4 -> genAst(depth - 1), 1 -> scalars.map(ScalarLit),
          1 -> Gen.const(TimeFn))
        rhs <- Gen.frequency(4 -> genAst(depth - 1), 1 -> scalars.map(ScalarLit),
          1 -> Gen.const(TimeFn))
      } yield ((op, lhs, rhs) match {
        // the parser FOLDS arithmetic on two scalar literals (no
        // matching clause) to one literal — keep the tree foldless so
        // parse(print(ast)) stays structural identity
        case ("+" | "-" | "*" | "/" | "%" | "^" | "atan2",
              ScalarLit(_), ScalarLit(_)) if m.isEmpty =>
          BinOp(op, lhs, TimeFn, m, g, bool)
        case _ => BinOp(op, lhs, rhs, m, g, bool)
      })),
      1 -> genAst(depth - 1).map(HistQuantile(0.9, _)),
      2 -> (for {
        fn <- Gen.oneOf("abs", "ceil", "floor", "sqrt", "exp", "sgn",
          "sin", "cos", "tan", "atan", "sinh", "cosh", "tanh",
          "asin", "acos", "acosh", "asinh", "atanh", "deg", "rad")
        child <- genAst(depth - 1)
      } yield VecFn(fn, child)),
      1 -> (for {
        child <- genAst(depth - 1)
        args <- Gen.oneOf(Seq(0.5), Seq(2.0, 8.0))
        fn = if (args.size == 2) "clamp" else "round"
      } yield VecFn(fn, child, args)),
      1 -> (for {
        child <- genAst(depth - 1)
        dst <- Gen.oneOf("kind", "grp")
        src <- labels
      } yield LabelFn("label_replace", child, dst, "$1", Seq(src), "(a)_.*")),
      1 -> (for {
        child <- genAst(depth - 1)
        dst <- Gen.oneOf("series", "joined")
        srcs <- Gen.listOfN(2, labels).map(_.distinct)
      } yield LabelFn("label_join", child, dst, "|", srcs)),
      1 -> genSelector.map(Absent(_)),
      1 -> genSelector.map(TimestampFn(_)),
      1 -> (for {
        label <- Gen.oneOf("val", "bucket")
        by <- Gen.listOfN(1, labels)
        without <- Gen.oneOf(true, false)
        child <- genAst(depth - 1)
      } yield CountValues(label, by, child, without)),
      1 -> (for {
        fn <- overTime
        child <- genAst(depth - 1)
        r <- Gen.oneOf(3600L, 7200L)
        st <- Gen.oneOf(300L, 600L)
        off <- Gen.oneOf(0L, 1800L, -3600L) // subquery offset, incl. negative
        at <- Gen.oneOf(None, Some(PromQlParser.AtTs(1704103200L)),
          Some(PromQlParser.AtStart), Some(PromQlParser.AtEnd))
      } yield RangeSub(fn, Subquery(child, r, st, off, at))))

  test("compound duration formatting: largest-exact-unit decomposition") {
    assert(PromQlFormat.durS(0) == "0s")
    assert(PromQlFormat.durS(60) == "1m")
    assert(PromQlFormat.durS(3900) == "1h5m")
    assert(PromQlFormat.durS(694861) == "1w1d1h1m1s")
    assert(parse(s"rate(cpu[${PromQlFormat.durS(3900)}])") ==
      RangeFn("rate", Selector(Some("cpu"), Nil), 3900))
  }

  test("parse(print(ast)) == ast for 500 random ASTs") {
    val prop = Prop.forAll(genAst(3)) { ast =>
      val printed = print(ast)
      val reparsed =
        try parse(printed)
        catch {
          case e: Throwable =>
            fail(s"failed to parse [$printed] from $ast: ${e.getMessage}")
        }
      if (reparsed != ast)
        fail(s"round-trip mismatch:\n  printed: $printed\n  from:    $ast\n  got:     $reparsed")
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
