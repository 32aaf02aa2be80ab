package graft.metrics

/** Prometheus `rule_files` loader — the declarative config face of the
  * rule-group engine (q135/q136/q239/q253 build groups from Scala
  * structures; this parses the real on-disk format a Prometheus operator
  * ships, closing the last config-format gap: the reference consumed
  * declarative config throughout, `/root/reference/pyproject.toml:26`).
  *
  * Format (upstream `model/rulefmt`): a YAML document
  *
  * {{{
  * groups:
  *   - name: example
  *     interval: 30s
  *     rules:
  *       - record: job:http_requests:rate5m
  *         expr: sum by (job) (rate(http_requests_total[5m]))
  *       - alert: HighErrorRate
  *         expr: rate(errors_total[5m]) > 0.5
  *         for: 10m
  *         keep_firing_for: 5m
  *         labels: { severity: page }   # (block form supported; flow is not)
  *         annotations:
  *           summary: high error rate
  * }}}
  *
  * The YAML parser is a deliberate SUBSET sufficient for rulefmt — block
  * maps and sequences, plain/single-/double-quoted scalars, `|` and `>`
  * block scalars, comments — and is STRICT the way promtool is: unknown
  * fields, tabs in indentation, duplicate keys, a rule with both `record`
  * and `alert`, a recording rule with `for`/`annotations`, and malformed
  * durations all throw. A config loader that guesses is how a typo'd
  * alert silently never fires.
  */
object RuleFiles {

  // ---- YAML subset -------------------------------------------------------

  sealed trait Node
  final case class YStr(s: String) extends Node
  final case class YMap(entries: Vector[(String, Node)]) extends Node
  final case class YSeq(items: Vector[Node]) extends Node

  private final case class Line(indent: Int, text: String, no: Int)

  private def fail(msg: String, lineNo: Int = -1): Nothing =
    throw new IllegalArgumentException(
      if (lineNo > 0) s"rule file line $lineNo: $msg" else s"rule file: $msg")

  /** Strip a trailing comment (a `#` outside quotes, preceded by start or
    * whitespace — the YAML rule) and right-trim. */
  private def stripComment(s: String): String = {
    var i = 0; var inS = false; var inD = false
    var cut = -1
    while (i < s.length && cut < 0) {
      val c = s.charAt(i)
      if (inD) { if (c == '\\') i += 1 else if (c == '"') inD = false }
      else if (inS) { if (c == '\'') inS = false }
      else c match {
        case '"' => inD = true
        case '\'' => inS = true
        case '#' if i == 0 || s.charAt(i - 1) == ' ' || s.charAt(i - 1) == '\t' =>
          cut = i
        case _ => ()
      }
      i += 1
    }
    (if (cut >= 0) s.substring(0, cut) else s).replaceAll("\\s+$", "")
  }

  private def scalar(raw: String, lineNo: Int): String = {
    val s = raw.trim
    if (s.length >= 2 && s.head == '"' && s.last == '"') {
      val b = new StringBuilder
      var i = 1
      while (i < s.length - 1) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length - 1) {
          s.charAt(i + 1) match {
            case 'n' => b += '\n'; case 't' => b += '\t'
            case '"' => b += '"'; case '\\' => b += '\\'
            case o => fail(s"unsupported escape \\$o", lineNo)
          }
          i += 2
        } else { b += c; i += 1 }
      }
      b.toString
    } else if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s
  }

  /** Parse a YAML-subset document into a [[Node]] tree. */
  def parseYaml(doc: String): Node = {
    val lines = doc.split("\n", -1).zipWithIndex.flatMap { case (l0, i) =>
      val l = stripComment(l0)
      if (l.trim.isEmpty || l.trim == "---") None
      else {
        val indent = l.takeWhile(_ == ' ').length
        if (l.lift(indent).contains('\t')) fail("tab in indentation", i + 1)
        Some(Line(indent, l.substring(indent), i + 1))
      }
    }.toVector
    if (lines.isEmpty) fail("empty document")
    val (node, rest) = parseBlock(lines, lines.head.indent)
    if (rest.nonEmpty) fail(s"unexpected de-dent", rest.head.no)
    node
  }

  /** `key:` splitter honoring quotes (a `:` inside quotes is content). */
  private def splitKey(text: String, lineNo: Int): Option[(String, String)] = {
    var i = 0; var inS = false; var inD = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inD) { if (c == '\\') i += 1 else if (c == '"') inD = false }
      else if (inS) { if (c == '\'') inS = false }
      else if (c == '"') inD = true
      else if (c == '\'') inS = true
      else if (c == ':' && (i + 1 == text.length || text.charAt(i + 1) == ' '))
        return Some((scalar(text.substring(0, i), lineNo),
          text.substring(math.min(i + 1, text.length)).trim))
      i += 1
    }
    None
  }

  /** Block scalar (`|` literal / `>` folded): consume the more-indented
    * lines that follow. Clip chomping (single logical block, no trailing
    * newline) — the subset rulefmt needs. */
  private def blockScalar(style: Char, rest: Vector[Line],
                          parentIndent: Int): (String, Vector[Line]) = {
    val body = rest.takeWhile(_.indent > parentIndent)
    if (body.isEmpty) ("", rest)
    else {
      val base = body.map(_.indent).min
      val parts = body.map(l => " " * (l.indent - base) + l.text)
      val joined = if (style == '|') parts.mkString("\n") else parts.mkString(" ")
      (joined, rest.drop(body.length))
    }
  }

  /** Parse one block (map or sequence) at exactly `indent`; returns the
    * node and the lines after the block. */
  private def parseBlock(lines: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    if (lines.isEmpty || lines.head.indent != indent)
      fail("internal: misaligned block", lines.headOption.map(_.no).getOrElse(-1))
    if (lines.head.text.startsWith("- ") || lines.head.text == "-") {
      // sequence of items at this indent
      var rest = lines
      var items = Vector.empty[Node]
      while (rest.nonEmpty && rest.head.indent == indent &&
             (rest.head.text.startsWith("- ") || rest.head.text == "-")) {
        val head = rest.head
        val inner = head.text.drop(2).trim
        if (inner.isEmpty) {
          val body = rest.tail.takeWhile(_.indent > indent)
          if (body.isEmpty) fail("empty sequence item", head.no)
          val (n, _) = parseBlock(body, body.head.indent)
          items :+= n
          rest = rest.tail.drop(body.length)
        } else {
          // inline start: the item content behaves as if indented at the
          // column where it begins (indent + 2)
          val virt = Line(indent + 2, inner, head.no)
          val body = virt +: rest.tail.takeWhile(_.indent > indent)
          val (n, leftover) = parseBlock(body, indent + 2)
          if (leftover.nonEmpty) fail("misindented item continuation", leftover.head.no)
          items :+= n
          rest = rest.tail.drop(body.length - 1)
        }
      }
      (YSeq(items), rest)
    } else {
      var rest = lines
      var entries = Vector.empty[(String, Node)]
      while (rest.nonEmpty && rest.head.indent == indent &&
             !rest.head.text.startsWith("- ")) {
        val head = rest.head
        splitKey(head.text, head.no) match {
          case None => fail(s"expected 'key:' got '${head.text}'", head.no)
          case Some((k, v)) =>
            if (entries.exists(_._1 == k)) fail(s"duplicate key '$k'", head.no)
            if (v.isEmpty) {
              val body = rest.tail.takeWhile(_.indent > indent)
              if (body.isEmpty) { entries :+= (k -> YStr("")); rest = rest.tail }
              else {
                val (n, _) = parseBlock(body, body.head.indent)
                entries :+= (k -> n)
                rest = rest.tail.drop(body.length)
              }
            } else if (v == "|" || v == ">") {
              val (s, after) = blockScalar(v.head, rest.tail, indent)
              entries :+= (k -> YStr(s))
              rest = after
            } else {
              entries :+= (k -> YStr(scalar(v, head.no)))
              rest = rest.tail
            }
        }
      }
      (YMap(entries), rest)
    }
  }

  // ---- rulefmt schema ----------------------------------------------------

  /** One parsed rule: exactly one of `record`/`alert` is set (validated). */
  final case class RuleDef(record: Option[String], alert: Option[String],
                           expr: String, forSec: Long, keepFiringSec: Long,
                           labels: Map[String, String],
                           annotations: Map[String, String])

  /** One parsed group: evaluation `interval` (None = the global default,
    * upstream 1m) and the rules in declaration order. */
  final case class GroupDef(name: String, intervalSec: Option[Long],
                            limit: Option[Int], rules: Seq[RuleDef]) {
    /** The alerting rules, in the existing engine structure. */
    def alertRules: Seq[AlertRules.Rule] = rules.collect {
      case r if r.alert.isDefined =>
        AlertRules.Rule(r.alert.get, r.expr, r.forSec, r.keepFiringSec)
    }
    /** The recording rules, in the existing engine structure. */
    def recordingRules: Seq[RuleGroup.Rule] = rules.collect {
      case r if r.record.isDefined => RuleGroup.Rule(r.record.get, r.expr)
    }
  }

  /** Prometheus `model.Duration`: ordered unit runs `y w d h m s ms`
    * (each at most once, strictly descending), or `0`. */
  def parseDuration(s: String): Long = {
    val t = s.trim
    if (t == "0") return 0L
    val re = "([0-9]+)(y|w|d|h|ms|m|s)".r
    val ms = re.findAllMatchIn(t).toVector
    if (ms.isEmpty || ms.map(_.matched).mkString != t)
      fail(s"invalid duration '$s'")
    val unitSec = Map("y" -> 31536000L, "w" -> 604800L, "d" -> 86400L,
      "h" -> 3600L, "m" -> 60L, "s" -> 1L)
    val order = Vector("y", "w", "d", "h", "m", "s", "ms")
    var lastIdx = -1
    var total = 0L
    ms.foreach { m =>
      val u = m.group(2)
      val idx = order.indexOf(u)
      if (idx <= lastIdx) fail(s"invalid duration '$s' (unit order)")
      lastIdx = idx
      if (u == "ms") {
        val v = m.group(1).toLong
        if (v % 1000 != 0) fail(s"sub-second duration '$s' unsupported (second-granular grid)")
        total += v / 1000
      } else total += m.group(1).toLong * unitSec(u)
    }
    total
  }

  private def asMap(n: Node, what: String): Vector[(String, Node)] = n match {
    case YMap(e) => e
    case _ => fail(s"$what must be a mapping")
  }
  private def asStr(n: Node, what: String): String = n match {
    case YStr(s) => s
    case _ => fail(s"$what must be a scalar")
  }
  private def strMap(n: Node, what: String): Map[String, String] =
    asMap(n, what).map { case (k, v) => k -> asStr(v, s"$what.$k") }.toMap

  /** Load a rule file: parse + validate, upstream promtool discipline. */
  def load(yaml: String): Seq[GroupDef] = {
    val top = asMap(parseYaml(yaml), "document")
    top.foreach { case (k, _) =>
      if (k != "groups") fail(s"unknown top-level field '$k'")
    }
    val groupsNode = top.collectFirst { case ("groups", n) => n }
      .getOrElse(fail("missing 'groups'"))
    val groups = groupsNode match {
      case YSeq(items) => items
      case _ => fail("'groups' must be a list")
    }
    val out = groups.map { g =>
      val m = asMap(g, "group")
      var name: Option[String] = None
      var interval: Option[Long] = None
      var limit: Option[Int] = None
      var rules: Seq[RuleDef] = Nil
      m.foreach {
        case ("name", v) => name = Some(asStr(v, "name"))
        case ("interval", v) => interval = Some(parseDuration(asStr(v, "interval")))
        case ("limit", v) => limit = Some(asStr(v, "limit").toInt)
        case ("rules", YSeq(items)) => rules = items.map(parseRule)
        case ("rules", _) => fail("'rules' must be a list")
        // accepted-and-ignored upstream extensions would go here; promtool
        // rejects unknowns, so we do too
        case (k, _) => fail(s"unknown group field '$k'")
      }
      GroupDef(name.getOrElse(fail("group missing 'name'")), interval, limit, rules)
    }
    val dup = out.groupBy(_.name).collectFirst { case (n, gs) if gs.size > 1 => n }
    dup.foreach(n => fail(s"duplicate group name '$n'"))
    out
  }

  private def parseRule(n: Node): RuleDef = {
    val m = asMap(n, "rule")
    var record: Option[String] = None
    var alert: Option[String] = None
    var expr: Option[String] = None
    var forSec = 0L
    var keep = 0L
    var labels = Map.empty[String, String]
    var ann = Map.empty[String, String]
    m.foreach {
      case ("record", v) => record = Some(asStr(v, "record"))
      case ("alert", v) => alert = Some(asStr(v, "alert"))
      case ("expr", v) => expr = Some(asStr(v, "expr"))
      case ("for", v) => forSec = parseDuration(asStr(v, "for"))
      case ("keep_firing_for", v) => keep = parseDuration(asStr(v, "keep_firing_for"))
      case ("labels", v) => labels = strMap(v, "labels")
      case ("annotations", v) => ann = strMap(v, "annotations")
      case (k, _) => fail(s"unknown rule field '$k'")
    }
    (record, alert) match {
      case (Some(_), Some(_)) => fail("rule has both 'record' and 'alert'")
      case (None, None) => fail("rule needs 'record' or 'alert'")
      case _ => ()
    }
    val e = expr.getOrElse(fail("rule missing 'expr'"))
    // the expr must PARSE — promtool type-checks every expression
    try PromQlParser.parse(e)
    catch { case ex: Exception => fail(s"bad expr '$e': ${ex.getMessage}") }
    if (record.isDefined) {
      if (forSec != 0 || keep != 0) fail("recording rule cannot have 'for'/'keep_firing_for'")
      if (ann.nonEmpty) fail("recording rule cannot have 'annotations'")
      if (!record.get.matches("[a-zA-Z_:][a-zA-Z0-9_:]*"))
        fail(s"invalid recording rule name '${record.get}'")
    }
    RuleDef(record, alert, e, forSec, keep, labels, ann)
  }
}
