package graft.metrics

import graft.metrics.Relabel.Rule
import org.scalatest.funsuite.AnyFunSuite

/** relabel_configs semantics vs upstream relabel.go: anchored regexes,
  * match-gated replace, serial rule visibility, label-name actions, and
  * the sum64(md5) hashmod rule. */
class RelabelSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("api-server", "prod", "10.0.0.1:9100"),
    ("api-server", "dev", "10.0.0.2:9100"),
    ("db", "prod", "10.0.0.3:5432")).toDF("job", "env", "__address__")

  test("replace writes only on match; regex is fully anchored") {
    val out = Relabel(df, Seq(
      Rule("replace", Seq("__address__"), regex = "([^:]+):.*",
        targetLabel = "host", replacement = "$1")))
      .select("host").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("10.0.0.1", "10.0.0.2", "10.0.0.3"))
    // anchoring: 'prod' must NOT match a bare 'pro' regex
    val keep = Relabel(df, Seq(Rule("keep", Seq("env"), regex = "pro")))
    assert(keep.count() == 0)
    // a non-matching replace keeps the previous value (no clobber)
    val noop = Relabel(df, Seq(
      Rule("replace", Seq("env"), regex = "nothing", targetLabel = "job",
        replacement = "X")))
    assert(noop.select("job").collect().map(_.getString(0)).toSet ==
      Set("api-server", "db"))
  }

  test("rules apply serially: later rules see earlier writes") {
    val out = Relabel(df, Seq(
      Rule("replace", Seq("job", "env"), separator = "-", regex = "(.*)",
        targetLabel = "combo", replacement = "$1"),
      Rule("keep", Seq("combo"), regex = "api-server-prod")))
    assert(out.count() == 1)
  }

  test("keepequal/dropequal compare the concatenated source to the target") {
    val d2 = Seq(("a", "a"), ("a", "b")).toDF("x", "y")
    assert(Relabel(d2, Seq(Rule("keepequal", Seq("x"), targetLabel = "y"))).count() == 1)
    assert(Relabel(d2, Seq(Rule("dropequal", Seq("x"), targetLabel = "y"))).count() == 1)
  }

  test("labelmap copies matching names; labeldrop/labelkeep prune the schema") {
    val mapped = Relabel(df, Seq(
      Rule("labelmap", regex = "__(.+)__", replacement = "meta_$1")))
    assert(mapped.columns.contains("meta_address") &&
      mapped.columns.contains("__address__"))
    val dropped = Relabel(df, Seq(Rule("labeldrop", regex = "__.*__")))
    assert(!dropped.columns.contains("__address__") && dropped.columns.length == 2)
    val kept = Relabel(df, Seq(Rule("labelkeep", regex = "job|env")))
    assert(kept.columns.toSeq.sorted == Seq("env", "job"))
  }

  test("hashmod is upstream's sum64(md5) % modulus — last 8 md5 bytes, unsigned") {
    // hand-check one value: md5("x") = 9dd4e461268c8034f5c8564e155c67a6
    // last 8 bytes f5c8564e155c67a6 = 17710930523889455014 (> Long.Max,
    // so the unsigned path matters); % 1000 = 14
    val one = Seq(Tuple1("x")).toDF("v")
    val r = Relabel(one, Seq(
      Rule("hashmod", Seq("v"), targetLabel = "m", modulus = 1000)))
      .select("m").collect().head.getLong(0)
    assert(r == java.math.BigInteger.valueOf(0)
      .add(new java.math.BigInteger("f5c8564e155c67a6", 16))
      .mod(java.math.BigInteger.valueOf(1000)).longValue())
    // shards are stable and within range
    val shards = Relabel(df, Seq(
      Rule("hashmod", Seq("job", "env"), targetLabel = "shard", modulus = 4)))
      .select("shard").collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 4))
  }

  test("lowercase/uppercase and unknown action") {
    val lc = Relabel(df, Seq(
      Rule("uppercase", Seq("job"), targetLabel = "JOB")))
      .select("JOB").collect().map(_.getString(0)).toSet
    assert(lc == Set("API-SERVER", "DB"))
    intercept[IllegalArgumentException](Relabel(df, Seq(Rule("bogus"))))
  }
}
