package graft.metrics

import graft.metrics.PromQlParser._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Query-frontend range splitting: split ≡ unsplit exactly (per-instant
  * independence), the data-extent walk is right on every stretching
  * construct, and the chunk pruning predicate reaches the parquet scan. */
class QueryFrontendSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private lazy val src = PromSource(
    graft.Tables.events(spark, graft.TestSpark.SF), "event_type",
    Seq("user_id", "event_type"), "ts", "event_id", "value")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertSplitEqDirect(q: String, lookback: Long = 300L): Unit = {
    val direct = PromQlParser.evalRange(src, q,
      "2024-01-14 00:00:00", "2024-01-15 00:00:00", 10800L, lookback)
    val split = QueryFrontend.evalRangeSplit(src, q,
      "2024-01-14 00:00:00", "2024-01-15 00:00:00", 10800L,
      splitSec = 21600L, lookbackSec = lookback)
    assert(rows(split) == rows(direct), s"split != direct for: $q")
  }

  test("split ≡ direct: rate + agg, instant selector, subquery, neg offset") {
    assertSplitEqDirect("sum without (user_id) (rate(purchase[6h]))")
    assertSplitEqDirect("""{event_type=~"click|view"}""", lookback = 7200L)
    assertSplitEqDirect("max_over_time(rate(purchase[6h])[6h:3h])")
    assertSplitEqDirect("sum without (user_id) (rate(purchase[6h] offset -1h))")
    assertSplitEqDirect("avg_over_time(login[3h]) + on(user_id, event_type) " +
      "avg_over_time(login[3h] offset 6h)")
  }

  test("split ≡ direct under @ (falls back to the unpruned source)") {
    assertSplitEqDirect("sum by (event_type) (rate(purchase[6h])) + " +
      "sum by (event_type) (rate(purchase[6h] @ end()))")
  }

  test("split interval not a multiple of step still partitions the instants") {
    // 7200s split vs 10800s step: chunks hold 0 or 1 instants each; the
    // absolute-alignment rule must still cover every instant exactly once.
    val q = "count without (user_id) (purchase)"
    val direct = PromQlParser.evalRange(src, q,
      "2024-01-14 01:00:00", "2024-01-14 23:00:00", 10800L)
    val split = QueryFrontend.evalRangeSplit(src, q,
      "2024-01-14 01:00:00", "2024-01-14 23:00:00", 10800L, splitSec = 10800L)
    assert(rows(split) == rows(direct))
  }

  test("data extent: windows, offsets, subqueries, @, binops") {
    def ext(q: String) = QueryFrontend.dataExtentSec(parse(q), 300L)
    assert(ext("cpu") == Some((300L, 0L)))
    assert(ext("rate(cpu[5m])") == Some((300L, 0L)))
    assert(ext("rate(cpu[1h] offset 2h)") == Some((10800L, 0L)))
    assert(ext("rate(cpu[1h] offset -2h)") == Some((0L, 7200L)))
    // subquery: range + inner extent; inner selector lookback rides on top
    assert(ext("max_over_time(rate(cpu[5m])[1h:5m])") == Some((3900L, 0L)))
    assert(ext("max_over_time(cpu[1h:5m] offset 30m)") == Some((5700L, 0L)))
    // binop takes the max per side and component
    assert(ext("rate(cpu[2h]) + rate(cpu[1h] offset -3h)") ==
      Some((7200L, 10800L)))
    // @ anywhere defeats pruning
    assert(ext("cpu @ 1705190400") == None)
    assert(ext("sum(rate(cpu[5m])) + sum(rate(cpu[5m] @ start()))") == None)
    // scalar-only subtrees reach nothing
    assert(ext("vector(1)") == Some((0L, 0L)))
  }

  private def assertShardedEqDirect(q: String, shards: Int): Unit = {
    val direct = PromQlParser.evalRange(src, q,
      "2024-01-14 00:00:00", "2024-01-15 00:00:00", 10800L)
    val sharded = QueryFrontend.evalRangeSharded(src, q,
      "2024-01-14 00:00:00", "2024-01-15 00:00:00", 10800L, shards)
    assert(rows(sharded) == rows(direct), s"sharded != direct for: $q")
  }

  test("sharded ≡ direct: sum/avg/count/min/max, incl. 1-shard identity") {
    assertShardedEqDirect("sum without (user_id) (rate(purchase[6h]))", 4)
    assertShardedEqDirect("avg without (user_id) (rate(purchase[6h]))", 3)
    assertShardedEqDirect("count by (event_type) (login)", 2)
    assertShardedEqDirect("min by (event_type) (avg_over_time(click[6h]))", 4)
    assertShardedEqDirect("max by (event_type) (rate(purchase[6h]) * 60)", 4)
    assertShardedEqDirect("sum by (event_type) (rate(purchase[6h]))", 1)
  }

  test("sharded topk/bottomk ≡ direct (partial top-k merge is exact)") {
    assertShardedEqDirect("topk(3, rate(purchase[6h]))", 4)
    assertShardedEqDirect("bottomk(2, avg_over_time(click[6h]))", 3)
  }

  test("non-shardable shapes fail loudly") {
    def bad(q: String) = intercept[IllegalArgumentException] {
      QueryFrontend.evalRangeSharded(src, q,
        "2024-01-14 00:00:00", "2024-01-14 06:00:00", 10800L, 2)
    }
    bad("rate(purchase[6h])")                       // no top-level agg
    bad("stddev by (event_type) (purchase)")        // non-linear merge
    bad("sum(sum by (user_id) (purchase))")         // nested aggregation
    bad("topk(3, sum by (user_id) (purchase))")     // nested under topk
    bad("sum(purchase + on(user_id, event_type) login)") // vector-vector
  }

  test("results cache: warm ≡ cold ≡ direct; cached chunks never rescan") {
    val q = "sum without (user_id) (rate(purchase[6h]))"
    val (start, end) = ("2024-01-14 00:00:00", "2024-01-15 00:00:00")
    // explicit file:/ URI — pins the serving path to the Hadoop FS API
    // (a java.io.File check would misread any scheme'd URI as cold)
    val cache = new QueryFrontend.ResultsCache("file:" +
      java.nio.file.Files.createTempDirectory("rescache_spec").toString)
    val direct = rows(PromQlParser.evalRange(src, q, start, end, 10800L))
    val cold = rows(QueryFrontend.evalRangeSplitCached(src, q, start, end,
      10800L, 21600L, cache, "ev"))
    assert(cold == direct)
    // grid 00:00..24:00 step 3h = 9 instants over 5 absolute 6h chunks;
    // the last chunk (holding only the 24:00 instant) stays uncached
    val cacheRoot = new org.apache.hadoop.fs.Path(cache.dir)
    val fs = cacheRoot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(cacheRoot).count(_.isDirectory) == 4)
    val warm = rows(QueryFrontend.evalRangeSplitCached(src, q, start, end,
      10800L, 21600L, cache, "ev"))
    assert(warm == direct)
    // poisoned source: empty the raw samples — cached chunks still serve
    // every instant except the final (recomputed, now-empty) chunk's
    val empty = src.copy(df = src.df.filter(lit(false)))
    val poisoned = rows(QueryFrontend.evalRangeSplitCached(empty, q, start,
      end, 10800L, 21600L, cache, "ev"))
    val lastChunkInstants = direct.filter(_.contains("2024-01-15 00:00:00"))
    assert(poisoned == direct -- lastChunkInstants,
      "cached chunks must serve without touching the source")
    // a different sourceId shares nothing
    val other = rows(QueryFrontend.evalRangeSplitCached(empty, q, start, end,
      10800L, 21600L, cache, "other-src"))
    assert(other.isEmpty)
  }

  test("chunk pruning reaches the parquet scan as PushedFilters") {
    val split = QueryFrontend.evalRangeSplit(src,
      "sum without (user_id) (rate(purchase[6h]))",
      "2024-01-14 00:00:00", "2024-01-14 06:00:00", 10800L, splitSec = 21600L)
    split.count()
    val plan = split.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"chunk ts bounds not pushed:\n${plan.take(2500)}")
  }
}
