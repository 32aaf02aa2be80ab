package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import PromQlParser._

/** Query-frontend range SPLITTING — the Thanos query-frontend /
  * Cortex/Mimir `split_queries_by_interval` contract: a long
  * `query_range` is split into interval-aligned chunks, each chunk is
  * evaluated as its own independent range query against a TIME-PRUNED
  * source, and the per-step results are unioned. Sound because
  * `query_range` evaluates every grid instant independently — splitting
  * only partitions the instant set, so split ≡ unsplit EXACTLY (no
  * tolerance; the declared query's oracle is the unsplit twin).
  *
  * Why this matters at 100 TB: a month-long dashboard query becomes ~30
  * independent day-queries. Each one scans only its day (± the query's
  * own data extent) of parquet — the pruning predicate lands in
  * `PushedFilters`, so row groups outside the chunk never leave disk —
  * and the chunks are embarrassingly parallel across a cluster (and
  * per-chunk cacheable, the frontend's results-cache unit, since chunk
  * boundaries are ABSOLUTE interval multiples independent of the
  * request's own start).
  *
  * Reference anchor: the reference consumes `query_range` pulls
  * (reference/CHANGELOG.md:90); this is the serving-layer shape those
  * pulls hit in a Thanos/Cortex deployment.
  */
object QueryFrontend {

  /** The query's data extent: how many seconds BACK (`_1`) and FORWARD
    * (`_2`) of an evaluation instant T the query can read — every sample
    * any instant-T evaluation touches has event time in
    * [T − back, T + fwd]. Window widths and positive offsets stretch
    * `back`; negative offsets (`offset -1h`, 2.26+) stretch `fwd`;
    * subqueries add their range on top of their inner expression's
    * extent. `None` when the query contains an `@` pin — a pinned
    * subtree reads at an absolute instant unrelated to T, so the
    * frontend falls back to the unpruned source (upstream frontends
    * disable splitting for `@` the same way).
    *
    * Counter functions (`rate`/`increase`/`resets`/`changes`/`irate`/
    * `idelta`) pair each sample with its immediate predecessor via a
    * series-ordered lag. Pruning at [T − back, T + fwd] is still sound
    * for them: a pair whose older sample falls before the pruned range
    * is a pair not fully inside any chunk instant's window, so it
    * contributes nothing unpruned either — and a sample whose true
    * predecessor was pruned gets prev=NULL (pair dropped), never a
    * false pairing with an older survivor.
    */
  def dataExtentSec(ast: Ast, lookbackSec: Long): Option[(Long, Long)] = {
    val L = lookbackSec
    def clamp(b: Long, f: Long) = Some((math.max(b, 0L), math.max(f, 0L)))
    def sel(s: Selector, reachSec: Long): Option[(Long, Long)] =
      if (s.at.isDefined) None
      else clamp(s.offsetSec + reachSec, -s.offsetSec)
    def max2(a: Option[(Long, Long)], b: Option[(Long, Long)]) =
      for ((ab, af) <- a; (bb, bf) <- b)
        yield (math.max(ab, bb), math.max(af, bf))
    def walk(a: Ast): Option[(Long, Long)] = a match {
      case s: Selector             => sel(s, L)
      case RangeFn(_, s, w, _, _)  => sel(s, w)
      case RangeVec(s, w, _)       => sel(s, w)
      // extended fetch reaches one lookback BEHIND the window start (the
      // left anchor) and one lookback AHEAD (smoothed's right straddle)
      case ExtRange(_, _, s, w)    =>
        if (s.at.isDefined) None
        else clamp(s.offsetSec + w + L, -s.offsetSec + L)
      case Absent(s)               => sel(s, L)
      case TimestampFn(s)          => sel(s, L)
      case Subquery(child, range, _, off, at) =>
        if (at.isDefined) None
        else walk(child).flatMap { case (cb, cf) =>
          clamp(off + range + cb, -off + cf)
        }
      case RangeSub(_, sub, _)     => walk(sub)
      case SortFn(_, c, _)         => walk(c)
      case InfoFn(c, _)            => max2(walk(c), Some((L, 0L)))
      case LimitK(_, _, c)         => walk(c)
      case LimitRatio(_, c)        => walk(c)
      case ScalarFn(c)             => walk(c)
      case VectorFn(c)             => walk(c)
      case TimeComp(_, c)          => c.map(walk).getOrElse(Some((0L, 0L)))
      case AggBy(_, _, c, _)       => walk(c)
      case TopK(_, _, c, _)        => walk(c)
      case VecFn(_, c, _)          => walk(c)
      case LabelFn(_, c, _, _, _, _) => walk(c)
      case AggQuantile(_, _, c, _) => walk(c)
      case CountValues(_, _, c, _) => walk(c)
      case HistQuantile(_, c)      => walk(c)
      case HistFn(_, c, _, _)      => walk(c)
      case BinOp(_, l, r, _, _, _) => max2(walk(l), walk(r))
      case ScalarLit(_)            => Some((0L, 0L))
      case TimeFn                  => Some((0L, 0L))
    }
    walk(ast)
  }

  /** Resolve `@ start()` / `@ end()` pins to the ABSOLUTE instants of the
    * original request before splitting — inside a chunk, `end()` would
    * otherwise mean the CHUNK's end (upstream query-frontends do the same
    * rewrite, promql `@` docs: start/end are the query's own range). */
  private def resolveAt(a: Ast, startSec: Long, endSec: Long): Ast = {
    def at(o: Option[At]): Option[At] = o.map {
      case AtStart => AtTs(startSec)
      case AtEnd   => AtTs(endSec)
      case p       => p
    }
    def go(x: Ast): Ast = x match {
      case s: Selector                  => s.copy(at = at(s.at))
      case r: RangeFn                   => r.copy(sel = go(r.sel).asInstanceOf[Selector])
      case RangeVec(s, w, m)            => RangeVec(go(s).asInstanceOf[Selector], w, m)
      case e: ExtRange                  => e.copy(sel = go(e.sel).asInstanceOf[Selector])
      case Absent(s)                    => Absent(go(s).asInstanceOf[Selector])
      case TimestampFn(s)               => TimestampFn(go(s).asInstanceOf[Selector])
      case sq: Subquery                 => sq.copy(child = go(sq.child), at = at(sq.at))
      case rs: RangeSub                 => rs.copy(sub = go(rs.sub).asInstanceOf[Subquery])
      case f: SortFn                    => f.copy(child = go(f.child))
      case f: InfoFn                    => f.copy(child = go(f.child))
      case f: LimitK                    => f.copy(child = go(f.child))
      case f: LimitRatio                => f.copy(child = go(f.child))
      case ScalarFn(c)                  => ScalarFn(go(c))
      case VectorFn(c)                  => VectorFn(go(c))
      case TimeComp(fn, c)              => TimeComp(fn, c.map(go))
      case f: AggBy                     => f.copy(child = go(f.child))
      case f: TopK                      => f.copy(child = go(f.child))
      case f: VecFn                     => f.copy(child = go(f.child))
      case f: LabelFn                   => f.copy(child = go(f.child))
      case f: AggQuantile               => f.copy(child = go(f.child))
      case f: CountValues               => f.copy(child = go(f.child))
      case HistQuantile(q, c)           => HistQuantile(q, go(c))
      case f: HistFn                    => f.copy(child = go(f.child))
      case b: BinOp                     => b.copy(lhs = go(b.lhs), rhs = go(b.rhs))
      case leaf @ (ScalarLit(_) | TimeFn) => leaf
    }
    go(a)
  }

  /** Time-prune every frame of a source to event time in
    * [loSec, hiSec] (epoch seconds, closed). Schema-adaptive like
    * `Tables.table`: a TIMESTAMP ts column gets Instant literals (native
    * parquet row-group pushdown), a raw int64-nanos column gets long
    * literals. The hist/info binding frames carry their own ts columns
    * and are pruned with the same bounds. */
  private def prune(src: PromSource, loSec: Long, hiSec: Long): PromSource = {
    def bound(df: DataFrame, tsCol: String): DataFrame = {
      val c = col(tsCol)
      df.schema(tsCol).dataType match {
        case LongType =>
          df.filter(c >= lit(loSec * 1000000000L) && c <= lit(hiSec * 1000000000L))
        case _ =>
          df.filter(c >= lit(java.time.Instant.ofEpochSecond(loSec)) &&
            c <= lit(java.time.Instant.ofEpochSecond(hiSec)))
      }
    }
    src.copy(
      df = bound(src.df, src.tsCol),
      hist = src.hist.map(h => h.copy(df = bound(h.df, h.tsCol))),
      info = src.info.map(i => i.copy(df = bound(i.df, i.tsCol))))
  }

  private def secOf(ts: String): Long =
    java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)

  private def tsOf(sec: Long): String =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Evaluate `query` over [startTs, endTs] step `stepSec`, split into
    * chunks of `splitSec`. Chunk membership is by ABSOLUTE interval —
    * instant T belongs to chunk ⌊T / splitSec⌋ — so two requests with
    * different starts share chunk boundaries (the results-cache
    * alignment rule). Each chunk re-anchors `evalRange` at its own first
    * instant; because every chunk start is an original grid instant, the
    * union evaluates exactly the unsplit instant set. */
  def evalRangeSplit(src: PromSource, query: String, startTs: String,
                     endTs: String, stepSec: Long, splitSec: Long,
                     lookbackSec: Long = 300L): DataFrame = {
    require(stepSec > 0, "step must be positive")
    require(splitSec >= stepSec, "split interval must be >= step")
    val startSec = secOf(startTs)
    val endSec = secOf(endTs)
    require(endSec >= startSec, "end must be >= start")
    val nSteps = (endSec - startSec) / stepSec
    val instants = (0L to nSteps).map(i => startSec + i * stepSec)
    val chunks = instants.groupBy(t => math.floorDiv(t, splitSec))
      .toSeq.sortBy(_._1).map(_._2)
    val resolved = resolveAt(parse(query), startSec, endSec)
    val resolvedQ = PromQlFormat.format(resolved)
    val ext = dataExtentSec(resolved, lookbackSec)
    val frames = chunks.map { ts =>
      val (c0, c1) = (ts.head, ts.last)
      val chunkSrc = ext match {
        case Some((back, fwd)) => prune(src, c0 - back, c1 + fwd)
        case None              => src
      }
      evalRange(chunkSrc, resolvedQ, tsOf(c0), tsOf(c1), stepSec, lookbackSec)
    }
    frames.reduce(_.unionByName(_))
  }

  // ---------- Results cache (Cortex query-frontend results_cache) ----

  /** Chunk-level results cache backing [[evalRangeSplitCached]]: cached
    * chunk results live as parquet under `dir/<key>` — the durable-store
    * stand-in for Cortex's memcached, with the same unit of caching (one
    * absolute-aligned split chunk) and the same key discipline (canonical
    * query text + step + lookback + chunk bounds + a caller-supplied
    * source id, so two sources never share entries). Reads are ordinary
    * parquet scans, so a warm chunk costs |result| rows, not a re-scan
    * of the raw samples. */
  final class ResultsCache(val dir: String) {
    private def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    def key(parts: String*): String = md5(parts.mkString("|"))

    def getOrCompute(spark: org.apache.spark.sql.SparkSession, k: String)
                    (compute: => DataFrame): DataFrame = {
      // Hadoop FS API, not java.io.File: the cache dir may be any
      // cluster-visible URI (hdfs://, s3a://, file:/) — a driver-local
      // File check would read every scheme as cold and re-write forever.
      val path = new org.apache.hadoop.fs.Path(dir, k)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
        spark.read.parquet(path.toString)
      else {
        compute.write.mode("overwrite").parquet(path.toString)
        spark.read.parquet(path.toString)
      }
    }
  }

  /** [[evalRangeSplit]] with a chunk results cache. Every COMPLETE chunk
    * (its absolute interval closes at or before the request's end) is
    * served from / written to the cache; the final, still-open chunk is
    * always recomputed — Cortex's rule for mutable recent data. A warm
    * month-long dashboard query therefore touches raw samples only for
    * its newest split interval. */
  def evalRangeSplitCached(src: PromSource, query: String, startTs: String,
                           endTs: String, stepSec: Long, splitSec: Long,
                           cache: ResultsCache, sourceId: String,
                           lookbackSec: Long = 300L): DataFrame = {
    require(stepSec > 0 && splitSec >= stepSec, "bad step/split")
    val startSec = secOf(startTs)
    val endSec = secOf(endTs)
    val nSteps = (endSec - startSec) / stepSec
    val instants = (0L to nSteps).map(i => startSec + i * stepSec)
    val chunks = instants.groupBy(t => math.floorDiv(t, splitSec))
      .toSeq.sortBy(_._1).map { case (k, ts) => (k, ts) }
    val resolved = resolveAt(parse(query), startSec, endSec)
    val resolvedQ = PromQlFormat.format(resolved)
    val ext = dataExtentSec(resolved, lookbackSec)
    val spark = src.df.sparkSession
    val frames = chunks.map { case (ck, ts) =>
      val (c0, c1) = (ts.head, ts.last)
      def compute: DataFrame = {
        val chunkSrc = ext match {
          case Some((back, fwd)) => prune(src, c0 - back, c1 + fwd)
          case None              => src
        }
        evalRange(chunkSrc, resolvedQ, tsOf(c0), tsOf(c1), stepSec, lookbackSec)
      }
      val complete = (ck + 1) * splitSec <= endSec
      if (complete)
        cache.getOrCompute(spark,
          cache.key(resolvedQ, stepSec.toString, lookbackSec.toString,
            c0.toString, c1.toString, sourceId))(compute)
      else compute
    }
    frames.reduce(_.unionByName(_))
  }

  // ---------- Vertical query sharding (Mimir query_sharding) ----------

  /** Is `a` SERIES-LOCAL — every output sample derived from input rows of
    * a single series (or a scalar)? These are the subtrees Mimir pushes
    * into shards: selectors, range functions, subqueries of series-local
    * expressions, per-sample scalar math. Cross-series constructs
    * (nested aggregations, vector-vector matching, absent, sort/limit,
    * info joins) are rejected — sharding them would aggregate partial
    * populations. */
  private def seriesLocal(a: Ast): Boolean = a match {
    case _: Selector | _: RangeFn | _: RangeVec | _: TimestampFn => true
    case Subquery(c, _, _, _, _) => seriesLocal(c)
    case RangeSub(_, sub, _)     => seriesLocal(sub)
    case VecFn(_, c, _)          => seriesLocal(c)
    case LabelFn(_, c, _, _, _, _) => seriesLocal(c)
    case TimeComp(_, c)          => c.forall(seriesLocal)
    case ScalarLit(_) | TimeFn   => true
    // scalar-vector arithmetic is per-sample; vector-vector would join
    // series across shard boundaries
    case BinOp(_, l, r, _, _, _) =>
      (scalarOnly(l) || scalarOnly(r)) && seriesLocal(l) && seriesLocal(r)
    case _ => false
  }

  private def scalarOnly(a: Ast): Boolean = a match {
    case ScalarLit(_) | TimeFn => true
    case BinOp(_, l, r, _, _, _) => scalarOnly(l) && scalarOnly(r)
    case _ => false
  }

  /** Evaluate a TOP-LEVEL aggregation `fn by/without (…) (series-local
    * expr)` as `shards` independent partial aggregations — shard s sees
    * only the series with `pmod(hash(seriesKey), shards) = s` — merged
    * per (labels, step). Merge is EXACT, not approximate: the engine's
    * vector `sum`/`avg` round each sample to 6 dp and sum as
    * DECIMAL(18,6), so shard partials are exact decimals and decimal
    * addition is associative — merged ≡ unsharded, hash-provable.
    * Exactness bound: each shard partial crosses one double-typed hop
    * (`evalRange`'s `value` column) before the decimal merge, so the
    * merged ≡ unsharded identity holds while every per-shard partial
    * stays below 2^53 in 6-dp units (|partial| < ~9.0e9) — above that
    * the partial itself is no longer representable and the claim
    * degrades to double-precision, same as the unsharded path's output
    * type. Lifting it would need evalRange to emit DECIMAL end-to-end.
    * `count` merges by summing integer partials, `min`/`max` by
    * min/max; `avg` is rewritten to merged-sum / merged-count (the
    * Mimir rewrite). Anything non-shardable fails loudly.
    *
    * Why shard at 100 TB: the shard predicate is a map-side filter
    * riding the scan (no extra shuffle), each shard's aggregation
    * carries 1/N of the series cardinality, and the N partial queries
    * are independent — Mimir fans them out to N queriers to bound
    * per-node state for high-cardinality aggregations. Here the merge
    * is one keyed union-aggregate over |labels|·|steps|·N rows. */
  def evalRangeSharded(src: PromSource, query: String, startTs: String,
                       endTs: String, stepSec: Long, shards: Int,
                       lookbackSec: Long = 300L): DataFrame = {
    require(shards > 0, "shards must be positive")
    parse(query) match {
      case a @ AggBy(fn, _, child, _) =>
        require(Set("sum", "count", "min", "max", "avg")(fn),
          s"aggregation '$fn' is not shardable")
        require(seriesLocal(child),
          s"inner expression is not series-local, cannot shard: $child")
        shardedAgg(src, a, startTs, endTs, stepSec, shards, lookbackSec)
      // topk/bottomk merge EXACTLY: every member of the global top-k is
      // in its own shard's top-k, so re-ranking the union of per-shard
      // partials reproduces the direct ranking (ties resolved by the
      // same label total order both times)
      case t @ TopK(_, _, child, _) =>
        require(seriesLocal(child),
          s"inner expression is not series-local, cannot shard: $child")
        shardedTopK(src, t, startTs, endTs, stepSec, shards, lookbackSec)
      case other => throw new IllegalArgumentException(
        s"only a top-level aggregation is shardable, got: $other")
    }
  }

  private def shardCol(src: PromSource, shards: Int): Column =
    pmod(hash(src.seriesKey.map(PromQlParser.labelCol): _*), lit(shards))

  private def shardedTopK(src: PromSource, ast: TopK, startTs: String,
                          endTs: String, stepSec: Long, shards: Int,
                          lookbackSec: Long): DataFrame = {
    val sc = shardCol(src, shards)
    val parts = (0 until shards).map { s =>
      evalRange(src.copy(df = src.df.filter(sc === s)),
        PromQlFormat.format(ast), startTs, endTs, stepSec, lookbackSec)
    }.reduce(_.unionByName(_))
    // re-rank the union of partials with the SAME total order the
    // engine's topk uses: value desc (asc for bottomk), ties on every
    // non-value label column
    val tieCols = parts.columns
      .filterNot(c => c == "value" || c == "rank" || ast.by.contains(c)).toSeq
    PromQl.topk(parts.drop("rank"), ast.k, ast.by :+ "step_ts", "value",
        tieCols.filterNot(_ == "step_ts"), asc = ast.bottom)
      .select(parts.columns.map(col): _*)
  }

  private def shardedAgg(src: PromSource, ast: AggBy, startTs: String,
                         endTs: String, stepSec: Long, shards: Int,
                         lookbackSec: Long): DataFrame = {
    val sCol = shardCol(src, shards)
    def shardEval(fn: String, s: Int): DataFrame =
      evalRange(src.copy(df = src.df.filter(sCol === s)),
        PromQlFormat.format(ast.copy(fn = fn)), startTs, endTs, stepSec,
        lookbackSec)
    def merged(fn: String, merge: Column => Column): DataFrame = {
      val parts = (0 until shards).map(shardEval(fn, _)).reduce(_.unionByName(_))
      val keys = parts.columns.filterNot(_ == "value").toSeq
      parts.groupBy(keys.map(col): _*).agg(merge(col("value")).as("value"))
        .select(parts.columns.map(col): _*)
    }
    def decMerge(c: Column): Column =
      sum(c.cast("decimal(18,6)")).cast("double")
    ast.fn match {
      case "sum"   => merged("sum", decMerge)
      case "count" => merged("count", c => sum(c).cast("double"))
      case "min"   => merged("min", min)
      case "max"   => merged("max", max)
      case "avg" =>
        // decSum/count per the engine's avg; partials are exact decimals
        val sums = merged("sum", decMerge).withColumnRenamed("value", "__s")
        val counts = merged("count", c => sum(c).cast("double"))
        val keys = counts.columns.filterNot(_ == "value").toSeq
        sums.join(counts, keys)
          .withColumn("value", col("__s") / col("value"))
          .drop("__s")
          .select((keys.takeWhile(_ != "step_ts") ++ Seq("value", "step_ts"))
            .map(col): _*)
    }
  }
}
