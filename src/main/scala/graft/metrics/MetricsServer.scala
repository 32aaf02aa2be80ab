package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, collect_list, element_at, expr, lit, max, max_by, min, row_number, sort_array, struct, to_timestamp}

/** A8 + P14: the engine's HTTP face — Prometheus text-format exposition
  * plus the Prometheus HTTP query API.
  *
  *  - `GET /metrics` — exposition format 0.0.4 over [[Observed]]'s
  *    snapshot (the reference started `prometheus_client.start_http_server`
  *    the same way; `numaprom/monitoring/__init__.py:16-24`).
  *  - `GET /api/v1/query?query=...&time=...` — instant PromQL evaluation
  *    through [[PromQlParser.eval]], returned as the Prometheus API's
  *    `vector` JSON (the service face the reference's fetcher consumed;
  *    `reference/CHANGELOG.md:10`).
  *  - `GET /api/v1/query_range?query=...&start=...&end=...&step=...` —
  *    step-grid evaluation through [[PromQlParser.evalRange]], returned as
  *    `matrix` JSON (the fetcher's `query_range` contract,
  *    `reference/CHANGELOG.md:90`). `step` accepts seconds or a duration
  *    (`5m`), as in Prometheus.
  *  - `GET /api/v1/labels`, `/api/v1/label/<name>/values`,
  *    `/api/v1/series?match[]=<selector>` — the metadata endpoints
  *    Prometheus clients use for discovery, served from the bound
  *    source's label columns / distinct values / matching series (each a
  *    distinct-aggregation plan, capped like the query endpoints).
  *  - `GET /api/v1/rules` / `/api/v1/alerts` (when alerting rules are
  *    bound) — rule definitions + on-demand [[AlertRules]] state at an
  *    explicit `time` (`step` optional, default 60 s): the engine has no
  *    background evaluation loop, so state is computed from the trailing
  *    `for` window per request instead of read from a scheduler.
  *  - `GET /federate?match[]=...&time=...` — the federation scrape face:
  *    newest-in-staleness-window sample per series matching ANY match[]
  *    selector, as exposition text with original sample timestamps (ms)
  *    and configured `externalLabels` filled in where the series doesn't
  *    already carry the label.
  *
  * The query endpoints exist only when a [[PromQlParser.PromSource]] is
  * bound; an instant/range result is vector-sized (series × steps, not
  * samples) — but a high-cardinality selector can still make that vector
  * arbitrarily large, so the collect is HARD-CAPPED at `maxResultRows`:
  * the plan fetches `limit(max + 1)` and an over-limit result returns a
  * 422 `too_many_results` error instead of materializing every series in
  * driver memory (the only unbounded driver collect the round-7 audit
  * found in the tree).
  *
  * JDK built-in `HttpServer`, zero dependencies, one daemon executor;
  * `port = 0` binds an ephemeral port (read it back via [[boundPort]]).
  * Loopback-only by design: production scrapes go through the pod network
  * namespace exactly like the reference's sidecar-scraped endpoint.
  */
final class MetricsServer(observed: Observed, port: Int = 0,
                          promSource: Option[PromQlParser.PromSource] = None,
                          maxResultRows: Int = 10000,
                          rules: Seq[AlertRules.Rule] = Nil,
                          exemplarFrame: Option[org.apache.spark.sql.DataFrame] = None,
                          externalLabels: Seq[(String, String)] = Nil,
                          metadata: Seq[PromMetricList] = Nil,
                          targets: Option[org.apache.spark.sql.DataFrame] = None)
    extends AutoCloseable {

  private val startedAtMs: Long = System.currentTimeMillis()

  private val server =
    HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = MetricsServer.render(observed.snapshot).getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  })
  // Prettifier endpoint (stable upstream since 2.46): parse + canonical
  // re-print. Pure parsing — needs no source, and a syntax error surfaces
  // as the handler's standard {"status":"error"} envelope.
  server.createContext("/api/v1/format_query", MetricsServer.jsonHandler { params =>
    val query = params.getOrElse("query",
      throw new IllegalArgumentException("missing 'query' parameter"))
    s"""{"status":"success","data":"${MetricsServer.jsonEscape(PromQlFormat.format(query))}"}"""
  })
  // AST endpoint (3.x experimental, --enable-feature=promql-experimental-
  // functions era): the parsed tree in the upstream translateAST JSON
  // shape. Pure parsing, no source needed.
  server.createContext("/api/v1/parse_query", MetricsServer.jsonHandler { params =>
    val query = params.getOrElse("query",
      throw new IllegalArgumentException("missing 'query' parameter"))
    s"""{"status":"success","data":${PromQlJson.json(query)}}"""
  })
  // Metric metadata (upstream api/v1/metadata): HELP/TYPE per metric from
  // the configured metric lists; `metric` filters to one name, `limit`
  // caps the number of metrics (upstream semantics: limit counts METRICS).
  server.createContext("/api/v1/metadata", MetricsServer.jsonHandler { params =>
    val wanted = params.get("metric")
    val limit = params.get("limit").map(_.toInt).getOrElse(Int.MaxValue)
    val entries = metadata
      .flatMap(l => l.metrics.map(m => (m.name, l.kind.toLowerCase, m.description)))
      .filter(e => wanted.forall(_ == e._1))
      .groupBy(_._1).toSeq.sortBy(_._1).take(limit)
      .map { case (name, ms) =>
        val items = ms.map { case (_, kind, help) =>
          s"""{"type":"${MetricsServer.jsonEscape(kind)}","help":"${MetricsServer.jsonEscape(help)}","unit":""}"""
        }.mkString("[", ",", "]")
        s""""${MetricsServer.jsonEscape(name)}":$items"""
      }
    s"""{"status":"success","data":{${entries.mkString(",")}}}"""
  })
  // Lifecycle + status faces (upstream web/api): health/readiness probes
  // and the buildinfo/flags status endpoints k8s and dashboards poll.
  server.createContext("/-/healthy", MetricsServer.jsonHandler { _ =>
    """{"status":"success","data":"Healthy"}""" })
  server.createContext("/-/ready", MetricsServer.jsonHandler { _ =>
    """{"status":"success","data":"Ready"}""" })
  server.createContext("/api/v1/status/buildinfo", MetricsServer.jsonHandler { _ =>
    s"""{"status":"success","data":{"version":"graft-0.11","revision":"spark",""" +
      s""""features":{"promql-experimental-functions":"true"}}}""" })
  server.createContext("/api/v1/status/flags", MetricsServer.jsonHandler { _ =>
    s"""{"status":"success","data":{"query.max-result-rows":"$maxResultRows",""" +
      s""""web.enable-admin-api":"true","storage.tsdb.retention.time":"0s"}}""" })
  server.createContext("/api/v1/status/runtimeinfo", MetricsServer.jsonHandler { _ =>
    val rt = Runtime.getRuntime
    s"""{"status":"success","data":{"startTime":"${MetricsServer.iso(startedAtMs)}",""" +
      s""""CWD":"${MetricsServer.jsonEscape(sys.props("user.dir"))}",""" +
      s""""reloadConfigSuccess":true,"goroutineCount":${rt.availableProcessors()},""" +
      s""""storageRetention":"0s"}}""" })
  // The engine serves from parquet, not a WAL — replay is always
  // complete by the time the server answers (the q206 replay path runs
  // at load, not serve). Upstream shape: min/max/current/state.
  server.createContext("/api/v1/status/walreplay", MetricsServer.jsonHandler { _ =>
    """{"status":"success","data":{"min":0,"max":0,"current":0,"state":"done"}}""" })
  // status/config serves the server's ACTUAL effective configuration
  // rendered as YAML (the upstream shape: {"yaml": "..."}) — external
  // labels, rule count, and the result cap are what this server truly
  // runs with; there is no config file to echo.
  server.createContext("/api/v1/status/config", MetricsServer.jsonHandler { _ =>
    val ext = externalLabels.map { case (k, v) => s"    $k: $v" }.mkString("\n")
    val yaml = "global:\n  external_labels:\n" +
      (if (ext.nonEmpty) ext + "\n" else "") +
      s"query:\n  max_result_rows: $maxResultRows\n" +
      s"rule_files_inline: ${rules.size}\n"
    s"""{"status":"success","data":{"yaml":"${MetricsServer.jsonEscape(yaml)}"}}""" })
  // No scrape manager / alertmanager discovery in this engine — the
  // upstream endpoints exist and serve their empty-but-well-formed
  // shapes (exactly what a Prometheus with no scrape_configs returns).
  // targets: data-bearing when a targets frame is bound (columns `job`,
  // `instance`, `health`, `last_scrape` — the q205 scrape-state shape);
  // otherwise the empty-but-well-formed no-scrape-config shape.
  server.createContext("/api/v1/targets", MetricsServer.jsonHandler { params =>
    targets match {
      case None =>
        """{"status":"success","data":{"activeTargets":[],"droppedTargets":[]}}"""
      case Some(tf) =>
        val stateFilter = params.get("state")
        val rows = tf.limit(maxResultRows + 1).collect()
        if (rows.length > maxResultRows)
          throw new MetricsServer.ResultTooLarge(maxResultRows)
        val items = rows.toSeq.map { r =>
          val job = String.valueOf(r.getAs[Any]("job"))
          val inst = String.valueOf(r.getAs[Any]("instance"))
          val health = String.valueOf(r.getAs[Any]("health"))
          val lastScrape = MetricsServer.iso(
            r.getAs[java.sql.Timestamp]("last_scrape").getTime)
          s"""{"discoveredLabels":{"job":"${MetricsServer.jsonEscape(job)}"},""" +
            s""""labels":{"job":"${MetricsServer.jsonEscape(job)}",""" +
            s""""instance":"${MetricsServer.jsonEscape(inst)}"},""" +
            s""""scrapeUrl":"http://${MetricsServer.jsonEscape(inst)}/metrics",""" +
            s""""health":"${MetricsServer.jsonEscape(health)}",""" +
            s""""lastScrape":"$lastScrape"}"""
        }
        // upstream ?state=active|dropped|any: this engine drops nothing
        val active = if (stateFilter.contains("dropped")) Nil else items
        s"""{"status":"success","data":{"activeTargets":[${active.mkString(",")}],""" +
          s""""droppedTargets":[]}}"""
    } })
  server.createContext("/api/v1/alertmanagers", MetricsServer.jsonHandler { _ =>
    """{"status":"success","data":{"activeAlertmanagers":[],"droppedAlertmanagers":[]}}""" })
  server.createContext("/api/v1/notifications", MetricsServer.jsonHandler { _ =>
    """{"status":"success","data":[]}""" })
  // TSDB admin API state (upstream: --web.enable-admin-api). Tombstones
  // recorded by delete_series MASK every serving read below (the `src`
  // def re-derives the masked view per request); clean_tombstones folds
  // them permanently into the bound plan and clears the list. Plan-level
  // masking is the serving-face analogue of the physical rewrite
  // (Tombstones.clean), which q199 proves equivalent on the block store.
  @volatile private var tombstonesList: Seq[Tombstones.Tombstone] = Nil
  @volatile private var cleanedDf: Option[org.apache.spark.sql.DataFrame] = None
  @volatile private var ingestedDf: Option[org.apache.spark.sql.DataFrame] = None

  promSource.foreach { boundSrc =>
    def src: PromQlParser.PromSource = {
      val stored = cleanedDf.getOrElse(boundSrc.df)
      val withIngest = ingestedDf.map(stored.unionByName(_)).getOrElse(stored)
      val base = boundSrc.copy(df = withIngest)
      if (tombstonesList.isEmpty) base
      else base.copy(df =
        Tombstones.mask(base.df, tombstonesList, boundSrc.tsCol))
    }
    // Shape parsed wire samples (metric/ts/value + a label map) onto the
    // bound source's schema — the same projection RecordingRules uses.
    def shapeIngest(parsed: org.apache.spark.sql.DataFrame,
                    labelsCol: String): org.apache.spark.sql.DataFrame = {
      val base = boundSrc.df
      def typed(c: String) = base.schema(c).dataType
      parsed.select(base.columns.toSeq.map {
        case c if c == boundSrc.metricCol =>
          col("metric").cast(typed(c)).as(c)
        case c if c == boundSrc.tsCol => col("ts").cast(typed(c)).as(c)
        case c if c == boundSrc.valueCol => col("value").cast(typed(c)).as(c)
        case c if c == boundSrc.orderCol => lit(0L).cast(typed(c)).as(c)
        case c => element_at(col(labelsCol), c).cast(typed(c)).as(c)
      }: _*)
    }
    def appendIngest(shaped: org.apache.spark.sql.DataFrame): Unit =
      synchronized {
        ingestedDf = Some(ingestedDf.map(_.unionByName(shaped)).getOrElse(shaped))
      }
    // Remote-write RECEIVER (POST /api/v1/write): the REAL wire — a
    // stock Prometheus POSTs `Content-Encoding: snappy` over protobuf
    // (v1 `prometheus.WriteRequest`, or v2 `io.prometheus.write.v2
    // .Request` selected by the Content-Type proto= parameter) — plus
    // the JSON mapping for hand-written bodies. All three wires land in
    // the same shapeIngest → immediately queryable union.
    server.createContext("/api/v1/write", MetricsServer.rawBodyHandler {
      (enc, ctype, raw) =>
        import boundSrc.df.sparkSession.implicits._
        val body =
          if (enc.exists(_.equalsIgnoreCase("snappy")))
            graft.functions.Snappy.decompress(raw)
          else raw
        val isV2 = ctype.exists(_.contains("write.v2"))
        val isJson = body.nonEmpty && body(0) == '{' &&
          !ctype.exists(_.contains("protobuf"))
        val parsed =
          if (isJson)
            graft.sources.RemoteWrite.parse(
              Seq(new String(body, "UTF-8")).toDF("json"))
          else if (isV2)
            graft.sources.RemoteWrite.parseV2Pb(Seq(body).toDF("pb"))
              .filter(!col("is_exemplar"))
              .select(col("metric"), col("labels"), col("ts"), col("value"))
          else
            graft.sources.RemoteWrite.parsePb(Seq(body).toDF("pb"))
        appendIngest(shapeIngest(parsed, "labels"))
        """{"status":"success","data":null}"""
    })
    // OTLP receiver (POST /api/v1/otlp/v1/metrics, the 3.x endpoint):
    // same ingest path through the OTLP/JSON translation.
    server.createContext("/api/v1/otlp/v1/metrics", MetricsServer.bodyHandler { body =>
      import boundSrc.df.sparkSession.implicits._
      val parsed = graft.sources.Otlp.parse(Seq(body).toDF("json"))
      appendIngest(shapeIngest(parsed, "attrs"))
      """{"status":"success","data":null}"""
    })
    // REMOTE-READ (POST /api/v1/read, `prometheus.ReadRequest`): the
    // server half of remote_read — raw SAMPLED series for each query's
    // matchers × ms range (the wire a federating Prometheus or Thanos
    // sidecar pulls long-term samples over; wire stand-in rule in
    // [[RemoteRead]]'s doc). The data path is the same tombstone-masked,
    // ingest-unioned `src` serving /api/v1/query: matchers render to a
    // selector, compile through selectorCond (pushdown-eligible), and
    // the collect rides the usual maxResultRows cap.
    server.createContext("/api/v1/read", MetricsServer.rawBodyHandlerBin {
      (enc0, raw0) =>
      // Real wire first (a federating Prometheus sends snappy'd
      // ReadRequest protobuf and expects snappy'd ReadResponse protobuf
      // back); the JSON mapping stays for hand-written bodies.
      val raw = if (enc0.exists(_.equalsIgnoreCase("snappy")))
        graft.functions.Snappy.decompress(raw0) else raw0
      val isJson = raw.nonEmpty && raw(0) == '{'
      def collectSamples(q: RemoteRead.ReadQuery): Array[org.apache.spark.sql.Row] = {
        val s0 = src
        val cond = PromQlParser.selectorCond(
          s0, RemoteRead.selectorString(q.matchers))
        val rows = s0.df.filter(cond)
          .withColumn("__ts_ms", expr(s"unix_millis(${s0.tsCol})"))
          .filter(col("__ts_ms") >= q.startMs && col("__ts_ms") <= q.endMs)
          .select(s0.seriesKey.map(PromQlParser.labelCol) :+ col("__ts_ms") :+
            col(s0.valueCol).cast("double").as("__v"): _*)
          .orderBy(s0.seriesKey.map(PromQlParser.labelCol) :+ col("__ts_ms"): _*)
          .limit(maxResultRows + 1)
          .collect()
        if (rows.length > maxResultRows)
          throw new MetricsServer.ResultTooLarge(maxResultRows)
        rows
      }
      // series cut into ≤120-sample XOR chunks IN SPARK (keyed window +
      // collect_list + XorChunkEncode), so the driver only holds encoded
      // chunk rows — ~10 bytes/sample — and chunking parallelizes across
      // executors; shared by both streamed faces.
      def collectChunkRows(q: RemoteRead.ReadQuery): Array[org.apache.spark.sql.Row] = {
        val s0 = src
        val cond = PromQlParser.selectorCond(
          s0, RemoteRead.selectorString(q.matchers))
        val sKey = s0.seriesKey.map(PromQlParser.labelCol)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(sKey: _*).orderBy(col("__ts_ms"), col("__b"))
        val rows = s0.df.filter(cond)
          .withColumn("__ts_ms", expr(s"unix_millis(${s0.tsCol})"))
          .filter(col("__ts_ms") >= q.startMs && col("__ts_ms") <= q.endMs)
          .withColumn("__b", graft.functions.VectorFunctions
            .doubleBits(col(s0.valueCol).cast("double")))
          .withColumn("__seq", (row_number().over(w) - 1).cast("long"))
          .withColumn("__chunk", expr("__seq div 120"))
          .groupBy(sKey :+ col("__chunk"): _*)
          .agg(min(col("__ts_ms")).as("__min_t"),
            max(col("__ts_ms")).as("__max_t"),
            graft.functions.XorChunk.encodeCol(sort_array(collect_list(
              struct(col("__ts_ms").as("t"), col("__b").as("b")))))
              .as("__data"))
          .orderBy(sKey :+ col("__chunk"): _*)
          .limit(maxResultRows + 1)
          .collect()
        if (rows.length > maxResultRows)
          throw new MetricsServer.ResultTooLarge(maxResultRows)
        rows
      }
      if (!isJson) {
        // protobuf face — the REAL wire both ways: SAMPLES as snappy'd
        // ReadResponse, STREAMED_XOR_CHUNKS as chunked-transport frames
        // (uvarint len · BE CRC32C · ChunkedReadResponse pb, upstream
        // chunked.go; not snappy'd — chunk data is already compressed).
        // Absent end (proto3 zero) reads open-ended.
        import graft.functions.ProtoWire
        val req = ProtoWire.decodeReadRequest(raw)
        val streamed = req.acceptedTypes.find(t => t == 0 || t == 1)
          .contains(1)
        val queries = req.queries.map { q =>
          RemoteRead.ReadQuery(q.startMs,
            if (q.endMs == 0L) Long.MaxValue else q.endMs,
            q.matchers.map { m =>
              val op = m.mtype match {
                case 0 => "="
                case 1 => "!="
                case 2 => "=~"
                case 3 => "!~"
                case other => throw new IllegalArgumentException(
                  s"unknown matcher type: $other")
              }
              (m.name, op, m.value)
            })
        }
        if (!streamed) {
          val results = queries.map(collectSamples)
          val body = graft.functions.Snappy.compress(
            MetricsServer.remoteReadPb(results, boundSrc.metricCol,
              boundSrc.seriesKey))
          ("application/x-protobuf", Some("snappy"), body)
        } else {
          val msgs = queries.zipWithIndex.flatMap { case (q, qi) =>
            MetricsServer.chunkedReadPb(collectChunkRows(q),
              boundSrc.metricCol, boundSrc.seriesKey, qi)
          }
          ("application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse",
            None, ProtoWire.frameMessages(msgs))
        }
      } else {
        val body = new String(raw, "UTF-8")
        // Response-type negotiation (storage/remote
        // NegotiateResponseType): first accepted type the server
        // supports wins; empty → SAMPLES.
        val streamed = RemoteRead.acceptedTypes(body)
          .find(t => t == "STREAMED_XOR_CHUNKS" || t == "SAMPLES")
          .contains("STREAMED_XOR_CHUNKS")
        val queries = RemoteRead.parseRequest(body)
        if (!streamed) {
          val results = queries.map(collectSamples)
          ("application/json", None,
            MetricsServer.remoteReadJson(results, boundSrc.metricCol,
              boundSrc.seriesKey).getBytes("UTF-8"))
        } else {
        // STREAMED_XOR_CHUNKS over the JSON mapping (hand-written
        // bodies): one JSON line per series frame, chunk data = the REAL
        // XOR chunk bytes base64'd. The real framed-protobuf face lives
        // on the pb branch above.
        val frames = queries.zipWithIndex.flatMap { case (q, qi) =>
          MetricsServer.chunkedReadFrames(collectChunkRows(q),
            boundSrc.metricCol, boundSrc.seriesKey, qi)
        }
        ("application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse",
          None, frames.mkString("", "\n", "\n").getBytes("UTF-8"))
        }
      }
    })
    server.createContext("/api/v1/admin/tsdb/delete_series",
      MetricsServer.jsonHandler { params =>
        val sel = params.getOrElse("match[]",
          throw new IllegalArgumentException("missing 'match[]' parameter"))
        val mint = params.get("start").map(t =>
          MetricsServer.epochSec(MetricsServer.parseTime(t)) * 1000L)
          .getOrElse(Long.MinValue)
        val maxt = params.get("end").map(t =>
          MetricsServer.epochSec(MetricsServer.parseTime(t)) * 1000L)
          .getOrElse(Long.MaxValue)
        tombstonesList = tombstonesList :+ Tombstones.Tombstone(
          PromQlParser.selectorMatchers(boundSrc, sel), mint, maxt)
        """{"status":"success","data":null}"""
      })
    server.createContext("/api/v1/admin/tsdb/clean_tombstones",
      MetricsServer.jsonHandler { _ =>
        if (tombstonesList.nonEmpty) {
          cleanedDf = Some(src.df) // folds masked ingest in too…
          tombstonesList = Nil
          ingestedDf = None // …so drop it or it would union twice
        }
        """{"status":"success","data":null}"""
      })
    // Snapshot (upstream api/v1/admin/tsdb/snapshot): persist the current
    // tombstone-masked view as parquet and return the snapshot name. The
    // write path is the Hadoop FS API, so the base can be hdfs://s3a://.
    server.createContext("/api/v1/admin/tsdb/snapshot",
      MetricsServer.jsonHandler { _ =>
        val name = "graft-snap-" + java.lang.Long.toHexString(System.nanoTime())
        val base = new java.io.File(sys.props("java.io.tmpdir"), "graft-snapshots")
        val dir = new java.io.File(base, name)
        src.df.write.mode("error").parquet(dir.getAbsolutePath)
        s"""{"status":"success","data":{"name":"${MetricsServer.jsonEscape(name)}","dir":"${MetricsServer.jsonEscape(dir.getAbsolutePath)}"}}"""
      })
    server.createContext("/api/v1/query", MetricsServer.jsonHandler { params =>
      val query = params.getOrElse("query",
        throw new IllegalArgumentException("missing 'query' parameter"))
      val t = MetricsServer.parseTime(params.getOrElse("time",
        throw new IllegalArgumentException("missing 'time' parameter")))
      // stats=all (upstream query stats): totals read from the EXECUTED
      // plan's own SQLMetrics — totalQueryableSamples = rows leaving the
      // scans, peakSamples = the widest operator — no second pass.
      val wantStats = params.get("stats").contains("all")
      val limited = PromQlParser.eval(src, query, t).limit(maxResultRows + 1)
      val t0 = System.nanoTime()
      val rows = limited.collect()
      val evalSec = (System.nanoTime() - t0) / 1e9
      if (rows.length > maxResultRows)
        throw new MetricsServer.ResultTooLarge(maxResultRows)
      val body =
        if (PromQlParser.isScalarQuery(query))
          MetricsServer.scalarJson(rows.head.getAs[Double]("value"),
            MetricsServer.epochSec(t))
        else MetricsServer.vectorJson(rows, MetricsServer.epochSec(t))
      if (!wantStats) body
      // splice inside the data object (upstream: data.stats)
      else body.patch(body.length - 2,
        MetricsServer.statsJson(limited.queryExecution.executedPlan, evalSec) + "}", 1)
    })
    server.createContext("/api/v1/query_range", MetricsServer.jsonHandler { params =>
      def need(k: String) = params.getOrElse(k,
        throw new IllegalArgumentException(s"missing '$k' parameter"))
      val start = MetricsServer.parseTime(need("start"))
      val end = MetricsServer.parseTime(need("end"))
      val step = MetricsServer.parseDurationSec(need("step"))
      val limited = PromQlParser.evalRange(src, need("query"), start, end, step)
        .limit(maxResultRows + 1)
      val t0 = System.nanoTime()
      val rows = limited.collect()
      val evalSec = (System.nanoTime() - t0) / 1e9
      if (rows.length > maxResultRows)
        throw new MetricsServer.ResultTooLarge(maxResultRows)
      val body = MetricsServer.matrixJson(rows)
      if (!params.get("stats").contains("all")) body
      else body.patch(body.length - 2,
        MetricsServer.statsJson(limited.queryExecution.executedPlan, evalSec) + "}", 1)
    })
    server.createContext("/api/v1/labels", MetricsServer.jsonHandler { params =>
      // the data model's label set is the source's series-key columns;
      // `limit` caps the list (upstream: 0/absent = unlimited)
      val names = MetricsServer.applyLimit(
        (src.seriesKey :+ "__name__").distinct.sorted, params)
      s"""{"status":"success","data":[${names.map(n => "\"" + n + "\"").mkString(",")}]}"""
    })
    server.createContext("/api/v1/label/", MetricsServer.jsonHandler2 { (path, params) =>
      // /api/v1/label/<name>/values
      val name = path.stripPrefix("/api/v1/label/").stripSuffix("/values")
      val colName = if (name == "__name__") src.metricCol else name
      require(src.seriesKey.contains(colName) || colName == src.metricCol,
        s"unknown label: $name")
      val distinctVals = src.df.select(col(colName).cast("string").as("v"))
        .filter(col("v").isNotNull) // a NULL label value is "unset", not a value
        .distinct().orderBy(col("v"))
      // Push `limit` into the PLAN (upstream truncates to the limit): a
      // label whose distinct count exceeds maxResultRows must still serve
      // a small-limit request instead of throwing ResultTooLarge.
      val capped = params.get("limit").map(_.toInt).filter(_ > 0)
        .map(distinctVals.limit).getOrElse(distinctVals)
      val rows = MetricsServer.collectCapped(capped, maxResultRows)
      val vals = MetricsServer.applyLimit(
        rows.toSeq.map(r => "\"" + MetricsServer.jsonEscape(r.getString(0)) + "\""),
        params)
      s"""{"status":"success","data":[${vals.mkString(",")}]}"""
    })
    server.createContext("/api/v1/series", MetricsServer.jsonHandler { params =>
      val sel = params.getOrElse("match[]",
        throw new IllegalArgumentException("missing 'match[]' parameter"))
      val rows = MetricsServer.collectCapped(
        PromQlParser.seriesFor(src, sel), maxResultRows)
      val labels = rows.headOption.toSeq
        .flatMap(_.schema.fields.zipWithIndex.map { case (f, i) => (f.name, i) })
      val items = rows.map { r =>
        labels.map { case (n, i) =>
          s""""${MetricsServer.jsonEscape(n)}":"${MetricsServer.jsonEscape(String.valueOf(r.get(i)))}""""
        }.mkString("{", ",", "}")
      }
      s"""{"status":"success","data":[${items.mkString(",")}]}"""
    })
    // GET /api/v1/status/tsdb — the cardinality-stats face (upstream
    // api/v1/status/tsdb): top-10 series counts by metric name, label
    // value counts by label name, and series counts by label=value pair.
    // Three keyed distinct-aggregations over the bound source (each a
    // map-side partial at any corpus size); output is top-10-sized.
    server.createContext("/api/v1/status/tsdb", MetricsServer.jsonHandler { _ =>
      def items(rows: Array[Row]) = rows.map(r =>
        s"""{"name":"${MetricsServer.jsonEscape(r.getString(0))}","value":${r.getLong(1)}}""")
        .mkString("[", ",", "]")
      val nSeries = org.apache.spark.sql.functions.countDistinct(
        col(src.seriesKey.head), src.seriesKey.tail.map(col): _*).as("v")
      val byMetric = MetricsServer.collectCapped(
        src.df.groupBy(col(src.metricCol).cast("string").as("n"))
          .agg(nSeries)
          .orderBy(col("v").desc, col("n")).limit(10), 10)
      val byLabel = src.seriesKey.map { l =>
        val c = src.df.select(col(l).cast("string").as("v"))
          .filter(col("v").isNotNull).distinct().count()
        (l, c)
      }.sortBy { case (l, c) => (-c, l) }.take(10).map { case (l, c) =>
        s"""{"name":"${MetricsServer.jsonEscape(l)}","value":$c}"""
      }.mkString("[", ",", "]")
      val byPair = MetricsServer.collectCapped(
        src.df.select(org.apache.spark.sql.functions.concat(
            lit(src.metricCol + "="), col(src.metricCol).cast("string")).as("n") +:
            src.seriesKey.map(PromQlParser.labelCol): _*)
          .groupBy(col("n"))
          .agg(nSeries)
          .orderBy(col("v").desc, col("n")).limit(10), 10)
      s"""{"status":"success","data":{"seriesCountByMetricName":${items(byMetric)},""" +
        s""""labelValueCountByLabelName":$byLabel,""" +
        s""""seriesCountByLabelValuePair":${items(byPair)}}}"""
    })
    // GET /federate?match[]=sel&match[]=sel2&time=... — the federation
    // scrape face (prometheus/web/federate.go): for every series matching
    // ANY match[] selector, the newest sample within the 5m staleness
    // window, as exposition text with the ORIGINAL sample timestamp (ms).
    // Engine convention: `time` is explicit (no background "now").
    // Repeated match[] params require the raw query string — the shared
    // jsonHandler collapses duplicate keys, and federation's content type
    // is text, so this endpoint owns its handler. ONE keyed max_by per
    // request (map-side partial; series-sized output under the standard
    // cap), never a sample-sized collect. External labels are added only
    // where the series doesn't already carry the label (the upstream
    // honor-labels federation rule).
    server.createContext("/federate", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body, ctype) =
          try {
            val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
            val pairs = raw.split("&").filter(_.nonEmpty).toSeq.map { kv =>
              val eq = kv.indexOf('=')
              val k = java.net.URLDecoder
                .decode(if (eq < 0) kv else kv.substring(0, eq), "UTF-8")
              val v = if (eq < 0) "" else java.net.URLDecoder
                .decode(kv.substring(eq + 1), "UTF-8")
              k -> v
            }
            val matches = pairs.collect { case ("match[]", v) => v }
            require(matches.nonEmpty, "missing 'match[]' parameter")
            val t = MetricsServer.parseTime(pairs.collectFirst {
              case ("time", v) => v
            }.getOrElse(throw new IllegalArgumentException(
              "missing 'time' parameter")))
            val txt = MetricsServer.federateText(src, matches, t,
              externalLabels, maxResultRows)
            (200, txt, "text/plain; version=0.0.4; charset=utf-8")
          } catch {
            case e: MetricsServer.ResultTooLarge =>
              (422, String.valueOf(e.getMessage) + "\n", "text/plain; charset=utf-8")
            case e: Throwable =>
              (400, String.valueOf(e.getMessage) + "\n", "text/plain; charset=utf-8")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    exemplarFrame.foreach { ef =>
      // /api/v1/query_exemplars — the OpenMetrics exemplar face: series
      // selector + [start, end] over a per-bucket newest-exemplar frame.
      // Serves BOTH bucket families: the native shape
      // (NativeHistogram.exemplars: series labels…, sign, idx, exemplar)
      // and the classic le-bucket shape
      // (MetricRegistry.histogramExemplars: series labels…, le,
      // exemplar) — bucket columns are never series labels upstream, so
      // all three are excluded from the series identity. The frame is
      // |series|·|buckets|-sized by construction, the filter is
      // selector + time-range pushdown, and the collect rides the same
      // hard cap as every query endpoint.
      server.createContext("/api/v1/query_exemplars", MetricsServer.jsonHandler { params =>
        def need(k: String) = params.getOrElse(k,
          throw new IllegalArgumentException(s"missing '$k' parameter"))
        val startT = MetricsServer.parseTime(need("start"))
        val endT = MetricsServer.parseTime(need("end"))
        val labelCols = ef.columns.filterNot(Set("sign", "idx", "le", "exemplar")).toSeq
        val rows = MetricsServer.collectCapped(
          ef.filter(PromQlParser.selectorCond(src, need("query")))
            .filter(col("exemplar.ts") >= to_timestamp(lit(startT)) &&
                    col("exemplar.ts") <= to_timestamp(lit(endT)))
            .orderBy(labelCols.map(col) :+ col("exemplar.ts"): _*),
          maxResultRows)
        MetricsServer.exemplarsJson(rows, labelCols, src.metricCol)
      })
    }
    if (rules.nonEmpty) {
      // /api/v1/alerts and /api/v1/rules — the rule-group face of the API.
      // Unlike Prometheus these take an explicit `time` (the engine has no
      // background evaluation loop; state is computed on demand): firing
      // iff the alert has been continuously active for the trailing `for`
      // window ending at `time`, which a grid of ceil(for/step)+1 steps
      // decides exactly — longer history cannot change the answer.
      server.createContext("/api/v1/alerts", MetricsServer.jsonHandler { params =>
        val t = MetricsServer.parseTime(params.getOrElse("time",
          throw new IllegalArgumentException("missing 'time' parameter")))
        val step = MetricsServer.parseDurationSec(params.getOrElse("step", "60"))
        val alerts = rules.flatMap(r =>
          MetricsServer.alertsAt(src, r, t, step, maxResultRows).map(_._1))
        s"""{"status":"success","data":{"alerts":[${alerts.mkString(",")}]}}"""
      })
      server.createContext("/api/v1/rules", MetricsServer.jsonHandler { params =>
        val t = MetricsServer.parseTime(params.getOrElse("time",
          throw new IllegalArgumentException("missing 'time' parameter")))
        val step = MetricsServer.parseDurationSec(params.getOrElse("step", "60"))
        val rjs = rules.map { r =>
          val alerts = MetricsServer.alertsAt(src, r, t, step, maxResultRows)
          val state =
            if (alerts.exists(_._2 == "firing")) "firing"
            else if (alerts.nonEmpty) "pending"
            else "inactive"
          s"""{"name":"${MetricsServer.jsonEscape(r.alertname)}"""" +
            s""","query":"${MetricsServer.jsonEscape(r.expr)}"""" +
            s""","duration":${r.forSec},"keepFiringFor":${r.keepFiringSec}""" +
            s""","type":"alerting","state":"$state"""" +
            s""","alerts":[${alerts.map(_._1).mkString(",")}]}"""
        }
        s"""{"status":"success","data":{"groups":[{"name":"graft",""" +
          s""""rules":[${rjs.mkString(",")}]}]}}"""
      })
    }
  }
  // A small pool, not the listener thread: the query/metadata endpoints
  // run full Spark jobs, and head-of-line blocking there would make a
  // slow query_range drop concurrent /metrics scrapes.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => {
      val t = new Thread(r, "graft-metrics-server"); t.setDaemon(true); t
    })
  server.setExecutor(pool)
  server.start()

  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = { server.stop(0); pool.shutdownNow(): Unit }
}

object MetricsServer {

  /** An over-limit query result (→ HTTP 422, Prometheus's execution-error
    * class): the server refuses to materialize it rather than buffering an
    * unbounded series set on the driver. */
  final class ResultTooLarge(val max: Int) extends RuntimeException(
    s"query result exceeds $max rows; narrow the selector or raise maxResultRows")

  /** `limit(max+1)` then collect: the executor-side plan ships at most
    * max+1 rows regardless of result cardinality; the +1 row distinguishes
    * "exactly max" from "over the cap". */
  /** Upstream `limit` parameter: 0 or absent = unlimited. */
  private[metrics] def applyLimit[A](xs: Seq[A],
                                     params: Map[String, String]): Seq[A] =
    params.get("limit").map(_.toInt).filter(_ > 0).map(xs.take).getOrElse(xs)

  /** The `stats=all` payload from an EXECUTED plan's own SQLMetrics —
    * totalQueryableSamples = rows leaving the scans, peakSamples = the
    * widest operator; AQE-unwrapped (the adaptive node and its stages
    * hide the real operators as inner plans, not children). */
  private[metrics] def statsJson(
      plan: org.apache.spark.sql.execution.SparkPlan, evalSec: Double): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def outRows(p: SparkPlan): Seq[Long] =
      p.metrics.get("numOutputRows").map(_.value).toSeq ++
        kids(p).flatMap(outRows) ++ p.subqueries.flatMap(outRows)
    def scanRows(p: SparkPlan): Seq[Long] =
      if (kids(p).isEmpty) p.metrics.get("numOutputRows").map(_.value).toSeq
      else kids(p).flatMap(scanRows) ++ p.subqueries.flatMap(scanRows)
    s""","stats":{"timings":{"evalTotalTime":$evalSec},""" +
      s""""samples":{"totalQueryableSamples":${scanRows(plan).sum},""" +
      s""""peakSamples":${(outRows(plan) :+ 0L).max}}}"""
  }

  private[metrics] def collectCapped(df: org.apache.spark.sql.DataFrame,
                                     max: Int): Array[Row] = {
    val rows = df.limit(max + 1).collect()
    if (rows.length > max) throw new ResultTooLarge(max)
    rows
  }

  /** One rule's alert instances at instant `t`: evaluate the for-duration
    * state machine on a trailing grid of exactly ceil(for/step)+1 steps
    * (sufficient: firing at `t` depends only on the trailing `for`
    * window) and keep the rows AT `t`. Returns (alert JSON, state). */
  private[metrics] def alertsAt(src: PromQlParser.PromSource,
                                rule: AlertRules.Rule, t: String,
                                stepSec: Long,
                                max: Int): Seq[(String, String)] = {
    val forSteps = (rule.forSec + stepSec - 1) / stepSec
    val start = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .minusSeconds(forSteps * stepSec)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val df = AlertRules.evalRule(src, rule, start, t, stepSec)
    val rows = collectCapped(
      df.filter(col("step_ts") === org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf(t))), max)
    val fields = rows.headOption.toSeq
      .flatMap(_.schema.fields.zipWithIndex)
    val labelIdx = fields.collect {
      case (f, i) if !Set("step_ts", "value", "alertstate")(f.name) => (f.name, i)
    }
    val stateIdx = fields.collectFirst { case (f, i) if f.name == "alertstate" => i }
    val valueIdx = fields.collectFirst { case (f, i) if f.name == "value" => i }
    rows.toSeq.map { r =>
      val state = r.getString(stateIdx.get)
      val labels = labelIdx.filter { case (_, i) => !r.isNullAt(i) }
        .map { case (n, i) =>
          s""""${jsonEscape(n)}":"${jsonEscape(String.valueOf(r.get(i)))}""""
        }
      (s"""{"labels":{${labels.mkString(",")}},"state":"$state"""" +
        s""","value":"${r.get(valueIdx.get)}"}""", state)
    }
  }

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Render observation rows as exposition text: each observation name is a
    * family prefix; every numeric field becomes one gauge sample
    * `graft_<obs>_<field> <value>`. Non-numeric fields are skipped (they
    * have no sample representation; Info-style payloads belong in labels).
    * Families sort by name so scrapes are byte-stable for equal state. */
  def render(snapshot: Map[String, Row]): String = {
    val sb = new StringBuilder
    snapshot.toSeq.sortBy(_._1).foreach { case (obsName, row) =>
      val fam = s"graft_${sanitize(obsName)}"
      sb.append(s"# HELP $fam observation '$obsName' from a graft plan\n")
      sb.append(s"# TYPE $fam gauge\n")
      row.schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          val v: Option[Double] = row.get(i) match {
            case n: java.lang.Number => Some(n.doubleValue())
            case _ => None
          }
          v.foreach(d => sb.append(s"${fam}_${sanitize(f.name)} $d\n"))
        }
      }
    }
    sb.toString
  }

  // ---------- Prometheus HTTP API v1 plumbing ----------

  /** Accepts epoch seconds, RFC3339 (`2024-01-15T12:00:00Z`), or the
    * engine's plain `yyyy-MM-dd HH:mm:ss`; returns the plain form the
    * compilers consume (session timezone is UTC). */
  private[metrics] def parseTime(s: String): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    if (s.forall(_.isDigit))
      java.time.LocalDateTime.ofEpochSecond(s.toLong, 0, java.time.ZoneOffset.UTC)
        .format(fmt)
    else if (s.endsWith("Z"))
      java.time.LocalDateTime.parse(s.dropRight(1)).format(fmt)
    else s
  }

  /** Prometheus step syntax: bare (fractional) seconds or a compound
    * duration (`5m`, `1h30m`, `90s`); returns whole seconds. Sub-second
    * steps (`500ms`) are rejected explicitly — the grid is second-grained. */
  private[metrics] def parseDurationSec(s: String): Long =
    if (s.nonEmpty && s.exists(_.isLetter)) {
      val seg = "([0-9]+)(ms|s|m|h|d|w)".r
      val parsed = seg.findAllMatchIn(s).map { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "ms" => throw new IllegalArgumentException(
            s"sub-second step not supported: $s")
          case "s" => n; case "m" => n * 60L; case "h" => n * 3600L
          case "d" => n * 86400L; case "w" => n * 604800L
        }
      }.toSeq
      require(parsed.nonEmpty && seg.replaceAllIn(s, "").isEmpty,
        s"bad duration: $s")
      parsed.sum
    } else {
      // bare seconds: reject a fractional value rather than silently
      // truncating it ("1.5" is a resolution the grid can't honor —
      // the same refusal the explicit "500ms" branch gives)
      val d = s.toDouble
      require(d == d.toLong.toDouble,
        s"sub-second step not supported: $s")
      d.toLong
    }

  private[metrics] def epochSec(plainTs: String): Long =
    java.time.LocalDateTime.parse(plainTs.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)

  private[metrics] def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Exposition-format label-value escaping: backslash, quote, newline. */
  private def promEscape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case c => c.toString
  }

  private val legacyName = "[a-zA-Z_:][a-zA-Z0-9_:]*".r

  /** The `/federate` body: for every series matching ANY selector, the
    * newest sample in the trailing 5m staleness window (upstream
    * LookbackDelta) at `t`, rendered as exposition text with the original
    * sample timestamp in MILLISECONDS — the federation contract
    * (prometheus/web/federate.go). Families sort by metric name, series
    * by label set; `# TYPE <name> untyped` heads each legacy-charset
    * family (a UTF-8 name has no 0.0.4 TYPE line and renders in the
    * quoted `{"name",...}` form). External labels fill in only where the
    * series doesn't already carry the label. One keyed max_by, map-side
    * partial; the collect is series-sized under the standard cap. */
  def federateText(src: PromQlParser.PromSource,
                                    matches: Seq[String], t: String,
                                    external: Seq[(String, String)],
                                    max: Int): String = {
    val cond = matches.map(m => PromQlParser.selectorCond(src, m)).reduce(_ || _)
    val te = to_timestamp(lit(t))
    val labelCols = src.seriesKey.filterNot(_ == src.metricCol)
    val newest = src.df.filter(cond)
      .filter(col(src.tsCol) <= te &&
        col(src.tsCol) > te - expr("INTERVAL 5 MINUTES"))
      .groupBy(src.seriesKey.map(PromQlParser.labelCol): _*)
      .agg(max_by(struct(col(src.valueCol).as("v"), col(src.tsCol).as("sts")),
        struct(col(src.tsCol), col(src.orderCol))).as("s"))
      .select(src.seriesKey.map(PromQlParser.labelCol) :+ col("s.v").as("__fv") :+
        col("s.sts").as("__fts"): _*)
    val rows = collectCapped(newest, max)
    val sb = new StringBuilder
    rows.toSeq
      .map { r =>
        val name = String.valueOf(r.getAs[Any](src.metricCol))
        val own = labelCols.flatMap { c =>
          Option(r.getAs[Any](c)).map(v => c -> String.valueOf(v))
        }
        val ext = external.filterNot { case (k, _) => own.exists(_._1 == k) }
        (name, (own ++ ext).sortBy(_._1),
          r.getAs[Double]("__fv"), r.getAs[java.sql.Timestamp]("__fts").getTime)
      }
      .sortBy { case (name, labels, _, _) => (name, labels.mkString(" ")) }
      .foldLeft(Option.empty[String]) { case (prev, (name, labels, v, tsMs)) =>
        val legacy = legacyName.pattern.matcher(name).matches()
        if (!prev.contains(name) && legacy)
          sb.append(s"# TYPE $name untyped\n")
        val lbl = labels.map { case (k, value) =>
          s"""$k="${promEscape(value)}""""
        }
        val head =
          if (legacy) if (lbl.isEmpty) name else s"$name{${lbl.mkString(",")}}"
          else s"""{"${promEscape(name)}"${lbl.map("," + _).mkString}}"""
        sb.append(s"$head ${fmtVal(v)} $tsMs\n")
        Some(name)
      }
    sb.result()
  }

  /** protobuf-JSON `ReadResponse`: one result per request query, each a
    * list of timeseries with full label pair sets and ms samples. Rows
    * arrive sorted by (seriesKey, ts); grouping preserves that order.
    * Sample values are JSON numbers (the protobuf JSON double mapping);
    * non-finite values quote as strings, as protobuf JSON specifies. */
  private[metrics] def remoteReadJson(results: Seq[Array[Row]],
      metricCol: String, seriesKey: Seq[String]): String = {
    def sampleVal(d: Double): String =
      if (d.isNaN || d.isInfinite) "\"" + fmtVal(d) + "\"" else fmtVal(d)
    def seriesJson(rows: Array[Row]): String = {
      val grouped = scala.collection.mutable.LinkedHashMap
        .empty[Seq[(String, String)], scala.collection.mutable.ArrayBuffer[Row]]
      rows.foreach { r =>
        val ls = seriesKey.map { k =>
          (if (k == metricCol) "__name__" else k) ->
            String.valueOf(r.getAs[Any](k))
        }
        grouped.getOrElseUpdate(ls,
          scala.collection.mutable.ArrayBuffer.empty) += r
      }
      grouped.map { case (ls, rs) =>
        val labels = ls.map { case (n, v) =>
          s"""{"name":"${jsonEscape(n)}","value":"${jsonEscape(v)}"}"""
        }.mkString("[", ",", "]")
        val samples = rs.map { r =>
          s"""{"value":${sampleVal(r.getAs[Double]("__v"))},""" +
            s""""timestamp":${r.getAs[Long]("__ts_ms")}}"""
        }.mkString("[", ",", "]")
        s"""{"labels":$labels,"samples":$samples}"""
      }.mkString("[", ",", "]")
    }
    s"""{"results":[${results.map(rs =>
      s"""{"timeseries":${seriesJson(rs)}}""").mkString(",")}]}"""
  }

  /** [[remoteReadJson]]'s real-bytes twin: the same series grouping
    * rendered as a `prometheus.ReadResponse` protobuf message
    * ([[graft.functions.ProtoWire]]) — what an actual federating
    * Prometheus expects back (snappy framing applied by the handler). */
  private[metrics] def remoteReadPb(results: Seq[Array[Row]],
      metricCol: String, seriesKey: Seq[String]): Array[Byte] = {
    import graft.functions.ProtoWire
    def seriesOf(rows: Array[Row]): Seq[ProtoWire.Series] = {
      val grouped = scala.collection.mutable.LinkedHashMap
        .empty[Seq[(String, String)], scala.collection.mutable.ArrayBuffer[Row]]
      rows.foreach { r =>
        val ls = seriesKey.map { k =>
          (if (k == metricCol) "__name__" else k) ->
            String.valueOf(r.getAs[Any](k))
        }
        grouped.getOrElseUpdate(ls,
          scala.collection.mutable.ArrayBuffer.empty) += r
      }
      grouped.map { case (ls, rs) =>
        ProtoWire.Series(
          ls.map { case (n, v) => ProtoWire.Label(n, v) },
          rs.toSeq.map(r => ProtoWire.Sample(
            r.getAs[Double]("__v"), r.getAs[Long]("__ts_ms"))))
      }.toSeq
    }
    ProtoWire.encodeReadResponse(results.map(seriesOf))
  }

  /** RFC3339 UTC instant for status payloads. */
  private[metrics] def iso(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  /** Prometheus sample-value formatting: a plain decimal string. */
  private def fmtVal(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "+Inf"
    else if (d == Double.NegativeInfinity) "-Inf"
    else d.toString

  private def metricJson(row: Row, labelIdx: Seq[(String, Int)]): String =
    labelIdx.map { case (name, i) =>
      s""""${jsonEscape(name)}":"${jsonEscape(String.valueOf(row.get(i)))}""""
    }.mkString("{", ",", "}")

  private def labelIndexes(rows: Array[Row]): Seq[(String, Int)] =
    if (rows.isEmpty) Seq.empty
    else rows.head.schema.fields.zipWithIndex.toSeq
      .collect { case (f, i) if f.name != "value" && f.name != "step_ts" => (f.name, i) }

  /** `resultType: scalar` payload — a pure-scalar instant query. */
  private[metrics] def scalarJson(v: Double, ts: Long): String =
    s"""{"status":"success","data":{"resultType":"scalar","result":[$ts,"${fmtVal(v)}"]}}"""

  /** `resultType: vector` payload for an instant query result. */
  private[metrics] def vectorJson(rows: Array[Row], ts: Long): String = {
    val labels = labelIndexes(rows)
    val items = rows.map { r =>
      val v = r.getAs[Double]("value")
      s"""{"metric":${metricJson(r, labels)},"value":[$ts,"${fmtVal(v)}"]}"""
    }
    s"""{"status":"success","data":{"resultType":"vector","result":[${items.mkString(",")}]}}"""
  }

  /** `resultType: matrix` payload for a query_range result: rows grouped
    * per series (label set), values sorted by step. */
  private[metrics] def matrixJson(rows: Array[Row]): String = {
    val labels = labelIndexes(rows)
    val series = rows.groupBy(r => labels.map { case (_, i) => String.valueOf(r.get(i)) })
      .toSeq.sortBy(_._1.mkString("\u0000"))
    val items = series.map { case (_, rs) =>
      val vals = rs.sortBy(_.getAs[java.sql.Timestamp]("step_ts").getTime)
        .map { r =>
          val t = r.getAs[java.sql.Timestamp]("step_ts").getTime / 1000
          s"""[$t,"${fmtVal(r.getAs[Double]("value"))}"]"""
        }
      s"""{"metric":${metricJson(rs.head, labels)},"values":[${vals.mkString(",")}]}"""
    }
    s"""{"status":"success","data":{"resultType":"matrix","result":[${items.mkString(",")}]}}"""
  }

  /** `/api/v1/query_exemplars` payload: rows grouped per series, each
    * exemplar as `{labels, value, timestamp}` (value stringified,
    * timestamp float epoch seconds — the upstream wire shape). */
  private[metrics] def exemplarsJson(rows: Array[Row], labelCols: Seq[String],
                                     metricCol: String): String = {
    def esc(s: String) = jsonEscape(s)
    val series = rows.groupBy(r => labelCols.map(c => String.valueOf(r.getAs[Any](c))))
      .toSeq.sortBy(_._1.mkString(" "))
    val items = series.map { case (_, rs) =>
      val head = rs.head
      val sl = labelCols.map { c =>
        val key = if (c == metricCol) "__name__" else c
        s""""${esc(key)}":"${esc(String.valueOf(head.getAs[Any](c)))}""""
      }.mkString("{", ",", "}")
      val exs = rs.map { r =>
        val ex = r.getAs[Row]("exemplar")
        val traceLabels = ex.schema.fields.map(_.name)
          .filterNot(Set("value", "ts")).toSeq
        val ls = traceLabels.map(n =>
          s""""${esc(n)}":"${esc(String.valueOf(ex.getAs[Any](n)))}"""")
          .mkString("{", ",", "}")
        val tsSec = ex.getAs[java.sql.Timestamp]("ts").getTime / 1000.0
        s"""{"labels":$ls,"value":"${fmtVal(ex.getAs[Double]("value"))}","timestamp":$tsSec}"""
      }
      s"""{"seriesLabels":$sl,"exemplars":[${exs.mkString(",")}]}"""
    }
    s"""{"status":"success","data":[${items.mkString(",")}]}"""
  }

  /** Wraps a params → JSON function as a handler with Prometheus-style
    * error payloads (400 + `status: error`). */
  private def jsonHandler(f: Map[String, String] => String): HttpHandler =
    jsonHandler2((_, params) => f(params))

  /** [[bodyHandler]] whose function also picks the response
    * Content-Type (remote-read response negotiation). Errors fall back
    * to the JSON envelope, as upstream's error paths do. */
  private def bodyHandlerCt(f: String => (String, String)): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, ctype, body) =
          try {
            val in = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            val (ct, b) = f(in)
            (200, ct, b)
          } catch {
            case e: ResultTooLarge =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (422, "application/json",
                s"""{"status":"error","errorType":"too_many_results","error":"$msg"}""")
            case e: Throwable =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (400, "application/json",
                s"""{"status":"error","errorType":"bad_data","error":"$msg"}""")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }

  /** One `ChunkedReadResponse` frame per series: rows arrive sorted by
    * (seriesKey, chunk) with encoded XOR chunk bytes; consecutive rows
    * of one series fold into one frame's chunk list (protobuf-JSON
    * field names; `data` is base64, the JSON bytes mapping). */
  private[metrics] def chunkedReadFrames(rows: Array[Row],
      metricCol: String, seriesKey: Seq[String], queryIndex: Int): Seq[String] = {
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[Seq[(String, String)], scala.collection.mutable.ArrayBuffer[Row]]
    rows.foreach { r =>
      val ls = seriesKey.map { k =>
        (if (k == metricCol) "__name__" else k) ->
          String.valueOf(r.getAs[Any](k))
      }
      grouped.getOrElseUpdate(ls,
        scala.collection.mutable.ArrayBuffer.empty) += r
    }
    grouped.map { case (ls, rs) =>
      val labels = ls.map { case (n, v) =>
        s"""{"name":"${jsonEscape(n)}","value":"${jsonEscape(v)}"}"""
      }.mkString("[", ",", "]")
      val chunks = rs.map { r =>
        val b64 = java.util.Base64.getEncoder
          .encodeToString(r.getAs[Array[Byte]]("__data"))
        s"""{"minTimeMs":${r.getAs[Long]("__min_t")},""" +
          s""""maxTimeMs":${r.getAs[Long]("__max_t")},""" +
          s""""type":"XOR","data":"$b64"}"""
      }.mkString("[", ",", "]")
      s"""{"chunkedSeries":[{"labels":$labels,"chunks":$chunks}],""" +
        s""""queryIndex":$queryIndex}"""
    }.toSeq
  }

  /** [[chunkedReadFrames]]'s real-bytes twin: one `ChunkedReadResponse`
    * protobuf message per series (same grouping), chunk type XOR = 1,
    * data = the real XOR chunk bytes. Framing (uvarint · CRC32C ·
    * payload) is applied by the caller via ProtoWire.frameMessages. */
  private[metrics] def chunkedReadPb(rows: Array[Row], metricCol: String,
      seriesKey: Seq[String], queryIndex: Int): Seq[Array[Byte]] = {
    import graft.functions.ProtoWire
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[Seq[(String, String)], scala.collection.mutable.ArrayBuffer[Row]]
    rows.foreach { r =>
      val ls = seriesKey.map { k =>
        (if (k == metricCol) "__name__" else k) ->
          String.valueOf(r.getAs[Any](k))
      }
      grouped.getOrElseUpdate(ls,
        scala.collection.mutable.ArrayBuffer.empty) += r
    }
    grouped.map { case (ls, rs) =>
      ProtoWire.encodeChunkedReadResponse(ProtoWire.ChunkedReadResponsePb(
        Seq(ProtoWire.ChunkedSeriesPb(
          ls.map { case (n, v) => ProtoWire.Label(n, v) },
          rs.toSeq.map(r => ProtoWire.ChunkPb(
            r.getAs[Long]("__min_t"), r.getAs[Long]("__max_t"), 1,
            scala.collection.immutable.ArraySeq
              .unsafeWrapArray(r.getAs[Array[Byte]]("__data")))))),
        queryIndex.toLong))
    }.toSeq
  }

  /** Raw-bytes variant for wire receivers that must see the body
    * unmangled (a UTF-8 String round-trip corrupts protobuf/snappy
    * bytes) plus the Content-Encoding/Content-Type headers that select
    * the decode path. Same Prometheus-style error envelope. */
  private def rawBodyHandler(f: (Option[String], Option[String], Array[Byte]) => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) =
          try {
            val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
            val ct = Option(ex.getRequestHeaders.getFirst("Content-Type"))
            (200, f(enc, ct, ex.getRequestBody.readAllBytes()))
          } catch {
            case e: Throwable =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (400, s"""{"status":"error","errorType":"bad_data","error":"$msg"}""")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }

  /** Raw-request, BINARY-response variant (the protobuf remote-read
    * face): f(contentEncoding, rawBody) → (contentType, optional
    * response Content-Encoding, bytes). Errors keep the JSON envelope. */
  private def rawBodyHandlerBin(
      f: (Option[String], Array[Byte]) => (String, Option[String], Array[Byte])): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, ctype, cenc, bytes) =
          try {
            val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
            val (ct, ce, b) = f(enc, ex.getRequestBody.readAllBytes())
            (200, ct, ce, b)
          } catch {
            case e: ResultTooLarge =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (422, "application/json", None,
                s"""{"status":"error","errorType":"too_many_results","error":"$msg"}"""
                  .getBytes("UTF-8"))
            case e: Throwable =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (400, "application/json", None,
                s"""{"status":"error","errorType":"bad_data","error":"$msg"}"""
                  .getBytes("UTF-8"))
          }
        ex.getResponseHeaders.set("Content-Type", ctype)
        cenc.foreach(ex.getResponseHeaders.set("Content-Encoding", _))
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }

  /** Wraps a request-BODY → JSON function (ingest receivers: remote
    * write, OTLP). Same Prometheus-style error envelope. */
  private def bodyHandler(f: String => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) =
          try {
            val in = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            (200, f(in))
          } catch {
            case e: Throwable =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (400, s"""{"status":"error","errorType":"bad_data","error":"$msg"}""")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }

  /** [[jsonHandler]] that also passes the request path (for path-shaped
    * endpoints like `/api/v1/label/<name>/values`). */
  private def jsonHandler2(f: (String, Map[String, String]) => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) =
          try {
            // keys are percent-decoded too: spec-conformant clients send
            // match%5B%5D= for match[]=
            def parseForm(s: String): Map[String, String] =
              s.split("&").filter(_.nonEmpty).map { kv =>
                val eq = kv.indexOf('=')
                val k = java.net.URLDecoder
                  .decode(if (eq < 0) kv else kv.substring(0, eq), "UTF-8")
                val v = if (eq < 0) "" else java.net.URLDecoder
                  .decode(kv.substring(eq + 1), "UTF-8")
                k -> v
              }.toMap
            val urlParams =
              parseForm(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
            // POST with a form body (upstream api.go reads r.Form, which
            // merges both; Grafana POSTs long queries this way) — body
            // params win over URL params, as ParseForm's ordering does
            val bodyParams =
              if (ex.getRequestMethod == "POST" &&
                Option(ex.getRequestHeaders.getFirst("Content-Type"))
                  .exists(_.startsWith("application/x-www-form-urlencoded")))
                parseForm(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
              else Map.empty[String, String]
            (200, f(ex.getRequestURI.getPath, urlParams ++ bodyParams))
          } catch {
            case e: ResultTooLarge =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (422, s"""{"status":"error","errorType":"too_many_results","error":"$msg"}""")
            case e: Throwable =>
              val msg = jsonEscape(String.valueOf(e.getMessage))
              (400, s"""{"status":"error","errorType":"bad_data","error":"$msg"}""")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }
}
