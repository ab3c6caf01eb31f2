package graft

import graft.ops.{ExternalScorer, IhcScorer, JourneyBuilder}
import org.apache.spark.sql.functions.{col, to_timestamp}

/** CLI mirroring the reference's per-step interface
  * (run_pipeline.py:31–106): each step runnable standalone against the
  * file contracts, or `all` in one process. Usage:
  *
  *   graft.Main --data-dir /root/testdata/sf0.01 --out-dir /tmp/out \
  *     [--step build-journeys|score|score-external|report|clean-corpus|all] \
  *     [--start-date YYYY-MM-DD] [--end-date YYYY-MM-DD] \
  *     [--max-sessions N]   // skew gate: skip conversions over N sessions
  *     [--min-tokens N] [--max-stopword-ratio X] [--jaccard-threshold X] \
  *     [--survivor-rule clustered|greedy]   // clean-corpus step only
  *
  * `--data-dir` points at the driver testdata (domain mapping in Tables);
  * `--out-dir` receives customer_journeys/ (CSV),
  * attribution_customer_journey/ (parquet) and channel_reporting/ (CSV).
  * Date bounds follow the reference's asymmetry: build-journeys filters
  * the conversion date (cj_builder.py:45–53), report filters the session
  * date (⚠B5, channel_reporter.py:47–56).
  */
object Main {

  private val KnownFlags = Set(
    "config", "data-dir", "out-dir", "step", "start-date", "end-date", "max-sessions",
    // clean-corpus step
    "min-tokens", "max-stopword-ratio", "jaccard-threshold", "survivor-rule",
    // sql step
    "query", "sql", "tx")

  /** Strict flag parsing: a typo'd or mispaired flag must fail loudly —
    * silently ignoring `--max-session 1000` would run WITHOUT the skew
    * gate the flag exists to enable. */
  private def parse(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"arguments must be --flag value pairs, got: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") && KnownFlags(k.drop(2)) => k.drop(2) -> v
      case Array(k, _) =>
        sys.error(s"unknown flag $k (known: ${KnownFlags.toSeq.sorted.map("--" + _).mkString(", ")})")
    }.toMap
  }

  /** The summary the reference prints after every report save
    * (channel_reporter.py:133–151). Computed from the artifact just
    * written — channel×date-sized, one tiny read — rather than from the
    * report frame, whose (unpersisted) lineage would re-run the step-3
    * joins a second time. */
  private def printSummary(spark: org.apache.spark.sql.SparkSession, outDir: String): Unit = {
    val rep = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$outDir/channel_reporting")
    ops.ChannelReport.summaryLines(rep).foreach(l => println(s"[graft] $l"))
  }

  def main(args: Array[String]): Unit = {
    val opts = parse(args)
    val spark = GraftSession.build(s"graft-${opts.getOrElse("step", "all")}")
    try run(spark, opts)
    finally spark.stop()
  }

  /** Step dispatch, separated from session lifecycle so tests can drive
    * the CLI against a shared session (main's `finally stop()` would
    * kill it for every later suite). */
  def run(spark: org.apache.spark.sql.SparkSession, opts: Map[String, String]): Unit = {
    // --config file supplies defaults (reference config.ini, config.py:17-36);
    // explicit flags override it
    val cfg = opts.get("config").map(Config.load).getOrElse(Config.Defaults)
    val dataDir = opts.getOrElse("data-dir", cfg.dataDir)
    val outDir = opts.getOrElse("out-dir", cfg.outDir)
    val step = opts.getOrElse("step", "all")
    val start = opts.get("start-date").orElse(cfg.startDate)
    val end = opts.get("end-date").orElse(cfg.endDate)
    // skew gate for the scorer window (C2 skip semantics; AQE cannot
    // split skewed WINDOW partitions) — off unless configured
    val maxSessions = opts.get("max-sessions").map(_.toInt).orElse(cfg.maxSessionsPerConversion)

    // lazy: clean-corpus runs against a corpus-only data dir where
    // events.parquet (and these readers' schema reads) may not exist
    lazy val conv = Tables.conversions(spark, dataDir)
    lazy val sess = Tables.sessions(spark, dataDir)
    lazy val costs = Tables.sessionCosts(spark, dataDir)

    step match {
      case "build-journeys" =>
        val j = AttributionPipeline.buildJourneys(conv, sess, start, end)
        require(AttributionPipeline.nonEmpty(j), "no customer journeys built")
        AttributionPipeline.writeCsv(JourneyBuilder.journeyOutput(j), s"$outDir/customer_journeys")
        println(s"[graft] journeys -> $outDir/customer_journeys")
      case "score" =>
        val j = AttributionPipeline.readJourneysCsv(spark, s"$outDir/customer_journeys")
        require(AttributionPipeline.nonEmpty(j), "no journeys to score")
        val attr = AttributionPipeline.score(j, maxSessions)
        AttributionPipeline.writeAttribution(attr, s"$outDir/attribution_customer_journey")
        println(s"[graft] attribution -> $outDir/attribution_customer_journey")
      case "score-external" =>
        // the pluggable-boundary path (S6): same contract as `score`,
        // batched per the config's request limits
        val j = AttributionPipeline.readJourneysCsv(spark, s"$outDir/customer_journeys")
          .withColumn("ts",
            to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss").cast("long"))
        require(AttributionPipeline.nonEmpty(j), "no journeys to score")
        val gated = maxSessions.fold(j)(IhcScorer.sessionGate(j, _))
        val attr = IhcScorer.normalize(ExternalScorer.score(
          gated,
          maxJourneysPerRequest = cfg.maxJourneysPerRequest,
          maxSessionsPerRequest = cfg.maxSessionsPerRequest))
        AttributionPipeline.writeAttribution(attr, s"$outDir/attribution_customer_journey")
        println(s"[graft] attribution (external boundary) -> $outDir/attribution_customer_journey")
      case "report" =>
        val attr = spark.read.parquet(s"$outDir/attribution_customer_journey")
        val rep = AttributionPipeline.report(sess, costs, attr, conv, start, end)
        AttributionPipeline.writeCsv(rep, s"$outDir/channel_reporting")
        println(s"[graft] report -> $outDir/channel_reporting")
        printSummary(spark, outDir)
      case "all" =>
        AttributionPipeline.runAll(conv, sess, costs, outDir, start, end, maxSessions)
        printSummary(spark, outDir)
        println(s"[graft] pipeline complete -> $outDir")
      case "clean-corpus" =>
        // the training-data flow as a product step: quality gate →
        // exact dedup → LSH near-dup dedup over documents.parquet;
        // survivor rule `clustered` (default, one survivor per
        // connected near-dup component) or `greedy` (pairwise drop)
        val docs = Tables.documents(spark, dataDir)
        val minTokens = opts.get("min-tokens").map(_.toInt).getOrElse(10)
        val maxStop = opts.get("max-stopword-ratio").map(_.toDouble).getOrElse(0.5)
        val thresh = opts.get("jaccard-threshold").map(_.toDouble).getOrElse(0.5)
        val cleaned = opts.getOrElse("survivor-rule", "clustered") match {
          case "clustered" => ops.CorpusClean.cleanClustered(docs, minTokens, maxStop, thresh)
          case "greedy" => ops.CorpusClean.clean(docs, minTokens, maxStop, thresh)
          case other => sys.error(s"unknown --survivor-rule $other (clustered|greedy)")
        }
        cleaned.write.mode("overwrite").parquet(s"$outDir/clean_corpus")
        val s = ops.CorpusClean.stats(spark.read.parquet(s"$outDir/clean_corpus")).head()
        println(s"[graft] clean corpus -> $outDir/clean_corpus " +
          s"(docs=${s.getLong(0)}, tokens=${s.getLong(1)}, avg_tokens=${s.getDouble(2)})")
      case "sql" =>
        // the SQL entry point: every fixture table + the attribution
        // domain views registered, one statement run through Catalyst,
        // result landed as parquet — the reference's native interface
        // (SQL text) without writing Scala
        val text = opts.get("sql").orElse(opts.get("query").map { p =>
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
            java.nio.charset.StandardCharsets.UTF_8)
        }).getOrElse(sys.error("--step sql needs --sql '<statement>' or --query <file.sql>"))
        Tables.registerViews(spark, dataDir)
        // transactional tables join the catalog too: --tx
        // name=path[,name=path…]; a `@v<N>` path suffix registers the
        // TIME-TRAVEL snapshot at version N (read-only — reproducing a
        // historical report in SQL), so such views never enter the
        // DML-addressable set below
        val txAll: Seq[(String, String, Option[Long])] =
          opts.get("tx").toSeq.flatMap(_.split(',')).map { pair =>
            val i = pair.indexOf('=')
            require(i > 0, s"--tx expects name=path pairs, got '$pair'")
            val (name, spec) = (pair.substring(0, i), pair.substring(i + 1))
            // the @vN suffix is a time-travel spec only when the PREFIX
            // is a real table — a literal path whose last component
            // happens to end in '@v2' must register as itself (trailing
            // '/' is the documented escape: 'path@v2/' strips to the
            // literal path). The LAST '@v' is the split point: a path
            // like /data@vault/tbl@v3 means version 3 of /data@vault/tbl
            val at = spec.lastIndexOf("@v")
            val v = if (at > 0) spec.substring(at + 2) else ""
            if (v.nonEmpty && v.forall(_.isDigit) &&
                graft.sources.TxStore.isTable(spark, spec.substring(0, at)))
              (name, spec.substring(0, at), Some(v.toLong))
            else (name, spec.stripSuffix("/"), None)
          }
        txAll.foreach { case (name, path, version) =>
          graft.sources.TxStore.registerView(spark, path, name, version)
        }
        val tx: Map[String, String] =
          txAll.collect { case (n, p, None) => n -> p }.toMap
        // dispatch order: maintenance (OPTIMIZE/VACUUM/RESTORE/DESCRIBE
        // HISTORY/SHOW PARTITIONS/CONVERT — statements Spark's grammar
        // doesn't know, so they must intercept before its parser sees
        // them), then DDL (ALTER TABLE → schema-evolution API), then
        // DML (DELETE/UPDATE/MERGE on a --tx view translate to the
        // TxStore API — Catalyst parses both but cannot execute either
        // on a file-backed view), then plain queries through SqlRead,
        // which rewrites tx relations to log-pruned scans (and resolves
        // VERSION/TIMESTAMP AS OF) before Catalyst plans the rest
        graft.sources.SqlMaint.maybeExecute(spark, text, tx) match {
          case Some(m) =>
            // restore/optimize moved the snapshot — advance the view
            // (CONVERT targets a raw path, not a registered view); the
            // artifact is the statement's own summary frame (O(1)
            // rows, or O(retained commits) for DESCRIBE HISTORY),
            // never table data
            m.version.foreach(_ => if (tx.contains(m.view))
              graft.sources.TxStore.registerView(spark, m.path, m.view))
            m.df.write.mode("overwrite").parquet(s"$outDir/sql_result")
            println(s"[graft] sql ${m.op} on tx '${m.view}' " +
              m.version.fold("(no commit)")(v => s"committed v$v") +
              s" -> $outDir/sql_result")
          case None =>
        graft.sources.SqlDdl.maybeExecute(spark, text, tx) match {
          case Some(dd) =>
            // the schema/constraint set moved — advance the view so a
            // following statement sees the altered table
            dd.version.foreach(_ =>
              graft.sources.TxStore.registerView(spark, dd.path, dd.view))
            dd.df.write.mode("overwrite").parquet(s"$outDir/sql_result")
            println(s"[graft] sql ${dd.op} on tx '${dd.view}' " +
              dd.version.fold("(no commit)")(v => s"committed v$v") +
              s" -> $outDir/sql_result")
          case None =>
        graft.sources.SqlDml.maybeExecute(spark, text, tx) match {
          case Some(r) =>
            // the view captured the pre-DML snapshot; advance it and
            // land the COMMIT'S OWN CHANGED ROWS (CDF) as the step
            // result — a one-partition DELETE is a metadata-only commit
            // and its artifact costs O(changes), never a full-table
            // re-land (VERDICT r13). No commit ⇒ an empty change set
            // with the table's schema.
            graft.sources.TxStore.registerView(spark, r.path, r.view)
            val since = r.version.map(_ - 1)
              .getOrElse(graft.sources.TxStore.snapshot(spark, r.path).version)
            val (_, changes) = graft.sources.TxStore.readChangesSince(spark, r.path, since)
            changes.write.mode("overwrite").parquet(s"$outDir/sql_result")
            println(s"[graft] sql ${r.op} on tx '${r.view}' " +
              r.version.fold("(matched nothing, no commit)")(v => s"committed v$v") +
              s"; changed rows -> $outDir/sql_result")
          case None =>
            graft.sources.SqlRead.plan(spark, text, txAll) match {
              case Some(p) =>
                p.rewrites.foreach { rw =>
                  println(s"[graft] sql scan on tx '${rw.view}'" +
                    rw.version.fold("")(v => s" @v$v") +
                    s": skipped ${rw.skipped.size} of " +
                    s"${rw.kept.size + rw.skipped.size} files from log metadata")
                }
                p.df.write.mode("overwrite").parquet(s"$outDir/sql_result")
              case None => // not a single-plan statement — let Catalyst report
                spark.sql(text).write.mode("overwrite").parquet(s"$outDir/sql_result")
            }
            println(s"[graft] sql -> $outDir/sql_result")
        }
        }
        }
      case other =>
        sys.error(s"unknown --step $other (build-journeys|score|score-external|report|clean-corpus|sql|all)")
    }
  }
}
