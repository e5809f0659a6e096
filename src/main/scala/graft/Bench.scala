package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries are forced through the `noop` sink — a bare `.count()` lets
  * Catalyst prune every computed column out of map-only queries, which
  * would benchmark the parquet scan instead of the operator.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 5) and reports
  * the per-query MEDIAN; total = sum of medians. Single runs on this host
  * swing 58–137 s with identical code (round-5 adjudication: the driver
  * recorded 137 s against a 60 s reproducible median purely from host
  * contention), so the artifact must be self-diagnosing: alongside the
  * medians it carries the RAW per-run samples for every query plus
  * /proc/loadavg and MemAvailable snapshots taken before and after the
  * sweep. A contended run then shows up as high load / divergent samples
  * in the artifact itself, and cross-round comparisons can be made
  * min-of-medians instead of trusting one possibly-inflated anchor.
  */
object Bench {
  /** One-line host telemetry: loadavg (1/5/15 min) + MemAvailable (GiB).
    * Linux-procfs only; absent files degrade to nulls rather than failing
    * the bench. */
  private[graft] def hostSnapshot(): String = {
    def readFirstLine(p: String): Option[String] =
      try Some(java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p)).get(0))
      catch { case NonFatal(_) => None }
    val load = readFirstLine("/proc/loadavg")
      .map(_.split("\\s+").take(3).mkString("[", ",", "]"))
      .getOrElse("null")
    val memGib = try {
      val meminfo = java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/meminfo"))
      import scala.jdk.CollectionConverters._
      meminfo.asScala.collectFirst {
        case l if l.startsWith("MemAvailable:") =>
          val kb = l.split("\\s+")(1).toLong
          String.format(java.util.Locale.ROOT, "%.1f", Double.box(kb / 1048576.0))
      }.getOrElse("null")
    } catch { case NonFatal(_) => "null" }
    s"""{"loadavg":$load,"mem_available_gib":$memGib}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val telemetryBefore = hostSnapshot()
    // untimed warmup: JVM/codegen/session init and parquet footer reads
    // should not be billed to whichever query sorts first
    Tables.all.foreach(t => Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // local-iteration filter (same contract as Verify's): unknown names
    // fail fast instead of silently shrinking the run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names.diff(SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples: Seq[Option[Double]] = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // release any blocks a query cached or checkpointed (minhash sigs,
        // postings, LSH candidate tables) so later queries aren't timed
        // against pinned storage; teardown cost stays OUTSIDE the timed
        // region. clearCache covers cache()d relations; releaseAll covers
        // localCheckpoint RDDs, which the catalog cannot see.
        spark.catalog.clearCache()
        Checkpoints.releaseAll()
        if (ok) Some(elapsed) else None
      }
      // a run that THREW is not a timing sample — a failure's near-zero
      // elapsed would otherwise drag the median down and hide the breakage;
      // a query with no successful run reports null in the JSON instead
      val good = samples.flatten
      (name, if (good.isEmpty) None else Some(median(good)), samples)
    }
    // Pinned-fixture dedup rows (round-11 verdict task 5, the streaming
    // fixture's batch twin): the anchor's dedup entries re-base on every
    // driver testdata regen, so round-over-round comparisons there can't
    // separate data shift from regression; these two rows run the same
    // operators against the COMMITTED fixtures/stream corpus and are the
    // comparable. Skipped under a BENCH_ONLY filter (partial runs are
    // local iteration, not anchors) or when the fixture is absent.
    val fixtureDir = sys.env.getOrElse("SPARK_GRAFT_DEDUP_FIXTURE", "fixtures/stream")
    // round-17 (r16 verdict task 5): the exact-state stream leg's pinned
    // batch twin. Keeper state is built ONCE per run over the committed
    // fixture (outside any timed sample); each timed sample then appends a
    // FRESH 500-row batch (10% stored duplicates) through the full ladder
    // — driver bloom rung, partition-pruned maybe-probe, LSM delta append.
    // Fresh ids/texts per sample because appendExactState always appends
    // (the warm-against-throwaway-state trap): every sample pays the same
    // shape instead of convicting its own re-arrivals.
    val exactStateSetup: Option[(String, Array[String])] =
      if (only.isDefined || !new java.io.File(s"$fixtureDir/documents.parquet").exists) None
      else {
        val dir = java.nio.file.Files.createTempDirectory("bench-exactstate-").toString
        graft.operators.Dedup.buildExactState(spark,
          Tables(spark, fixtureDir, "documents"), dir)
        val dupTexts = Tables(spark, fixtureDir, "documents")
          .orderBy(org.apache.spark.sql.functions.col("doc_id")).limit(64)
          .select("text").collect().map(_.getString(0))
        Some((dir, dupTexts))
      }
    val exactStateRep = new java.util.concurrent.atomic.AtomicLong(0L)
    def exactStateBatch(s: SparkSession): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.{col, md5, min => smin}
      import s.implicits._
      val (dir, dupTexts) = exactStateSetup.get
      val rep = exactStateRep.getAndIncrement()
      val base = 1000000L + rep * 500L
      val rows = (0 until 500).map { i =>
        val id = base + i
        val text = if (i % 10 == 0) dupTexts(((rep * 50 + i / 10) % dupTexts.length).toInt)
                   else s"bench exactstate fresh r${rep}_$i"
        (id, text)
      }
      val hashed = rows.toDF("doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
      val gm = hashed.groupBy(col("text_hash"))
        .agg(smin(col("doc_id")).as("batch_min"))
      graft.operators.Dedup.appendExactState(s, hashed, gm, dir)
    }
    val fixtureResults: Seq[(String, Option[Double], Seq[Option[Double]])] =
      if (only.isDefined || !new java.io.File(s"$fixtureDir/documents.parquet").exists) Nil
      else Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)](
        "dedup_minhash_lsh_fixture" -> (s => graft.operators.Dedup.minhashLshPairs(s, fixtureDir)),
        "dedup_simhash_fixture" -> (s => graft.operators.Dedup.simhashPairs(s, fixtureDir)),
        // the two regen-sensitive COMPOSITES (r11 verdict #5 follow-up):
        // the production LSH pipeline and the star-alternation clusters,
        // pinned on the committed corpus so their anchor drift is
        // attributable round-over-round
        "dedup_pipeline_lsh_fixture" -> (s => graft.operators.Dedup.dedupPipelineLsh(s, fixtureDir)),
        "dedup_clusters_star_fixture" -> (s => graft.operators.Dedup.nearDupClustersStar(s, fixtureDir)),
        // round-15 (r14 verdict task 6): the NEW families' pinned twins —
        // without them a real regression in the trained-quality, selection
        // or curation-select paths is indistinguishable from a testdata
        // regen next round
        "quality_lr_lit_fixture" -> (s =>
          graft.operators.QualityModel.scoreLiteralQuery(s, fixtureDir)),
        "sel_model_score_fixture" -> (s =>
          graft.operators.Selection.storedModelScoreQuery(s, fixtureDir)),
        "curation_select_fixture" -> (s =>
          graft.operators.Curation.curatedSelectedSample(s, fixtureDir)),
        // round-17: the keeper ladder's per-batch cost on the committed
        // corpus (see exactStateSetup above)
        "exactstate_fixture" -> (exactStateBatch _)
      ).map { case (name, fn) =>
        val samples: Seq[Option[Double]] = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark).write.format("noop").mode("overwrite").save(); true }
            catch { case NonFatal(e) =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
          val elapsed = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          Checkpoints.releaseAll()
          if (ok) Some(elapsed) else None
        }
        val good = samples.flatten
        (name, if (good.isEmpty) None else Some(median(good)), samples)
      }
    val telemetryAfter = hostSnapshot()
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // env-supplied strings go through a JSON string escape — a quote or
    // backslash in a path must not break the anchor tooling's parse
    def jstr(v: String): String = v.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v, _) => s""""$k":${v.map(f3).getOrElse("null")}""" }
      .mkString("{", ",", "}")
    // failed runs ride as null so the array length ALWAYS equals `runs` —
    // a 3-entry array under runs=5 would be ambiguous between a filtered
    // config and two failures that only reached (truncated) stderr
    val raw = results.map { case (k, _, samples) =>
      s""""$k":${samples.map(_.map(f3).getOrElse("null")).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // fixture rows ride in their own section, OUTSIDE `queries`/`value`:
    // they are round-over-round comparables, not part of the sf total
    val fixtureJson =
      if (fixtureResults.isEmpty) ""
      else {
        val fq = fixtureResults.map { case (k, v, _) =>
          s""""$k":${v.map(f3).getOrElse("null")}""" }.mkString("{", ",", "}")
        val fr = fixtureResults.map { case (k, _, ss) =>
          s""""$k":${ss.map(_.map(f3).getOrElse("null")).mkString("[", ",", "]")}"""
        }.mkString("{", ",", "}")
        s""","dedup_fixture":{"dir":"${jstr(fixtureDir)}","queries":$fq,"samples":$fr}"""
      }
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"${jstr(sfDir)}"""" +
      s""","runs":$runs,"samples":$raw$fixtureJson,"host_before":$telemetryBefore,"host_after":$telemetryAfter}"""
    println(line)
    // the driver's log capture keeps only a ~2 KB TAIL of stdout, so the
    // full line above (8 KB+) always loses its head — including the
    // "metric"/"value" fields — and the round artifact records
    // parsed=null. Persist the complete line to a file, and ALSO print a
    // LAST line compact enough to survive the tail window whole: headline
    // total, host telemetry, the slowest queries, and a pointer to the
    // file holding the complete per-query map.
    //
    // Output-file policy: BENCH_local.json is the COMMITTED quiet-host
    // anchor (min-of-medians protocol, VERDICT r7 #1) — an unattended
    // default-config sweep must never overwrite it (that is exactly how
    // the round-8 anchor was lost to a contended-host run). Default
    // sweeps land in BENCH_run_c$cpus.json — suffixed by the core count
    // because the driver sweeps TWICE (main cpus + a low-cpus scaling run)
    // and a shared default file name let the second run destroy the first
    // run's per-query map (round-17 PERF had n_common=0 for exactly this).
    // Writing the anchor is an explicit SPARK_GRAFT_BENCH_OUT=
    // BENCH_local.json decision. Filtered runs stay off both.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) s"BENCH_partial_c$cpus.json" else s"BENCH_run_c$cpus.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case NonFatal(e) => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    val slowest = results.collect { case (k, Some(v), _) => (k, v) }
      .sortBy(-_._2).take(10)
      .map { case (k, v) => s""""$k":${f3(v)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"${jstr(sfDir)}","runs":$runs""" +
      s""","n_queries":${results.size},"queries_file":"${jstr(out)}","slowest":$slowest""" +
      s""","host_before":$telemetryBefore,"host_after":$telemetryAfter}""")
    spark.stop()
  }
}
