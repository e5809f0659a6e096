package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries are forced through the `noop` sink — a bare `.count()` lets
  * Catalyst prune every computed column out of map-only queries, which
  * would benchmark the parquet scan instead of the operator.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and reports
  * the per-query MEDIAN; total = sum of medians. Single runs on this host
  * swing 58–106 s with identical code, so round-over-round comparisons of
  * single samples chase noise, not plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init and parquet footer reads
    // should not be billed to whichever query sorts first
    Tables.all.foreach(t => Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples: Seq[Option[Double]] = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
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
      name -> (if (good.isEmpty) None else Some(median(good)))
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s""""$k":${v.map(f3).getOrElse("null")}""" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // the driver's log capture truncates long stdout lines, dropping the
    // head of the per-query map from the recorded artifact — persist the
    // complete line so every round's numbers survive verbatim
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
