package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b runs a subset
    // (the driver sets nothing and gets the full surface)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        // a typo'd name must not silently shrink the run to a green subset
        val unknown = names.diff(SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir).coalesce(1)
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        // A skew guard arming on the GATE corpus (a driver testdata regen
        // with a >cap duplicate cluster) would trim Spark-side pairs and
        // fail the DuckDB compare as an opaque hash mismatch. Surface the
        // armed state identifiably: any nonzero trim observation means
        // "guard armed — the mismatch is the guard, not the algorithm".
        graft.Observed.metrics(df).foreach { case (obs, row) =>
          val trimmed = (obs.startsWith("graft_lsh_trim_") ||
            obs.startsWith("graft_shingle_trim_")) &&
            row.toSeq.exists { case l: Long => l != 0L; case _ => false }
          if (trimmed)
            System.err.println(s"[verify] GUARD-ARMED $name: $obs=$row — skew guard " +
              "trimmed rows on the gate corpus; a hash mismatch here is the guard arming")
        }
      }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop any blocks the query cached or checkpointed so the session
      // doesn't accumulate pinned storage across all the queries
      spark.catalog.clearCache()
      Checkpoints.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
