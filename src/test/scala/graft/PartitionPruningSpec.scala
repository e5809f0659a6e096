package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout evidence for the write path: a corpus written
  * `partitionBy(lang)` must prune non-matching partitions at the SCAN
  * (PartitionFilters, not post-scan filters) — the layout decision that
  * turns a 100 TB full-corpus read into a per-language read.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("lang-partitioned write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part-docs").toString
    Tables(spark, sf, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("lang") === "de")
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(800))

    // pruned read returns exactly the partition's rows
    val expected = Tables(spark, sf, "documents").filter(col("lang") === "de").count()
    assert(q.count() == expected)

    // the physical scan selects strictly fewer partition directories than exist
    import org.apache.spark.sql.execution.FileSourceScanExec
    val selected = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    val all = spark.read.parquet(dir).select(countDistinct(col("lang"))).collect()(0).getLong(0)
    assert(selected.nonEmpty && selected.head == 1 && all > 1,
      s"scan selected $selected of $all lang partitions")
  }
}
