package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off 10x scale experiment: replicate sf0.1 inputs (1M events, 50k
  * docs, 20k vectors) into /tmp and time the heaviest operators, to observe
  * scaling behavior beyond the provided SFs. Dev tool, not part of the
  * driver contract. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/sf1x"
    val k = 10
    // events: shift user_id and ts per replica (keeps cardinality scaling)
    val ev = Tables(spark, src, "events")
    val evBig = (0 until k).map(i => ev
      .withColumn("user_id", col("user_id") + lit(i * 10000L))
      .withColumn("event_id", col("event_id") + lit(i * 10000000L))).reduce(_ unionAll _)
    evBig.write.mode("overwrite").parquet(s"$dst/events.parquet")
    val docs = Tables(spark, src, "documents")
    val docsBig = (0 until k).map(i => docs
      .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))).reduce(_ unionAll _)
    docsBig.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = Tables(spark, src, "embeddings")
    val embBig = (0 until k).map(i => emb
      .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))).reduce(_ unionAll _)
    embBig.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // lineitem replicates with shifted orderkeys against the SAME part dim:
    // per-part groups grow 10x — the correlated-agg scaling shape
    val li = Tables(spark, src, "lineitem")
    val liBig = (0 until k).map(i => li
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))).reduce(_ unionAll _)
    liBig.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    Tables(spark, src, "part").write.mode("overwrite").parquet(s"$dst/part.parquet")
    // orders replicate against the SAME customer dim (10x orders per
    // customer — the outer-join distribution just shifts right)
    val ord = Tables(spark, src, "orders")
    val ordBig = (0 until k).map(i => ord
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))).reduce(_ unionAll _)
    ordBig.write.mode("overwrite").parquet(s"$dst/orders.parquet")
    Tables(spark, src, "customer").write.mode("overwrite").parquet(s"$dst/customer.parquet")
    println(s"rows: events=${spark.read.parquet(s"$dst/events.parquet").count()}" +
      s" docs=${spark.read.parquet(s"$dst/documents.parquet").count()}" +
      s" emb=${spark.read.parquet(s"$dst/embeddings.parquet").count()}")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SCALE10X $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // q_dedup_embedding is deliberately ABSENT: on a k×-replicated corpus
    // every replica pair is a TRUE near-dup (cos = 1), so the correct
    // output is Θ(k²·n) pairs — output-bound, not plan-bound (same law as
    // exact jaccard/simhash on duplicated corpora; run exactDedup first).
    for (q <- Seq("q_card_stats_all", "q_card_sketch_rollup", "q_card_minute_approx",
                  "q_dedup_minhash_lsh", "q_dedup_ngram_jaccard", "q_dedup_simhash",
                  "q_text_langid", "q_stream_data_driven",
                  // round-3 additions
                  "q_dedup_contamination", "q_text_tfidf",
                  "q_text_seq_pack", "q_text_pii_scrub", "q_text_langid_trigram",
                  "q_sim_ann_ivf",
                  // round-4 additions. NB clusters/clusters_star consume the
                  // REPLICA-MERGED pair graph: identical replicas join their
                  // originals' components (jaccard=1 cross-replica pairs), so
                  // edges grow ~k^2 (the duplication law above), not 10x —
                  // their timings here are against a ~100x-edge input
                  "q_dedup_spans", "q_text_outliers", "q_rel_avg_subquery",
                  "q_stream_data_driven_exact", "q_dedup_clusters", "q_dedup_clusters_star",
                  "q_sim_ann_lsh", "q_emb_jl_project",
                  "q_text_dup_ngrams", "q_sample_token_budget", "q_rel_cust_dist",
                  "q_tmp_funnel", "q_tmp_retention", "q_tmp_event_paths")) {
      time(q)(SparkEntry.queries(q)(spark, dst).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
