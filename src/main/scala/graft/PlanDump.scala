package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump formatted physical plans for representative queries — the
  * engine's evidence that filters push down, dims broadcast, windows
  * collapse, and the custom operators plan as intended.
  * Usage: runMain graft.PlanDump [sfDir] [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_scan_prune", "q_join_multihop", "q_scd1_merge",
        "q_window_lag", "q_topk_perkey", "ann_brute",
        "dedup_embed", "q_range_join", "q_rep_fraud",
        "q_bloom_semi", "ann_ivf_learned", "text_pack",
        "dedup_ngram", "dedup_minhash", "text_decontam", "text_curate",
        "dedup_simhash", "dedup_containment", "ann_int8", "q_zorder",
        "text_tempsample", "dedup_incremental", "dedup_semantic",
        "text_bm25", "text_perplexity", "text_shard",
        "dedup_semantic2", "dedup_crossset", "text_quantile", "q_profile",
        "q_funnel", "q_cohort", "q_twap", "q_regression",
        "q_window_range", "mm_imagehash", "q_scd2_changes", "q_mv_approx",
        "q_linkage", "q_skip_scan", "q_privacy", "q_anonymize",
        "dedup_triangles", "dedup_triangles_deg",
        "q_tpch_q10", "q_tpch_q17", "q_tpch_q18",
        // round-9 continuation (q_bucket_join/q_stream_session
        // materialize driver-side / via the memory sink, so their
        // dumps are local scans — plan properties are asserted
        // in-entry and in their specs instead; same for the streamed
        // CDC consumers q_stream_cdf/replica/scd2/enrich)
        "q_table_diff", "q_cdf_apply", "q_cdf_compact",
        // PQ family: broadcast codebooks/ADC tables; the SEARCH side
        // never shuffles a raw vector (ann_pq_learned's refinement is
        // a build-time training pass and does exchange subvectors)
        "ann_pq", "ann_pq_learned", "ann_ivfpq")
        // q_replica_group materializes through warehouse commits
        // (ReplicateGroupSpec gates its plans); q_bloom_skip and
        // q_meta_agg assert their plan property in-entry (files
        // pruned / PushedAggregation present) and return driver-side
        // rows, so their dumps would be local scans
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
