package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory audit: constructs EVERY SparkEntry query once at
  * sf0.001 and locks two invariants per query — the ones a single new
  * entry is most likely to silently break:
  *
  *  1. OUTPUT SCHEMA inside the driver-proven dtype allow-list
  *     (`Verify.driverUnsafeColumns`) — the round-8 decimal regression
  *     shipped because nothing swept the whole inventory.
  *  2. NO SCALE-KILLER JOINS: no CartesianProduct anywhere, and
  *     BroadcastNestedLoopJoin only where a documented design uses a
  *     broadcast single-row/codebook build (allow-listed below). A new
  *     query that loses an equi key plans a nested loop over the fact
  *     side — O(n·m) at 100 TB — and this gate fails it by name.
  *
  * PlanShapeSpec pins richer per-query properties (pushdown, exchange
  * counts, broadcast chains); this spec is the breadth net that covers
  * every entry, including ones added after the last PlanShapeSpec
  * update. Gated entries (streams, MV-routed, bucket-join) EXECUTE at
  * this SF — seconds — and materialize driver-side, so their audited
  * plan is the local result scan; their internal plan properties are
  * pinned by their own specs.
  */
class SuiteAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * every one is a broadcast of a SINGLE-ROW aggregate (scalar
    * threshold) or a tiny codebook — bounded build side by
    * construction, never data × data.
    */
  private val bnljAllowed = Set(
    // broadcast QUERY-SET / codebook joins: the broadcast side is the
    // fixed query batch or centroid table, never the corpus
    "ann_brute", "ann_int8", "ann_ivf", "ann_ivf_learned", "ann_assign2",
    "ann_pq", // codebook broadcast: every-vector × codebook PQ encode/ADC
    "ann_ivfpq", // coarse + PQ codebook broadcasts (assign/encode/probe)
    "ann_ivfpq_rerank", // same chain + broadcast candidate re-rank joins
    "ann_ivfpq_prod", // learned-codebook chain: same codebook broadcasts
    "ann_recall", // same chain + broadcast-queries exact ground truth
    "ann_recall_clustered", // same: broadcast-queries exact ground truth
    // same chains per ladder rung + the single-row chosen-rung pick
    "ann_autotune", "ann_autotune_noise",
    "ann_autotune_stored", // same decision tail over the stored index
    "ann_balance", // codebook broadcasts in the index build it audits
    "ann_search_stored", // same stored-search chain + decision constants
    "dedup_semantic", // IVF: every vector × broadcast coarse codebook
    "dedup_semantic2", // two-level routing: coarse-codebook broadcasts
    "q_tpch_q11", // scalar total-value threshold (single-row broadcast)
    "q_tpch_q22", // scalar average-balance threshold (single-row broadcast)
    // broadcast SINGLE-ROW aggregate (global stats / cutoffs / bounds)
    // crossed into the per-row stage — one row × data, not data × data
    "q_profile", "q_profile_approx", // single-row profile agg branches
    "q_zorder", // global min/max bounds row for the curve interleave
    "q_basket", // global order-count row crossed into the pair frame
    "q_rfm", // anchor-date row crossed into the per-customer frame
    "q_ks", "q_drift", "q_wasserstein", // day-span row for the half split
    "text_bm25", // corpus N/avgdl stats row
    "text_budget", "text_lenstats", "text_perplexity", "text_quantile",
    "text_sweep", "text_tempsample", "text_topterms" // cutoff/stats rows
  )

  test("every query has an oracle (and no orphan oracles)") {
    // a query without an oracleSql entry silently downgrades to the
    // driver's weaker rows-only check; an oracle without a query is
    // dead SQL — both are inventory drift
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"only in queries: ${(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted}; " +
        s"only in oracles: ${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
  }

  test("all queries: driver-safe output schema; no cartesian; BNLJ allow-listed") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val badTypes = Verify.driverUnsafeColumns(df.schema)
        if (badTypes.nonEmpty)
          failures += s"$name: dtype outside allow-list: $badTypes"
        val plan = df.queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: plans a CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          failures += s"$name: plans a BroadcastNestedLoopJoin (not allow-listed)"
      } catch {
        case e: Throwable =>
          failures += s"$name: construction failed: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
