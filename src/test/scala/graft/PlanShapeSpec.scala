package graft

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: the properties PLANS.md documents, locked
  * as assertions so a refactor that silently de-optimizes a flagship
  * query (loses a pushdown, turns a broadcast chain into shuffles,
  * splits a window, introduces a nested loop) fails CI instead of only
  * showing up in the next bench.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_scan_prune: filter and projection reach the parquet scan") {
    val p = plan("q_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      "shipdate filter not pushed to scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_shipdate:timestamp>"),
      "scan reads more columns than the projection needs")
  }

  test("q_join_multihop: dims broadcast, fact side never sort-merges") {
    val p = plan("q_join_multihop")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!p.contains("SortMergeJoin"), "fact side should not shuffle for the join")
  }

  test("q_window_lag: both lags share ONE window exec") {
    val p = plan("q_window_lag")
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      s"expected exactly one Window node:\n$p")
  }

  test("q_topk_perkey: custom partial/final exec pair around one exchange") {
    val p = plan("q_topk_perkey")
    assert("TopKPerKey".r.findAllIn(p).size == 2,
      s"expected the partial/final TopKPerKey exec pair:\n$p")
    assert(p.contains("Exchange hashpartitioning(o_orderstatus"),
      "expected the hash exchange between partial and final top-k")
  }

  test("q_rep_fraud: report joins broadcast the dims") {
    val p = plan("q_rep_fraud")
    assert(p.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(!p.contains("SortMergeJoin"), "the fact side should never sort-merge")
  }

  test("q_bloom_semi: the Bloom pre-filter sits below the semi join") {
    // formatted mode: simple toString truncates the (array-literal-heavy)
    // filter condition, hiding the expression this gate checks for
    val p = SparkEntry.queries("q_bloom_semi")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin LeftSemi"), "expected a broadcast semi join")
    assert(p.contains("graft_bloom_might_contain"),
      "Bloom membership filter missing from the plan")
    // the big-side child printed directly under the join is a Filter —
    // the Bloom prune runs in the scan stage, before the exchange
    assert("BroadcastHashJoin LeftSemi[^\\n]*\\n[^\\n]*:- Filter".r
      .findFirstIn(p).isDefined,
      s"Bloom filter is not the join's big-side child:\n${p.take(2000)}")
  }

  test("dedup_ngram: native one-pass signature, no corpus-wide explode before it") {
    val p = plan("dedup_ngram")
    assert(p.contains("graft_chargram_minhash"),
      "signature should be the native QCharGramMinHash expression")
    assert(p.contains("graft_sorted_intersect_count"),
      "verify should be the scalar merge-intersect, not an explode+join")
  }

  test("no unblocked joins in the LSH/range operators") {
    // dedup_semantic is excluded: its centroid assignment is the IVF
    // every-vector × broadcast-codebook BroadcastNestedLoopJoin, by
    // design (see Similarity.assign)
    for (name <- Seq("dedup_embed", "dedup_minhash", "dedup_ngram", "dedup_simhash",
        "q_range_join", "q_interval_overlap", "dedup_incremental", "dedup_crossset")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
  }

  test("fifth-wave queries: interval/blocked joins stay equi-keyed (no NLJ)") {
    // q_scd2_pit's validity interval and q_fuzzy_join's gram blocking
    // must ride equi joins as residual conditions — a lost equi key
    // degrades either to a nested loop over the fact/corpus side
    for (name <- Seq("q_scd2_merge", "q_scd2_pit", "q_fuzzy_join",
        "q_dq_audit", "q_mv_refresh")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
  }

  test("seventh-wave: record-linkage joins stay equi-keyed (no NLJ)") {
    // q_linkage's trigram blocking and component joins must ride equi
    // keys; the MV-routed and skip-scan entries materialize driver-side
    // (group-cardinality rows) so their final plans are local scans —
    // the gate locks that they never regress to a distributed replan
    // with a nested loop
    for (name <- Seq("q_linkage", "q_mv_route", "q_mv_rollup", "q_skip_scan",
        "q_tpch_q3", "q_tpch_q5", "q_mv_quantile", "q_privacy", "q_anonymize")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
    // the 6-way TPC-H Q5 join: dims reach the fact side as broadcasts
    assert(plan("q_tpch_q5").contains("BroadcastHashJoin"),
      "q_tpch_q5 should broadcast its dims")
  }

  test("audioFrameFeatures: shuffle-free (map-side codec + relational framing)") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Multimodal.audioFrameFeatures(
      graft.operators.Multimodal.attachMediaPayload(
        graft.Tables(spark, dir, "documents").select(col("doc_id"))))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"audio framing should not shuffle:\n${p.take(1200)}")
  }

  test("text_bm25: global top-k is a heap (TakeOrdered), not a sort") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    // executedPlan.toString renders SortExec as "Sort [" — matching the
    // class name would be vacuously true
    assert(!p.contains("Sort ["), "top-k must not global-sort")
  }

  test("corpusShard: exactly one exchange (the shard key)") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.TextAnalysis.corpusShard(
      graft.Tables(spark, dir, "documents").select(col("doc_id")), nShards = 16)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"want 1 hash exchange, got $exchanges:\n${p.take(1200)}")
  }

  test("q_funnel: one user-key exchange feeds the stacked stage windows") {
    val p = plan("q_funnel")
    // chained stage mins are dependent windows — they may stack as
    // separate Window execs but must all ride ONE hash exchange, with
    // the per-user and global reductions reusing its partitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"want 1 hash exchange, got $exchanges:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_twap: one exchange; the duration window and the aggregate share it") {
    val p = plan("q_twap")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"want 1 hash exchange, got $exchanges:\n${p.take(1500)}")
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "lead() should be a single Window exec")
  }

  test("q_cohort: no join; exchanges strictly reduce (user -> user-period -> cell)") {
    val p = plan("q_cohort")
    assert(!p.contains("Join"), s"cohort should not join:\n${p.take(1200)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"want <= 3 hash exchanges, got $exchanges")
  }

  test("q_regression: one aggregation pass (partial+final HashAggregate), no Expand") {
    val p = plan("q_regression")
    assert("HashAggregate".r.findAllIn(p).length == 2,
      s"want one partial/final HashAggregate pair:\n${p.take(1500)}")
    assert(!p.contains("Expand"), "sufficient statistics must not Expand")
  }

  test("eighth-wave TPC-H family: joins stay equi-keyed, dims broadcast") {
    // q_tpch_q22 is excluded from the NLJ check: its scalar-average
    // threshold is a deliberate broadcast single-row cross join
    for (name <- Seq("q_tpch_q1", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
        "q_tpch_q9", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
        "q_tpch_q19")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
    assert(!plan("q_tpch_q22").contains("CartesianProduct"),
      "q_tpch_q22's scalar threshold must broadcast, not cartesian")
    for (name <- Seq("q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q14",
        "q_tpch_q19"))
      assert(plan(name).contains("BroadcastHashJoin"), s"$name should broadcast dims")
  }

  test("partsupp family (Q2/Q11/Q16/Q20): equi-keyed joins; scalar thresholds broadcast") {
    // q_tpch_q11 is excluded from the NLJ check: its total-value
    // threshold is a deliberate broadcast single-row cross join (the
    // Q22 pattern)
    for (name <- Seq("q_tpch_q2", "q_tpch_q16", "q_tpch_q20")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
    assert(!plan("q_tpch_q11").contains("CartesianProduct"),
      "q_tpch_q11's scalar threshold must broadcast, not cartesian")
    // Q20's correlated quantity aggregate joins on BOTH correlate keys
    assert(plan("q_tpch_q20").contains("BroadcastHashJoin") ||
      plan("q_tpch_q20").contains("SortMergeJoin"),
      "q_tpch_q20 lost its equi joins")
    // Q16's NOT IN must be an anti join, not a filter subquery rescan
    assert(plan("q_tpch_q16").contains("LeftAnti"),
      "q_tpch_q16's NOT IN should plan as a left anti join")
  }

  test("q_tpch_q6: every predicate reaches the parquet scan; one agg pair") {
    // formatted mode: simple toString truncates the scan's PushedFilters
    // metadata at 100 chars, hiding the bounds this gate checks for
    val p = SparkEntry.queries("q_tpch_q6")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"scan predicates not pushed:\n${p.take(1200)}")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"discount/quantity/date bounds missing from PushedFilters:\n${p.take(1200)}")
    // the agg-pair count uses the plain tree: formatted mode lists every
    // node twice (tree + detail section)
    assert("HashAggregate".r.findAllIn(plan("q_tpch_q6")).length == 2,
      "want one partial/final HashAggregate pair")
  }

  test("q_tpch_q1: all eight aggregates in ONE partial/final pass") {
    val p = plan("q_tpch_q1")
    assert("HashAggregate".r.findAllIn(p).length == 2,
      s"want one partial/final HashAggregate pair:\n${p.take(1500)}")
    assert(!p.contains("Expand"), "the agg surface must not Expand")
  }

  test("imageAHash: partition-wise decode, no shuffle") {
    import org.apache.spark.sql.functions.col
    // the registered query adds an output orderBy for the oracle dump;
    // the operator itself must be shuffle-free
    val df = graft.operators.Multimodal.imageAHash(
      graft.operators.Multimodal.attachMediaPayload(
        graft.Tables(spark, dir, "documents").select(col("doc_id")))
        .filter(col("fmt") =!= "wav"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"decode+hash should be shuffle-free:\n${p.take(1200)}")
  }
}
