package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over the engine's similarity/linkage graphs — the
  * diagnostics layer above [[Dedup.clusterLabels]]: components tell you
  * WHAT merged; degrees and triangles tell you WHY and HOW DENSELY
  * (a near-dup cluster that is a clique is template spam; a star is one
  * anchor document with orbiting variants; a long path is drift).
  *
  * Edges are canonically oriented (`a < b`, one row per undirected
  * edge), which makes triangle counting a two-join chain over the
  * ORIENTED list: (a<b)∧(b<c)∧(a<c) enumerates each triangle exactly
  * once — the standard distributed formulation; at scale, orienting by
  * DEGREE instead of id bounds the join fan-out by arboricity
  * (documented trade; id-orientation keeps the DuckDB oracle exact and
  * the semantics identical).
  */
object GraphMetrics {

  /** Rotating registry of the frames this object has MATERIALIZED
    * (persisted `InternalRow` RDD behind a `LogicalRDD` leaf — the
    * lineage-FLATTENING half of `localCheckpoint` without the
    * truncation; a plain cache keeps the whole upstream pipeline in
    * the logical plan, and the metric dags reference the edge frame
    * 3-7 times — every reference re-walks that tree through
    * canonicalization and optimization, measured as >10 s of pure
    * driver time per triangle query on the sf0.1 near-dup graph).
    * Metrics return LAZY frames, so an in-function
    * unpersist-after-action is impossible — but unbounded block
    * accumulation in a long-lived session is a real leak. Bound: each
    * metric invocation materializes at most 2 frames (edge list +
    * directed list); the registry keeps the [[MaxLiveCaches]] most
    * recently USED (a memo hit refreshes queue position) and releases
    * older ones' storage as new calls arrive. Eviction is
    * RECOMPUTE-SAFE: the persisted RDD keeps its DAG (the compiled
    * physical plan), so a straggler frame consumed after its entry
    * rotated out re-executes that DAG instead of failing — slower, and
    * still free of Catalyst re-planning. Caveat: re-execution re-reads
    * the CURRENT source files, so recompute-after-eviction is
    * snapshot-consistent only for immutable sources; if the inputs
    * mutated since materialization, a post-eviction consumer sees the
    * re-read data, not the memoized image ([[checkpointed]]'s "data as
    * of its materialization" contract holds only while the entry is
    * live).
    * [[releaseCaches]] drains storage explicitly under the same
    * guarantee.
    */
  private val MaxLiveCaches = 8
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
     org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
     DataFrame)]

  /** Materialize `df` eagerly behind a leaf plan, MEMOIZED on the
    * canonicalized source plan: two metric calls over the same pairs
    * (degrees then trianglesByDegree, say) reuse one materialized edge
    * list instead of re-running the upstream pipeline per call — the
    * sharing the CacheManager used to give plan-equal cache() twins.
    * Same staleness contract as the CacheManager too: a memo hit
    * serves the data as of its materialization, not a re-read of
    * mutated source files. A hit also moves the entry to the queue
    * tail so its rotation headroom restarts from the latest use, not
    * original insertion.
    */
  private def checkpointed(df: DataFrame): DataFrame = synchronized {
    val key = df.queryExecution.analyzed.canonicalized
    val it = live.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e._1 == key) {
        live.remove(e)
        live.add(e)
        return e._3
      }
    }
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val rdd = bridge.toInternalRows(df)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager: materialize once, up front, like localCheckpoint did
    val out = bridge.fromInternalRows(df.sparkSession, rdd, df.schema)
    live.add((key, rdd, out))
    while (live.size > MaxLiveCaches)
      Option(live.poll()).foreach(_._2.unpersist(blocking = false))
    out
  }

  private def releaseBlocks(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(df)
      .foreach(_.unpersist(blocking = false))

  /** Release the storage of every frame this object still tracks.
    * Safe at any time: an unconsumed metric frame whose backing RDD
    * was released RECOMPUTES through the RDD's own DAG at action time
    * (the physical plan is baked into the lineage — re-execution, not
    * failure, and no Catalyst re-planning).
    */
  def releaseCaches(): Unit = {
    var e = live.poll()
    while (e != null) { e._2.unpersist(blocking = false); e = live.poll() }
  }

  /** Canonical edge list, materialized AND plan-flattened via
    * [[checkpointed]] (same mitigation [[prCore]] uses inside its
    * loop): every consumer self-joins it — two branches for degrees,
    * THREE to SEVEN plan references for the triangle dags — and a mere
    * cache() would keep the whole upstream pair-generation pipeline
    * (for an LSH similarity graph: the full signature+band+verify
    * computation) inside the logical plan, where every downstream
    * canonicalization / cache lookup / optimizer pass re-walks it once
    * PER REFERENCE. Measured on the sf0.1 near-dup graph: the
    * degree-oriented triangle dag spent >10 s of pure DRIVER time
    * re-planning the cached-but-un-truncated tree (sum of executor
    * stage time: 0.2 s); checkpointing both frames cuts the whole
    * query to ~the id-oriented variant's latency. The edge list
    * itself is pairs-sized (tiny next to the corpus), and the
    * materialization is work the first consumer would do anyway.
    */
  private def oriented(pairs: DataFrame): DataFrame =
    checkpointed(pairs.select(
      least(col("doc_a"), col("doc_b")).as("a"),
      greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct())

  /** Per-node degree over the undirected edge set. */
  def degrees(pairs: DataFrame): DataFrame = {
    val e = oriented(pairs)
    e.select(col("a").as("doc_id")).unionAll(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
  }

  /** BOUNDED-HOP REACHABILITY — BFS distances from a seed set through
    * the undirected graph, out to `maxHops`: the "blast radius" of
    * flagged documents through a near-dup graph (a decontamination
    * primitive — one leaked benchmark doc taints every close paraphrase
    * within k hops, not just its direct neighbors).
    *
    * Frontier expansion, one hash join per hop: frontier ⋈ edges gives
    * the next ring, the anti-join against the visited set keeps the
    * first (= minimal) distance, and each ring is checkpointed so the
    * loop's plan stays flat (the [[prCore]] lineage rule). maxHops
    * bounds the rounds, so the whole walk is `maxHops` joins over
    * frontier-sized frames — never an all-pairs closure.
    */
  def reachWithin(pairs: DataFrame, sources: DataFrame, maxHops: Int,
                  idCol: String = "doc_id"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32, "bounded BFS: 1..32 hops")
    val e = oriented(pairs)
    val edges = checkpointed(
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"))))
    // one checkpoint per RING only — the visited set stays a union plan
    // over already-flat rings (≤ maxHops legs), so no frame
    // materializes twice
    val rings = scala.collection.mutable.ArrayBuffer(
      checkpointed(sources.select(col(idCol).as("id")).distinct()
        .withColumn("dist", lit(0L))))
    for (h <- 1 to maxHops) {
      val frontier = rings.last.select("id")
      val visited = rings.map(_.select("id")).reduce(_ unionAll _)
      rings += checkpointed(
        frontier.join(edges, frontier("id") === edges("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .withColumn("dist", lit(h.toLong)))
    }
    rings.reduce(_ unionAll _).withColumnRenamed("id", idCol)
  }

  /** All triangles, one row each, vertices sorted (x < y < z). */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = oriented(pairs)
    e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
  }

  /** Per-node triangle participation (every triangle credits its three
    * vertices) — the local clustering signal.
    */
  def trianglesPerNode(pairs: DataFrame, byDegree: Boolean = false): DataFrame =
    (if (byDegree) trianglesByDegree(pairs) else triangles(pairs))
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))

  /** Triangle enumeration with DEGREE orientation — each edge directed
    * from its lower-(degree, id) endpoint, so every out-list is
    * bounded by O(√m) and the wedge self-join's fan-out by the graph's
    * arboricity. On the skewed similarity graphs LSH produces (one
    * anchor document, thousands of orbiters) id-orientation can hand
    * the anchor the whole orbit as its out-list and square it; degree
    * orientation is the standard at-scale fix. Same triangle set as
    * [[triangles]], vertices sorted by id (spec-asserted).
    */
  def trianglesByDegree(pairs: DataFrame): DataFrame = {
    val e = oriented(pairs)
    // degrees from the SAME cached edge list (degrees(pairs) would
    // build — and cache — a second identical copy)
    val d = e.select(col("a").as("doc_id"))
      .unionAll(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val withDeg = e
      .join(d.select(col("doc_id").as("a"), col("degree").as("da")), Seq("a"))
      .join(d.select(col("doc_id").as("b"), col("degree").as("db")), Seq("b"))
    // direct low-rank -> high-rank, rank = (degree, id); carry the
    // head's rank so the wedge join can order its two heads
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // materialized + truncated like `e` in [[oriented]]: the wedge's
    // two branches would otherwise re-execute (and re-plan) the degree
    // aggregation + attach joins per reference. The closing probe
    // below needs no degrees at all, so it reads the checkpointed `e`
    // directly — one attach pass total.
    val dir = checkpointed(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv")))
    val e1 = dir.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val e2 = dir.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    // close the wedge against the undirected edge SET — the id-oriented
    // cache probed on (least, greatest); rank direction of the closing
    // edge is irrelevant to closure, so the degree attach is skipped
    val closing = e.select(col("a").as("cl_a"), col("b").as("cl_b"))
    wedges.join(closing,
        col("cl_a") === least(col("v1"), col("v2")) &&
        col("cl_b") === greatest(col("v1"), col("v2")))
      .select(least(col("u"), col("v1"), col("v2")).as("x"),
        // middle by elimination — ids are table keys, far below the
        // Long overflow range a three-way sum could threaten
        (col("u") + col("v1") + col("v2")
          - least(col("u"), col("v1"), col("v2"))
          - greatest(col("u"), col("v1"), col("v2"))).as("y"),
        greatest(col("u"), col("v1"), col("v2")).as("z"))
  }

  /** PageRank over the undirected near-dup/linkage graph in EXACT
    * integer micro-units — link-analysis centrality as a canonical-
    * selection signal (the hub of an anchor-star cluster outranks its
    * orbiting variants; a clique ranks its members equally).
    *
    * Determinism: ranks are BIGINT micro-units (start 1e6 per node);
    * each iteration a node sends every neighbor
    * `(r · dampMilli) div (deg · 1000)` — INTEGRAL division, which
    * Spark's `div` and DuckDB's `//` compute identically on positive
    * longs (a double division here would round differently at the ulp
    * and break the cross-engine hash) — and every node restarts from
    * `1e6·(1000−dampMilli)/1000` teleport mass. Floor remainders leak
    * a little mass per hop (bounded by deg·iters micro-units); that is
    * the price of bit-portability and is identical in both engines.
    * Isolated nodes hold exactly the teleport mass.
    *
    * Scale shape: the standard distributed PR loop — per iteration ONE
    * join of the edge list against the rank vector on src (both
    * pre-partitionable on the same key) and ONE groupBy dst; `iters`
    * is a small constant so the lineage stays shallow (checkpoint
    * between iterations if you raise it past ~10).
    * Output: (idCol, rank_micro).
    */
  def pageRankMicro(pairs: DataFrame, nodes: DataFrame, iters: Int = 3,
                    dampMilli: Int = 850, idCol: String = "doc_id"): DataFrame =
    prCore(symEdges(pairs.withColumn("w", lit(1L))), nodes, iters, dampMilli, idCol)

  /** [[pageRankMicro]] with EDGE WEIGHTS — similarity-weighted
    * centrality: `pairsW` carries (doc_a, doc_b, w) with w a positive
    * BIGINT (quantize a similarity score to basis points:
    * `floor(jaccard·10000)` — the jaccard double is already
    * cross-engine exact, so its floor is too). A node's mass splits
    * over neighbors proportionally: u sends v
    * `(r·dampMilli·w_uv) div (1000·W_u)` with W_u = Σw. Uniform
    * weights reduce EXACTLY to the unweighted form — integer division
    * of the same rational, `(a·c) div (b·c) == a div b` — spec-pinned.
    * Overflow headroom: r·850·w must stay under 2^63, i.e.
    * hub rank · weight < ~1.08e16 (sf3 hubs sit near 1.4e11 at
    * w ≤ 1e4 → 1.4e15, an order inside the bound). Weights must be
    * POSITIVE — enforced row-side: a zero weight would make Spark's
    * div-by-zero NULL silently vanish in the sum while DuckDB's `//`
    * errors, the worst cross-engine divergence.
    */
  def pageRankMicroWeighted(pairsW: DataFrame, nodes: DataFrame, iters: Int = 3,
                            dampMilli: Int = 850,
                            idCol: String = "doc_id"): DataFrame =
    prCore(symEdges(pairsW.filter(assert_true(col("w") > 0,
      lit("pageRankMicroWeighted: edge weights must be positive")).isNull)),
      nodes, iters, dampMilli, idCol)

  /** PageRank CONVERGENCE TRACE: per iteration, the total rank movement
    * `Σ|r_i − r_{i-1}|` in exact integer micro-units — the number an
    * operator watches to pick `iters` (stop when the movement falls
    * under a mass tolerance) instead of guessing a constant. Exact
    * BIGINT end to end, so the trace is cross-engine hashable.
    *
    * The trace is computed EAGERLY, one single-row aggregate per
    * iteration (bounded by construction: `iters` rows cross the
    * driver, never data): each rank vector is `localCheckpoint`ed so
    * the loop's lineage stays flat, consumed exactly twice (as `r_i`
    * and as the next step's `r_{i-1}`), and its blocks are released
    * the moment its successor's delta lands — at no point do more
    * than TWO node-count-sized vectors hold storage, where the lazy
    * formulation pinned all `iters`+1 of them until the caller's
    * action (and past any registry the session could drain).
    * Output: (iter, delta_micro), one row per iteration.
    */
  def pageRankConvergence(pairs: DataFrame, nodes: DataFrame, iters: Int = 10,
                          dampMilli: Int = 850,
                          idCol: String = "doc_id"): DataFrame = {
    val spark = pairs.sparkSession
    val edgesW = withWeightedDegree(symEdges(pairs.withColumn("w", lit(1L))))
    var ranks = nodes.select(col(idCol), lit(1000000L).as("r")).localCheckpoint()
    val deltas = (1 to iters).map { i =>
      // ONE materialization per iteration: the step result is joined
      // with the previous vector BEFORE the checkpoint, so the delta
      // aggregate afterwards is a leaf-only scan — the former shape
      // checkpointed the bare step and then re-ran the prev-join as a
      // second full action every iteration (~2× the per-iteration
      // stage count for the same trace values)
      val stepped = prStep(edgesW, ranks, nodes, dampMilli, idCol)
        .join(ranks.select(col(idCol), col("r").as("rp")), Seq(idCol))
        .localCheckpoint()
      val row = stepped.agg(sum(abs(col("r") - col("rp")))).head
      // empty graph: SQL SUM over zero rows is NULL; zero movement is
      // the honest trace value (and what an engine comparing totals
      // coalesces to)
      val d = if (row.isNullAt(0)) 0L else row.getLong(0)
      releaseBlocks(ranks)
      ranks = stepped.select(col(idCol), col("r"))
      (i, d)
    }
    releaseBlocks(ranks)
    import spark.implicits._
    deltas.toDF("iter", "delta_micro")
  }

  private def symEdges(pairsW: DataFrame): DataFrame =
    pairsW.select(col("doc_a").as("src"), col("doc_b").as("dst"), col("w"))
      .unionAll(pairsW.select(col("doc_b").as("src"), col("doc_a").as("dst"), col("w")))

  /** Weighted degree pre-joined ONCE into a materialized frame:
    * defined outside the iteration loop but referenced EVERY iteration
    * — uncached, the aggregate would re-run its shuffle per iteration
    * (Spark does not dedupe identical uncached subtrees across a
    * loop-built plan); cached-but-not-truncated, the upstream pair
    * pipeline would be re-planned once per iteration REFERENCE
    * (measured: >10 s of driver time on a 10-iteration convergence
    * trace at sf0.1). Checkpointing does both: one materialization,
    * and a leaf-sized plan inside the loop.
    */
  private def withWeightedDegree(edges: DataFrame): DataFrame =
    checkpointed(edges.join(
      edges.groupBy("src").agg(sum("w").as("wsum")), Seq("src")))

  /** One PR iteration: edge list × rank vector on src (ONE join), mass
    * split `(r·damp·w) div (1000·W_src)`, ONE groupBy dst, teleport
    * re-add via left join back onto the node list.
    */
  private def prStep(edgesW: DataFrame, ranks: DataFrame, nodes: DataFrame,
                     dampMilli: Int, idCol: String): DataFrame = {
    val base = 1000000L * (1000L - dampMilli) / 1000L
    val contrib = edgesW
      .join(ranks.withColumnRenamed(idCol, "src"), Seq("src"))
      .select(col("dst").as(idCol),
        expr(s"(r * $dampMilli * w) div (wsum * 1000)").as("c"))
      .groupBy(idCol).agg(sum("c").as("csum"))
    nodes.select(col(idCol))
      .join(contrib, Seq(idCol), "left_outer")
      .select(col(idCol), (lit(base) + coalesce(col("csum"), lit(0L))).as("r"))
  }

  /** Past this many iterations the loop-built plan gets truncated with
    * an eager `localCheckpoint`: each join+agg round nests the previous
    * plan, and ~10 nested rounds is where optimizer time and lineage
    * re-execution risk start to dominate the actual work. Checkpoints
    * change no values — only where the plan is cut.
    */
  private val CkptEvery = 8

  private def prCore(edges: DataFrame, nodes: DataFrame, iters: Int,
                     dampMilli: Int, idCol: String): DataFrame = {
    val edgesW = withWeightedDegree(edges)
    var ranks = nodes.select(col(idCol), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      ranks = prStep(edgesW, ranks, nodes, dampMilli, idCol)
      if (i % CkptEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col(idCol), col("r").as("rank_micro"))
  }
}
