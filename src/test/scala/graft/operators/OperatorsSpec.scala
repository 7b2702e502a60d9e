package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps lowest id") {
    val out = Dedup.exact(docs).collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false)) // duplicate of 1
    assert(out(3L)._2 && out(4L)._2)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs.filter($"doc_id" =!= 5), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "no false positive")
  }

  test("cluster labels: transitive chains collapse, singletons self-label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val out = Dedup.clusterLabels(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1-2-3 is a CHAIN (no direct 1-3 pair) -> needs propagation rounds
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 7L -> 7L, 9L -> 7L))
  }

  test("leakage-free split: clusters stay whole; singletons match the per-doc split") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val labels = Dedup.clusterLabels(pairs, nodes)
    val split = Dedup.leakageFreeSplit(labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // no cluster straddles a split boundary — the leakage guarantee
    assert(split(1L)._2 == split(2L)._2 && split(2L)._2 == split(3L)._2)
    assert(split(7L)._2 == split(9L)._2)
    // a singleton's split equals the per-document hash split bit for bit
    val perDoc = graft.operators.TextAnalysis
      .assignSplit(Seq(5L).toDF("doc_id"))
      .collect().map(r => r.getAs[String]("split")).head
    assert(split(5L)._2 == perDoc,
      "singleton cluster must reproduce the per-doc split")
    // bucket domain sanity
    val buckets = Dedup.leakageFreeSplit(labels)
      .collect().map(_.getLong(2))
    assert(buckets.forall(b => b >= 0 && b < 100))
  }

  test("dedup report: per-size rollup with exact dropped-bytes accounting") {
    // clusters {1,2,3} (texts 5/3/7 chars) and {7,9} (4/4); singleton 5 (2)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val docs = Seq((1L, "aaaaa"), (2L, "bbb"), (3L, "ccccccc"),
      (5L, "dd"), (7L, "eeee"), (9L, "ffff")).toDF("doc_id", "text")
    val rep = Dedup.dedupReport(Dedup.clusterLabels(pairs, nodes), docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep(1L) == ((1L, 1L, 2L, 0L)), "singleton: nothing dropped")
    assert(rep(2L) == ((1L, 2L, 8L, 4L)), "pair keeps one 4-char text")
    assert(rep(3L) == ((1L, 3L, 15L, 8L)), "triple keeps the 7-char text")
  }

  test("pointer-doubling CC: 1000-node path converges in O(log n) rounds, " +
    "labels equal naive propagation") {
    // worst case for naive propagation: one path 0-1-2-...-999 whose
    // diameter is 999, so min-label needs ~999 rounds; doubling must do
    // it in ~log2(999) ≈ 10 (allow slack for the jump interleaving)
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (0L to 1001L).toDF("doc_id") // 1000-1001 isolated
    val (labels, rounds, _) = Dedup.doublingRounds(pairs, nodes, "doc_id")
    assert(rounds <= 12, s"doubling took $rounds rounds on a 1000-node path")
    val out = Dedup.clusterLabelsDoubling(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 1002)
    assert((0L until 1000L).forall(out(_) == 0L), "path collapses to min label 0")
    assert(out(1000L) == 1000L && out(1001L) == 1001L, "isolated nodes self-label")
    labels.sparkSession.catalog.clearCache()
  }

  test("withPersistCleanup reclaims clusterLabels' checkpoint residue after consumption") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val (labels, cleanup) = Dedup.withPersistCleanup(spark) {
      Dedup.clusterLabels(pairs, nodes)
    }
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // consume
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 7L -> 7L, 9L -> 7L))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "expected checkpoint residue before cleanup")
    cleanup()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "cleanup left persisted RDDs behind")
  }

  test("bucket cap: 1500 identical docs yield linear anchor pairs, not O(N^2)") {
    val many = (1L to 1500L).map(i => (i, "identical corpus text repeated" +
      " across every document to form one degenerate lsh bucket")).toDF("doc_id", "text")
    // cap 100 << 1500: every sketch bucket is over-cap -> anchor form.
    // All docs share all 8 sketch hashes; anchor is doc 1; expect exactly
    // N-1 pairs (1, i) instead of N*(N-1)/2 = 1.1M.
    val pairs = Dedup.lshNearDups(Dedup.shingles(many), threshold = 0.5,
      maxBucket = 100, candidateBudgetPerDoc = None).collect()
    assert(pairs.length == 1499, s"got ${pairs.length} pairs")
    assert(pairs.forall(r => r.getLong(0) == 1L && r.getDouble(2) == 1.0))
    // simhash path under the same degenerate corpus
    val sPairs = Dedup.simhashNearDups(many, maxBucket = 100,
      candidateBudgetPerDoc = None).collect()
    assert(sPairs.length == 1499, s"got ${sPairs.length} simhash pairs")
    assert(sPairs.forall(r => r.getLong(0) == 1L && r.getInt(2) == 0))
  }

  test("pageRankMicro: exact integer ranks match a driver-side reference; " +
    "hub outranks leaves, cliques tie, isolated holds teleport mass") {
    // star 0-(1..5), triangle clique 10-11-12, isolated 20
    val pairEdges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val nodeIds = (0L to 5L) ++ Seq(10L, 11L, 12L, 20L)
    val pairs = pairEdges.toDF("doc_a", "doc_b")
    val nodes = nodeIds.toDF("doc_id")
    val got = GraphMetrics.pageRankMicro(pairs, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the same exact integer recurrence, in plain Scala
    val adj = (pairEdges ++ pairEdges.map(_.swap)).groupMap(_._1)(_._2)
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var r = nodeIds.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3)
      r = nodeIds.map(n => n -> (150000L +
        adj.getOrElse(n, Nil).map(u => r(u) * 850L / (deg(u) * 1000L)).sum)).toMap
    assert(got == r, s"ranks diverged from reference:\n got=$got\n ref=$r")
    assert(got(0L) > got(1L), "star hub must outrank its leaves")
    assert(got(10L) == got(11L) && got(11L) == got(12L), "clique members must tie")
    assert(got(20L) == 150000L, "isolated node must hold exactly the teleport mass")
    // centrality keep: the hub survives its cluster even when a leaf
    // has the longer text (where keepCanonical would pick the leaf)
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L))
      .toDF("doc_id", "cluster_id")
    val keep = Dedup.keepCanonicalByRank(labels,
        GraphMetrics.pageRankMicro(pairs, nodes, iters = 3))
      .collect().map(x => x.getLong(0) -> (x.getBoolean(3), x.getLong(4))).toMap
    assert(keep(0L) == ((true, 0L)) && (1L to 5L).forall(keep(_) == ((false, 0L))))
  }

  test("weighted PageRank: uniform weights reduce exactly to unweighted; " +
    "heavier edge pulls more mass") {
    val pairEdges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val nodeIds = (0L to 5L) ++ Seq(10L, 11L, 12L, 20L)
    val pairs = pairEdges.toDF("doc_a", "doc_b")
    val nodes = nodeIds.toDF("doc_id")
    // uniform w = c: (r·850·c) div (c·deg·1000) == (r·850) div (deg·1000)
    // — integer division of the SAME rational, so equality is exact
    val uni = GraphMetrics.pageRankMicroWeighted(
        pairs.withColumn("w", lit(7777L)), nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unw = GraphMetrics.pageRankMicro(pairs, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uni == unw, "uniform weights moved the ranks")
    // path 100-101, 101-102 with 101→102 nine times heavier than
    // 101→100: node 102 must outrank node 100
    val wPairs = Seq((100L, 101L, 1000L), (101L, 102L, 9000L))
      .toDF("doc_a", "doc_b", "w")
    val wNodes = Seq(100L, 101L, 102L).toDF("doc_id")
    val wr = GraphMetrics.pageRankMicroWeighted(wPairs, wNodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wr(102L) > wr(100L), s"heavy edge did not pull more mass: $wr")
  }

  test("PageRank at iters=20 (checkpointed lineage) matches the driver-side reference; " +
    "convergence trace is exact and settles") {
    val pairEdges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val nodeIds = (0L to 5L) ++ Seq(10L, 11L, 12L, 20L)
    val pairs = pairEdges.toDF("doc_a", "doc_b")
    val nodes = nodeIds.toDF("doc_id")
    // driver-side exact reference, 20 iterations, with per-iter deltas
    val adj = (pairEdges ++ pairEdges.map(_.swap)).groupMap(_._1)(_._2)
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var r = nodeIds.map(_ -> 1000000L).toMap
    val refDeltas = (1 to 20).map { _ =>
      val nxt = nodeIds.map(n => n -> (150000L +
        adj.getOrElse(n, Nil).map(u => r(u) * 850L / (deg(u) * 1000L)).sum)).toMap
      val d = nodeIds.map(n => math.abs(nxt(n) - r(n))).sum
      r = nxt; d
    }
    // 20 iterations cross the CkptEvery=8 checkpoint twice: the plan is
    // TRUNCATED mid-loop, and the values must be bit-identical anyway
    val got = GraphMetrics.pageRankMicro(pairs, nodes, iters = 20)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == r, s"checkpointed 20-iter ranks diverged:\n got=$got\n ref=$r")
    // convergence trace: exact per-iteration Σ|Δr|, settling (the tail
    // movement far below the head's), never negative
    val trace = GraphMetrics.pageRankConvergence(pairs, nodes, iters = 20)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).sortBy(_._1)
    assert(trace.map(_._2).sameElements(refDeltas),
      s"trace diverged:\n got=${trace.map(_._2).toSeq}\n ref=$refDeltas")
    // geometric decay at the damping rate: monotone, and the tail far
    // below the head (0.85^19 ≈ 4.6% — assert under 10%)
    assert(trace.map(_._2).sliding(2).forall(p => p.head >= p.last),
      s"trace not monotone: ${trace.toSeq}")
    assert(trace.last._2 < trace.head._2 / 10,
      s"trace did not settle: ${trace.toSeq}")
  }

  test("simhash: identical docs get identical signatures, hamming 0") {
    val pairs = Dedup.simhashNearDups(docs.filter($"doc_id" =!= 5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
  }

  test("brute-force ANN: an exact copy ranks first with cosine 1.0") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)), (1L, Array(1.0f, 0.0f, 0.5f)),
      (2L, Array(-1.0f, 0.2f, 0.1f)), (3L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, col("vec_id") === 0, k = 3).collect()
    assert(top.head.getLong(1) == 1L) // the copy
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("IVF probes return a subset of brute-force results (recall<=1)") {
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") % 10 === 0, 3)
      .select("query_id", "hit_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, col("vec_id") % 10 === 0,
      col("vec_id") % 7 === 1, k = 3, nprobe = 3)
      .select("query_id", "hit_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.3, s"recall $recall unexpectedly low")
  }

  test("PQ: a copy of a seed retrieves it at adist 0; seed hits carry exact L2²") {
    val emb = (0L until 48L).map(i =>
        (i, Array.tabulate(16)(d => ((i * 29 + d * 5) % 11).toFloat - 5f)))
      .toDF("vec_id", "embedding")
    // vec 1000 = exact copy of seed 10 (seeds: vec_id % 5 == 0)
    val aug = emb.unionAll(emb.filter($"vec_id" === 10L)
      .select(lit(1000L).as("vec_id"), $"embedding"))
    val res = Similarity.pqTopK(aug, col("vec_id") === 1000L,
        col("vec_id") % 5 === 0 && col("vec_id") < 100, m = 4, k = 48)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._3) // collect() row order is not a contract
    assert(res.head == ((10L, 0L, 1)), s"copy did not retrieve its seed: ${res.head}")
    // ADC distance to any SEED hit is the exact integer L2² (the seed
    // encodes to itself, so every lookup is its true sub-distance)
    val q = (x: Float) => math.floor(x.toDouble * 1e6).toLong
    val vecs = aug.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(q).toArray).toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val query = vecs(1000L)
    res.filter(h => h._1 % 5 == 0 && h._1 < 100).foreach { case (hit, adist, _) =>
      assert(adist == l2(query, vecs(hit)), s"seed $hit: adist $adist != exact")
    }
  }

  test("PQ on real embeddings: k rows per query, monotone adist, recall vs exact L2") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val res = Similarity.pqTopK(emb, col("vec_id") % 250 === 7,
        col("vec_id") % 40 === 3 && col("vec_id") < 2560, m = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byQuery = res.groupBy(_._1)
    assert(byQuery.nonEmpty && byQuery.values.forall(_.length == 5))
    byQuery.values.foreach { hits =>
      val sorted = hits.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last),
        "adist not monotone in rank")
    }
    // recall@5 vs exact integer L2 (driver-side: 500 vectors)
    val q = (x: Float) => math.floor(x.toDouble * 1e6).toLong
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(q).toArray).toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recalls = byQuery.map { case (qid, hits) =>
      val exact = vecs.keys.filter(_ != qid).toSeq
        .sortBy(h => (l2(vecs(qid), vecs(h)), h)).take(5).toSet
      hits.map(_._2).count(exact).toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ recall@5 vs exact L2: $mean%.2f")
    assert(mean > 0.0, "PQ found nothing from the exact top-5")
  }

  test("IVF-PQ: a copy of a PQ seed retrieves it at adist 0; candidates stay probed-list-bound") {
    val emb = (0L until 60L).map(i =>
        (i, Array.tabulate(16)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    // vec 1000 = exact copy of PQ seed 10: same coarse assignment, same
    // residual; the seed encodes to itself (sub-distance 0 everywhere),
    // so the copy's ADC distance to the seed is exactly 0 → rank 1
    val aug = emb.unionAll(emb.filter($"vec_id" === 10L)
      .select(lit(1000L).as("vec_id"), $"embedding"))
    val res = Similarity.ivfpqTopK(aug, col("vec_id") === 1000L,
        col("vec_id") % 7 === 1, col("vec_id") % 5 === 0 && col("vec_id") < 100,
        m = 4, k = 60, nprobe = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._3) // collect() row order is not a contract
    assert(res.head == ((10L, 0L, 1)), s"copy did not retrieve its seed: ${res.head}")
    // nprobe=1 bounds every hit to ONE coarse list — the query's own
    assert(res.nonEmpty && res.length < 60, "routing did not restrict the candidate set")
  }

  test("IVF-PQ on real embeddings: k rows per query, adist stable under wider probing") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    def run(nprobe: Int) = Similarity.ivfpqTopK(emb, col("vec_id") % 250 === 7,
        col("vec_id") % 125 === 11,
        col("vec_id") % 40 === 3 && col("vec_id") < 2560,
        m = 8, k = 5, nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val r2 = run(2)
    val byQuery = r2.groupBy(_._1)
    assert(byQuery.nonEmpty && byQuery.values.forall(_.length == 5))
    byQuery.values.foreach { hits =>
      assert(hits.sortBy(_._4).map(_._3).sliding(2).forall(p => p.head <= p.last),
        "adist not monotone in rank")
    }
    // a vector's ADC distance is a property of ITS list's centroid and
    // codes, not of the probe width: any (query, hit) surviving at
    // nprobe=2 must carry the same adist at nprobe=4
    val a4 = run(4).map(t => (t._1, t._2) -> t._3).toMap
    r2.foreach { case (q, h, d, _) =>
      assert(a4.get((q, h)).forall(_ == d), s"adist for ($q,$h) changed with nprobe")
    }
  }

  test("exact re-rank: recall@10 >= plain ADC on planted neighbors; output distances are exact L2²") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    // plant an exact copy of every query at +200001 (offset chosen so a
    // copy never satisfies the query predicate itself): each query's
    // true nearest neighbor is its planted copy at distance 0
    val qPred = col("vec_id") % 250 === 7 && col("vec_id") < 200000
    val aug = emb.unionAll(emb.filter(col("vec_id") % 250 === 7)
      .select((col("vec_id") + 200001L).as("vec_id"), col("embedding")))
    val coPred = col("vec_id") % 125 === 11
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val exact = Similarity.bruteForceTopKL2(aug, qPred, k = 10)
    def totalRecall(found: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Similarity.annRecallReport(found, exact)
        .agg(sum("n_found"), sum("n_exact")).head()
      (r.getLong(0), r.getLong(1))
    }
    val plain = totalRecall(Similarity.ivfpqTopK(aug, qPred, coPred, pqPred,
      m = 8, k = 10, nprobe = 2))
    val rr = Similarity.ivfpqTopKReranked(aug, qPred, coPred, pqPred,
      m = 8, k = 10, nprobe = 2, overscan = 4)
    val rerank = totalRecall(rr)
    assert(rerank._2 == plain._2 && rerank._2 > 0)
    assert(rerank._1 >= plain._1,
      s"re-rank lost recall: ${rerank._1}/${rerank._2} < ${plain._1}/${plain._2}")
    info(s"recall@10: plain ${plain._1}/${plain._2}, reranked ${rerank._1}/${rerank._2}")
    // every planted copy survives routing (same coarse list as its
    // query) and the re-rank must surface it at rank 1, distance 0
    val rows = rr.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (qid, hits) =>
      val first = hits.minBy(_._4)
      assert(first._2 == qid + 200001L && first._3 == 0L,
        s"query $qid: planted copy not at rank 1 — got $first")
    }
    // reranked distances are the EXACT integer L2² (not ADC estimates)
    val q = (x: Float) => math.floor(x.toDouble * 1e6).toLong
    val vecs = aug.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(q).toArray).toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { case (qid, hit, dist, _) =>
      assert(dist == l2(vecs(qid), vecs(hit)), s"($qid,$hit): $dist not exact")
    }
  }

  test("IVF-PQ stored index: search from a parquet round trip == fresh build") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val qPred = col("vec_id") % 250 === 7
    val coPred = col("vec_id") % 125 === 11
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString + "/idx"
    Similarity.ivfpqIndex(emb, coPred, pqPred, m = 8).write.parquet(dir)
    val stored = Similarity.ivfpqSearchStored(spark.read.parquet(dir), emb,
        qPred, coPred, pqPred, m = 8, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    val fresh = Similarity.ivfpqTopK(emb, qPred, coPred, pqPred, m = 8, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    assert(stored.nonEmpty && stored.sameElements(fresh),
      "stored-index search diverged from the fresh build")
  }

  test("learned PQ: the all-seeds codebook is an exact fixpoint (== seed PQ == exact L2)") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val qPred = col("vec_id") % 250 === 7
    // every vector its own seed: each cell floor-means ONE member —
    // itself — so one Lloyd step must reproduce the seed codebook
    // exactly, and both paths degenerate to exact L2² ranking
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    val learned = shape(Similarity.pqTopKLearned(emb, qPred, lit(true), m = 8, k = 5))
    val seed = shape(Similarity.pqTopK(emb, qPred, lit(true), m = 8, k = 5))
    assert(learned.nonEmpty && learned.sameElements(seed),
      "one Lloyd step over singleton cells moved the codebook")
    // and the degenerate ADC is the exact integer L2² top-k
    val q = (x: Float) => math.floor(x.toDouble * 1e6).toLong
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(q).toArray).toMap
    learned.groupBy(_._1).foreach { case (qid, hits) =>
      val exact = vecs.keys.filter(_ != qid).toSeq
        .sortBy(h => (vecs(qid).zip(vecs(h)).map { case (a, b) => (a - b) * (a - b) }.sum, h))
        .take(5)
      assert(hits.sortBy(_._4).map(_._2).toSeq == exact,
        s"query $qid: degenerate ADC != exact L2 top-5")
    }
  }

  test("PQ: a non-dividing m fails loudly instead of dropping trailing dims") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding") // 64-dim; m=7 would silently drop dim 64
    val ex = intercept[Exception] {
      Similarity.pqTopK(emb, col("vec_id") % 250 === 7,
        col("vec_id") % 40 === 3, m = 7, k = 5).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("divisible by m=7"), s"wrong failure: $msgs")
  }

  test("IVF-PQ incremental append == full rebuild when codebooks are batch-stable") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    // all seeds live in the base slice, so the batch cannot move the
    // codebooks — the condition under which append is exact
    val coPred = col("vec_id") % 125 === 11 && col("vec_id") < 400
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 400
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2))
    val full = rows(Similarity.ivfpqIndex(emb, coPred, pqPred, m = 8))
    val appended = Similarity.ivfpqIndexAppend(
      Similarity.ivfpqIndex(base, coPred, pqPred, m = 8),
      base, batch, coPred, pqPred, m = 8)
    val incr = rows(appended)
    assert(incr.nonEmpty && incr.sameElements(full),
      "incremental append diverged from the full rebuild")
    // idempotence: re-appending an overlapping batch must not create
    // duplicate index rows (a dup would silently double ADC sums)
    val again = rows(Similarity.ivfpqIndexAppend(
      appended, base, batch, coPred, pqPred, m = 8))
    assert(again.sameElements(full), "re-append created duplicate index rows")
  }

  test("IVF-PQ stored index: searching with a mismatched m fails loudly") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val coPred = col("vec_id") % 125 === 11
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val idx = Similarity.ivfpqIndex(emb, coPred, pqPred, m = 8)
    // m=4 against an m=8 index would silently sum half the subspaces
    // without the guard — it must fail at action time instead
    val ex = intercept[Exception] {
      Similarity.ivfpqSearchStored(idx, emb, col("vec_id") % 250 === 7,
        coPred, pqPred, m = 4, k = 5, nprobe = 2).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("code width != m=4"), s"wrong failure: $msgs")
  }

  test("Lloyd-refined IVF codebook: recall vs brute >= seed codebook's") {
    // real embeddings (sf0.001): arbitrary seed vectors are a poor
    // codebook; one spherical-k-means step must not lose recall
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "hit_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topk(Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, 5))
    val seed = topk(Similarity.ivfTopK(emb, col("vec_id") % 50 === 0,
      col("vec_id") % 50 === 7, k = 5, nprobe = 2))
    val learned = topk(Similarity.ivfTopKLearned(emb, col("vec_id") % 50 === 0,
      col("vec_id") % 50 === 7, k = 5, nprobe = 2, lloydIters = 1))
    val rSeed = seed.intersect(brute).size.toDouble / brute.size
    val rLearned = learned.intersect(brute).size.toDouble / brute.size
    info(f"recall seed=$rSeed%.3f learned=$rLearned%.3f")
    assert(rLearned >= rSeed, f"Lloyd refinement lost recall: $rLearned%.3f < $rSeed%.3f")
    spark.catalog.clearCache()
  }

  test("hyperplane-LSH near-dup: subset of exact, finds exact dups, blocked plan") {
    val emb = (0L until 60L).map(i =>
      (i, Array.tabulate(16)(d => ((i * 37 + d * 11) % 17).toFloat - 8f)))
      .toDF("vec_id", "embedding")
    // plant exact duplicates: 100+i copies vector i for i in 0,10,20
    val aug = emb.unionAll(emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100).as("vec_id"), $"embedding"))
    val blocked = Similarity.nearDupPairs(aug, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.nearDupPairsExact(aug, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), "LSH result must be a subset of all-pairs")
    // identical vectors share every band -> always candidates, cosine 1.0
    for (i <- Seq(0L, 10L, 20L, 30L, 40L, 50L))
      assert(blocked.contains((i, i + 100)), s"exact dup ($i,${i + 100}) missed")
    // the scale property: no unblocked (cartesian / theta-only) self-join
    val plan = Similarity.nearDupPairs(aug, 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan must not contain a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "plan must not contain a nested-loop join")
  }

  test("multimodal byte-stat screening computes statistics partition-wise") {
    val out = Multimodal.decodeFeatures(spark, docs.filter($"doc_id" === 1))
      .head
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    assert(out.getLong(4) == bytes.length)
    assert(out.getDouble(1) == bytes.map(_ & 0xff).sum.toDouble / bytes.length)
    assert(out.getInt(2) == bytes.map(_ & 0xff).min)
    assert(out.getInt(3) == bytes.map(_ & 0xff).max)
  }

  test("BMP/WAV/PNG decode: real file bytes roundtrip through parquet, " +
    "stats match the render formulas, malformed files fail loudly") {
    val ids = Seq(0L, 1L, 2L, 7L, 16L, 33L, 128L, 254L).toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("mm-payload").toString
    // payloads cross a real parquet binary column before decoding
    Multimodal.attachMediaPayload(ids).write.mode("overwrite").parquet(dir)
    val out = Multimodal.decodeMediaFeatures(spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val r = out(id)
      (id % 3) match {
        case 0 =>
          val w = id % 16 + 4; val h = id % 9 + 3; val n = w * h * 3
          val vs = (0L until n).map(k => (id * 31 + k) % 256)
          assert(r.getString(1) == "bmp" && r.getLong(2) == w && r.getLong(3) == h)
          assert(r.getLong(5) == n && r.getDouble(6) == vs.sum.toDouble / n)
          assert(r.getLong(7) == vs.min && r.getLong(8) == vs.max)
        case 1 =>
          val n = id % 50 + 10
          val vs = (0L until n).map(k => (id * 131 + k * 17) % 65536 - 32768)
          assert(r.getString(1) == "wav" && r.getLong(4) == 8000L)
          assert(r.getLong(5) == n && r.getDouble(6) == vs.sum.toDouble / n)
          assert(r.getLong(7) == vs.min && r.getLong(8) == vs.max)
        case _ =>
          val w = id % 16 + 4; val h = id % 9 + 3; val n = w * h
          val vs = (0L until n).map(k => (id * 53 + k) % 256)
          assert(r.getString(1) == "png" && r.getLong(2) == w && r.getLong(3) == h)
          assert(r.getLong(5) == n && r.getDouble(6) == vs.sum.toDouble / n)
          assert(r.getLong(7) == vs.min && r.getLong(8) == vs.max)
      }
    }
    // header validation: garbage bytes are rejected, not mis-parsed
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("not a bitmap at all".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(Multimodal.encodeBmp(0L)) // wrong container
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(Multimodal.encodeWav(1L)) // wrong container
    }
    // a corrupted PNG byte trips the chunk CRC, not a garbage result
    val png = Multimodal.encodePng(2L)
    png(40) = (png(40) ^ 0x5a).toByte // inside IDAT payload
    intercept[IllegalArgumentException] { Multimodal.decodePng(png) }
  }

  test("image patch pooling matches a per-pixel fold of the render formulas") {
    val ids = Seq(0L, 2L, 9L, 17L, 33L).toDF("doc_id") // bmp (0,9,33) + png (2,17)
    val out = Multimodal.imagePatchFeatures(Multimodal.attachMediaPayload(ids))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val w = (id % 16 + 4).toInt; val h = (id % 9 + 3).toInt
      val sums = new Array[Long](4); val cnts = new Array[Long](4)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (2 * y) / h * 2 + (2 * x) / w
        val v = if (id % 3 == 0)
          (0 until 3).map(c => (id * 31 + y * 3 * w + 3 * x + c) % 256).sum
        else (id * 53 + y * w + x) % 256
        sums(p) += v; cnts(p) += 1
      }
      val r = out(id)
      assert(r.getLong(2) == w && r.getLong(3) == h)
      assert((4 to 7).map(r.getLong) ==
        (0 to 3).map(p => sums(p) / cnts(p)), s"doc $id")
    }
    // audio is not an image: loud failure, not a zero row
    intercept[org.apache.spark.SparkException] {
      Multimodal.imagePatchFeatures(
        Multimodal.attachMediaPayload(Seq(1L).toDF("doc_id"))).collect()
    }
  }

  test("audio frame features match a per-sample fold of the render formula") {
    val ids = Seq(1L, 4L, 22L, 49L).toDF("doc_id") // all %3==1 → wav
    val out = Multimodal.audioFrameFeatures(Multimodal.attachMediaPayload(ids))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val n = (id % 50 + 10).toInt
      val samples = (0 until n).map(k => ((id * 131 + k * 17) % 65536 - 32768).toInt)
      samples.grouped(16).zipWithIndex.foreach { case (fs, f) =>
        val r = out((id, f.toLong))
        assert(r.getLong(1) == 8000L && r.getLong(3) == fs.length, s"doc $id frame $f")
        assert(r.getLong(4) == fs.map(v => v.toLong * v).sum, s"energy doc $id frame $f")
        assert(r.getLong(5) == fs.map(v => math.abs(v.toLong)).max, s"peak doc $id frame $f")
        val zc = fs.sliding(2).count(p => p.size == 2 && (p(0) < 0) != (p(1) < 0))
        assert(r.getLong(6) == zc, s"zero_cross doc $id frame $f")
      }
      assert(!out.contains((id, ((n - 1) / 16 + 1).toLong)), s"no extra frame for $id")
    }
  }

  test("frame sampling yields <=4 in-range indices per video") {
    val out = Multimodal.frameSample(docs).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 4)
      val n = rows.head.getInt(1)
      assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < n))
    }
  }

  test("sequence packing: bins chunk the token stream at capacity boundaries") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g"), (3L, "h i j k l"),
      (4L, "m n")).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, capacity = 5, shards = 1)
      .orderBy("doc_id").collect()
    // stream: 4,3,5,2 tokens -> before = 0,4,7,12 -> bins 0,0,1,2
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 0L, 1L, 2L))
    assert(out.map(_.getAs[Long]("offset_in_bin")).toSeq == Seq(0L, 4L, 2L, 2L))
  }

  test("PII scan counts and redacts emails, IPs, phone numbers") {
    val docs = Seq((1L, "Mail Bob@Example.COM or admin@test.org; " +
      "host 192.168.0.1 tel +14155551234 done")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScan(docs).head
    assert(r.getLong(1) == 2L, "emails")
    assert(r.getLong(2) == 1L, "ips")
    assert(r.getLong(3) == 1L, "phones")
    // redaction hash = md5 of the placeholder form (text lowered first,
    // placeholders inserted after and therefore uppercase)
    val expected = "mail <EMAIL> or <EMAIL>; host <IP> tel <PHONE> done"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(4) == md)
  }

  test("stratified sample: per-class rates hold, assignment is repartition-stable") {
    val ids = (0L until 3000L).toDF("doc_id")
    val cls = pmod($"doc_id", lit(3))
    val rate = when(cls === 0, 10000).when(cls === 1, 5000).otherwise(0)
    val kept = TextAnalysis.stratifiedSample(ids, rate).collect()
      .map(_.getLong(0)).toSet
    assert((0L until 3000L by 3).forall(kept), "class 0 keeps everything")
    assert(!kept.exists(_ % 3 == 2), "class 2 keeps nothing")
    val c1 = kept.count(_ % 3 == 1)
    assert(c1 > 350 && c1 < 650, s"class 1 at ~50%: got $c1/1000")
    // same ids, different partitioning -> identical survivors
    val kept2 = TextAnalysis.stratifiedSample(ids.repartition(13), rate)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
  }

  test("language id picks the dominant stopword profile") {
    val multi = Seq(
      (1L, "the cat is of the house and a dog"),
      (2L, "der hund ist nicht die katze und das haus"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(multi).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("decontamination flags docs sharing an 8-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // contains bench gram
      (2L, "one two three four five six seven eight nine ten"),         // clean
      (3L, "too short to have grams")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, bench, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, 1L, true)))  // 10 tokens -> 3 grams; 1 matches
    assert(out(2L) == ((3L, 0L, false)))
    assert(out(3L) == ((0L, 0L, false))) // 5 tokens -> no 8-grams, clamped to 0
  }

  test("repetition score separates doubled text from natural text") {
    val d = Seq(
      (1L, "a b c d e f g h a b"),     // mild repetition
      (2L, "spam spam spam spam spam") // total repetition
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r2 = out(2L)
    assert(r2.getLong(1) == 5L)            // n_words
    assert(r2.getDouble(2) == 1.0)         // top_word_frac: all 'spam'
    assert(r2.getDouble(4) == 1.0)         // top_bigram_frac: all 'spam spam'
    assert(r2.getDouble(5) == 1.0)         // dup_bigram_frac
    val r1 = out(1L)
    assert(r1.getLong(1) == 10L && r1.getDouble(2) == 0.2)
    // 9 bigrams, 'a b' twice -> top 2/9, dup 2/9
    assert(r1.getLong(3) == 9L && r1.getDouble(4) == 2.0 / 9.0 &&
      r1.getDouble(5) == 2.0 / 9.0)
  }

  test("mixture report: shares sum to 1, totals add up") {
    val d = Seq(
      (1L, "a b c", "s1", "en"), (2L, "d e", "s1", "de"),
      (3L, "f g h i", "s2", "en")).toDF("doc_id", "text", "source", "lang")
    val rows = TextAnalysis.mixtureReport(d).collect()
    assert(rows.map(_.getLong(2)).sum == 3L)   // n_docs total
    assert(rows.map(_.getLong(3)).sum == 9L)   // n_tokens total
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-12) // doc_share
    assert(math.abs(rows.map(_.getDouble(6)).sum - 1.0) < 1e-12) // token_share
  }

  test("hashed model score: integer logit matches a hand-folded reference") {
    val d = Seq((1L, "Alpha beta ALPHA")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedModelScore(d, dim = 1024).head
    def w(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
      val bk = java.lang.Long.parseLong(hex, 16) % 1024
      (bk * 2654435761L % 1000L) - 500L
    }
    val want = w("alpha") + w("beta") + w("alpha") // lowercased, per-OCCURRENCE
    assert(out.getLong(1) == 3L)
    assert(out.getLong(2) == want)
    assert(out.getDouble(3) == want / 1000.0)
  }

  test("duplicated spans: CDC anchors find a shared region at SHIFTED offsets") {
    // the shared region sits at offset 20 in doc 1 and offset 0 in
    // doc 2 — 20 % 16 != 0, so a fixed-stride sampler would sample the
    // two copies at different phases and never collide; content-defined
    // anchors are phase-free
    val boiler = "this exact boilerplate sentence is shared verbatim " +
      "across two documents and is long enough to carry anchors"
    val d = Seq(
      (1L, "unique preamble one " + boiler),
      (2L, boiler + " unique tail two"),
      (3L, "entirely different content with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpans(d, spanLen = 32, freq = 16)
      .collect()
    assert(out.nonEmpty, "shared region must yield at least one anchored span")
    assert(out.forall(_.getLong(1) >= 2))
    assert(out.forall(r => boiler.contains(r.getString(0))),
      "every duplicated span must come from the shared region")
  }

  test("int8 quantization: extremes hit ±127-ish, zero vector stays zero") {
    val e = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(e).collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4L && r1.getDouble(2) == 1.0)
    // q = [127, -127, 63, 0] -> sum 63, sat 2
    assert(r1.getLong(3) == 63L && r1.getLong(4) == 2L)
    val r2 = out(2L)
    assert(r2.getDouble(2) == 0.0 && r2.getLong(3) == 0L && r2.getLong(4) == 0L)
  }
}
