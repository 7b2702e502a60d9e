package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-re-rank tail's quality contract: on a corpus with PLANTED
  * near neighbors, re-ranked IVF-PQ recall@k is never below plain
  * IVF-PQ recall@k (the re-rank can only restore true neighbors that
  * code quantization demoted INSIDE the candidate set, never lose one),
  * and the report arithmetic itself is pinned.
  */
class AnnRerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // real sf0.001 embeddings + a planted near-copy of every query vector
  // (one component nudged): each query's TRUE nearest neighbor is known
  // to be its planted twin at +100000
  private def planted: DataFrame = {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    emb.unionAll(emb.filter(col("vec_id") % 250 === 7)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding")))
  }

  private def meanRecallBp(found: DataFrame, exact: DataFrame): Double =
    Similarity.annRecallReport(found, exact)
      .agg(avg("recall_bp")).head.getDouble(0)

  test("re-ranked IVF-PQ recall@10 >= plain IVF-PQ recall@10 on planted neighbors") {
    val emb = planted.cache()
    val qPred = col("vec_id") % 250 === 7 && col("vec_id") < 100000
    val coPred = col("vec_id") % 125 === 11 && col("vec_id") < 100000
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val exact = Similarity.bruteForceTopKL2(emb, qPred, k = 10).cache()
    val plain = meanRecallBp(
      Similarity.ivfpqTopK(emb, qPred, coPred, pqPred, m = 8, k = 10, nprobe = 2),
      exact)
    val reranked = meanRecallBp(
      Similarity.ivfpqTopKReranked(emb, qPred, coPred, pqPred,
        m = 8, k = 10, nprobe = 2, overscan = 4),
      exact)
    info(f"mean recall@10: plain=$plain%.0f bp reranked=$reranked%.0f bp")
    assert(reranked >= plain,
      f"re-rank lost recall: $reranked%.0f bp < $plain%.0f bp")
    // the planted twin is the true top-1; the re-ranked pass must
    // surface it for most queries (sanity that recall is not
    // vacuously equal on an empty report)
    val twins = Similarity.ivfpqTopKReranked(emb, qPred, coPred, pqPred,
        m = 8, k = 10, nprobe = 2, overscan = 4)
      .filter(col("hit_id") === col("query_id") + 100000).count()
    val nq = emb.filter(qPred).count()
    assert(twins * 2 >= nq, s"re-ranked pass found only $twins/$nq planted twins")
    emb.unpersist(); exact.unpersist()
  }

  test("learned-codebook rerank recall >= fixture-codebook rerank recall on planted neighbors") {
    // the production contract behind ann_ivfpq_prod: per-subspace
    // LEARNED cells (seed % 78 = 5, ~N/78 cells/subspace, Lloyd-refined
    // on the corpus residuals) quantize residuals tighter than the
    // fixture's reused whole-seed residuals, so at the same routing and
    // overscan the re-ranked recall must not drop
    val emb = planted.cache()
    val qPred = col("vec_id") % 250 === 7 && col("vec_id") < 100000
    val coPred = col("vec_id") % 125 === 11 && col("vec_id") < 100000
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val seedPred = col("vec_id") % 78 === 5 && col("vec_id") < 100000
    val exact = Similarity.bruteForceTopKL2(emb, qPred, k = 10).cache()
    val fixture = meanRecallBp(
      Similarity.ivfpqTopKReranked(emb, qPred, coPred, pqPred,
        m = 8, k = 10, nprobe = 2, overscan = 4),
      exact)
    val learned = meanRecallBp(
      Similarity.ivfpqTopKLearnedReranked(emb, qPred, coPred, seedPred,
        m = 8, k = 10, nprobe = 2, overscan = 4),
      exact)
    info(f"mean rerank recall@10: fixture=$fixture%.0f bp learned=$learned%.0f bp")
    assert(learned >= fixture,
      f"learned codebooks lost recall: $learned%.0f bp < $fixture%.0f bp")
    emb.unpersist(); exact.unpersist()
  }

  test("clustered corpus: production chain recall@5 stays high at partial scan") {
    // the ann_recall_clustered corpus shape: N/12 tight clusters
    // (center + own/16), production knobs — routing keeps clusters
    // together and the exact re-rank orders the cluster-mates, so
    // recall must be high even though only nprobe of the coarse lists
    // are scanned (the driver hash gate pins the exact per-query
    // values; this pins the QUALITY floor the gate encodes)
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val nc = math.max(e.count() / 12L, 1L)
    val centers = e.filter(col("vec_id") < nc)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val clustered = e.withColumn("c_id", col("vec_id") % nc)
      .join(broadcast(centers), Seq("c_id"))
      .select(col("vec_id"),
        zip_with(col("c_emb"), col("embedding"),
          (c, o) => c.cast("double") + o.cast("double") / lit(16.0))
          .as("embedding")).cache()
    val qPred = col("vec_id") % 50 === 7
    val bp = meanRecallBp(
      Similarity.ivfpqTopKLearnedReranked(clustered, qPred,
        col("vec_id") % 125 === 11, col("vec_id") % 78 === 5,
        m = 8, k = 5, nprobe = 2, overscan = 4),
      Similarity.bruteForceTopKL2(clustered, qPred, k = 5))
    info(f"clustered mean rerank recall@5: $bp%.0f bp")
    assert(bp >= 9000.0,
      f"clustered-corpus recall collapsed: $bp%.0f bp < 9000 bp")
    clustered.unpersist()
  }

  test("recall report arithmetic: basis points, exact div, missing hits count zero") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "hit_id")
    val found = Seq((1L, 10L), (1L, 99L), (2L, 20L)).toDF("query_id", "hit_id")
    val r = Similarity.annRecallReport(found, exact)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((3L, 1L, 3333L))) // 1 of 3 found -> 3333 bp (floor)
    assert(r(2L) == ((1L, 1L, 10000L)))
  }

  test("autotune: report choice == searchWithRecallTarget, fallback on " +
    "unattainable target, chosen search == fixed-nprobe search") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").cache()
    val sPred = col("vec_id") % 50 === 7
    val ePred = col("vec_id") % 50 === 19
    val coPred = col("vec_id") % 125 === 11
    val seedPred = col("vec_id") % 78 === 5
    val rep = Similarity.autotuneReport(emb, sPred, ePred, coPred, seedPred,
        m = 8, k = 5, targetBp = 2000)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).sortBy(_._1)
    assert(rep.map(_._1).toSeq == Seq(1, 2, 4))
    // exactly one chosen rung: the smallest meeting the target, else top
    assert(rep.count(_._3) == 1, s"$rep")
    val chosen = rep.find(_._3).get
    val qualifying = rep.filter(_._2 >= 2000L).map(_._1)
    assert(chosen._1 == (if (qualifying.nonEmpty) qualifying.min else 4),
      s"$rep")
    // eval recall is surfaced on the chosen rung ONLY
    assert(rep.forall(r => r._4.isDefined == r._3), s"$rep")
    // the production entry point lands on the same rung and emits
    // exactly the fixed-nprobe production search at it
    val search = Similarity.searchWithRecallTarget(emb, ePred, sPred,
      coPred, seedPred, m = 8, k = 5, targetBp = 2000)
    assert(search.select("nprobe").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(chosen._1))
    val got = search.select("query_id", "hit_id", "dist", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val fixed = Similarity.ivfpqTopKLearnedReranked(emb, ePred, coPred,
        seedPred, m = 8, k = 5, nprobe = chosen._1, overscan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got == fixed)
    // a target no rung can reach falls back to the ladder's TOP rung —
    // and SAYS SO: target_met reads false on the fallback branch,
    // true when a rung genuinely qualified (r14, both branches pinned)
    val fb = Similarity.searchWithRecallTarget(emb, ePred, sPred, coPred,
      seedPred, m = 8, k = 5, targetBp = 10001)
    assert(fb.select("nprobe").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    assert(fb.select("target_met").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(false))
    // ...and agrees with the measured qualifying set on the real target
    assert(search.select("target_met").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(qualifying.nonEmpty))
    val fbRep = Similarity.autotuneReport(emb, sPred, ePred, coPred, seedPred,
      m = 8, k = 5, targetBp = 10001)
    assert(fbRep.select("target_met").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(false),
      "report must flag the silent-fallback case")
    // a trivially reachable target reads true (recall ≥ 0 bp always)
    assert(Similarity.autotuneReport(emb, sPred, ePred, coPred, seedPred,
        m = 8, k = 5, targetBp = 1)
      .select("target_met").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(rep.exists(_._2 >= 1L)))
    emb.unpersist()
  }

  test("autotuneReportStored: nlist-relative rungs dedupe after conversion " +
    "and match the absolute-ladder report at the same nprobes") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").cache()
    val sPred = col("vec_id") % 50 === 7
    val ePred = col("vec_id") % 50 === 19
    val coPred = col("vec_id") % 125 === 11
    val seedPred = col("vec_id") % 78 === 5
    val nlist = emb.filter(coPred).count()
    val cw = Similarity.ivfpqLearnedCodebooks(emb, coPred, seedPred, m = 8)
      .localCheckpoint()
    val idx = Similarity.ivfpqIndexLearned(emb, coPred, cw, m = 8)
      .localCheckpoint()
    val fracs = Seq(1250, 2500, 5000)
    val expected = fracs.map(f => math.max(1L, nlist * f / 10000).toInt).distinct
    val stored = Similarity.autotuneReportStored(emb, idx, cw, sPred, ePred,
        coPred, m = 8, k = 5, targetBp = 2000, ladderFracBp = fracs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(stored.map(_._1).toSeq == expected,
      s"rungs ${stored.map(_._1).toSeq} != expected $expected (nlist $nlist)")
    // the same deterministic build runs under autotuneReport, so rows at
    // the same nprobes are identical — the stored path adds no drift
    val abs = Similarity.autotuneReport(emb, sPred, ePred, coPred, seedPred,
        m = 8, k = 5, targetBp = 2000, ladder = expected)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(stored.toSeq == abs.toSeq)
    emb.unpersist()
  }

  test("tagged two-side ladder (r15): autotuneReport's sample AND eval " +
    "columns equal the single-side ladder run per query set") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").cache()
    val sPred = col("vec_id") % 50 === 7
    val ePred = col("vec_id") % 50 === 19
    val coPred = col("vec_id") % 125 === 11
    val seedPred = col("vec_id") % 78 === 5
    val ladder = Seq(1, 2, 4)
    // the report runs BOTH query sets in one tagged pass; the public
    // single-set ladder runs each alone — per side the counts must be
    // bit-identical (side only prepends window/group keys)
    val rep = Similarity.autotuneReport(emb, sPred, ePred, coPred, seedPred,
        m = 8, k = 5, targetBp = 2000, ladder = ladder)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .sortBy(_._1)
    def solo(pred: org.apache.spark.sql.Column) =
      Similarity.nprobeRecallLadder(emb, pred, coPred, seedPred,
          m = 8, k = 5, ladder = ladder)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).sortBy(_._1)
    val soloS = solo(sPred)
    assert(rep.map(r => (r._1, r._2, r._3, Some(r._4))).toSeq ==
      soloS.toSeq.map(r => (r._1, r._2, r._3, r._4)),
      s"sample side drifted: rep=${rep.toSeq} solo=${soloS.toSeq}")
    val soloE = solo(ePred).map(r => r._1 -> r._4).toMap
    rep.foreach { r =>
      if (r._5.isDefined) // eval recall surfaces on the chosen rung only
        assert(r._5 == soloE(r._1),
          s"eval side drifted at rung ${r._1}: ${r._5} != ${soloE(r._1)}")
    }
    emb.unpersist()
  }

  test("shared-assignment build (r15): ivfpqLearnedArtifacts == the " +
    "separate codebooks + index builds, bit for bit") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").cache()
    val coPred = col("vec_id") % 125 === 11
    val seedPred = col("vec_id") % 78 === 5
    val (cwS, idxS) = Similarity.ivfpqLearnedArtifacts(emb, coPred, seedPred,
      m = 8)
    val cw = Similarity.ivfpqLearnedCodebooks(emb, coPred, seedPred, m = 8)
      .localCheckpoint()
    val idx = Similarity.ivfpqIndexLearned(emb, coPred, cw, m = 8)
    def cwRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cw_id", "s").collect().map(_.toString).toSeq
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(cwRows(cwS) == cwRows(cw), "codebooks drifted under the shared build")
    assert(idxRows(idxS) == idxRows(idx), "index drifted under the shared build")
    assert(cwRows(cwS).nonEmpty && idxRows(idxS).nonEmpty)
    emb.unpersist()
  }

  test("searchWithRecallTargetStored: identical to the rebuilding search " +
    "at the same artifacts and rungs; fallback flags target_met false") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").cache()
    val sPred = col("vec_id") % 50 === 7
    val qPred = col("vec_id") % 50 === 19
    val coPred = col("vec_id") % 125 === 11
    val seedPred = col("vec_id") % 78 === 5
    val nlist = emb.filter(coPred).count()
    val cw = Similarity.ivfpqLearnedCodebooks(emb, coPred, seedPred, m = 8)
      .localCheckpoint()
    val idx = Similarity.ivfpqIndexLearned(emb, coPred, cw, m = 8)
      .localCheckpoint()
    val fracs = Seq(1250, 2500, 5000)
    val expected = fracs.map(f => math.max(1L, nlist * f / 10000).toInt).distinct
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("query_id", "hit_id", "dist", "CAST(rnk AS BIGINT)",
          "CAST(nprobe AS BIGINT)", "sample_recall_bp", "target_met")
        .collect().map(_.toString).sorted.toSeq
    val stored = rows(Similarity.searchWithRecallTargetStored(emb, idx, cw,
      qPred, sPred, coPred, m = 8, k = 5, targetBp = 2000,
      ladderFracBp = fracs))
    // the same deterministic build runs inside the rebuilding form, so
    // the stored path must add no drift at the equivalent absolute rungs
    val rebuilt = rows(Similarity.searchWithRecallTarget(emb, qPred, sPred,
      coPred, seedPred, m = 8, k = 5, targetBp = 2000, ladder = expected))
    assert(stored.nonEmpty && stored == rebuilt,
      "stored-artifact search != rebuilding search")
    // unreachable target: top rung, honest flag
    val fb = Similarity.searchWithRecallTargetStored(emb, idx, cw, qPred,
      sPred, coPred, m = 8, k = 5, targetBp = 10001, ladderFracBp = fracs)
    assert(fb.select("nprobe").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(expected.last.toLong))
    assert(fb.select("target_met").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(false))
    emb.unpersist()
  }
}
