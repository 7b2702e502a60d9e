package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-probe hyperplane LSH: probe-set structure, the superset
  * guarantee vs single-probe at equal parameters, and the headline
  * trade — recall held (or improved) at HALF the hash tables.
  */
class MultiProbeLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // base corpus + planted NEAR duplicates (one component nudged, so
  // unlike exact copies some sign bits genuinely flip) at id+1000
  private def planted: (DataFrame, Set[(Long, Long)]) = {
    val base = (0L until 80L).map(i =>
      (i, Array.tabulate(16)(d => ((i * 37 + d * 11) % 17).toFloat - 8f)))
    val dups = base.filter(_._1 % 5 == 0).map { case (i, v) =>
      val w = v.clone()
      w((i % 16).toInt) += 0.9f // enough to flip a low-margin plane
      (i + 1000L, w)
    }
    val truth = dups.map { case (j, _) => (j - 1000L, j) }.toSet
    ((base ++ dups).toDF("vec_id", "embedding"), truth)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe rows: p=0 equals the single-probe bands; each probe flips exactly one bit") {
    val (emb, _) = planted
    val quant = emb.select($"vec_id",
      Similarity.quantize($"embedding").as("q"))
    val probes = Similarity.hyperplaneProbes(quant, planes = 16, bandBits = 8, flips = 2)
    val single = quant.select($"vec_id",
      posexplode(graft.functions.QHyperplaneBands.bands($"q", 16, 8))
        .as(Seq("band_id", "sv")))
    // primary values identical to the single-probe expression
    val mismatch = probes.filter($"p" === 0)
      .join(single, Seq("vec_id", "band_id"))
      .filter($"band_val" =!= $"sv").count()
    assert(mismatch == 0, "p=0 must reproduce QHyperplaneBands exactly")
    // every p>=1 probe differs from its primary in exactly one bit,
    // and the probes within a band are pairwise distinct
    val byBand = probes.groupBy("vec_id", "band_id")
      .agg(first(when($"p" === 0, $"band_val"), ignoreNulls = true).as("prim"),
        collect_list(when($"p" >= 1, $"band_val")).as("flipped"))
      .collect()
    byBand.foreach { r =>
      val prim = r.getLong(2)
      val flipped = r.getSeq[Long](3)
      assert(flipped.size == 2)
      assert(flipped.distinct.size == flipped.size, "probes must be distinct")
      flipped.foreach { f =>
        assert(java.lang.Long.bitCount(prim ^ f) == 1,
          s"probe $f is not a single-bit flip of $prim")
      }
    }
  }

  test("superset of single-probe at equal (planes, bandBits); recall holds at half the tables") {
    val (emb, truth) = planted
    val sp16 = pairs(Similarity.nearDupCandidates(emb, planes = 16, bandBits = 8))
    val sp32 = pairs(Similarity.nearDupCandidates(emb, planes = 32, bandBits = 8))
    val mp16 = pairs(Similarity.nearDupCandidatesMultiProbe(
      emb, planes = 16, bandBits = 8, flips = 1))
    assert(sp16.subsetOf(mp16),
      "multi-probe candidates must contain the single-probe candidates")
    def recall(found: Set[(Long, Long)]): Double =
      truth.intersect(found).size.toDouble / truth.size
    val (rSp16, rSp32, rMp16) = (recall(sp16), recall(sp32), recall(mp16))
    info(f"planted recall: single16=$rSp16%.3f single32=$rSp32%.3f multi16=$rMp16%.3f")
    assert(rMp16 >= rSp16, "multi-probe lost recall vs single-probe at equal planes")
    // the headline trade: 2 tables + 1 flip >= 4 tables, on this corpus
    assert(rMp16 >= rSp32,
      f"multi-probe at half the tables lost recall: $rMp16%.3f < $rSp32%.3f")
    // and it stays blocked — candidates nowhere near all-pairs
    val n = emb.count()
    assert(mp16.size < n * (n - 1) / 8, "candidate set too close to all-pairs")
    val plan = Similarity.nearDupCandidatesMultiProbe(emb, 16, 8, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
