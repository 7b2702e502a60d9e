package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured IVF-PQ quality curve: recall@k vs `nprobe`, plain ADC vs
  * the exact re-rank tail, against the exact integer-L2² ground truth
  * — the number a user tuning nprobe/m/overscan reads instead of the
  * scaladoc's "recall < 1 by construction". Also reports the scanned
  * candidate fraction per nprobe (the cost axis of the same curve).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.AnnRecallProbe
  */
object AnnRecallProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding").cache()
    val n = emb.count()
    val qPred = col("vec_id") % 250 === 7
    val coPred = col("vec_id") % 125 === 11
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val (m, k) = (8, 10)
    val nLists = emb.filter(coPred).count()
    val exact = Similarity.bruteForceTopKL2(emb, qPred, k).cache()
    exact.count()

    def meanBp(found: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecallReport(found, exact)
        .agg(avg("recall_bp")).head.getDouble(0)

    val cells = Seq(1, 2, 4, 8).map { nprobe =>
      val (plainBp, tPlain) = time(meanBp(
        Similarity.ivfpqTopK(emb, qPred, coPred, pqPred, m, k, nprobe)))
      val (rerankBp, tRerank) = time(meanBp(
        Similarity.ivfpqTopKReranked(emb, qPred, coPred, pqPred, m, k, nprobe)))
      val scanFrac = nprobe.toDouble / nLists
      f"""{"nprobe":$nprobe,"scan_frac":$scanFrac%.4f,"plain_recall_bp":$plainBp%.0f,"rerank_recall_bp":$rerankBp%.0f,"plain_secs":$tPlain%.2f,"rerank_secs":$tRerank%.2f}"""
    }
    // the overscan lever at fixed nprobe: re-rank recall is capped by
    // truth ∩ candidate set, so widening the ADC window is the second
    // axis of the same quality/cost trade
    val osCells = Seq(4, 16, 64).map { os =>
      val (bp, t) = time(meanBp(
        Similarity.ivfpqTopKReranked(emb, qPred, coPred, pqPred, m, k,
          nprobe = 8, overscan = os)))
      f"""{"overscan":$os,"rerank_recall_bp":$bp%.0f,"secs":$t%.2f}"""
    }
    println(s"""{"probe":"ann_recall_curve","sf":"$sfDir","n_vectors":$n,"n_lists":$nLists,"m":$m,"k":$k,"overscan":4,"cells":[
${cells.mkString(",\n")}],
"overscan_cells_nprobe8":[
${osCells.mkString(",\n")}]}""")
    spark.stop()
  }
}
