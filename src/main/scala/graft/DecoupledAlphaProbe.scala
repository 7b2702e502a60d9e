package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DECOUPLED scaling alphas (r13 verdict item 3): 18 bench entries carry
  * α > 1 explained as fixture coupling — their QUERY batch grows with
  * the corpus by construction (`vec_id % 50 = 0` is 10× the queries at
  * 10× the corpus), so the raw α conflates per-query cost with batch
  * size. This probe holds the query batch FIXED (ids below the sf0.1
  * id range, so the identical batch exists at both scales) and times
  * the same operators at two corpus scales, reporting the corpus-only
  * α = ln(t_big/t_small) / ln(n_big/n_small):
  *
  *  - `ann_brute_fixed` / `ann_int8_fixed`: exact and int8-quantized
  *    scans — expected α ≈ 1 (per-query cost IS linear in the corpus;
  *    the coupled table's 1.59 was batch-growth × corpus-growth);
  *  - `ann_ivf_fixed` / `ann_ivf_learned_fixed` / `ann_ivfpq_prod_fixed`:
  *    routed searches — probed-fraction scans plus index build;
  *  - `dedup_embed_fixed`: [[graft.operators.Similarity.crossSetMatches]]
  *    of a fixed bench set against the growing corpus (the decoupled
  *    form of the all-pairs dedup whose coupled α read 1.41);
  *  - `q_fuzzy_join_fixed`: a fixed typo'd probe set trigram-joined
  *    against the growing supplier table.
  *
  * Method: per cell, the SMALL scale runs twice (first run pays JIT —
  * min taken), then the BIG scale twice, adjacent in time so the
  * within-cell ratio is apples-to-apples; one untimed warmup first.
  *
  * Usage: runMain graft.DecoupledAlphaProbe /root/testdata/sf0.1 /tmp/testdata/sf1
  */
object DecoupledAlphaProbe {
  private def time(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
  private def minOf2(f: => Long): (Long, Double) = {
    val (r1, t1) = time(f); val (_, t2) = time(f)
    (r1, math.min(t1, t2))
  }

  def main(args: Array[String]): Unit = {
    val smallDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val bigDir = if (args.length > 1) args(1) else "/tmp/testdata/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{FuzzyJoin, Similarity}

    // fixed batches: ids that exist at BOTH scales (sf0.1 has 2000
    // embeddings, suppliers well past 100)
    val qFixed = col("vec_id") % 50 === 0 && col("vec_id") < 2000   // 40 queries
    val benchFixed = col("vec_id") % 29 === 0 && col("vec_id") < 2000 // 69 vecs
    val supFixed = col("s_suppkey") <= 100                            // 100 probes

    def emb(dir: String) = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    def cells(dir: String): Seq[(String, () => Long)] = {
      val e = emb(dir)
      val sup = Tables(spark, dir, "supplier")
      val typo = sup.filter(supFixed).select(col("s_suppkey").as("l_id"),
        when(col("s_suppkey") % 3 === 0,
          expr("""concat(substring(s_name, 1, CAST(s_suppkey % 10 AS INT)),
                         substring(s_name, CAST(s_suppkey % 10 AS INT) + 2, 100))"""))
          .otherwise(col("s_name")).as("l_name"))
      val orig = sup.select(col("s_suppkey").as("r_id"),
        col("s_name").as("r_name"))
      Seq(
        "ann_brute_fixed" -> (() =>
          Similarity.bruteForceTopK(e, qFixed, k = 5).count()),
        "ann_int8_fixed" -> (() =>
          Similarity.int8RerankTopK(e, qFixed, k = 5, overscan = 4).count()),
        "ann_ivf_fixed" -> (() =>
          Similarity.ivfTopK(e, qFixed, col("vec_id") % 50 === 7,
            k = 5, nprobe = 2).count()),
        // root-cause cell: queries AND nlist fixed — the flat
        // nearest-centroid assignment is N·nlist work, and the gate
        // fixture couples nlist = N/50, so the BUILD is ~N²/50; with
        // nlist pinned the same operator must read ~linear-or-better
        "ann_ivf_fixed_nlist" -> (() =>
          Similarity.ivfTopK(e, qFixed,
            col("vec_id") % 50 === 7 && col("vec_id") < 2000,
            k = 5, nprobe = 2).count()),
        "ann_ivf_learned_fixed" -> (() =>
          Similarity.ivfTopKLearned(e, qFixed, col("vec_id") % 50 === 7,
            k = 5, nprobe = 2, lloydIters = 1).count()),
        "ann_ivfpq_prod_fixed" -> (() =>
          Similarity.ivfpqTopKLearnedReranked(e, qFixed,
            col("vec_id") % 125 === 11, col("vec_id") % 78 === 5,
            m = 8, k = 5, nprobe = 2, overscan = 4).count()),
        "dedup_embed_fixed" -> (() =>
          Similarity.crossSetMatches(e.filter(!benchFixed),
            e.filter(benchFixed), threshold = 0.35).count()),
        "q_fuzzy_join_fixed" -> (() =>
          FuzzyJoin.trigramBlocked(typo, orig, "l_id", "l_name",
            "r_id", "r_name", maxDist = 2).count()))
    }

    val nSmall = emb(smallDir).count()
    val nBig = emb(bigDir).count()
    val supSmall = Tables(spark, smallDir, "supplier").count()
    val supBig = Tables(spark, bigDir, "supplier").count()
    require(nBig > nSmall, s"big dir must be bigger ($nSmall -> $nBig)")

    cells(smallDir).head._2() // untimed JIT warmup
    val out = cells(smallDir).zip(cells(bigDir)).map {
      case ((name, small), (_, big)) =>
        val (rs, ts) = minOf2(small())
        val (rb, tb) = minOf2(big())
        val (n0, n1) =
          if (name.startsWith("q_fuzzy")) (supSmall, supBig) else (nSmall, nBig)
        val alpha = math.log(tb / ts) / math.log(n1.toDouble / n0)
        f"""{"cell":"$name","rows_small":$rs,"rows_big":$rb,"secs_small":$ts%.2f,"secs_big":$tb%.2f,"n_small":$n0,"n_big":$n1,"alpha":$alpha%.2f}"""
    }
    println(s"""{"probe":"decoupled_alpha","small":"$smallDir","big":"$bigDir","queries_fixed":true,"cells":[
${out.mkString(",\n")}]}""")
    spark.stop()
  }
}
