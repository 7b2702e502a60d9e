package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-knob evidence probe (round 8).
  *
  * The sf0.1→sf1 bench flags the embedding family at ×12-32 for 10×
  * data (SCALING_r8.txt). That growth is in the WORKLOAD definitions,
  * not the plans: for oracle determinism the driver queries define
  * their query sets and codebooks as fixed FRACTIONS of the corpus
  * (`vec_id % 50`), so query×corpus work grows ~n²/50 by construction,
  * and the LSH near-dup keeps `bandBits = 8` — documented for corpora
  * up to ~10^5 — so expected bucket occupancy (and with it candidate
  * pairs, ~n²/2^bits per band) grows linearly with n.
  *
  * At a real 100 TB deployment none of those couplings hold: the query
  * batch is whatever the user submits (fixed, not a corpus fraction),
  * the codebook size is picked for a target cluster size, and bandBits
  * rises with the corpus. This main MEASURES that: each flagged
  * operator runs at the same SF twice — once in its oracle-workload
  * form, once with the scale-appropriate knob (same operator code,
  * different argument) — and prints both times. Knob forms at sf1
  * landing near the sf0.1 workload times × ~1-3 demonstrates the cost
  * was the workload coupling, not the operator.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleProbe
  */
object ScaleProbe {
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").select("vec_id", "embedding")

  private def embAug(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    e.unionAll(e.filter(col("vec_id") % 29 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  /** The q_fuzzy_join workload (supplier typos matched to originals) at
    * a chosen gram length — the fixed-alphabet lever: 10-digit name
    * tails yield only 10^q distinct digit q-grams, so q must grow with
    * log(corpus) to hold candidate density.
    */
  private def fuzzy(s: SparkSession, dir: String, gramLen: Int): DataFrame = {
    val sup = Tables(s, dir, "supplier")
    val typo = sup.select(col("s_suppkey").as("l_id"),
      when(col("s_suppkey") % 3 === 0,
        expr("""concat(substring(s_name, 1, CAST(s_suppkey % 10 AS INT)),
                       substring(s_name, CAST(s_suppkey % 10 AS INT) + 2, 100))"""))
        .otherwise(col("s_name")).as("l_name"))
    val orig = sup.select(col("s_suppkey").as("r_id"), col("s_name").as("r_name"))
    graft.operators.FuzzyJoin.trigramBlocked(
      typo, orig, "l_id", "l_name", "r_id", "r_name", maxDist = 2,
      maxGramDf = None, gramLen = gramLen)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/region.parquet").count()

    // The fraction predicates below: %50 is the oracle-workload form
    // (query/codebook count grows with n); %500 / %290 pins the COUNT
    // at sf1 to what %50 / %29 yields at sf0.1 — the fixed-batch form.
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "ann_brute_fracq" -> (() =>
        Similarity.bruteForceTopK(emb(spark, dir), col("vec_id") % 50 === 0, k = 5)),
      "ann_brute_fixedq" -> (() =>
        Similarity.bruteForceTopK(emb(spark, dir), col("vec_id") % 500 === 0, k = 5)),
      "ann_int8_fracq" -> (() =>
        Similarity.int8RerankTopK(emb(spark, dir), col("vec_id") % 50 === 0,
          k = 5, overscan = 4)),
      "ann_int8_fixedq" -> (() =>
        Similarity.int8RerankTopK(emb(spark, dir), col("vec_id") % 500 === 0,
          k = 5, overscan = 4)),
      "ann_ivf_frac" -> (() =>
        Similarity.ivfTopK(emb(spark, dir), col("vec_id") % 50 === 0,
          col("vec_id") % 50 === 7, k = 5, nprobe = 2)),
      "ann_ivf_fixed" -> (() =>
        Similarity.ivfTopK(emb(spark, dir), col("vec_id") % 500 === 0,
          col("vec_id") % 500 === 7, k = 5, nprobe = 2)),
      "dedup_embed_b8" -> (() =>
        Similarity.nearDupPairs(embAug(spark, dir), threshold = 0.35,
          planes = 32, bandBits = 8)),
      "dedup_embed_b16" -> (() =>
        Similarity.nearDupPairs(embAug(spark, dir), threshold = 0.35,
          planes = 32, bandBits = 16)),
      "dedup_semantic_frack" -> (() =>
        Similarity.semanticDedup(embAug(spark, dir), col("vec_id") % 50 === 7,
          threshold = 0.9, lloydIters = 1)),
      "dedup_semantic_fixedk" -> (() =>
        Similarity.semanticDedup(embAug(spark, dir), col("vec_id") % 500 === 7,
          threshold = 0.9, lloydIters = 1)),
      "fuzzy_gram3" -> (() => fuzzy(spark, dir, gramLen = 3)),
      "fuzzy_gram4" -> (() => fuzzy(spark, dir, gramLen = 4)))

    val out = probes.map { case (name, fn) =>
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn().count()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] $name $s%.3f s ($n rows)")
        s
      }
      name -> secs.min
    }
    def jnum(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(out.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString(s"""{"sf":"$dir","probes":{""", ",", "}}"))
    spark.stop()
  }
}
