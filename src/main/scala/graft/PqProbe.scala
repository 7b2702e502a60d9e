package graft

import java.util.Locale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the PQ/IVF-PQ family at sf1 (20k × 64-dim
  * vectors): measures the numbers behind the 100 TB claims —
  * (a) the stored code table is a small fraction of the raw embedding
  * bytes (the scan-side compression ADC exists for),
  * (b) searching a STORED index skips the corpus-sized encode, so the
  * repeat-query path beats rebuilding,
  * (c) IVF routing bounds the scored candidates to ~nprobe/lists of
  * the Q·N brute-force pair count.
  * Correctness rides ann_pq/ann_ivfpq's oracle + the stored-index
  * equality spec; this probe asserts result equality before timing so
  * both paths are warm and provably identical.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.PqProbe
  */
object PqProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(dir: String): Long = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val n = emb.count()
    val qPred = col("vec_id") % 250 === 7
    val coPred = col("vec_id") % 125 === 11
    val pqPred = col("vec_id") % 40 === 3 && col("vec_id") < 2560
    val (m, k, nprobe) = (8, 5, 2)
    val nQueries = emb.filter(qPred).count()
    val nLists = emb.filter(coPred).count()

    // (a) bytes: raw embeddings vs the stored code table
    val base = java.nio.file.Files.createTempDirectory("pqprobe").toString
    emb.write.parquet(s"$base/raw")
    val (_, buildSecs) = time {
      Similarity.ivfpqIndex(emb, coPred, pqPred, m).write.parquet(s"$base/idx")
    }
    val rawBytes = dirBytes(s"$base/raw")
    val idxBytes = dirBytes(s"$base/idx")

    // (b) equality FIRST (warms both paths), then timings
    val index = spark.read.parquet(s"$base/idx")
    def stored() = Similarity.ivfpqSearchStored(index, emb,
      qPred, coPred, pqPred, m, k, nprobe)
    def fresh() = Similarity.ivfpqTopK(emb, qPred, coPred, pqPred, m, k, nprobe)
    val sRows = stored().collect().map(_.toString).sorted
    val fRows = fresh().collect().map(_.toString).sorted
    require(sRows.nonEmpty && sRows.sameElements(fRows),
      "stored-index search != fresh build")
    val (_, storedSecs) = time(stored().count())
    val (_, freshSecs) = time(fresh().count())
    val (bruteCount, bruteSecs) = time(
      Similarity.bruteForceTopK(emb, qPred, k).count())

    // (c) candidates actually SCORED: k = n surfaces every
    // (query, probed-list member) pair the ADC scan touched
    val probedPairs = Similarity.ivfpqTopK(emb, qPred, coPred, pqPred,
        m, n.toInt, nprobe)
      .count()
    val _ = bruteCount

    println(String.format(Locale.ROOT,
      """{"metric":"ivfpq","vectors":%d,"queries":%d,"lists":%d,"m":%d,"raw_bytes":%d,"index_bytes":%d,"bytes_ratio":%.3f,"index_build_secs":%.2f,"stored_search_secs":%.2f,"fresh_build_search_secs":%.2f,"brute_secs":%.2f,"scored_pairs":%d,"brute_pairs":%d,"scan_fraction":%.4f}""",
      Long.box(n), Long.box(nQueries), Long.box(nLists), Int.box(m),
      Long.box(rawBytes), Long.box(idxBytes),
      Double.box(idxBytes.toDouble / rawBytes),
      Double.box(buildSecs), Double.box(storedSecs), Double.box(freshSecs),
      Double.box(bruteSecs), Long.box(probedPairs),
      Long.box(nQueries * (n - 1)),
      Double.box(probedPairs.toDouble / (nQueries * (n - 1)))))
    spark.stop()
  }
}
