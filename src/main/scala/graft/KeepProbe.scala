package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level scaling probe for the dedup_clusters / dedup_keep tail
  * (round-10 watch-list: α=1.16 / 1.45 between sf1 and sf3): times the
  * pair generation, the label-propagation loop (with ROUND COUNT), and
  * the keep window separately, under TWO corpus augmentations —
  *
  *  - `driver`: the exact docsAug recipe. Since r12 the offset is
  *    DERIVED (smallest multiple of 100000 above max(doc_id)), so the
  *    driver cell is collision-free at every SF and must equal `clean`.
  *  - `clean`: the same augmentation at fixed huge offsets
  *    (+10_000_000 / +20_000_000), same planted fraction.
  *  - `legacy100k`: the pre-r12 fixed +100000/+200000 recipe, kept to
  *    quantify the collision artifact it injected on >100k-doc corpora
  *    (sf3 = 150k doc_ids → planted ids collided with real documents:
  *    duplicate doc_id keys with different texts multiplied every
  *    per-id join and inflated the pair set ~1.6×).
  *
  * α computed between two runs of this probe (sf1 dir vs sf3 dir) on
  * the `clean` cells is the engine's actual scaling; the driver-vs-
  * clean gap at sf3 quantifies the collision artifact.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 runMain graft.KeepProbe
  */
object KeepProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def aug(d: DataFrame, off: Long): DataFrame =
    d.unionAll(d.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + off).as("doc_id"),
          concat(col("text"), lit(" neardup extra")).as("text")))
      .unionAll(d.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + 2 * off).as("doc_id"), col("text").as("text")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val d = Tables(spark, sfDir, "documents").select("doc_id", "text")
    // `driver` now mirrors docsAug's DERIVED offset (r12: smallest
    // multiple of 100000 above max(doc_id)), so driver == clean at any
    // SF; `legacy100k` keeps the pre-r12 fixed constant to quantify the
    // collision artifact it used to inject on >100k-doc corpora
    val derivedOff = (d.agg(max("doc_id")).head.getLong(0) / 100000L + 1L) * 100000L
    val cells = Seq("driver" -> derivedOff, "clean" -> 10000000L,
        "legacy100k" -> 100000L).map {
      case (tag, off) =>
        val a = aug(d, off).cache()
        val nDocs = a.count()
        val dupIds = nDocs - a.select("doc_id").distinct().count()
        val (pairs, tPairs) = time {
          val p = Dedup.wordGramNearDupsPoly(a, threshold = 0.5)
            .localCheckpoint()
          (p, p.count())
        }
        val nodes = a.select("doc_id")
        val (labels, tLabels) = time {
          val l = Dedup.clusterLabels(pairs._1, nodes).localCheckpoint()
          (l, l.count())
        }
        val (_, tKeep) = time {
          Dedup.keepCanonical(a, labels._1).count()
        }
        val nClusters = labels._1.select("cluster_id").distinct().count()
        a.unpersist()
        f"""{"cell":"$tag","n_docs":$nDocs,"dup_ids":$dupIds,"n_pairs":${pairs._2},"n_clusters":$nClusters,"pairs_secs":$tPairs%.2f,"labels_secs":$tLabels%.2f,"keep_secs":$tKeep%.2f}"""
    }
    // containment diagnosis: the dedup_containment fixture plants
    // 12-word TRUNCATED prefixes of every %11 doc — prefix docs drawn
    // from one empirical vocabulary collide with each other in gram
    // space, so the candidate (and verified-pair) count among PLANTED
    // docs can grow quadratically with corpus size: workload coupling,
    // not plan shape. The cell splits the output by whether both ends
    // are planted.
    val contain = {
      val a = d
        .unionAll(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 3 * derivedOff).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " ", -1), 1, 12)).as("text")))
        .unionAll(d.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 2 * derivedOff).as("doc_id"), col("text")))
        .cache()
      a.count()
      val (out, tAll) = time {
        val o = operators.Dedup.wordGramContainment(a, threshold = 0.9)
          .localCheckpoint()
        (o, o.count())
      }
      val planted = out._1
        .filter(col("doc_a") >= 2 * derivedOff && col("doc_b") >= 2 * derivedOff)
        .count()
      // bucket-size census of the single-family containment bands: the
      // within-bucket pairing is quadratic BELOW the cap, so sum b² over
      // buckets (truncated at the cap) is the candidate-volume driver
      import graft.functions.QWordGrams
      val bands = a.select(col("doc_id"), lower(col("text")).as("t"))
        .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= 3)
        .select(col("doc_id"),
          posexplode(QWordGrams.polySigCol(col("t"), 3)).as(Seq("band_id", "band")))
      val buckets = bands.groupBy("band_id", "band").agg(count(lit(1)).as("b"))
        .agg(sum(when(col("b") <= 256, expr("b * (b - 1) div 2"))
            .otherwise(col("b") - 1)).as("cand_volume"),
          max("b").as("max_bucket"),
          sum(when(col("b") > 256, 1).otherwise(0)).as("over_cap"))
        .head()
      // fixed-knob twin: cap at 64 — if the growth is bucket-density
      // workload coupling, the tighter cap flattens it; a plan-shape
      // problem would not care
      val (_, tCap) = time {
        operators.Dedup.wordGramContainment(a, threshold = 0.9, maxBucket = 64,
            candidateBudgetPerDoc = None)
          .count()
      }
      a.unpersist()
      f"""{"n_pairs":${out._2},"planted_planted_pairs":$planted,"secs":$tAll%.2f,"cand_volume":${buckets.getLong(0)},"max_bucket":${buckets.getLong(1)},"over_cap":${buckets.getLong(2)},"cap64_secs":$tCap%.2f}"""
    }
    println(s"""{"probe":"keep_scaling","sf":"$sfDir","cells":[
${cells.mkString(",\n")}],
"containment":$contain}""")
    spark.stop()
  }
}
