package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Latency breakdown of the two triangle enumerations over the same
  * near-dup pair graph — evidence for where the degree-oriented
  * variant's constant goes (edge generation is shared and measured
  * separately; the enumeration cores are timed warm, twice each; set
  * TRIPROBE_STAGES=1 for a per-stage duration dump of each run).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.TriangleProbe
  */
object TriangleProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private class StageLog extends SparkListener {
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
        .getOrElse(-1L)
      stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(90), ms))
    }
    def drainAndPrint(label: String): Unit = {
      var total = 0L
      val it = stages.iterator()
      while (it.hasNext) {
        val (id, name, ms) = it.next()
        total += math.max(ms, 0)
        println(f"  [$label] stage $id%4d $ms%6d ms  $name")
      }
      println(f"  [$label] sum-of-stages ${total / 1000.0}%.2f s, n=${stages.size}")
      stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, GraphMetrics}
    val log = new StageLog
    val wantStages = sys.env.contains("TRIPROBE_STAGES")
    if (wantStages) spark.sparkContext.addSparkListener(log)

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val aug = docs.unionAll(
        docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" neardup extra")).as("text")))
      .unionAll(
        docs.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text").as("text")))
    val pairs = Dedup.wordGramNearDupsPoly(aug, threshold = 0.5).cache()
    val (nEdges, edgeSecs) = time(pairs.count())
    println(f"edges=$nEdges edge_gen=$edgeSecs%.2fs")
    if (wantStages) log.drainAndPrint("edge-gen")

    def run(label: String, byDegree: Boolean): Unit = {
      for (i <- 1 to 2) {
        val (df, build) = time(GraphMetrics.trianglesPerNode(pairs, byDegree))
        val (n, s) = time(df.count())
        println(f"$label run$i: rows=$n build=$build%.2f action=$s%.2f")
        if (wantStages) log.drainAndPrint(s"$label run$i")
      }
      GraphMetrics.releaseCaches()
    }
    run("id-oriented ", byDegree = false)
    run("deg-oriented", byDegree = true)
    spark.stop()
  }
}
