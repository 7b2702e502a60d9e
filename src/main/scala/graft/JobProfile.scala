package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query wall-time attribution (optimization-round instrument): runs
  * each named query once warm and reports where the seconds live —
  * executed Spark jobs (count + summed wall + the top offenders by
  * description) vs driver-side gaps (planning, FS metadata, local work).
  * A query whose time is 60 tiny jobs needs fewer actions; one whose
  * time is a single fat stage needs a better plan; one that is mostly
  * gap needs driver work (planning/listing) removed.
  * Usage: runMain graft.JobProfile <query> [query...]
  */
object JobProfile {
  private final class Acc extends SparkListener {
    case class J(id: Int, var desc: String, var start: Long, var end: Long,
                 var stages: Int, var tasks: Int, var taskMs: Long)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    case class St(name: String, ms: Long, tasks: Int, taskMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    var deserMs, runMs, gcMs, resSerMs, cpuMs = 0L
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val d = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      jobs(e.jobId) = J(e.jobId, d, e.time, e.time, e.stageIds.size, 0, 0L)
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        if (e.taskInfo != null) j.taskMs += e.taskInfo.duration
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = e.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        stages += St(si.name, ms, si.numTasks,
          si.taskMetrics.executorRunTime)
        val tm = si.taskMetrics
        deserMs += tm.executorDeserializeTime
        runMs += tm.executorRunTime
        gcMs += tm.jvmGCTime
        resSerMs += tm.resultSerializationTime
        cpuMs += tm.executorCpuTime / 1000000L
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true")) // bench default (r15 A/B)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up

    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    for (name <- args) {
      // one unprofiled warm run so JIT/codegen caches don't pollute the
      // attribution (matches the bench's min-of-3 steady state)
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain (no public wait API)
      spark.sparkContext.removeSparkListener(acc)
      val js = acc.jobs.values.toSeq
      val jobWall = js.map(j => (j.end - j.start).max(0L)).sum / 1e3
      val taskSec = js.map(_.taskMs).sum / 1e3
      println(f"== $name wall=$wall%.2fs jobs=${js.size} " +
        f"jobWall=$jobWall%.2fs gap=${wall - jobWall}%.2fs " +
        f"stages=${js.map(_.stages).sum} tasks=${js.map(_.tasks).sum} " +
        f"taskSec=$taskSec%.1f")
      val byDesc = js.groupBy(_.desc).map { case (d, g) =>
        (d, g.size, g.map(j => (j.end - j.start).max(0L)).sum / 1e3,
          g.map(_.tasks).sum)
      }.toSeq.sortBy(-_._3)
      for ((d, n, sec, tasks) <- byDesc.take(14))
        println(f"   $sec%7.2fs n=$n%-4d tasks=$tasks%-5d ${d.take(110)}")
      val byStage = acc.stages.groupBy(_.name).map { case (nm, g) =>
        (nm, g.size, g.map(_.ms).sum / 1e3, g.map(_.tasks).sum,
          g.map(_.taskMs).sum / 1e3)
      }.toSeq.sortBy(-_._3)
      println(f"   -- task metrics: deser=${acc.deserMs / 1e3}%.1fs " +
        f"run=${acc.runMs / 1e3}%.1fs cpu=${acc.cpuMs / 1e3}%.1fs " +
        f"gc=${acc.gcMs / 1e3}%.1fs resSer=${acc.resSerMs / 1e3}%.1fs")
      println(f"   -- stages by summed wall (name n sumSec tasks taskSec):")
      for ((nm, n, sec, tasks, tsec) <- byStage.take(16))
        println(f"   $sec%7.2fs n=$n%-4d tasks=$tasks%-5d tsk=$tsec%6.1fs ${nm.take(95)}")
    }
    spark.stop()
  }
}
