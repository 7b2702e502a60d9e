package graft

import org.apache.spark.sql.SparkSession

/** Driver-gap attribution (r15): JobProfile showed the slow scenario
  * queries spend over HALF their wall in driver-side gap (q_cdf_vacuum
  * 5.8 s of 10.0 s) — time with no Spark job running. This probe runs a
  * query warm and SAMPLES every live thread's stack at 10 ms, then
  * prints a histogram of where non-executor threads actually sit,
  * collapsed to the most informative frame (the deepest graft.* frame,
  * else the deepest org.apache.spark frame that is not pure plumbing).
  * The histogram names the scaffolding term to attack — planning, FS
  * metadata, commit protocol, stream start/stop — instead of guessing.
  * Usage: runMain graft.GapProbe <query> [query...]
  */
object GapProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GapProbe <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-gapprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
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
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir).count() // warm run
      spark.catalog.clearCache()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (t, frames) =>
            val n = t.getName
            // skip executor task threads and idle pools: we want the
            // DRIVER-side time (main, stream execution, AQE broadcast)
            val isWorker = n.startsWith("Executor task launch") ||
              n.contains("dispatcher") || n.contains("shuffle") ||
              n.contains("netty") || n.contains("rpc") ||
              n.contains("block-manager") || n.contains("sampler")
            if (!isWorker && frames.nonEmpty &&
                t.getState == Thread.State.RUNNABLE) {
              val fs = frames.map(f => f.getClassName + "." + f.getMethodName)
              val pick = fs.find(_.startsWith("graft."))
                .orElse(fs.find(f => f.startsWith("org.apache.parquet")))
                .orElse(fs.find(f => f.startsWith("org.apache.spark.sql") &&
                  !f.contains("Iterator")))
                .orElse(fs.headOption)
              pick.foreach(p => hist.merge(s"[$n] $p", 1, (a, b) =>
                Integer.valueOf(a.intValue + b.intValue)))
            }
          }
          Thread.sleep(10)
        }
      }, "gap-sampler")
      sampler.setDaemon(true)
      val t0 = System.nanoTime()
      sampler.start()
      SparkEntry.queries(name)(spark, sfDir).count()
      sampling = false
      sampler.join(500)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name wall=$wall%.2fs samples (10ms each, RUNNABLE driver-side threads):")
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2.intValue).take(24).foreach {
        case (frame, n) => println(f"   ${n.intValue * 10}%6d ms  $frame")
      }
    }
    spark.stop()
  }
}
