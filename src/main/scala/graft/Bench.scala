package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line —
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is forced with .count() (full plan execution, no result
  * collection overhead). A tiny warm-up query absorbs session/codegen
  * startup so per-query numbers reflect steady state. The cache is
  * cleared between queries: Spark's CacheManager matches canonicalized
  * plans ACROSS queries, so without isolation an earlier query warms a
  * later one's identical sub-plan (and leaked blocks pressure the rest)
  * — per-query numbers must each carry their own full cost.
  *
  * Each query runs `SPARK_GRAFT_RUNS` times (default 3) and reports the
  * MIN: single runs at this scale vary ±2.5× on GC/compilation noise
  * (round-2 lesson: 21.3s vs 8.5s for the same query), and the min is
  * the only run-count-stable statistic — regressions can't hide in it.
  *
  * VARIANCE BOUND (the round-4 q_pivot 3.5× lesson): even the min-of-3
  * drifts between FULL-SUITE runs for sub-second queries — 72 queries in
  * one JVM shift JIT/code-cache state, so a query's three runs can all
  * land slow. The artifact therefore carries a per-query `spread`
  * (max/min of the three runs, the run's own noise floor): a moved min
  * whose spread is ≈1 is a real regression; a moved min with spread ≥2
  * is noise until reproduced. Cross-run comparisons below ~0.5 s should
  * be judged against spread, not treated as signal.
  *
  * ROUND-ROBIN repeats (round-5 lesson): environmental slowdowns
  * persist for longer than three back-to-back repeats — measured
  * same-build cross-run drift of 2.6× on a query whose own spread read
  * 1.1, i.e. all three adjacent repeats sat inside one slow window and
  * the min learned nothing. Repeats therefore cycle through the WHOLE
  * suite per round (q1..qn, q1..qn, ...) instead of repeating each
  * query in place: a query's samples land minutes apart, so a slow
  * window inflates one sample, not all of them, and both the min and
  * the spread become honest under slow-drift noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: session, file listing, codegen paths
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    // optional args = query-name subset (local iteration; driver passes
    // none). Unknown names are an ERROR: a typo that silently ran fewer
    // queries would make a local A/B comparison vacuous.
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val ordered = selected.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to runs; (name, fn) <- ordered) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
    }
    val results = ordered.map { case (name, _) => name -> samples(name) }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":${v.min}%.3f""" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, v) => "\"" + k + f"""\":${v.max / v.min}%.2f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    // the JSON line must be the LAST thing on stdout: Spark's shutdown
    // logging (and wrapped startup INFO lines, which lose their stream
    // prefix under sbt) otherwise lands after it and a tail-based
    // harness parse reads noise instead of the artifact — the observed
    // BENCH_r03/r04 `parsed: null` failure mode
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreads,"sf":"$sfDir"}""")
  }
}
