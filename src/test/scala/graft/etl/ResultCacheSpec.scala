package graft.etl

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Result cache: identical plans over identical scanned paths hit; a
  * commit to a read table invalidates exactly; unrelated commits do
  * not; results always equal direct evaluation.
  */
class ResultCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("g", StringType),
    StructField("v", LongType)))

  private def freshWh() = new Warehouse(spark,
    Files.createTempDirectory("rescache").toString,
    Map("t" -> schema, "u" -> schema),
    partitionSpec = Map.empty, bucketSpec = Map.empty)

  private def load(wh: Warehouse, table: String, rows: Seq[(String, Long)]): Unit = {
    val t = wh.begin(); t.append(table, rows.toDF("g", "v")); t.commit()
  }

  private def q(wh: Warehouse) =
    wh.read("t").groupBy("g").agg(sum(col("v")).as("s"))

  test("second identical query hits; results equal direct evaluation") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L), ("a", 2L), ("b", 5L)))
    assert(!ResultCache.wouldHit(wh, q(wh)))
    val first = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(first == Set(("a", 3L), ("b", 5L)))
    assert(ResultCache.wouldHit(wh, q(wh)), "same plan should now hit")
    // an equivalent frame built independently hits too (canonical plan)
    val again = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == first)
    // a DIFFERENT query does not hit
    assert(!ResultCache.wouldHit(wh,
      wh.read("t").groupBy("g").agg(count(lit(1)).as("n"))))
  }

  test("a commit to the read table invalidates; an unrelated commit does not") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L)))
    load(wh, "u", Seq(("x", 7L)))
    ResultCache.through(wh, q(wh)).collect()
    assert(ResultCache.wouldHit(wh, q(wh)))

    // unrelated table commit: the plan's scanned paths are unchanged
    load(wh, "u", Seq(("y", 8L)))
    assert(ResultCache.wouldHit(wh, q(wh)),
      "commit to an unrelated table must NOT invalidate")

    // commit to the read table: new dir set => new key => miss
    load(wh, "t", Seq(("a", 10L)))
    assert(!ResultCache.wouldHit(wh, q(wh)), "commit to a read table must invalidate")
    val fresh = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fresh == Set(("a", 11L)), "post-commit result reflects the new data")
  }

  test("prune reclaims entries whose source dirs were retired") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L)))
    ResultCache.through(wh, q(wh)).collect()
    val beforeOverwrite = q(wh) // frame bound to the OLD dirs
    // overwrite retires the old dir entirely
    val txn = wh.begin(); txn.overwrite("t", Seq(("a", 2L)).toDF("g", "v")); txn.commit()
    ResultCache.through(wh, q(wh)).collect() // current entry
    assert(ResultCache.prune(wh) == 1, "exactly the retired-dir entry goes")
    assert(ResultCache.wouldHit(wh, q(wh)), "current-dir entry survives prune")
    assert(!ResultCache.wouldHit(wh, beforeOverwrite))
  }

  test("nondeterministic plans bypass the cache") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L)))
    val nd = wh.read("t").withColumn("r", rand())
    assert(!ResultCache.wouldHit(wh, nd))
    ResultCache.through(wh, nd).collect()
    assert(!ResultCache.wouldHit(wh, nd), "rand() must never be served from cache")
    assert(!Files.exists(java.nio.file.Paths.get(wh.root, "_cache")) ||
      Files.list(java.nio.file.Paths.get(wh.root, "_cache")).count() == 0)
  }

  test("serving stack: MV routing and the result cache compose") {
    import graft.operators.MaterializedAgg
    import graft.operators.MaterializedAgg.{Count => MCount, Measure}
    import graft.plans.MvRewrite
    val wh = freshWh()
    load(wh, "t", (1 to 90).map(i => (s"g${i % 3}", i.toLong)))
    val measures = Seq(Measure("n", lit(1), MCount))
    val t = wh.begin()
    t.overwrite("u", MaterializedAgg.aggregate(wh.read("t"), Seq("g"), measures)
      .select(col("g"), col("n").cast("long").as("v")))
    t.commit()
    MvRewrite.registerWarehouse(wh, "t", "u", Seq("g"),
      Seq(MvRewrite.MeasureSig("v", "count", None)))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try {
      def covered = wh.read("t").groupBy("g").agg(count(lit(1)).as("v"))
      // first run: routed to the view AND admitted to the cache — the
      // cache key is the ANALYZED plan over the BASE paths, so routing
      // (an optimizer-time rewrite) never affects hit identity
      val r1 = ResultCache.through(wh, covered)
      assert(r1.collect().map(_.getLong(1)).sum == 90)
      assert(ResultCache.wouldHit(wh, covered))
      val r2 = ResultCache.through(wh, covered)
      assert(r2.collect().map(_.getLong(1)).sum == 90)
      assert(r2.queryExecution.executedPlan.toString.contains("_cache"),
        "second run should serve from the cache entry")
    } finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  test("entry cap evicts least-recently-used; a touched entry survives") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    def qn(n: Int) = wh.read("t").filter(col("v") <= n.toLong)
      .groupBy("g").agg(sum(col("v")).as("s"))
    def entries = {
      val root = java.nio.file.Paths.get(wh.root, "_cache")
      if (!Files.exists(root)) 0
      else { import scala.jdk.CollectionConverters._
        Files.list(root).iterator().asScala.size }
    }
    // fill to the cap of 3 (mtime-granularity guard between stores);
    // grace = 0 isolates the pure LRU policy from the safety window
    (1 to 3).foreach { i =>
      ResultCache.through(wh, qn(i), maxEntries = 3, evictionGraceMs = 0L).collect()
      Thread.sleep(15) }
    assert(entries == 3)
    // touch entry 1 (a HIT refreshes recency), then overflow the cap:
    // the LRU victim must be entry 2, not the just-touched entry 1
    ResultCache.through(wh, qn(1), maxEntries = 3, evictionGraceMs = 0L).collect()
    Thread.sleep(15)
    ResultCache.through(wh, qn(4), maxEntries = 3, evictionGraceMs = 0L).collect()
    assert(entries == 3, "cap must hold after overflow")
    assert(ResultCache.wouldHit(wh, qn(1)), "recently-hit entry must survive eviction")
    assert(!ResultCache.wouldHit(wh, qn(2)), "LRU entry must be the victim")
    assert(ResultCache.wouldHit(wh, qn(4)))
  }

  test("eviction grace: an over-cap burst never deletes files under an unconsumed lazy frame") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    def qn(n: Int) = wh.read("t").filter(col("v") <= n.toLong)
      .groupBy("g").agg(sum(col("v")).as("s"))
    // store entry 1 and HOLD the returned frame lazily (no action yet)
    val held = ResultCache.through(wh, qn(1), maxEntries = 2)
    Thread.sleep(15)
    // burst past the cap: with the default grace every entry is fresh,
    // so nothing is evicted and the held frame's files stay on disk
    (2 to 4).foreach { i =>
      ResultCache.through(wh, qn(i), maxEntries = 2).collect(); Thread.sleep(15) }
    assert(held.collect().nonEmpty,
      "the lazily-held cached result must still evaluate after the burst")
    assert(ResultCache.wouldHit(wh, qn(1)))
  }

  test("hard cap: a grace-pinned burst stops storing instead of growing the disk") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    def qn(n: Int) = wh.read("t").filter(col("v") <= n.toLong)
      .groupBy("g").agg(sum(col("v")).as("s"))
    def entries = {
      val root = java.nio.file.Paths.get(wh.root, "_cache")
      if (!Files.exists(root)) 0
      else { import scala.jdk.CollectionConverters._
        Files.list(root).iterator().asScala.size }
    }
    // soft cap 2, hard cap 4, default grace: every entry in the burst is
    // inside the grace window, so LRU cannot evict — the hard cap must
    // stop the disk growth instead
    (1 to 8).foreach { i =>
      val out = ResultCache.through(wh, qn(i), maxEntries = 2,
        hardMaxEntries = 4)
      // passthrough or cached, the ANSWER is always right
      assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        qn(i).collect().map(r => (r.getString(0), r.getLong(1))).toSet,
        s"burst query $i must return correct rows regardless of caching")
      Thread.sleep(15)
    }
    assert(entries == 4, s"hard cap must bound _cache at 4 entries, got $entries")
    // the first 4 stored and still hit; the rest were served uncached
    assert(ResultCache.wouldHit(wh, qn(1)) && ResultCache.wouldHit(wh, qn(4)))
    assert(!ResultCache.wouldHit(wh, qn(5)) && !ResultCache.wouldHit(wh, qn(8)),
      "past the hard cap results must not have been stored")
  }

  test("empty results cache and read back with schema intact") {
    val wh = freshWh()
    load(wh, "t", Seq(("a", 1L)))
    val empty = wh.read("t").filter(col("v") > 100L)
    val out = ResultCache.through(wh, empty)
    assert(out.collect().isEmpty && out.schema.fieldNames.toSeq == Seq("g", "v"))
    assert(ResultCache.wouldHit(wh, wh.read("t").filter(col("v") > 100L)))
  }
}
