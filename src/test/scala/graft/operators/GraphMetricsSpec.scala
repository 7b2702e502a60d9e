package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Triangle enumeration on the oriented edge list: each triangle once,
  * per-node credit three ways, robust to duplicate/reversed input pairs.
  */
class GraphMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // K4 on {1,2,3,4} (4 triangles) + a pendant 5 + disconnected edge 6-7;
  // pairs deliberately carry duplicates and reversed orientation
  private def pairs = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (3L, 2L),            // reversed duplicate
    (1L, 2L),            // exact duplicate
    (4L, 5L), (6L, 7L))
    .toDF("doc_a", "doc_b")

  test("triangles: K4 yields its four, each exactly once, sorted") {
    val t = GraphMetrics.triangles(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("per-node participation: K4 members get 3 each; pendant and island get none") {
    val n = GraphMetrics.trianglesPerNode(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degree orientation enumerates the same triangles, star-heavy graph included") {
    // a star (anchor 1 with orbiters 10..29, no triangles except via
    // extra edges) + K4 + a triangle chained off the star
    val star = (10L to 29L).map(i => (1L, i))
    val k4 = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (101L, 102L), (101L, 103L), (102L, 103L))
    val chained = Seq((10L, 11L), (200L, 10L), (200L, 11L))
    val g = (star ++ k4 ++ chained).toDF("doc_a", "doc_b")
    val byId = GraphMetrics.triangles(g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byDeg = GraphMetrics.trianglesByDegree(g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byDeg == byId, s"degree orientation changed the triangle set")
    assert(byId.contains((1L, 10L, 11L)) && byId.contains((10L, 11L, 200L)))
    assert(byId.count { case (x, _, _) => x == 100L } +
      byId.count { case (_, y, _) => y == 101L } >= 4) // K4 present
  }

  test("degrees ignore duplicates and orientation") {
    val d = GraphMetrics.degrees(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
  }

  test("a metric result stays consumable after registry rotation within the bound") {
    // a lazily-held result must survive the next few metric calls
    // without recomputation (its entry is still registered). Hold a
    // triangle frame across two later invocations (<= 4 new frames)
    // and consume it last.
    GraphMetrics.releaseCaches()
    val held = GraphMetrics.trianglesPerNode(pairs, byDegree = true)
    (1 to 2).foreach { k =>
      GraphMetrics.degrees(
        Seq((10L * k, 20L * k), (20L * k, 30L * k)).toDF("doc_a", "doc_b")).count()
    }
    val n = held.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    GraphMetrics.releaseCaches()
  }

  test("eviction is recompute-safe: first frame consumed LAST, past full rotation") {
    // Rotate the FIRST call's frames all the way out of the registry
    // (8 slots; each distinct trianglesByDegree materializes 2 frames,
    // so 6 later distinct-graph calls guarantee eviction), then consume
    // the first result. Pre-fix this failed at action time
    // ("checkpoint block not found" — released localCheckpoints cannot
    // recompute); now the backing RDD re-executes its compiled DAG.
    GraphMetrics.releaseCaches()
    val first = GraphMetrics.trianglesPerNode(pairs, byDegree = true)
    (1 to 6).foreach { k =>
      val g = Seq((1000L + 10 * k, 1001L + 10 * k),
        (1001L + 10 * k, 1002L + 10 * k), (1000L + 10 * k, 1002L + 10 * k))
        .toDF("doc_a", "doc_b")
      GraphMetrics.trianglesByDegree(g).count()
    }
    val n = first.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    GraphMetrics.releaseCaches()
  }

  test("consuming a frame after releaseCaches recomputes instead of failing") {
    GraphMetrics.releaseCaches()
    val held = GraphMetrics.degrees(pairs)
    GraphMetrics.releaseCaches() // storage gone before first action
    val d = held.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(4L) == 4L && d(5L) == 1L)
  }

  test("a memo hit refreshes queue position: re-used edge list outlives later inserts") {
    // insert A, then 3 distinct graphs (6 frames — A next to rotate),
    // then TOUCH A via a second metric call (memo hit must move it to
    // the queue tail), then 2 more inserts. With the refresh, the
    // evictees are the 2 oldest post-A frames and A's storage stays
    // live; counting headroom from ORIGINAL insertion (the pre-fix
    // bug) would have evicted A here.
    GraphMetrics.releaseCaches()
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.keySet
    GraphMetrics.degrees(pairs).count() // A's edge list materialized
    val aIds = sc.getPersistentRDDs.keySet -- base
    assert(aIds.size == 1)
    (1 to 3).foreach { k =>
      GraphMetrics.trianglesByDegree(
        Seq((2000L + 10 * k, 2001L + 10 * k), (2001L + 10 * k, 2002L + 10 * k),
          (2000L + 10 * k, 2002L + 10 * k)).toDF("doc_a", "doc_b")).count()
    }
    val touched = GraphMetrics.trianglesPerNode(pairs, byDegree = true) // memo hit on A
    (4 to 5).foreach { k =>
      GraphMetrics.degrees(
        Seq((2000L + 10 * k, 2001L + 10 * k)).toDF("doc_a", "doc_b")).count()
    }
    assert(aIds.subsetOf(sc.getPersistentRDDs.keySet),
      "memo hit must refresh A's rotation headroom — A was evicted by the later inserts")
    val n = touched.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    GraphMetrics.releaseCaches()
  }

  test("repeated calls don't accumulate checkpoint storage; releaseCaches drains") {
    GraphMetrics.releaseCaches()
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.size
    val base = persisted
    // 10 invocations, each checkpointing 1-2 frames — the rotating
    // registry must bound live blocks regardless of call count
    (1 to 10).foreach { _ =>
      GraphMetrics.trianglesByDegree(pairs).count()
      GraphMetrics.degrees(pairs).count()
    }
    assert(persisted - base <= 8,
      s"checkpointed frames must stay bounded, got ${persisted - base} new persistent RDDs")
    GraphMetrics.releaseCaches()
    assert(persisted <= base, "releaseCaches must drain every tracked frame")
  }

  test("reachWithin: BFS hop distances, minimal over multiple paths, hop cap") {
    // chain 1-2-3-4-5 plus shortcut 1-3; island 8-9. From seed {1} at
    // maxHops 3: 1@0, 2@1, 3@1 (shortcut beats the 2-hop chain), 4@2,
    // 5@3; island unreached. Reversed/duplicate pairs must not matter.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (3L, 1L), (8L, 9L)).toDF("doc_a", "doc_b")
    val seeds = Seq(1L).toDF("doc_id")
    val got = GraphMetrics.reachWithin(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    // hop cap binds: at maxHops 2 node 5 drops
    val capped = GraphMetrics.reachWithin(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // multiple seeds: distances are min over the seed set
    val two = GraphMetrics.reachWithin(edges,
        Seq(1L, 5L).toDF("doc_id"), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
