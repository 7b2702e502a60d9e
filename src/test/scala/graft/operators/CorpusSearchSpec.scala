package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 search, bigram-LM scoring, deterministic sharding, and
  * incremental near-dup — the round-5 corpus-service operators.
  */
class CorpusSearchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // ---- BM25 ----

  private lazy val searchDocs = Seq(
    (1L, "merge merge merge sort sort table"),      // heavy on 'merge'
    (2L, "merge sort table scan filter project"),   // one hit
    (3L, "scan filter project join group order"),   // no hits
    (4L, "window window merge stream stream stream")// 3 distinct terms
  ).toDF("doc_id", "text")

  test("bm25: multi-term docs outrank single-term docs; non-hits absent") {
    val out = TextAnalysis.bm25Search(searchDocs, Seq("merge", "window", "stream"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q"))
    val ranked = out.map(_._1)
    assert(!ranked.contains(3L), "doc with no query terms must not appear")
    assert(ranked.head == 4L, s"doc 4 hits all three terms, got order $ranked")
    // every score positive, ordering matches score desc
    val scores = out.map(_._2)
    assert(scores.forall(_ > 0))
    assert(scores.sorted(Ordering[Long].reverse).sameElements(scores))
  }

  test("bm25: tf saturation — 3x the tf is far less than 3x the score") {
    val docs = Seq(
      (1L, Seq.fill(9)("merge").mkString(" ") + " a b c"),
      (2L, "merge a b c d e f g h i j k")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, Seq("merge"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    assert(out(1L) > out(2L), "more tf must score higher")
    assert(out(1L) < 3 * out(2L), s"k1 saturation must damp tf: $out")
  }

  // ---- bigram LM ----

  test("bigram LM: anomalous word sequences score higher than corpus-typical ones") {
    // 20 docs share the same fluent phrasing; one doc scrambles rare words
    val fluent = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val weird = Seq((99L, "dog the over quick lazy brown jumps fox the"))
    val out = TextAnalysis.bigramLmScore((fluent ++ weird).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_score")).toMap
    assert(out(99L) > out(1L),
      s"scrambled doc must be more surprising: ${out(99L)} vs ${out(1L)}")
    // all fluent copies share one score (identical bigram profile)
    assert((2 to 20).forall(i => out(i.toLong) == out(1L)))
  }

  // ---- corpus shard ----

  test("corpusShard: partitions the corpus; positions contiguous per shard; repartition-stable") {
    val ids = (1L to 500L).toDF("doc_id")
    val out = TextAnalysis.corpusShard(ids, nShards = 8).cache()
    assert(out.count() == 500)
    assert(out.select("doc_id").distinct().count() == 500)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .collect()
    assert(perShard.length == 8)
    perShard.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("n"),
        s"positions must be 1..n within shard: $r")
    }
    val again = TextAnalysis.corpusShard(ids.repartition(13), nShards = 8)
    assert(again.except(out).isEmpty && out.except(again).isEmpty,
      "shard assignment must be independent of input partitioning")
    out.unpersist()
  }

  // ---- training-shard export ----

  test("exportTrainingShards: dirs per shard, positions replay the permutation, " +
    "packing offsets consistent, rewrite deterministic") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tshards").toString
    TextAnalysis.exportTrainingShards(docs, dir, nShards = 8, capacity = 256)

    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // shard dirs exist and positions are 1..n within each
    val shards = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .collect()
    assert(shards.length == 8)
    shards.foreach(r => assert(r.getAs[Long]("mn") == 1L &&
      r.getAs[Long]("mx") == r.getAs[Long]("n")))
    // offsets replay the running token sum in pos order
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bad = back
      .withColumn("tb", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("bin") =!= expr("tb div 256") ||
        col("offset_in_bin") =!= pmod(col("tb"), lit(256L)))
      .count()
    assert(bad == 0, s"$bad rows with inconsistent packing offsets")
    // shard/pos assignment matches corpusShard's permutation contract
    val fromOp = TextAnalysis.corpusShard(docs.select("doc_id"), nShards = 8)
    assert(back.select("doc_id", "shard", "pos")
      .except(fromOp).isEmpty, "export must replay corpusShard's permutation")
    // rewriting yields identical content
    val dir2 = java.nio.file.Files.createTempDirectory("tshards2").toString
    TextAnalysis.exportTrainingShards(docs, dir2, nShards = 8, capacity = 256)
    assert(spark.read.parquet(dir2).except(back).isEmpty &&
      back.except(spark.read.parquet(dir2)).isEmpty)
  }

  // ---- semantic dedup ----

  test("semanticDedup: exact copies flagged, originals and singletons kept") {
    // three well-separated directions in 4-d; copies share the direction
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.9f, 0.4f, 0f, 0f)), // cos(1,2) ≈ 0.914
      (10L, Seq(0f, 1f, 0f, 0f)), (11L, Seq(0f, 1f, 0f, 0f)),   // 11 dups 10
      (20L, Seq(0f, 0f, 1f, 0f)),
      (21L, Seq(1f, 0f, 0f, 0f))                                 // 21 dups 1
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.semanticDedup(vecs, col("vec_id").isin(1L, 10L, 20L),
        threshold = 0.99, lloydIters = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> false, 10L -> false, 11L -> true,
      20L -> false, 21L -> true), s"got $out")
  }

  // ---- keep decisions ----

  test("keepCanonical: longest text survives, ties break low, canonical propagates") {
    val docs = Seq(
      (1L, "short"), (2L, "much longer text here"), (3L, "same len"),
      (4L, "same len"), (5L, "solo doc")
    ).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.keepCanonical(docs, labels)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), r.getLong(4))).toMap
    assert(out == Map(
      1L -> (false, 2L), 2L -> (true, 2L),   // longest wins
      3L -> (true, 3L), 4L -> (false, 3L),   // tie -> lowest id
      5L -> (true, 5L)), s"got $out")        // singleton keeps itself
  }

  test("crossSetMatches: exact copy found, unrelated vector not, no corpus-corpus pairs") {
    val bench = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val corpus = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),    // exact copy of bench 1
      (11L, Seq(0.95f, 0.3f, 0f, 0f)), // near copy of bench 1
      (12L, Seq(0f, 0f, 0f, 1f)),    // orthogonal to both
      (13L, Seq(1f, 0f, 0f, 0f))     // second copy of bench 1 (corpus dup)
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.crossSetMatches(corpus, bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 10L)) && out.contains((1L, 13L)),
      s"exact copies must match: $out")
    assert(!out.exists(_._2 == 12L), "orthogonal corpus vector must not match")
    assert(out.forall(p => p._1 <= 2L && p._2 >= 10L),
      s"only bench→corpus pairs allowed: $out")
  }

  test("embeddingStore: stored path == fresh path through a parquet round trip") {
    val bench = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val corpus = Seq(
      (10L, Seq(0.97f, 0.21f, 0f, 0f)), (11L, Seq(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("embstore").toString
    Similarity.embeddingStore(corpus).write.mode("overwrite").parquet(dir)
    val stored = Similarity.crossSetMatchesStored(
        spark.read.parquet(dir), bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fresh = Similarity.crossSetMatches(corpus, bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored == fresh && stored.nonEmpty, s"stored=$stored fresh=$fresh")
  }

  // ---- two-level codebook ----

  test("two-level assignment with exhaustive coarse probing == flat argmax") {
    val vecs = (0 until 24).map { i =>
      val r = new scala.util.Random(i * 7 + 1)
      (i.toLong, Seq.fill(4)(r.nextFloat() * 2f - 1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val fineIds = vecs.map(_._1).filter(_ % 6 == 1)   // 1, 7, 13, 19
    val out = Similarity.assignTwoLevel(df,
        col("vec_id") % 6 === 1, col("vec_id") % 12 === 5, nprobeCoarse = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent flat argmax in the exact quantized domain
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }.toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble) /
        math.sqrt(b.map(x => x * x).sum.toDouble)
    }
    val expected = vecs.map { case (id, _) =>
      id -> fineIds.map(c => (c, cos(q(id), q(c))))
        .sortBy { case (c, s) => (-s, c) }.head._1
    }.toMap
    assert(out == expected, s"got $out expected $expected")
  }

  test("semanticDedupTwoLevel: exhaustive coarse probing == flat seed-codebook SemDeDup") {
    val vecs = (0 until 24).map { i =>
      val r = new scala.util.Random(i * 7 + 1)
      (i.toLong, Seq.fill(4)(r.nextFloat() * 2f - 1f))
    } ++ Seq((100L, {  // exact copy of vec 1 so the dup flag has a positive
      val r = new scala.util.Random(1 * 7 + 1)
      Seq.fill(4)(r.nextFloat() * 2f - 1f)
    }))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // 2 coarse cents, nprobeCoarse=2 ⇒ exhaustive ⇒ assignment == flat
    val twoLevel = Similarity.semanticDedupTwoLevel(df,
        col("vec_id") % 6 === 1, col("vec_id") % 12 === 5,
        nprobeCoarse = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val flat = Similarity.semanticDedup(df, col("vec_id") % 6 === 1,
        threshold = 0.99, lloydIters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(twoLevel == flat, s"two-level=$twoLevel flat=$flat")
    assert(twoLevel.exists(_._3), "expected at least one dup flag")
    assert(twoLevel.count(!_._3) >= 24, "originals must be kept")
  }

  test("semanticDedupTwoLevelStored: stored == fresh through a parquet round trip") {
    val vecs = (0 until 24).map { i =>
      val r = new scala.util.Random(i * 7 + 1)
      (i.toLong, Seq.fill(4)(r.nextFloat() * 2f - 1f))
    } ++ Seq((100L, {
      val r = new scala.util.Random(1 * 7 + 1)
      Seq.fill(4)(r.nextFloat() * 2f - 1f)
    }))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("semstore").toString
    Similarity.embeddingStore(df).write.mode("overwrite").parquet(dir)
    val stored = Similarity.semanticDedupTwoLevelStored(spark.read.parquet(dir),
        col("vec_id") % 6 === 1, col("vec_id") % 12 === 5,
        nprobeCoarse = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val fresh = Similarity.semanticDedupTwoLevel(df,
        col("vec_id") % 6 === 1, col("vec_id") % 12 === 5,
        nprobeCoarse = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(stored == fresh && stored.exists(_._3), s"stored=$stored fresh=$fresh")
  }

  // ---- incremental near-dup ----

  test("incremental == full near-dup pairs restricted to batch-touching pairs") {
    def words(seed: Int) =
      (0 until 30).map(k => s"w${(seed * 31 + k * 7) % 97}").mkString(" ")
    val existing = (1 to 30).map(i => (i.toLong, words(i))).toDF("doc_id", "text")
    // batch: near-copies of existing docs + one fresh doc + an in-batch dup pair
    val incoming = Seq(
      (101L, words(3) + " extra tail"),
      (102L, words(7)),
      (103L, "completely novel content never seen before in this corpus at all"),
      (104L, words(50)), (105L, words(50) + " x")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDups(existing, incoming, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = Dedup.wordGramNearDupsPoly(existing.unionAll(incoming), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = fullPairs.filter { case (a, b) => a > 100L || b > 100L }
    assert(inc == expected, s"inc=$inc expected=$expected")
    assert(inc.contains((3L, 101L)) && inc.contains((7L, 102L)), "cross-corpus dups missing")
    assert(inc.contains((104L, 105L)), "in-batch dup missing")
    assert(!inc.exists { case (a, b) => a <= 100L && b <= 100L },
      "existing-existing pairs must not be re-emitted")
  }

  test("persisted signature store: stored path == recomputed path through parquet") {
    def words(seed: Int) =
      (0 until 30).map(k => s"w${(seed * 31 + k * 7) % 97}").mkString(" ")
    val existing = (1 to 30).map(i => (i.toLong, words(i))).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, words(3) + " extra tail"), (102L, words(7)),
      (104L, words(50)), (105L, words(50) + " x")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.signatureStore(existing).write.mode("overwrite").parquet(dir)
    val stored = Dedup.incrementalNearDupsStored(
        spark.read.parquet(dir), existing, incoming, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = Dedup.incrementalNearDups(existing, incoming, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored == recomputed && stored.nonEmpty, s"stored=$stored")
  }
}
