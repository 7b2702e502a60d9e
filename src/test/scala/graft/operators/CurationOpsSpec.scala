package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 curation operators: containment dedup, boilerplate filter,
  * temperature resampling, int8 rerank ANN.
  */
class CurationOpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // ---- percentile quality filter ----

  test("qualityPercentileFilter: exact cutoff, ties kept, keepFrac=1 keeps all") {
    // doc i: i stopwords + one junk token -> score_q = i*1e6 div (i+1),
    // strictly increasing in i; doc 108 ties doc 8 exactly
    val docs = ((1 to 10).map(i => (i.toLong, ("the " * i) + "zz")) :+
      (108L, ("the " * 8) + "zz")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityPercentileFilter(docs, keepFrac = 0.3)
      .collect().map(r => r.getLong(0)).toSet
    // ceil(11*0.3)=4: top scores are docs 10, 9, then the 8/108 tie —
    // both tie members kept
    assert(out == Set(10L, 9L, 8L, 108L), s"got $out")
    val all = TextAnalysis.qualityPercentileFilter(docs, keepFrac = 1.0)
      .collect().map(r => r.getLong(0)).toSet
    assert(all.size == 11, s"keepFrac=1 must keep everything: $all")
    // zero-token docs are excluded, not scored
    val withEmpty = docs.unionAll(Seq((99L, "   ")).toDF("doc_id", "text"))
    val all2 = TextAnalysis.qualityPercentileFilter(withEmpty, keepFrac = 1.0)
      .collect().map(r => r.getLong(0)).toSet
    assert(!all2.contains(99L) && all2.size == 11)
  }

  test("tokenBudgetSelect: fills the budget best-first; short corpus kept whole") {
    // doc i: i stopwords + "zz" -> i+1 tokens, score strictly increasing
    val docs = (1 to 10).map(i => (i.toLong, ("the " * i) + "zz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenBudgetSelect(docs, budgetTokens = 15L)
      .collect().map(r => r.getLong(0)).toSet
    // best-first: doc 10 (11 tokens), then doc 9 crosses 15 at cum 21
    assert(out == Set(10L, 9L), s"got $out")
    val all = TextAnalysis.tokenBudgetSelect(docs, budgetTokens = 1000000L)
      .collect().map(r => r.getLong(0)).toSet
    assert(all.size == 10, s"under-budget corpus must survive whole: $all")
  }

  test("lengthStats: exact percentiles and scalars off the histogram") {
    val docs = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthStats(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map(
      "n_docs" -> 10.0, "tok_total" -> 55.0, "mean" -> 5.5,
      "min" -> 1.0, "max" -> 10.0,
      "p50" -> 5.0, "p90" -> 9.0, "p99" -> 10.0), s"got $out")
  }

  test("rebalanceMixture: quotas hit, short groups kept whole, absent dropped, monotone") {
    val docs = ((1 to 60).map(i => (i.toLong, "a")) ++
      (61 to 70).map(i => (i.toLong, "b")) ++
      (71 to 80).map(i => (i.toLong, "c"))).toDF("doc_id", "g")
    val out = TextAnalysis.rebalanceMixture(docs, col("g"),
        Seq("a" -> 500000L, "b" -> 500000L), totalOut = 40L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val byG = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byG == Map("a" -> 20, "b" -> 10), s"got $byG") // b capped by supply
    assert(!out.exists(_._2 == "c"), "group with no share must drop")
    // monotone: halving the target keeps a subset of the larger run
    val small = TextAnalysis.rebalanceMixture(docs, col("g"),
        Seq("a" -> 500000L, "b" -> 500000L), totalOut = 20L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(small.subsetOf(out), "selection must be monotone in the quota")
  }

  test("chunkDocs: windows cover the doc, overlap honored, last chunk short") {
    val docs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, chunkTokens = 8, overlap = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // stride 5: starts 0,5,10,15 -> sizes 8,8,8,5
    assert(out.map(c => (c._1, c._2)).toSeq ==
      Seq((0L, 8L), (1L, 8L), (2L, 8L), (3L, 5L)), s"got ${out.toSeq}")
    val h0 = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 8).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.head._3 == h0, "chunk 0 hash must cover tokens 1..8")
    // empty docs chunk to nothing
    assert(TextAnalysis.chunkDocs(Seq((2L, "  ")).toDF("doc_id", "text"))
      .count() == 0)
  }

  test("chunkDocs: zero exchanges — the operator is map-side by contract") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextAnalysis.chunkDocs(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n${plan.take(800)}")
  }

  test("thresholdSweep: survivor counts and ppm rates; unreachable tau absent") {
    val docs = (1 to 10).map(i => (i.toLong, ("the " * i) + "zz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.thresholdSweep(docs, Seq(800000L, 950000L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // score_i = i*1e6 div (i+1); tau 800000 keeps docs 4..10:
    // 7 docs, 56 of 65 tokens
    assert(out == Map(800000L -> ((7L, 56L, 700000L, 861538L))), s"got $out")
    assert(!out.contains(950000L), "tau above every score must be absent")
  }

  // ---- containment ----

  private val longText = (1 to 40).map(i => s"w$i").mkString(" ")
  private val snippet = (1 to 12).map(i => s"w$i").mkString(" ") // prefix of longText
  private val contDocs = Seq(
    (1L, longText),
    (2L, snippet),
    (3L, "totally unrelated words about spark shuffles and parquet footers"),
    (4L, longText) // exact copy of 1
  ).toDF("doc_id", "text")

  test("containment finds snippet-in-document pairs Jaccard misses") {
    val pairs = Dedup.wordGramContainment(contDocs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"snippet pair missing from $keys")
    assert(keys.contains((1L, 4L)), "exact-copy pair missing")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "false positive on unrelated doc")
    val snippetOverlap = pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3
    assert(snippetOverlap == 1.0, s"prefix snippet overlap should be 1.0, was $snippetOverlap")
    // the motivating property: the Jaccard path does NOT surface the
    // snippet pair at any useful threshold (10 shared grams / 38 union)
    val jac = Dedup.wordGramNearDupsPoly(contDocs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)), "Jaccard at 0.5 should miss the snippet pair")
  }

  test("autoBucketCap: budget-monotone ladder over a known census") {
    // synthetic census: one bucket of 40, ten of 4, 100 singletons
    // (180 band rows; bandsPerDoc=8 -> nDocs = 22)
    // vol(8)=vol(16)=vol(32)=99 (the 40-bucket anchors: 39; tens: 10*6)
    // vol(64)=vol(128)=vol(256)=840 (40-bucket enumerates: 780)
    import org.apache.spark.sql.functions.{col, lit}
    val rows =
      (1 to 40).map(i => (0, "A", i.toLong)) ++
      (for (b <- 1 to 10; i <- 1 to 4) yield (1, s"B$b", (100 * b + i).toLong)) ++
      (1 to 100).map(i => (2, s"S$i", (10000 + i).toLong))
    val bands = rows.toDF("band_id", "band", "doc_id")
    def capAt(perDoc: Int) =
      Dedup.autoBucketCap(bands, Seq("band_id", "band"), perDoc)
    // nDocs = 180/8 = 22; budgets 4*22=88 < 99 -> floor rung;
    // 5*22=110 covers vol 99 but not 840 -> 32; 40*22=880 >= 840 -> 256
    assert(capAt(4) == 8, "under-budget must land on the floor rung")
    assert(capAt(5) == 32)
    assert(capAt(40) == 256)
    // monotone: larger budget never derives a smaller cap
    val caps = (1 to 50).map(capAt)
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b },
      s"cap must be nondecreasing in budget, got $caps")
  }

  test("capFromHistogram: empty census lands on the ladder floor, " +
    "mirroring the oracle's coalesce(max(c), 8) fallback (r14 ADVICE)") {
    assert(Dedup.capFromHistogram(Nil, perDocBudget = 64) ==
      Dedup.BucketCapLadder.min)
    // and through the DataFrame census path too (empty bands frame)
    val bands = Seq.empty[(Int, String, Long)].toDF("band_id", "band", "doc_id")
    assert(Dedup.autoBucketCap(bands, Seq("band_id", "band"), 64) ==
      Dedup.BucketCapLadder.min)
    // the DataFrame census and the pure-histogram core agree on a
    // non-trivial census (one 40-bucket, bandsPerDoc 8)
    val rows = (1 to 40).map(i => (0, "A", i.toLong))
    assert(Dedup.autoBucketCap(rows.toDF("band_id", "band", "doc_id"),
      Seq("band_id", "band"), 5) ==
      Dedup.capFromHistogram(Seq((40L, 1L)), 5))
  }

  test("maxBucket and the live budget default are mutually exclusive " +
    "(r14 ADVICE): an explicit cap that would be silently ignored throws") {
    val e = intercept[IllegalArgumentException] {
      Dedup.lshNearDups(Dedup.shingles(contDocs), threshold = 0.5,
        maxBucket = 100).collect()
    }
    assert(e.getMessage.contains("candidateBudgetPerDoc = None"))
    // the escape hatch still works
    Dedup.lshNearDups(Dedup.shingles(contDocs), threshold = 0.5,
      maxBucket = 100, candidateBudgetPerDoc = None).collect()
  }

  test("budgeted containment matches the fixed-cap result it derives") {
    val auto = Dedup.wordGramContainment(contDocs, threshold = 0.9,
        candidateBudgetPerDoc = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fixed = Dedup.wordGramContainment(contDocs, threshold = 0.9,
        candidateBudgetPerDoc = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // tiny corpus: every bucket is under every rung, so the budgeted
    // path must reproduce the fixed-cap output exactly
    assert(auto == fixed, s"auto=$auto fixed=$fixed")
  }

  test("budget is the DEFAULT: bare calls == fixed-cap output under-cap, " +
    "every banded family") {
    // r13 policy pin: the no-argument form of every banded pipeline
    // derives its cap from the census (DefaultCandidateBudget), and on
    // an under-cap corpus that must reproduce the fixed-256 escape
    // hatch (candidateBudgetPerDoc = None) exactly.
    assert(Dedup.DefaultCandidateBudget == Some(64))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.wordGramNearDups(contDocs, 0.3)) ==
      pairs(Dedup.wordGramNearDups(contDocs, 0.3, candidateBudgetPerDoc = None)))
    assert(pairs(Dedup.wordGramNearDupsPoly(contDocs, 0.3)) ==
      pairs(Dedup.wordGramNearDupsPoly(contDocs, 0.3, candidateBudgetPerDoc = None)))
    assert(pairs(Dedup.charGramNearDups(contDocs, 0.5)) ==
      pairs(Dedup.charGramNearDups(contDocs, 0.5, candidateBudgetPerDoc = None)))
    assert(pairs(Dedup.wordGramContainment(contDocs, 0.9)) ==
      pairs(Dedup.wordGramContainment(contDocs, 0.9, candidateBudgetPerDoc = None)))
    assert(pairs(Dedup.minhashNearDups(contDocs, 0.3)) ==
      pairs(Dedup.lshNearDups(Dedup.shingles(contDocs), 0.3,
        candidateBudgetPerDoc = None)))
    assert(pairs(Dedup.simhashNearDups(contDocs)) ==
      pairs(Dedup.simhashNearDups(contDocs, candidateBudgetPerDoc = None)))
  }

  // ---- boilerplate ----

  test("boilerplate filter drops js/cookie/brace docs, keeps prose") {
    val docs = Seq(
      (1L, "this is a perfectly normal sentence with plenty of words per line."),
      (2L, "please enable javascript to continue\nnormal words here after that"),
      (3L, "{ \"config\": true }\nsome other content follows the json blob"),
      (4L, "one\ntwo\nthree\nfour"), // 1 word/line
      (5L, "first line ends properly.\nsecond line also ends with a mark!")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateFilter(docs)
      .select("doc_id", "keep", "frac_punct_lines", "n_lines")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(1L)._1, "plain prose must survive")
    assert(!out(2L)._1, "javascript phrase must drop")
    assert(!out(3L)._1, "brace doc must drop")
    assert(!out(4L)._1, "1-word lines must drop on mean words per line")
    assert(out(5L)._1 && out(5L)._2 == 1.0, "punctuated prose survives with frac 1.0")
    assert(out(2L)._3 == 2L, "line count")
  }

  // ---- temperature resampling ----

  test("temperature resample flattens a skewed mixture toward sqrt weights") {
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "domain")
    val out = TextAnalysis.temperatureResample(docs, col("domain"), targetFrac = 0.5)
    val rates = out.select("domain", "rate_bp").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights: s_big/s_small = 3 while n_big/n_small = 9 ⇒ the big
    // domain's PER-DOC rate is 3× lower
    assert(rates("big") < rates("small"),
      s"head domain must downsample harder: $rates")
    assert(rates("small") <= 10000L && rates("big") > 0L)
    // exact md5 gate ⇒ deterministic: same rows both runs
    val again = TextAnalysis.temperatureResample(docs, col("domain"), targetFrac = 0.5)
    assert(out.collect().toSet == again.collect().toSet, "resample must be deterministic")
    // overall volume lands near targetFrac (md5 buckets are uniform-ish)
    val n = out.count()
    assert(n > 300 && n < 700, s"kept $n of 1000 at targetFrac 0.5")
  }

  // ---- int8 rerank ANN ----

  test("int8 rerank: exact duplicate ranks first; top-k agrees with brute force") {
    // deterministic pseudo-random vectors; vec 100 duplicates vec 0 (a query)
    def vec(seed: Long): Seq[Float] =
      (0 until 16).map(i => (((seed * 2654435761L + i * 40503L) % 1000).toFloat - 500f) / 500f)
    val emb = ((0L until 100L).map(i => (i, vec(i))) :+ (100L, vec(0L)))
      .toDF("vec_id", "embedding")
    val pred = col("vec_id") === 0L
    val rerank = Similarity.int8RerankTopK(emb, pred, k = 5, overscan = 4)
      .orderBy("rnk").collect()
    assert(rerank.length == 5, "k rows per query")
    assert(rerank.head.getAs[Long]("hit_id") == 100L, "exact duplicate must rank 1")
    assert(rerank.head.getAs[Double]("cosine") > 0.999999)
    // int8 coarse pass + full rerank should agree with brute force on
    // well-separated data (overscan absorbs quantization reordering)
    val brute = Similarity.bruteForceTopK(emb, pred, k = 5)
      .orderBy("rnk").collect().map(_.getAs[Long]("hit_id")).toSeq
    val got = rerank.map(_.getAs[Long]("hit_id")).toSeq
    assert(got == brute, s"rerank $got != brute $brute")
  }

  // ---- BPE pair counts ----

  test("bpePairCounts: corpus-weighted adjacent char pairs, vocab-side explode") {
    // "ab ab cd" + "ab xx" -> freqs: ab=3, cd=1, xx=1
    // pairs: ab->3, cd->1, xx->1
    val docs = Seq((1L, "ab ab cd"), (2L, "ab, XX")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L, "cd" -> 1L, "xx" -> 1L), s"got $got")
    // overlapping pairs inside one word, weighted by word frequency
    val docs2 = Seq((1L, "aaa aaa bc")).toDF("doc_id", "text")
    val got2 = TextAnalysis.bpePairCounts(docs2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("aa" -> 4L, "bc" -> 1L), s"got $got2")
    // k truncates by (count desc, pair asc)
    val top1 = TextAnalysis.bpePairCounts(docs, k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("ab"))
  }
}
