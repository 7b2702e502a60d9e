package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Every operator here is built from codegen'd Spark built-ins (no UDFs)
  * and keeps its arithmetic in exactly-portable domains — md5 over UTF-8
  * bytes for hashing, BIGINT for counting, single-division doubles — so
  * results hash-match a DuckDB oracle bit for bit.
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the text digest (map-side
  *    partial aggregation applies);
  *  - MinHash/LSH hashes each shingle occurrence once to a 64-bit md5
  *    prefix (dedup + signature + verify all run on the short hash, so
  *    the long shingle strings never cross a shuffle) and joins
  *    candidates on signature bands — the shingle → hash → signature →
  *    band → bucket join pipeline, linear in corpus size, never
  *    all-pairs;
  *  - SimHash blocks on signature bands, so the quadratic verify only
  *    runs inside buckets;
  *  - band/sketch buckets are CAPPED: buckets past `maxBucket` divert to
  *    anchor pairs (member ↔ bucket-min doc), so a degenerate corpus of
  *    N identical documents costs O(N), not O(N²);
  *  - verification joins are restricted to LSH candidates.
  *
  * CACHING CONTRACT: the LSH operators `cache()` small intermediate
  * frames (signatures, bucket sizes) because the returned plan references
  * them from several branches — self-joined derived frames otherwise
  * re-execute per branch. The blocks live until the caller runs
  * `spark.catalog.clearCache()` (or closes the session); long-lived
  * services should do so after consuming each result.
  * [[clusterLabels]]/[[clusterLabelsDoubling]] additionally
  * `localCheckpoint()` per-round label generations — those blocks are NOT
  * reclaimed by `clearCache()` and persist until session close. A
  * long-lived service reclaims them with [[withPersistCleanup]]: run the
  * clustering inside, CONSUME the result, then call the returned handle.
  */
object Dedup {

  /** Run `body` and return its result plus a cleanup handle that
    * unpersists every RDD `body` left persisted in the session — caches
    * AND local checkpoints, the latter being exactly the residue
    * `spark.catalog.clearCache()` cannot reach.
    *
    * Call `cleanup()` only AFTER consuming the result (collected it,
    * written it out): `localCheckpoint` truncates lineage, so an
    * unpersisted checkpoint cannot be recomputed and later actions on
    * the result will fail. Tracking is a persistent-RDD snapshot diff on
    * the SparkContext, so the session must not persist anything else
    * CONCURRENTLY with `body` (a parallel job's new blocks would be
    * swept too) — the single-pipeline-at-a-time scope a service embeds
    * the clustering in anyway.
    */
  def withPersistCleanup[A](spark: org.apache.spark.sql.SparkSession)
                           (body: => A): (A, () => Unit) = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val result = body
    val cleanup = () => sc.getPersistentRDDs
      .foreach { case (id, rdd) => if (!before.contains(id)) rdd.unpersist(blocking = false) }
    (result, cleanup)
  }

  /** Lower-cased whitespace tokens with their original positions. */
  def tokenize(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("i", "w")))
      .filter(col("w") =!= "")

  /** Word n-gram shingles per document (NOT deduplicated — `min` in the
    * signature ignores duplicates, and the verify stage dedups hashes
    * for candidate docs only, so the long strings never cross a
    * shuffle). Indexes into the token array directly
    * (`explode(sequence)` + `element_at`) — shuffle-free, unlike a
    * `lead()` window which would repartition by document.
    */
  def shingles(docs: DataFrame, n: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
    val parts = (0 until n).map(k => element_at(col("toks"), col("i") + k))
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - (n - 1))).as("i"))
      .select(col(idCol),
        parts.reduce((a, b) => concat(a, lit(" "), b)).as("shingle"))
  }

  /** DISTINCT character n-gram shingles per document. Unlike word
    * shingles these ARE deduplicated up front: a doc emits ~9× more char
    * n-gram occurrences than distinct values, so one distinct shuffle of
    * the short (n+8-byte) rows beats hashing and carrying every
    * occurrence downstream — measured both ways. Built with
    * `explode(sequence)` + `substr` — all codegen'd; a `transform(...)`
    * lambda here runs interpreted and is ~2× slower.
    */
  def charShingles(docs: DataFrame, n: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= n) // sequence(1,0) would run backwards
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), length(col("t")) - (n - 1))).as("i"))
      .select(col(idCol), col("t").substr(col("i"), lit(n)).as("shingle"))
      .distinct()

  /** Windowed exact dedup: canonical = lowest id per (partition keys +
    * payload hash) — the per-day/per-shard dedup a training pipeline
    * runs when global dedup is semantically wrong (the same payload
    * reappearing in a later window is a NEW sample) or when bounding the
    * dedup state to one window at a time. One Window exec, shuffling on
    * (keys, hash).
    */
  def exactWithin(df: DataFrame, partCols: Seq[String], payload: Column,
                  idCol: String = "event_id"): DataFrame = {
    val keyed = df.withColumn("payload_hash", md5(payload.cast("binary")))
    val w = Window.partitionBy(partCols.map(col) :+ col("payload_hash"): _*)
    keyed.select(col(idCol) +: partCols.map(col) :+ col("payload_hash") :+
        min(col(idCol)).over(w).as("canonical_id") :+
        count(lit(1)).over(w).as("n_copies"): _*)
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** Exact dedup: canonical = lowest id per md5(text) group. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    val w = Window.partitionBy("text_hash")
    // both window aggs in one select → a single Window exec
    docs.withColumn("text_hash", h)
      .select(col(idCol), col("text_hash"),
        min(col(idCol)).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("n_copies"))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** 64-bit shingle hashes: ONE md5 per shingle occurrence, NOT
    * deduplicated — the signature's `min` ignores duplicates and the
    * verify stage dedups per candidate doc, so no full-corpus shuffle
    * ever carries these rows. The same hash serves as signature basis
    * AND verify join key. A 64-bit collision would merge two shingles,
    * but identically in every engine that computes the same md5 — so
    * results stay deterministic and oracle-checkable.
    */
  def shingleHashes(shinglesDf: DataFrame, idCol: String = "doc_id"): DataFrame =
    shinglesDf.select(col(idCol),
      substring(md5(col("shingle").cast("binary")), 1, 16).as("h"))

  /** 8-family MinHash signature over the 64-bit shingle HASHES: two md5
    * evaluations of the (16-char) hash — not of the raw shingle — each
    * split into four 8-hex chunks → 8 independent 32-bit families. Per-
    * family independence is the recall property that an ordered bottom-k
    * sketch lacks: there, one inserted shingle shifts every sorted slot
    * and breaks band alignment; here a changed shingle only perturbs the
    * families where it happens to be the minimum. `min` ignores
    * duplicates, so the input needs no occurrence-level dedup.
    */
  def minhashSignature(hashes: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val h1 = md5(col("h").cast("binary"))
    val h2 = md5(concat(lit("x:"), col("h")).cast("binary"))
    val mins = (0 until 8).map { j =>
      val src = if (j < 4) h1 else h2
      min(substring(src, 1 + 8 * (j % 4), 8)).as(s"m$j")
    }
    hashes.groupBy(idCol).agg(mins.head, mins.tail: _*)
  }

  /** LSH bands over the signature: `bandSize` families concatenated per
    * band (AND-composition: P ≈ J^bandSize per band, OR across the
    * 8/bandSize bands). `bandSize` is the precision lever — widen it on
    * corpora with high baseline similarity (char n-grams of same-language
    * text), where narrow bands would flood the verify join with
    * near-all-pairs.
    */
  def signatureBands(sig: DataFrame, bandSize: Int = 2,
                     idCol: String = "doc_id"): DataFrame = {
    require(8 % bandSize == 0, "bandSize must divide 8")
    val bandCols = (0 until 8 / bandSize).map { b =>
      concat((b * bandSize until (b + 1) * bandSize).map(j => col(s"m$j")): _*)
    }
    sig.select(col(idCol), posexplode(array(bandCols: _*)).as(Seq("band_id", "band")))
  }

  /** Candidate pairs (a < b) sharing a bucket (the `bucketCols` key),
    * with a per-bucket cap: buckets of ≤ `maxBucket` docs enumerate all
    * pairs; larger buckets — a pathological corpus with thousands of
    * near-identical documents — are diverted to ANCHOR form, pairing
    * every member with the bucket's lowest doc id instead of exploding
    * quadratically (members transitively reach each other through the
    * anchor; the per-pair verify still applies). The cap bounds every
    * bucket's output linearly in its size.
    */
  /** Poly-family LSH band strings over an (id, m0..m7) signature row:
    * `bandSize` adjacent families concatenated with ':'. ONE definition
    * — the incremental path's correctness depends on producing
    * bit-identical band strings to the full-corpus paths, so the
    * builder must never be copy-edited per call site.
    */
  private def polyBandCols(bandSize: Int): Seq[Column] = {
    require(8 % bandSize == 0, "bandSize must divide 8")
    (0 until 8 / bandSize).map { b =>
      concat_ws(":", (b * bandSize until (b + 1) * bandSize)
        .map(j => col(s"m$j").cast("string")): _*)
    }
  }

  def cappedPairs(rows0: DataFrame, bucketCols: Seq[String], maxBucket: Int,
                  idCol: String = "doc_id"): DataFrame = {
    // ONE exchange on the bucket key does all the bucket-local work:
    // a Window computes (size, anchor) per row, the ≤cap branch then
    // groups the SAME partitioning (no second exchange) into sorted id
    // arrays — bounded at maxBucket ids ≈ 2 KB, never corpus-sized —
    // and enumerates each array's (i < j) pairs with two generates,
    // entirely map-side. The former shape (size aggregate + join back +
    // bucket self-join) spent three more exchanges moving the same rows;
    // at bench scale those fixed costs dominated, at cluster scale they
    // are three shuffle barriers that don't need to exist. Cached
    // because the ≤cap and >cap branches both read the windowed frame.
    val keys = bucketCols.map(col)
    val w = Window.partitionBy(keys: _*)
    val rows = rows0
      .select(keys :+ col(idCol) :+ count(lit(1)).over(w).as("bn") :+
        min(col(idCol)).over(w).as("anchor"): _*)
      .cache()
    val smallPairs = rows.filter(col("bn") <= maxBucket)
      .groupBy(keys: _*).agg(sort_array(collect_list(col(idCol))).as("ids"))
      .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
      // slice is 1-based: partners of the element at 0-based i start at i+2
      .select(col("doc_a"),
        explode(slice(col("ids"), col("i") + lit(2), lit(maxBucket))).as("doc_b"))
    val bigPairs = rows
      .filter(col("bn") > maxBucket && col(idCol) > col("anchor"))
      .select(col("anchor").as("doc_a"), col(idCol).as("doc_b"))
    smallPairs.unionAll(bigPairs).distinct()
  }

  /** The cap ladder [[autoBucketCap]] picks from: power-of-two rungs up
    * to the historic 256 default. A fixed ladder (rather than an exact
    * integer search) keeps the derivation trivially mirrorable in an
    * oracle and stable under census noise.
    */
  val BucketCapLadder: Seq[Int] = Seq(8, 16, 32, 64, 128, 256)

  /** Default per-document candidate budget — the POLICY default on
    * every banded near-dup pipeline since r13. r11–r12 measured that a
    * fixed bucket cap is the wrong default on template-dense corpora
    * (candidate volume below the cap is quadratic in bucket occupancy:
    * a 3× corpus grew candidates 6.4×), while the budget-DERIVED cap
    * landed exactly on the hand-measured optimal dial at 5.4× the fixed
    * default's speed. 64 is the dial those measurements validated; on
    * ordinary corpora every bucket sits under every ladder rung and the
    * derived cap reproduces the fixed-256 output bit-for-bit
    * (spec-pinned). Pass `candidateBudgetPerDoc = None` to force a
    * fixed `maxBucket` — the escape hatch for corpora whose dup density
    * is known a priori.
    */
  val DefaultCandidateBudget: Option[Int] = Some(64)

  /** Derive the banding bucket cap from a CANDIDATE BUDGET instead of a
    * hand constant (r11 finding: on template-dense corpora candidate
    * volume below the cap is quadratic in bucket occupancy — a 3×
    * corpus grew candidates 6.4× — and tightening 256→64 cut sf3
    * wall-clock 5.5×; the dial worked but had to be discovered by
    * hand). Chooses the LARGEST ladder rung whose worst-case candidate
    * volume fits `perDocBudget × nDocs`, where a bucket of size b
    * contributes b·(b-1)/2 pairs below the cap and b-1 anchor pairs
    * above it — the exact enumeration [[cappedPairs]] performs.
    *
    * Cost: one aggregation over the bands frame (same key as the
    * pairing shuffle) collapsed to a bucket-size histogram; the collect
    * is one row per DISTINCT bucket size — bounded by the largest
    * bucket, not the corpus. nDocs comes from the census itself
    * (Σ bn·k = bandsPerDoc · nDocs), so no extra corpus action.
    * Monotone: a larger budget can only derive an equal-or-larger cap
    * (spec-pinned).
    */
  def autoBucketCap(bands: DataFrame, bucketCols: Seq[String],
                    perDocBudget: Int, bandsPerDoc: Int = 8,
                    ladder: Seq[Int] = BucketCapLadder): Int = {
    require(perDocBudget > 0 && bandsPerDoc > 0 && ladder.nonEmpty,
      "autoBucketCap needs a positive budget, band count, and a ladder")
    val hist = bands.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("bn"))
      .groupBy("bn").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    capFromHistogram(hist.toIndexedSeq, perDocBudget, bandsPerDoc, ladder)
  }

  /** The pure cap derivation [[autoBucketCap]] runs after its census —
    * exposed so a MAINTAINED bucket-size histogram (the streaming
    * signature-store path, which cannot afford a per-batch full-store
    * census) derives bit-identical caps from the same arithmetic. An
    * EMPTY histogram returns the ladder's smallest rung — the same
    * value the SQL oracle's `coalesce(max(cap), 8)` fallback reads
    * (no data ⇒ no pairs under any cap, so the choice is inert, but
    * the documented derivation-mirror invariant holds for all inputs).
    */
  def capFromHistogram(hist: Seq[(Long, Long)], perDocBudget: Int,
                       bandsPerDoc: Int = 8,
                       ladder: Seq[Int] = BucketCapLadder): Int = {
    require(perDocBudget > 0 && bandsPerDoc > 0 && ladder.nonEmpty,
      "capFromHistogram needs a positive budget, band count, and a ladder")
    val sorted = ladder.sorted
    if (hist.isEmpty) return sorted.head
    val nDocs = hist.map { case (bn, k) => bn * k }.sum / bandsPerDoc
    val budget = perDocBudget.toLong * nDocs
    def vol(c: Int): Long = hist.map { case (bn, k) =>
      (if (bn <= c) bn * (bn - 1) / 2 else bn - 1) * k
    }.sum
    sorted.filter(c => vol(c) <= budget).lastOption.getOrElse(sorted.head)
  }

  /** One (id, bkey) row per band of each signature-store row —
    * `bkey = band_id || '|' || band` flattens the two-column bucket key
    * into the single string key the MAINTAINED census tables are keyed
    * (and bucketed) by. Pure function of the stored 8 BIGINTs, so the
    * CDC consumer derives band deltas from exactly the rows it
    * adds/removes, never from a corpus scan.
    */
  def storeBands(store: DataFrame, bandSize: Int = 2,
                 idCol: String = "doc_id"): DataFrame = {
    require(8 % bandSize == 0, "bandSize must divide 8")
    store.select(col(idCol),
        posexplode(array(polyBandCols(bandSize): _*)).as(Seq("band_id", "band")))
      .select(col(idCol), concat_ws("|", col("band_id"), col("band")).as("bkey"))
  }

  /** Derive the banding bucket cap for an incremental batch from the
    * MAINTAINED census instead of re-aggregating the stored bands:
    * `storeHist` is the store's bucket-size histogram (kept store-side
    * by the CDC consumer), `storeCounts` its per-bucket counts (only
    * the buckets the incoming bands touch are read — the caller may
    * pass a bucket-pruned slice), `incomingBands` the batch's (bkey)
    * rows. The combined (store + incoming) histogram is the maintained
    * one adjusted per incoming-touched bucket (old size leaves, old +
    * incoming enters) — bit-equal to [[autoBucketCap]]'s full recompute
    * over the combined bands (spec-pinned), at batch-sized cost: one
    * batch-side aggregation, one lookup join, a driver merge bounded by
    * distinct (old, new) size pairs.
    */
  def capFromMaintainedCensus(storeHist: Seq[(Long, Long)],
                              storeCounts: DataFrame,
                              incomingBands: DataFrame, perDocBudget: Int,
                              bandsPerDoc: Int = 4,
                              ladder: Seq[Int] = BucketCapLadder): Int = {
    val adj = incomingBands.groupBy("bkey").agg(count(lit(1)).as("ic"))
      .join(storeCounts.select(col("bkey"), col("cnt")), Seq("bkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("oldc"),
        (coalesce(col("cnt"), lit(0L)) + col("ic")).as("newc"))
      .groupBy("oldc", "newc").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hist = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    storeHist.foreach { case (bn, k) => hist(bn) += k }
    adj.foreach { case (oldc, newc, m) =>
      if (oldc > 0) hist(oldc) -= m
      hist(newc) += m
    }
    capFromHistogram(hist.toSeq.filter(_._2 > 0), perDocBudget, bandsPerDoc,
      ladder)
  }

  /** The `maxBucket` value every banded pipeline defaults to — kept as
    * a named constant so [[resolveCap]] can detect when a caller pinned
    * BOTH knobs (an explicit `maxBucket` while the budget default is
    * live would be silently ignored — rejected instead).
    */
  val DefaultMaxBucket: Int = 256

  /** Resolve a banded pipeline's effective bucket cap: the caller's
    * fixed `maxBucket`, or the [[autoBucketCap]]-derived rung when
    * `budgetPerDoc` is set — in which case the bands frame is cached,
    * because the census and the pairing both read it (one signature
    * pass, not two). Shared by every banded near-dup pipeline.
    *
    * The two knobs are MUTUALLY EXCLUSIVE: with the budget default
    * live ([[DefaultCandidateBudget]]) an explicit non-default
    * `maxBucket` would be silently ignored (the cap derives from the
    * census instead), so that combination is rejected — pass
    * `candidateBudgetPerDoc = None` to pin a fixed cap.
    */
  private[operators] def resolveCap(bands: DataFrame, maxBucket: Int,
                                    budgetPerDoc: Option[Int], bandsPerDoc: Int,
                                    bucketCols: Seq[String] = Seq("band_id", "band"))
      : (DataFrame, Int) = budgetPerDoc match {
    case Some(b) =>
      require(maxBucket == DefaultMaxBucket,
        s"maxBucket = $maxBucket would be ignored: the candidate budget ($b/doc) " +
          "derives the cap from the band census; pass candidateBudgetPerDoc = None " +
          "to use a fixed cap")
      val cached = bands.cache()
      (cached, autoBucketCap(cached, bucketCols, b, bandsPerDoc))
    case None => (bands, maxBucket)
  }

  /** Exact Jaccard over hashed shingle sets, evaluated only for
    * candidate pairs.
    */
  def jaccardVerifyHashed(cand: DataFrame, hashes: DataFrame, threshold: Double,
                          idCol: String = "doc_id"): DataFrame = {
    val sizes = hashes.groupBy(idCol).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(hashes.select(col(idCol).as("doc_a"), col("h")), Seq("doc_a"))
      .join(hashes.select(col(idCol).as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    val j = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter")).cast("double")
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → hash → signature →
    * bands → capped candidates → exact-Jaccard verify. Word shingles
    * have near-zero baseline Jaccard, so narrow bands (bandSize 2 →
    * 4 bands: recall ≈ 1-(1-J²)⁴) maximize recall.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.5,
                      shingleSize: Int = 3): DataFrame =
    lshNearDups(shingles(docs, shingleSize), threshold)

  /** Shared LSH tail: hash → signature → bands → capped candidates →
    * exact-Jaccard verify over CANDIDATE DOCS ONLY.
    *
    * The corpus-wide stages are shuffle-light by construction: the
    * signature is a partial-combining aggregation (8 mins/doc cross the
    * exchange, not the hash rows), and the only full hash-set dedup
    * happens AFTER a semi-join down to candidate docs — at scale the
    * candidates are a vanishing fraction of the corpus, so the verify
    * cost tracks the duplicate density, not the corpus size. The raw
    * hash frame is cached for the two passes (signature + verify);
    * at cluster scale prefer recompute-or-checkpoint over a 100 TB
    * cache — both passes are map-only scans. Raise `bandSize`
    * (AND-width) on corpora whose baseline similarity is high.
    */
  def lshNearDups(shinglesDf: DataFrame, threshold: Double,
                  bandSize: Int = 2, maxBucket: Int = 256,
                  candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget)
      : DataFrame = {
    val raw = shingleHashes(shinglesDf).cache()
    val (bands, cap) = resolveCap(signatureBands(minhashSignature(raw), bandSize),
      maxBucket, candidateBudgetPerDoc, 8 / bandSize)
    val cand = cappedPairs(bands, Seq("band_id", "band"), cap).cache()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
    val hashes = raw.join(candDocs, Seq("doc_id"), "left_semi").distinct().cache()
    jaccardVerifyHashed(cand, hashes, threshold)
  }

  /** Char-n-gram near-dup pipeline on the NATIVE gram-hash expressions
    * ([[graft.functions.QCharGrams]]): the 8-family MinHash signature is
    * ONE scalar map over the corpus — no per-gram explode, no distinct
    * shuffle, no md5 — and the per-document gram SETS the Jaccard verify
    * needs are computed only for candidate docs after the semi-join.
    * Replaces the composed [[charShingles]]+[[lshNearDups]] form, whose
    * corpus-sized distinct shuffle of short strings plus ~1M md5
    * evaluations was the engine's largest bench tail (measured 6.6s →
    * 2.9s at sf0.1; the remainder is the band-bucket join and verify —
    * the only corpus-sized exchange left. Identical output shape).
    *
    * Bands are `bandSize` adjacent families joined with ':' (same
    * AND/OR composition as [[signatureBands]]); char grams of same-
    * language text have high baseline Jaccard, so default bands are
    * wide (4).
    */
  def charGramNearDups(docs: DataFrame, threshold: Double, n: Int = 5,
                       bandSize: Int = 4, maxBucket: Int = 256,
                       textCol: String = "text", idCol: String = "doc_id",
                       candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget): DataFrame = {
    import graft.functions.QCharGrams
    require(8 % bandSize == 0, "bandSize must divide 8")
    val base = docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= n)
    val sig = base
      .select(col(idCol), QCharGrams.minhashCol(col("t"), n).as("mh"))
      .select(col(idCol) +:
        (0 until 8).map(j => element_at(col("mh"), j + 1).as(s"m$j")): _*)
    val (bands, cap) = resolveCap(
      sig.select(col(idCol),
        posexplode(array(polyBandCols(bandSize): _*)).as(Seq("band_id", "band"))),
      maxBucket, candidateBudgetPerDoc, 8 / bandSize)
    val cand = cappedPairs(bands, Seq("band_id", "band"), cap).cache()
    // per-CANDIDATE-doc sorted gram sets, kept as arrays: the verify is
    // then one scalar merge-intersect per pair (QSortedIntersectCount) —
    // no explode, no (id, hash) shuffle join, no per-pair aggregate.
    // Array rows scale with document size — for million-gram documents
    // prefer the exploded jaccardVerifyHashed form; for web-scale docs
    // (KBs) arrays win.
    val docHashes = candDocSets(cand, base,
      QCharGrams.hashesCol(col("t"), n), idCol)
    arrayJaccardVerify(cand, docHashes, threshold)
  }

  /** Sorted-distinct hash arrays (`hs`) for exactly the docs appearing
    * in `cand`, via `hashExpr` over `base`'s `t` column. Cached: the
    * verify references the frame from both pair sides.
    */
  private def candDocSets(cand: DataFrame, base: DataFrame, hashExpr: Column,
                          idCol: String): DataFrame = {
    // no distinct on the endpoint list: the semi join dedups by
    // definition, so a pre-distinct is one exchange of pure overhead
    // (the duplicated endpoints — 2 per pair — broadcast fine)
    val candDocs = cand.select(col("doc_a").as(idCol))
      .unionAll(cand.select(col("doc_b").as(idCol)))
    base.join(candDocs, Seq(idCol), "left_semi")
      .select(col(idCol), hashExpr.as("hs"))
      .cache()
  }

  /** Exact Jaccard over pre-sorted per-doc hash ARRAYS: one scalar
    * merge-intersect per candidate pair.
    */
  private def arrayJaccardVerify(cand: DataFrame, docHashes: DataFrame,
                                 threshold: Double): DataFrame = {
    val j = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter")).cast("double")
    arrayIntersectVerify(cand, docHashes, j, "jaccard", threshold)
  }

  /** Shared verify scaffold for set-similarity scores computed off the
    * candidate pair's sorted hash arrays: join both sides' arrays,
    * merge-intersect once ([[graft.functions.QSortedIntersect]]), score
    * with the caller's expression over (n_inter, na, nb), threshold.
    * One definition — Jaccard and containment differ ONLY in the
    * denominator, and the join/intersect scaffolding must not drift
    * between them.
    */
  private def arrayIntersectVerify(cand: DataFrame, docHashes: DataFrame,
                                   score: Column, scoreName: String,
                                   threshold: Double): DataFrame = {
    cand
      .join(docHashes.select(col(docHashes.columns.head).as("doc_a"), col("hs").as("ha"),
        size(col("hs")).cast("long").as("na")), Seq("doc_a"))
      .join(docHashes.select(col(docHashes.columns.head).as("doc_b"), col("hs").as("hb"),
        size(col("hs")).cast("long").as("nb")), Seq("doc_b"))
      .withColumn("n_inter", graft.functions.QSortedIntersect.col(col("ha"), col("hb")))
      .select(col("doc_a"), col("doc_b"), score.as(scoreName))
      .filter(col(scoreName) >= threshold)
  }

  /** Word-n-gram near-dup pipeline on the NATIVE
    * [[graft.functions.QWordGrams]] expressions — BIT-IDENTICAL results
    * to [[minhashNearDups]] (same md5 gram hashes, same 8 families,
    * same banding and Jaccard), so the md5-based oracles verify it
    * unchanged. What changes is the plan: the signature is one scalar
    * map per document (no per-gram explode, no signature aggregation
    * exchange), and the verify is the [[QSortedIntersectCount]] merge
    * over candidate docs' hash arrays. The corpus-sized stages carry
    * one row per DOCUMENT end to end.
    */
  def wordGramNearDups(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                       bandSize: Int = 2, maxBucket: Int = 256,
                       textCol: String = "text", idCol: String = "doc_id",
                       candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget): DataFrame = {
    import graft.functions.QWordGrams
    val base = docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
    val sig = base
      .select(col(idCol), QWordGrams.sigCol(col("t"), n).as("ms"))
      .select(col(idCol) +:
        (0 until 8).map(j => element_at(col("ms"), j + 1).as(s"m$j")): _*)
    val (bands, cap) = resolveCap(signatureBands(sig, bandSize, idCol),
      maxBucket, candidateBudgetPerDoc, 8 / bandSize)
    val cand = cappedPairs(bands, Seq("band_id", "band"), cap, idCol).cache()
    val docHashes = candDocSets(cand, base,
      QWordGrams.hashesCol(col("t"), n), idCol)
    arrayJaccardVerify(cand, docHashes, threshold)
  }

  /** Word-n-gram near-dup pipeline on the POLYNOMIAL hash family
    * ([[graft.functions.QWordGrams]] poly section) — the dedup_ngram
    * playbook applied to word grams. Same shape as
    * [[wordGramNearDups]]: one-pass native signature, banded capped
    * candidates, merge-intersect Jaccard verify over candidate docs'
    * sorted gram sets. What changes is the per-gram constant: ~n
    * integer multiply-mods instead of three md5 evaluations — the
    * largest remaining CPU cost of the md5 signature path (round-4
    * verdict). Results are NOT bit-identical to the md5 family (different
    * minima → banding can surface a slightly different candidate set),
    * so the query carries its own relational DuckDB oracle; the md5 form
    * remains as the bit-identity yardstick against the composed
    * pipeline.
    */
  def wordGramNearDupsPoly(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                           bandSize: Int = 2, maxBucket: Int = 256,
                           textCol: String = "text", idCol: String = "doc_id",
                           candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget): DataFrame = {
    import graft.functions.QWordGrams
    require(8 % bandSize == 0, "bandSize must divide 8")
    val base = docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
    val sig = base
      .select(col(idCol), QWordGrams.polySigCol(col("t"), n).as("ms"))
      .select(col(idCol) +:
        (0 until 8).map(j => element_at(col("ms"), j + 1).as(s"m$j")): _*)
    val (bands, cap) = resolveCap(
      sig.select(col(idCol),
        posexplode(array(polyBandCols(bandSize): _*)).as(Seq("band_id", "band"))),
      maxBucket, candidateBudgetPerDoc, 8 / bandSize)
    val cand = cappedPairs(bands, Seq("band_id", "band"), cap, idCol).cache()
    val docHashes = candDocSets(cand, base,
      QWordGrams.polyHashesCol(col("t"), n), idCol)
    arrayJaccardVerify(cand, docHashes, threshold)
  }

  /** Asymmetric CONTAINMENT near-dup: pairs whose overlap coefficient
    * `|grams(A) ∩ grams(B)| / min(|A|, |B|)` reaches `threshold` — the
    * quote/snippet/prefix-inclusion case Jaccard structurally misses (a
    * 12-word excerpt of a 300-word page has Jaccard ≈ 0.04 but
    * containment 1.0; training-data pipelines drop or attribute such
    * subsumed docs).
    *
    * Same poly word-gram machinery as [[wordGramNearDupsPoly]] with TWO
    * deliberate deltas: bands are SINGLE minhash families (bandSize 1 —
    * per-band collision probability J rather than J^s, because
    * containment pairs have low Jaccard by construction, exactly the
    * regime AND-composed bands suppress), and the verify divides by the
    * smaller gram set. Recall still tracks Jaccard (min-wise hashing
    * is a Jaccard sketch; there is no symmetric containment LSH) —
    * documented: 8 single-family bands give 1-(1-J)^8, e.g. ≈ 0.83 at
    * J = 0.2. The capped-bucket discipline is unchanged, so degenerate
    * corpora stay linear PAST the cap — but candidate volume below the
    * cap is quadratic in bucket occupancy (b·(b-1)/2), and single-band
    * buckets densify on corpora whose signature diversity doesn't grow
    * with size (fixed templates/vocabulary). Measured (SCALING_r11 §3):
    * a 3× corpus with fixed vocabulary grew candidates 6.4× while
    * verified output stayed linear; tightening `maxBucket` 256→64 cut
    * wall-clock 5.5× with anchor transitivity preserved — size the cap
    * to the dup-density of the corpus, not to a constant.
    */
  def wordGramContainment(docs: DataFrame, threshold: Double = 0.9, n: Int = 3,
                          maxBucket: Int = 256,
                          textCol: String = "text", idCol: String = "doc_id",
                          candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget): DataFrame = {
    import graft.functions.QWordGrams
    val base = docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
    val sig = base
      .select(col(idCol), QWordGrams.polySigCol(col("t"), n).as("ms"))
      .select(col(idCol) +:
        (0 until 8).map(j => element_at(col("ms"), j + 1).as(s"m$j")): _*)
    // budgeted cap (r12): derive the bucket cap from the corpus's own
    // band census instead of the hand constant — a template-dense
    // corpus (the quadratic-candidate regime) tightens itself
    val (bands, cap) = resolveCap(
      sig.select(col(idCol),
        posexplode(array((0 until 8).map(j => col(s"m$j").cast("string")): _*))
          .as(Seq("band_id", "band"))),
      maxBucket, candidateBudgetPerDoc, 8)
    val cand = cappedPairs(bands, Seq("band_id", "band"), cap, idCol).cache()
    val docHashes = candDocSets(cand, base,
      QWordGrams.polyHashesCol(col("t"), n), idCol)
    val overlap = col("n_inter").cast("double") /
      least(col("na"), col("nb")).cast("double")
    arrayIntersectVerify(cand, docHashes, overlap, "overlap", threshold)
  }

  /** INCREMENTAL near-dup — the production ingestion shape: a batch of
    * `incoming` documents is checked against the `existing` corpus (and
    * against earlier docs in the same batch) WITHOUT re-pairing the
    * existing corpus with itself. Emits exactly the
    * [[wordGramNearDupsPoly]] pairs that involve at least one incoming
    * doc — same signatures, same banding, same capped-bucket
    * discipline, same exact-Jaccard verify — so a full-corpus oracle
    * restricted to incoming-touching pairs verifies it unchanged.
    *
    * What is incremental at scale: the existing side contributes only
    * its 8-BIGINT signatures (in production these live in a signature
    * STORE, written once at ingest — this method recomputes them so the
    * contract stays self-contained) and its per-bucket stats; candidate
    * generation PROBES the band index with the batch's bands only, so
    * join work tracks the batch size, not the corpus. The verify
    * re-reads raw text for CANDIDATE docs only (the store keeps 8
    * BIGINTs per doc, not gram sets) via the usual semi-join.
    *
    * Over-cap buckets keep the anchor discipline: every member pairs
    * with the bucket's min id; the pair survives here iff one endpoint
    * is new (when the ANCHOR itself is new, the whole bucket pairs with
    * it — transitive reachability through the anchor is preserved for
    * the batch).
    */
  def incrementalNearDups(existing: DataFrame, incoming: DataFrame,
                          threshold: Double = 0.5, n: Int = 3,
                          bandSize: Int = 2, maxBucket: Int = 256,
                          textCol: String = "text", idCol: String = "doc_id",
                          candidateBudgetPerDoc: Option[Int] =
                            DefaultCandidateBudget): DataFrame =
    incrementalNearDupsStored(signatureStore(existing, n, textCol, idCol),
      existing, incoming, threshold, n, bandSize, maxBucket, textCol, idCol,
      candidateBudgetPerDoc)

  /** The SIGNATURE STORE row for every document: the 8 polynomial
    * MinHash family minima, one row per doc, 8 BIGINTs — what the
    * ingestion pipeline persists (a warehouse table keyed by doc id) so
    * [[incrementalNearDupsStored]] never re-reads existing text except
    * for verify candidates. Build cost: one scalar map over the corpus.
    */
  def signatureStore(docs: DataFrame, n: Int = 3, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    import graft.functions.QWordGrams
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
      .select(col(idCol), QWordGrams.polySigCol(col("t"), n).as("ms"))
      .select(col(idCol) +:
        (0 until 8).map(j => element_at(col("ms"), j + 1).as(s"m$j")): _*)
  }

  /** [[incrementalNearDups]] with the existing side's signatures taken
    * from a PERSISTED [[signatureStore]] instead of recomputed — the
    * full production shape: per batch, the existing corpus contributes
    * 8 BIGINTs/doc from storage for banding and raw text ONLY for the
    * (semi-joined) verify candidates. `existing` still supplies that
    * candidate text; `store` must hold exactly `existing`'s store rows
    * (spec-asserted equal to the recomputed path, including through a
    * parquet round trip).
    */
  def incrementalNearDupsStored(store: DataFrame, existing: DataFrame,
                                incoming: DataFrame,
                                threshold: Double = 0.5, n: Int = 3,
                                bandSize: Int = 2, maxBucket: Int = 256,
                                textCol: String = "text", idCol: String = "doc_id",
                                candidateBudgetPerDoc: Option[Int] =
                                  DefaultCandidateBudget): DataFrame = {
    require(8 % bandSize == 0, "bandSize must divide 8")
    def prep(df: DataFrame) =
      df.select(col(idCol), lower(col(textCol)).as("t"))
        .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
    // NOT cached: consumed exactly once, by candDocSets' semi-join
    // (which caches its own candidate-sized output) — caching here
    // would materialize the full corpus text per batch, defeating the
    // signatures-from-storage point
    val base = prep(existing).unionAll(prep(incoming))
    val sig = store.withColumn("is_new", lit(false)).unionByName(
      signatureStore(incoming, n, textCol, idCol).withColumn("is_new", lit(true)))
    // The cap census runs over the COMBINED (store + incoming) bands —
    // the same census the batch path would compute on the full corpus,
    // so the contract ("exactly the full-corpus pairs restricted to
    // incoming-touching") holds under the budget default too. At scale
    // the census is one extra aggregation per batch over 8-BIGINT rows;
    // a production store maintains the census incrementally alongside
    // the signatures instead — [[incrementalNearDupsStoredWithCap]]
    // takes the cap that [[capFromMaintainedCensus]] derives from the
    // maintained tables (bit-equal to this recompute, spec-pinned) and
    // skips this full pass.
    val (bands, cap) = resolveCap(
      sig.select(col(idCol), col("is_new"),
        posexplode(array(polyBandCols(bandSize): _*)).as(Seq("band_id", "band"))),
      maxBucket, candidateBudgetPerDoc, 8 / bandSize)
    incrementalCore(base, bands, cap, threshold, n, idCol)
  }

  /** [[incrementalNearDupsStored]] with the bucket cap supplied by the
    * caller instead of recomputed from a full (store + incoming) band
    * census — the production shape once the census is MAINTAINED: the
    * CDC consumer keeps per-bucket counts + the bucket-size histogram
    * store-side (updated in the same txn as the signatures), the caller
    * derives `cap` via [[capFromMaintainedCensus]] (batch-sized work),
    * and this method never aggregates the stored bands. Identical
    * output to the recomputing form at the same cap (spec-pinned).
    */
  def incrementalNearDupsStoredWithCap(store: DataFrame, existing: DataFrame,
                                       incoming: DataFrame, cap: Int,
                                       threshold: Double = 0.5, n: Int = 3,
                                       bandSize: Int = 2,
                                       textCol: String = "text",
                                       idCol: String = "doc_id"): DataFrame = {
    require(8 % bandSize == 0, "bandSize must divide 8")
    def prep(df: DataFrame) =
      df.select(col(idCol), lower(col(textCol)).as("t"))
        .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= n)
    val base = prep(existing).unionAll(prep(incoming))
    val sig = store.withColumn("is_new", lit(false)).unionByName(
      signatureStore(incoming, n, textCol, idCol).withColumn("is_new", lit(true)))
    val bands = sig.select(col(idCol), col("is_new"),
      posexplode(array(polyBandCols(bandSize): _*)).as(Seq("band_id", "band")))
    incrementalCore(base, bands, cap, threshold, n, idCol)
  }

  private def incrementalCore(base: DataFrame, bands: DataFrame, cap: Int,
                              threshold: Double, n: Int,
                              idCol: String): DataFrame = {
    // one exchange on the bucket key: size + anchor(id, flag) per row
    // (at scale these stats are maintained in the store, not recomputed)
    val w = Window.partitionBy("band_id", "band")
    val rows = bands.select(col("band_id"), col("band"), col(idCol), col("is_new"),
        count(lit(1)).over(w).as("bn"),
        min(struct(col(idCol), col("is_new"))).over(w).as("anchor"))
      .cache()
    // ≤cap: probe the bucket with NEW rows only; (least, greatest)
    // normalization makes new×new pairs single and ordered
    val small = rows.filter(col("is_new") && col("bn") <= cap)
      .join(rows.filter(col("bn") <= cap)
          .select(col("band_id"), col("band"), col(idCol).as("other")),
        Seq("band_id", "band"))
      .filter(col(idCol) =!= col("other"))
      .select(least(col(idCol), col("other")).as("doc_a"),
        greatest(col(idCol), col("other")).as("doc_b"))
    // >cap: anchor pairs, kept iff an endpoint is new
    val big = rows
      .filter(col("bn") > cap && col(idCol) > col("anchor")(idCol) &&
        (col("is_new") || col("anchor")("is_new")))
      .select(col("anchor")(idCol).as("doc_a"), col(idCol).as("doc_b"))
    val cand = small.unionAll(big).distinct().cache()
    val docHashes = candDocSets(cand, base.select(col(idCol), col("t")),
      graft.functions.QWordGrams.polyHashesCol(col("t"), n), idCol)
    arrayJaccardVerify(cand, docHashes, threshold)
  }

  /** The LAST dedup stage: cluster labels → keep/drop DECISIONS. Within
    * each cluster exactly one document survives — the longest text
    * (most complete near-duplicate), ties to the lowest id; the rest
    * carry their cluster's canonical id for attribution. This is the
    * step that turns the pairs → clusters machinery into the filter a
    * curation pipeline actually applies. One broadcastable join of
    * labels to doc lengths and one per-cluster window (cluster sizes
    * are near-dup groups — tiny — so the window partitions are bounded
    * regardless of corpus size).
    */
  def keepCanonical(docs: DataFrame, labels: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    keepBySignal(labels,
      docs.select(col(idCol), length(col(textCol)).cast("long").as("n_chars")),
      "n_chars", idCol)

  /** The shared survivor machinery behind [[keepCanonical]] (signal =
    * text length) and [[keepCanonicalByRank]] (signal = PageRank):
    * within each cluster rank-1 by (signal desc, id asc) survives and
    * every row carries the cluster's canonical id.
    */
  private def keepBySignal(labels: DataFrame, signal: DataFrame,
                           signalCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(signalCol).desc, col(idCol))
    labels.join(signal, Seq(idCol))
      .withColumn("rk", row_number().over(w))
      .withColumn("canonical_id", min(when(col("rk") === 1, col(idCol))).over(
        Window.partitionBy("cluster_id")))
      .select(col(idCol), col("cluster_id"), col(signalCol),
        (col("rk") === 1).as("keep"), col("canonical_id"))
  }

  /** [[keepCanonical]] with CENTRALITY as the survivor signal: within
    * each cluster the highest-[[GraphMetrics.pageRankMicro]] document
    * survives (ties to the lowest id). Longest-text keep prefers
    * completeness; rank keep prefers the cluster's HUB — the anchor of
    * a star of orbiting variants — which is the better canonical when
    * near-dups are derived copies of one source. Same output contract
    * as [[keepCanonical]] with `rank_micro` in place of `n_chars`.
    */
  def keepCanonicalByRank(labels: DataFrame, ranks: DataFrame,
                          idCol: String = "doc_id"): DataFrame =
    keepBySignal(labels, ranks, "rank_micro", idCol)

  /** LEAKAGE-FREE train/val/test split: the split is assigned to the
    * near-dup CLUSTER, not the document — every member of a cluster
    * lands in the same split, so an eval document can never share a
    * near-duplicate with the training set (the contamination channel a
    * per-document hash split leaves open: web corpora run 10-20%
    * near-dups, and a template's variants straddle any per-doc split,
    * leaking eval text into training verbatim-minus-noise). `labels`
    * is [[clusterLabels]]' (id, cluster_id) output; the bucket is the
    * same md5-prefix hash [[TextAnalysis.assignSplit]] uses, applied
    * to the cluster id — a SINGLETON cluster (cluster_id = own id)
    * therefore reproduces the per-document split bit for bit, so
    * adopting cluster splits re-shuffles only documents that actually
    * have near-dups. Scale shape: one hash projection over the labels
    * frame — no join, no shuffle beyond what labels already carries.
    * Output: (idCol, cluster_id, bucket, split).
    */
  def leakageFreeSplit(labels: DataFrame, trainPct: Int = 80,
                       valPct: Int = 10,
                       idCol: String = "doc_id"): DataFrame = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    val bucket = expr(
      "CAST(conv(substring(md5(CAST(cluster_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
    labels.select(col(idCol), col("cluster_id"))
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** DEDUP IMPACT REPORT — the "what did dedup actually do" artifact a
    * curation run publishes: per CLUSTER SIZE, how many clusters, how
    * many documents, their total text bytes, and the bytes dropped by
    * longest-survivor keep ([[keepCanonical]]'s rule: chars_total minus
    * the longest member per cluster). Reading it: row 1 (size 1) is the
    * untouched corpus mass; the tail is the dup burden; Σ chars_dropped
    * is the storage/compute the dedup pass saves downstream. Exact
    * integers end to end. Scale shape: one labels⋈lengths join (both
    * id-keyed), one per-cluster aggregate, one per-size aggregate —
    * output is at most `max cluster size` rows.
    * Output: (cluster_size, n_clusters, n_docs, chars_total,
    * chars_dropped), ascending by size.
    */
  def dedupReport(labels: DataFrame, docs: DataFrame,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    labels.join(docs.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars")), Seq(idCol))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"), sum("n_chars").as("chars"),
        max("n_chars").as("kept"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_docs"),
        sum("chars").as("chars_total"),
        sum(col("chars") - col("kept")).as("chars_dropped"))

  /** RECALL REPORT for a near-dup pass against a PLANTED ground-truth
    * pair list — the "measure your dedup before trusting it" harness a
    * production pipeline runs on every banding-parameter change. Takes
    * the pass's (doc_a, doc_b) output and a `planted` frame
    * (doc_a, doc_b, kind) of known-duplicate pairs, and reports per
    * kind: how many were planted, how many the pass found, and recall
    * in integer basis points (exact `div` — no float compare in the
    * gate). End-to-end honest: a planted pair lost to banding OR to the
    * verify threshold both count as missed.
    */
  def nearDupRecallReport(found: DataFrame, planted: DataFrame): DataFrame = {
    // orient BOTH sides (a < b): every pass emits canonical pairs, but
    // nothing requires the PLANTED list to — an unoriented (b, a) entry
    // would count as missed forever and silently deflate recall
    def orient(df: DataFrame) = df.withColumn("__a",
        least(col("doc_a"), col("doc_b")))
      .withColumn("doc_b", greatest(col("doc_a"), col("doc_b")))
      .withColumn("doc_a", col("__a")).drop("__a")
    orient(planted)
      .join(orient(found).select("doc_a", "doc_b").distinct()
          .withColumn("hit", lit(1L)),
        Seq("doc_a", "doc_b"), "left_outer")
      .groupBy("kind")
      .agg(count(lit(1)).as("n_planted"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .withColumn("recall_bp", expr("(10000 * n_found) div n_planted"))
  }

  /** Connected components over near-dup pairs: every node gets
    * `cluster_id` = the smallest doc id transitively reachable through
    * the pair graph — the "cluster, then keep one canonical doc" step
    * that turns pairwise near-dup output into dedup decisions.
    *
    * Pregel-style iterative min-label propagation: each round joins the
    * label frame to the (bidirectional) edge list, takes the min
    * neighbor label, and stops when a round changes nothing — a driver
    * loop over fully distributed joins (labels never collect), with
    * rounds bounded by the component diameter (near-dup clusters are
    * shallow — pairs and small cliques — so typically 1-3 rounds).
    * Deterministic: min is order-insensitive. For deep graphs (long
    * chains from templated corpora) use [[clusterLabelsDoubling]],
    * whose pointer-jumping converges in O(log diameter) rounds.
    *
    * Cost discipline (the round-2 bench tail, fixed here; tightened in
    * round 5 — the residual was per-round DRIVER fixed cost, i.e. jobs
    * launched × plan analysis, not data movement):
    *  - only EDGE ENDPOINTS iterate — an isolated node is its own
    *    cluster by construction and `nodes - endpoints` never changes,
    *    so the per-round joins run over the near-dup subgraph (a
    *    vanishing fraction of a real corpus), not every document;
    *  - ONE job per round: the changed-flag is a column of the round
    *    frame, whose `localCheckpoint` mark is LAZY — the convergence
    *    count materializes (persists) the frame as it counts, where an
    *    eager checkpoint plus count launched two jobs;
    *  - the seed round is FUSED into one aggregation over the edge list
    *    (identity seed ⇒ round 1 = min(own, min neighbor)), whose group
    *    keys are the endpoint set — no endpoints-distinct checkpoint,
    *    no convergence count for a round that by construction changes
    *    the larger end of every pair.
    *
    * Lineage discipline: edges and every label generation are
    * `localCheckpoint`ed, not merely cached — a cache shortcuts
    * execution but Catalyst still re-analyzes the whole accumulated
    * logical plan per action, which grows a layer per round (measured
    * 4s → 19s/round on an 837-pair graph before truncation). On a real
    * cluster swap in reliable `checkpoint()` against the fault-tolerance
    * of executor loss. Checkpoint blocks live until session close —
    * callers embedding this in a long-lived service should run it in a
    * dedicated session or accept the (labels-sized) residue.
    *
    * PRECONDITION: every id in `pairs0` must appear in `nodes` — labels
    * are seeded from edge ENDPOINTS (so only the near-dup subgraph
    * iterates), and an endpoint absent from `nodes` would surface as a
    * phantom output row (and could become a cluster's min label). Holds
    * by construction when pairs come from an LSH/SimHash pass over the
    * same corpus (as in every [[graft.queries.TextQueries]] use); a
    * defensive `endpoints ⋉ nodes` semi-join is deliberately omitted —
    * it would shuffle the full corpus to guard an impossible input.
    */
  def clusterLabels(pairs0: DataFrame, nodes: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    // LAZY checkpoint on the (possibly expensive) pair pipeline: the mark
    // persists the RDD, so the bidirectional union's two branches share
    // one computation of it — and the parallelism-sizing count below
    // materializes pairs AND edges in ONE job, where the former eager
    // pairs checkpoint launched its own (round-5: two jobs → one).
    val pairs = pairs0.localCheckpoint(false)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(false)
    var labels: DataFrame = null
    var changed = 1L
    withSubgraphParallelism(edges) {
      // fused seed + first propagation: from the identity seed, round 1's
      // result is min(own id, min neighbor id) — computable straight off
      // the edge list, whose group keys ARE the endpoint set (every
      // endpoint occurs as src of a bidirectional edge). This replaces
      // the former endpoints-distinct checkpoint AND the first loop round
      // with one aggregation; round 1 always changes something when edges
      // exist (the larger end of every pair), so its convergence count is
      // skipped, not approximated.
      // LAZY mark again: round 1 of the loop references the seed twice
      // (own-label branch + neighbor join), the persist mark makes both
      // branches share one computation, and round 1's convergence count
      // materializes seed AND round in one job (round-5: the seed's own
      // eager-checkpoint job folded away).
      labels = edges.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl"))
        .localCheckpoint(false)
      while (changed > 0) {
        // fused round: propagate neighbor labels over the edges, UNION
        // the nodes' own labels (tagged in `own`), and take both the
        // new minimum and the previous label in ONE aggregation —
        // two exchanges per round (the dst join + the id groupBy)
        // instead of the join/agg/join chain's three. min() ignores
        // the propagated rows' null `own`, so `own` is exactly the
        // previous label and the changed flag is `lbl < own`. The lazy
        // checkpoint mark makes the convergence count the round's ONE
        // job: it materializes (persists) the frame as it counts.
        val next = labels.select(col("id"), col("lbl"), col("lbl").as("own"))
          .unionAll(edges
            .join(labels.select(col("id").as("dst"), col("lbl")), Seq("dst"))
            .select(col("src").as("id"), col("lbl"), lit(null).cast("long").as("own")))
          .groupBy("id").agg(min("lbl").as("lbl"), min("own").as("own"))
          .select(col("id"), col("lbl"), (col("lbl") < col("own")).as("chg"))
          .localCheckpoint(false)
        changed = next.filter(col("chg")).count() // materializes + counts
        labels = next.select("id", "lbl")
      }
    }
    attachIsolated(labels, nodes, labels.select(col("id")), idCol)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to the
    * near-dup SUBGRAPH's size instead of the session's corpus-sized
    * setting (restored after). The iteration shuffles only edges and
    * labels — on a real corpus a vanishing fraction of the documents —
    * and per-round fixed cost includes empty-task launch when a
    * thousand-edge subgraph shuffles into hundreds of partitions
    * (measured ~0.4s of a 4.1s bench run at 32→2 partitions; the
    * residual round cost is per-round plan analysis + checkpoint job
    * launch, invariant to partitioning). One partition per ~64k edges,
    * floor 1, capped at the session default so a dense billion-pair
    * subgraph still spreads. The count() feeding the sizing doubles as
    * the edge frame's checkpoint-materializing action (edges arrive
    * lazily marked).
    */
  private def withSubgraphParallelism[A](edges: DataFrame)(body: => A): A = {
    val spark = edges.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val p = math.max(1L, math.min(prev.toLong, edges.count() / 65536L + 1L))
    spark.conf.set(key, p.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** [[clusterLabels]] with POINTER JUMPING: each round takes the min
    * over neighbors (as the naive propagation does) and then jumps one
    * pointer level — `lbl := lbl(lbl)` via a self-join of the label
    * frame — so the distance a label travels per round roughly doubles.
    * Converges in O(log diameter) rounds instead of O(diameter): the
    * hardening for adversarial/templated corpora whose near-dup graphs
    * chain (naive propagation needs `diameter` rounds of full joins).
    *
    * Correctness: labels are monotone non-increasing and always name a
    * node of the same component (a neighbor's label, or a label's
    * label, stays in-component), so the fixpoint — where no edge sees
    * two labels and pointers are idempotent — is the component minimum,
    * identical to the naive propagation's output. Verified by property
    * test on a 1,000-node path graph (≤ ~10 rounds, equal labels).
    * Same PRECONDITION as [[clusterLabels]]: pair ids ⊆ `nodes`.
    */
  def clusterLabelsDoubling(pairs0: DataFrame, nodes: DataFrame,
                            idCol: String = "doc_id"): DataFrame = {
    val (labels, _, endpoints) = doublingRounds(pairs0, nodes, idCol)
    attachIsolated(labels, nodes, endpoints, idCol)
  }

  /** Iteration core of [[clusterLabelsDoubling]], exposing the round
    * count for the convergence property test.
    */
  private[graft] def doublingRounds(pairs0: DataFrame, nodes: DataFrame,
                                    idCol: String): (DataFrame, Int, DataFrame) = {
    val pairs = pairs0.localCheckpoint()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val endpoints = edges.select(col("src").as("id")).distinct().localCheckpoint()
    var labels = endpoints.select(col("id"), col("id").as("lbl"))
    var changed = 1L
    var rounds = 0
    withSubgraphParallelism(edges) {
      while (changed > 0) {
        val neigh = edges
          .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
          .groupBy(col("src").as("id")).agg(min("nlbl").as("minn"))
        val stepped = labels.join(neigh, Seq("id"), "left")
          .select(col("id"), col("lbl").as("lbl0"),
            least(col("lbl"), coalesce(col("minn"), col("lbl"))).as("lbl1"))
        // pointer jump: lbl := lbl(lbl) — labels only ever name endpoint
        // ids, so the jump lookup always matches
        val jumpTbl = stepped.select(col("id").as("j_id"), col("lbl1").as("j_lbl"))
        val jumped = least(col("lbl1"), coalesce(col("j_lbl"), col("lbl1")))
        val scored = stepped
          .join(jumpTbl, col("lbl1") === col("j_id"), "left")
          .select(col("id"), jumped.as("lbl"),
            coalesce(jumped < col("lbl0"), lit(false)).as("chg"))
          .localCheckpoint() // the round's one real action
        changed = scored.filter(col("chg")).count()
        labels = scored.select("id", "lbl")
        rounds += 1
      }
    }
    (labels, rounds, endpoints)
  }

  /** Union the iterated endpoint labels with the isolated nodes
    * (cluster_id = own id — they never entered the loop).
    */
  private def attachIsolated(labels: DataFrame, nodes: DataFrame,
                             endpoints: DataFrame, idCol: String): DataFrame = {
    val isolated = nodes.select(col(idCol).as("id"))
      .join(endpoints, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    labels.unionAll(isolated)
      .select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }

  /** 64-bit SimHash over word unigrams (the Charikar/Google form: 64
    * bits, near-dup at Hamming ≤ 3). The hash basis is md5(word); bit b
    * of hex char p contributes ±1 to accumulator (p,b); the signature is
    * the 64-char '0'/'1' string of accumulator signs, ordered by (p,b).
    *
    * Built as ONE wide aggregation (64 sum columns) — no row explosion,
    * one shuffle on doc_id, fully codegen'd.
    */
  def simhashSignature(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val wh = tokenize(docs).select(col(idCol), md5(col("w").cast("binary")).as("h")).distinct()
    // hex value of each md5 position computed ONCE per word (16 substr
    // ops), then the 64 bit-sums read from those — not 64 substr ops
    val hexVals = (1 to 16).map(p =>
      expr(s"CAST(instr('0123456789abcdef', substring(h, $p, 1)) - 1 AS INT)").as(s"v$p"))
    val withVals = wh.select(col(idCol) +: hexVals: _*)
    val pbs = for (p <- 1 to 16; b <- 0 to 3) yield (p, b)
    val sums = pbs.map { case (p, b) =>
      sum(when(((col(s"v$p") / lit(1 << b)).cast("int") % 2) === 1, lit(1))
        .otherwise(lit(-1))).as(s"s_${p}_$b")
    }
    val sig = concat(pbs.map { case (p, b) =>
      when(col(s"s_${p}_$b") >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
    withVals.groupBy(idCol).agg(sums.head, sums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit bands (pigeonhole: Hamming
    * ≤ 3 over 4 bands leaves at least one band identical, so banding is
    * EXACT for this radius), then verify Hamming over the full 64 bits.
    *
    * Band buckets larger than `maxBucket` (a degenerate corpus of
    * thousands of near-identical docs) are diverted to anchor form —
    * each member pairs with the bucket's lowest doc id only — bounding
    * every bucket's output linearly. Within an over-cap bucket the
    * pigeonhole exactness narrows to anchor-reachable pairs (documented
    * trade: such buckets are near-dup clusters already).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      maxBucket: Int = 256, idCol: String = "doc_id",
                      candidateBudgetPerDoc: Option[Int] = DefaultCandidateBudget)
      : DataFrame = {
    // The bit string is packed into two BIGINT halves here (one conv()
    // per doc) so the per-pair Hamming distance is two xor + bit_count
    // ops instead of 64 substring comparisons.
    //
    // The signature itself is the native one-pass QSimHash expression —
    // bit-identical to [[simhashSignature]] (spec-asserted), minus its
    // corpus-wide (doc, word-hash) distinct shuffle and 64-column
    // aggregation exchange. The empty-token filter reproduces the
    // composed form's implicit exclusion (no words → no group → no row).
    val sig = docs
      .filter(size(filter(split(lower(col("text")), "\\s+"), w => w =!= "")) > 0)
      .select(col(idCol),
        graft.functions.QSimHash.sigCol(lower(col("text"))).as("simhash"))
      .withColumn("hi", expr("CAST(conv(substring(simhash, 1, 32), 2, 10) AS BIGINT)"))
      .withColumn("lo", expr("CAST(conv(substring(simhash, 33, 32), 2, 10) AS BIGINT)"))
    val (bands, cap) = resolveCap(
      sig.select(col(idCol), col("hi"), col("lo"),
        explode(array((0 until 4).map(k =>
          substring(col("simhash"), 1 + 16 * k, 16)): _*)).as("band")),
      maxBucket, candidateBudgetPerDoc, bandsPerDoc = 4,
      bucketCols = Seq("band"))
    // same one-exchange shape as [[cappedPairs]], with the (hi, lo)
    // halves riding along: the Window computes bucket size, anchor id
    // AND the anchor's signature halves (min_by over the same exchange),
    // so neither branch ever joins back — the former shape spent three
    // more exchanges (size aggregate + join-back + bucket self-join) and
    // a fourth join fetching the anchor's signature.
    val w = Window.partitionBy(col("band"))
    val rows = bands.select(col(idCol), col("hi"), col("lo"), col("band"),
        count(lit(1)).over(w).as("bn"),
        min(col(idCol)).over(w).as("anchor"),
        min_by(col("hi"), col(idCol)).over(w).as("hi_anchor"),
        min_by(col("lo"), col(idCol)).over(w).as("lo_anchor"))
      .cache()
    val cand = rows.filter(col("bn") <= cap)
      .groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col(idCol), col("hi"), col("lo")))).as("ms"))
      .select(posexplode(col("ms")).as(Seq("i", "a")), col("ms"))
      // slice is 1-based: partners of the element at 0-based i start at i+2
      .select(col("a"), explode(slice(col("ms"), col("i") + lit(2), lit(cap))).as("b"))
      .select(col(s"a.$idCol").as("doc_a"), col("a.hi").as("hi_a"), col("a.lo").as("lo_a"),
        col(s"b.$idCol").as("doc_b"), col("b.hi").as("hi_b"), col("b.lo").as("lo_b"))
      // a doc whose signature repeats a 16-bit quarter appears TWICE in
      // that band-value group — the adjacent sorted entries would pair
      // it with itself ((A, A, hamming 0) passes any threshold); the
      // oracle's a.doc_id < b.doc_id predicate never emits those
      .filter(col("doc_a") =!= col("doc_b"))
    val bigCand = rows
      .filter(col("bn") > cap && col(idCol) > col("anchor"))
      .select(col("anchor").as("doc_a"), col("hi_anchor").as("hi_a"),
        col("lo_anchor").as("lo_a"),
        col(idCol).as("doc_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    // pairs sharing several bands appear several times — recomputing the
    // two-instruction hamming beats an early wide-row distinct shuffle
    cand.unionAll(bigCand).withColumn("hamming",
      (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
        bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
  }
}
