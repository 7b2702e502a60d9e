package graft.operators

import graft.functions.QDotProduct.qdot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism strategy: floats are quantized to BIGINT
  * (`floor(x*1e6)` — floor, not CAST: double→int casts truncate in Spark
  * but round in DuckDB) before any arithmetic, so dot products and norms
  * are EXACT, associative integers — immune to float summation order —
  * and the final cosine is a fixed sequence of double ops any engine
  * reproduces bit for bit.
  *
  * Performance strategy: the inner product is
  * [[graft.functions.QDotProduct]], a native Catalyst expression whose
  * generated code is one tight loop over the two array buffers inside
  * whole-stage codegen — measured ~10× faster on the all-pairs path than
  * either array higher-order functions (interpreted) or an unrolled
  * per-component column sum.
  *
  * Scale design: brute force is the O(Q·N) baseline — queries broadcast
  * against a partitioned corpus scan. The IVF variant is the scale path:
  * vectors are bucketed by nearest centroid once (the bucket is a join /
  * partition key), queries probe only `nprobe` buckets.
  */
object Similarity {

  /** `array<float>` → exact `array<bigint>`, ×1e6 then floor. */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1000000.0)).cast("bigint"))

  private def withQuant(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", qdot(col("q"), col("q")))

  /** Zero-norm guard: a vector whose components all sit in [0, 1e-6)
    * quantizes to the all-zero array (nrm = 0), and under Spark 4's
    * default ANSI mode a double division by zero THROWS — one degenerate
    * embedding (a failed upstream embedding call) would kill the whole
    * job. Cosine against a zero vector is defined here as 0.0 (no
    * similarity — never a near-dup, never a top-k hit at any positive
    * threshold), which is also what every oracle computes for data
    * without such vectors (none exist in the fixtures).
    */
  private def cosine(dot: Column, na: Column, nb: Column): Column =
    when(na <= 0 || nb <= 0, lit(0.0))
      .otherwise(dot.cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double")))

  /** Brute-force cosine top-k: every `queryPred` vector against the whole
    * corpus (minus itself). Output: (query_id, hit_id, cosine, rnk).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = withQuant(embeddings)
    val queries = withQuant(embeddings.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        cosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Nearest-centroid assignment: every corpus vector scored against the
    * broadcast codebook, rank-1 by cosine (ties to the lowest cent_id).
    * The `lit(true)` join is a BroadcastNestedLoopJoin BY DESIGN — IVF
    * assignment is every-vector × every-centroid; a 2-level codebook is
    * the fix if the centroid count ever outgrows a broadcast, not a
    * different join.
    */
  private def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val aw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    corpus.join(broadcast(cents), lit(true))
      .withColumn("ccos", cosine(qdot(col("cq"), col("q")), col("cn"), col("nrm")))
      .withColumn("arnk", row_number().over(aw))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("q"), col("nrm"), col("cent_id").as("bucket"))
  }

  /** Probe + in-bucket search against a given codebook — the shared tail
    * of the seed and learned IVF variants.
    */
  private def ivfSearch(corpus: DataFrame, cents: DataFrame, queryPred: Column,
                        k: Int, nprobe: Int): DataFrame = {
    val assigned = assign(corpus, cents)
    // probe list: nprobe nearest centroids per query
    val queries = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val pw = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("cent_id"))
    val probes = queries.join(broadcast(cents), lit(true))
      .withColumn("pcos", cosine(qdot(col("cq"), col("qq")), col("cn"), col("qn")))
      .withColumn("prnk", row_number().over(pw))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("qq"), col("qn"), col("cent_id").as("bucket"))

    // search only the probed buckets
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    broadcast(probes).join(assigned, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        cosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF-style ANN: `centroidPred` vectors act as the coarse codebook;
    * every vector is assigned to its nearest centroid (one pass), and a
    * query searches only the `nprobe` nearest buckets. Recall < 1 by
    * construction; the bucketing is the 100 TB path. Predicates select
    * on `vec_id`. See [[ivfTopKLearned]] for the Lloyd-refined codebook.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, centroidPred: Column,
              k: Int, nprobe: Int): DataFrame = {
    val corpus = withQuant(embeddings)
    ivfSearch(corpus, seedCents(corpus, centroidPred), queryPred, k, nprobe)
  }

  private def seedCents(corpus: DataFrame, centroidPred: Column): DataFrame =
    corpus.filter(centroidPred)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nrm").as("cn"))

  /** One spherical-k-means (Lloyd) step: assign by cosine, then each
    * centroid becomes the element-wise FLOOR-MEAN of its bucket's
    * quantized vectors — floor(sum/n) keeps the codebook in the exact
    * BIGINT domain (sums < 2^53 make the double division exact to well
    * below the 1/n gap to the nearest integer, so the floor is
    * bit-portable across engines). Centroids that attract no vectors
    * drop out — deterministic, and the usual k-means shrinkage.
    * Bucket ids keep the seed's cent_id through refinement.
    */
  def lloydStep(corpus: DataFrame, cents: DataFrame): DataFrame =
    floorMeanVectors(
      assign(corpus, cents)
        .select(col("bucket").as("cent_id"), posexplode(col("q")).as(Seq("i", "qi"))),
      Seq("cent_id"), "i", "qi", "cq")
      .withColumn("cn", qdot(col("cq"), col("cq")))

  /** IVF with a LEARNED codebook: `centroidPred` picks the seeds, then
    * `lloydIters` spherical-k-means iterations (cosine assignment,
    * floor-mean update) refine them before the probe/search pass. The
    * refinement is `iters` extra corpus passes at build time — at 100 TB
    * the codebook is built once on a sample and reused; here the corpus
    * is cached across rounds (see the caching contract note on
    * [[graft.operators.Dedup]]).
    */
  def ivfTopKLearned(embeddings: DataFrame, queryPred: Column, centroidPred: Column,
                     k: Int, nprobe: Int, lloydIters: Int = 1): DataFrame = {
    val corpus = withQuant(embeddings).cache()
    var cents = seedCents(corpus, centroidPred)
    for (_ <- 1 to lloydIters) cents = lloydStep(corpus, cents)
    ivfSearch(corpus, cents, queryPred, k, nprobe)
  }

  /** PRODUCT-QUANTIZATION ANN — the compression half of IVF-PQ, the
    * structure that makes billion-vector search affordable: each vector
    * splits into `m` subvectors, each subvector snaps to its nearest
    * codeword (here: the `centroidPred` seeds' own subvectors — one
    * codeword per seed per subspace, no training iteration, so the
    * whole pipeline is exact integer arithmetic and oracle-
    * reproducible), and a vector is stored as just `m` small codes.
    * A query computes ONE distance table (per-subspace L2² to every
    * codeword — queries × m × C rows, broadcastable) and every corpus
    * vector's approximate distance is `m` table lookups summed — an
    * asymmetric-distance (ADC) scan that reads CODES, not vectors:
    * at 100 TB of embeddings the scan touches m bytes per vector
    * instead of 4·D, and no shuffle moves a raw vector at all (the
    * codebook and the distance tables broadcast; the only exchange is
    * the per-(vector, subspace) argmin aggregate, codes-sized).
    * Distances are exact integer L2² in the ×1e6 quantized domain;
    * ties break to the lowest codeword / hit id. Requires D % m == 0.
    * Output: (query_id, hit_id, adist, rnk) — recall < 1 by
    * construction, like [[ivfTopK]].
    */
  def pqTopK(embeddings: DataFrame, queryPred: Column, centroidPred: Column,
             m: Int, k: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val cents = corpus.filter(centroidPred)
      .select(col("vec_id").as("cent_id"), col("q").as("c"))
    def scored(vecs: DataFrame, idCol: String) = vecs
      .join(broadcast(cents), lit(true)) // every-vector × codebook BY DESIGN
      .select(col("vec_id").as(idCol), col("cent_id"),
        posexplode(subDists(col("q"), col("c"), m)).as(Seq("s", "d")))
    // encode: per (vector, subspace) the nearest codeword (tie → lowest)
    val codes = scored(corpus, "vec_id")
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("cent_id"))).getField("cent_id").as("code"))
    // ADC distance tables for the queries (the same scoring, query side)
    val dt = scored(corpus.filter(queryPred), "query_id")
    adcScan(codes, dt, codes("s") === dt("s") && codes("code") === dt("cent_id"), k)
  }

  /** PQ with a LEARNED codebook — one Lloyd step per subspace, the
    * subspace-granular analogue of [[lloydStep]]: encode with the seed
    * codebook (the `centroidPred` vectors' subvectors), replace each
    * (codeword, subspace) CELL by the element-wise floor-mean of the
    * subvectors assigned to it (floor keeps the codebook in the exact
    * BIGINT domain — [[lloydStep]]'s bit-portability argument), then
    * re-encode and answer by ADC against the refined cells. Cells that
    * attract no vectors drop out per subspace (k-means shrinkage). When
    * every vector is its own seed the refinement is an exact fixpoint
    * (each cell floor-means ONE member — itself), so the result equals
    * [[pqTopK]]'s (spec-pinned). At 100 TB the refinement is a
    * build-time pass over a training sample, like [[ivfTopKLearned]];
    * the codebook here is cell-granular, so the per-subspace encode is
    * an equi-join on the subspace id, never a full-vector broadcast NLJ,
    * and the encode aggregate carries each group's subvector through so
    * the refinement needs no corpus-sized re-join. Requires D % m == 0
    * (enforced row-side, like the stored-index m guard).
    * Output: (query_id, hit_id, adist, rnk).
    */
  def pqTopKLearned(embeddings: DataFrame, queryPred: Column,
                    centroidPred: Column, m: Int, k: Int): DataFrame = {
    // subvector frame: (vec_id, s, sq) — cached: feeds the seed book,
    // two encode passes, the refinement, and the query tables
    val subv = pqQuantChecked(embeddings, m)
      .select(col("vec_id"), posexplode(subVectors(col("q"), m)).as(Seq("s", "sq")))
      .cache()
    val cw0 = subv.filter(centroidPred)
      .select(col("vec_id").as("cw_id"), col("s"), col("sq").as("cs"))
    // encode against a cell-granular codebook: equi-join on s, argmin
    // per (vector, subspace), tie → lowest cw_id; sq is constant within
    // the group, so first() carries it to the refinement WITHOUT a
    // corpus-sized join back onto subv
    def encode(book: DataFrame) = subv.join(broadcast(book), Seq("s"))
      .withColumn("d", l2sq(col("sq"), col("cs")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("cw_id"))).getField("cw_id").as("code"),
        first(col("sq")).as("sq"))
    // refine: floor-mean of each cell's members, element-wise
    val cw1 = floorMeanVectors(
      encode(cw0).select(col("code").as("cw_id"), col("s"),
        posexplode(col("sq")).as(Seq("j", "qj"))),
      Seq("cw_id", "s"), "j", "qj", "cs")
    val codes = encode(cw1).select("vec_id", "s", "code")
    val dt = subv.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("s"), col("sq"))
      .join(broadcast(cw1), Seq("s"))
      .select(col("query_id"), col("cw_id"), col("s"),
        l2sq(col("sq"), col("cs")).as("d"))
    adcScan(codes, dt, codes("s") === dt("s") && codes("code") === dt("cw_id"), k)
  }

  /** Element-wise floor-mean over grouped positions — rows (keys…, pos,
    * v) → one array per key group, ordered by pos. floor(sum/n) keeps
    * the result in the exact BIGINT domain: sums stay below 2^53, so
    * the double division is exact to well below the 1/n gap to the
    * nearest integer and the floor is bit-portable across engines. The
    * ONE home of this idiom, shared by [[lloydStep]] (full-vector
    * centroids) and [[pqTopKLearned]] (per-subspace cells).
    */
  private def floorMeanVectors(rows: DataFrame, keys: Seq[String], posCol: String,
                               valCol: String, out: String): DataFrame =
    rows.groupBy((keys :+ posCol).map(col): _*)
      .agg(floor(sum(valCol).cast("double") / count(lit(1))).cast("bigint").as("fm"))
      .groupBy(keys.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col(posCol), col("fm")))),
        x => x.getField("fm")).as(out))

  /** [[pqQuant]] plus the D % m contract enforced row-side (assert_true
    * is null on success): the subspace slicing would otherwise silently
    * DROP the trailing D % m dimensions from every vector.
    */
  private def pqQuantChecked(embeddings: DataFrame, m: Int): DataFrame =
    pqQuant(embeddings).filter(assert_true((size(col("q")) % m) === 0,
      lit(s"PQ: vector dimensionality must be divisible by m=$m")).isNull)

  /** The m D/m-length slices of a BIGINT vector, in subspace order. */
  private def subVectors(a: Column, m: Int): Column = {
    val sub = (size(a) / lit(m)).cast("int")
    transform(sequence(lit(0), lit(m - 1)), s => slice(a, s * sub + 1, sub))
  }

  /** Shared ADC scan tail: corpus codes × broadcast distance tables on
    * the caller's join keys, self-exclusion, per-(query, vector) sum,
    * top-k by (adist asc, hit_id) — the tie-break and self-filter live
    * here ONCE for [[pqTopK]], [[pqTopKLearned]] and [[ivfpqSearchStored]].
    */
  private def adcScan(codes: DataFrame, dt: DataFrame, on: Column, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("hit_id"))
    codes.join(broadcast(dt), on)
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("d").as("adist"))
      .select(col("query_id"), col("vec_id").as("hit_id"), col("adist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Exact integer L2² between two equal-length BIGINT arrays — the
    * m=1 case of the native [[graft.functions.QSubL2]] expression (one
    * tight generated loop; an interpreted zip_with/aggregate chain here
    * measured 1.7× slower end-to-end on the IVF-PQ build, and this
    * sits inside the vectors × centroids assignment join).
    */
  private def l2sq(a: Column, b: Column): Column =
    element_at(graft.functions.QSubL2.subl2(a, b, 1), 1)

  /** Per-subspace L2² between two BIGINT vectors: the m-array of exact
    * sums over D/m-length slices — the PQ building block shared by
    * [[pqTopK]] (raw vectors) and [[ivfpqTopK]] (residuals). Native
    * [[graft.functions.QSubL2]]: the encode join is vectors ×
    * codewords, the PQ family's hottest loop.
    */
  private def subDists(a: Column, b: Column, m: Int): Column =
    graft.functions.QSubL2.subl2(a, b, m)

  /** IVF-PQ — the full billion-scale index shape, combining [[ivfTopK]]'s
    * coarse routing with [[pqTopK]]'s code compression the way Jégou et
    * al.'s original design does: vectors are assigned to their nearest
    * coarse centroid by exact integer L2² (tie → lowest id), and PQ
    * encodes each vector's RESIDUAL q − c (what's left after the coarse
    * quantizer explains the vector — residuals cluster far tighter than
    * raw vectors, which is why the real structure quantizes them). The
    * codewords are the `pqPred` seeds' own residuals. A query probes its
    * `nprobe` nearest coarse lists and builds one ADC table PER PROBED
    * LIST from its residual against THAT list's centroid; a corpus
    * vector is scored only if its list is probed, via m lookups + a sum.
    *
    * Scale shape: the scan reads m codes + a list id per vector — never
    * a raw vector; codebooks and ADC tables broadcast (coarse codebook
    * |C_coarse|·D longs, tables Q·nprobe·|C_pq|·m rows); the only
    * corpus-sized exchanges are the two argmin aggregates of the encode
    * step, and routing cuts the scanned fraction to ~nprobe/|C_coarse|.
    * All arithmetic exact BIGINT (residuals ≤ 2e6 per component, so a
    * 64-dim adist ≤ ~1e15 — inside both Long and DuckDB-exact range).
    * Output: (query_id, hit_id, adist, rnk); recall < 1 by construction
    * from BOTH routing (unprobed list) and code quantization.
    */
  def ivfpqTopK(embeddings: DataFrame, queryPred: Column, coarsePred: Column,
                pqPred: Column, m: Int, k: Int, nprobe: Int): DataFrame =
    ivfpqSearchStored(ivfpqIndex(embeddings, coarsePred, pqPred, m),
      embeddings, queryPred, coarsePred, pqPred, m, k, nprobe)

  /** The `keep` nearest coarse centroids per vector by exact integer L2²
    * (tie → lowest co_id), each with the vector's residual against that
    * centroid — keep=1 is IVF assignment, keep=nprobe is query probing.
    * Input (vec_id, q); output (vec_id, co_id, r).
    */
  private def coarseResiduals(vecs: DataFrame, coarse: DataFrame, keep: Int): DataFrame =
    probeResiduals(vecs, coarse, keep)
      .select(col("vec_id"), col("co_id"), col("r"))

  /** [[coarseResiduals]] keeping the probe rank `crnk` — the one-pass
    * ladder ([[ladderCountsSides]]) scans at the TOP rung once and derives
    * every smaller rung's candidate set by filtering on this rank, so
    * the rank must survive the projection.
    */
  private def probeResiduals(vecs: DataFrame, coarse: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cd").asc, col("co_id"))
    vecs.join(broadcast(coarse), lit(true)) // × coarse codebook BY DESIGN
      .withColumn("cd", l2sq(col("q"), col("c")))
      .withColumn("crnk", row_number().over(w)).filter(col("crnk") <= keep)
      .select(col("vec_id"), col("co_id"), col("crnk"),
        zip_with(col("q"), col("c"), (a, b) => a - b).as("r"))
  }

  private def pqQuant(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))

  private def coarseBook(corpus: DataFrame, coarsePred: Column): DataFrame =
    corpus.filter(coarsePred).select(col("vec_id").as("co_id"), col("q").as("c"))

  /** PQ codewords: the `pqPred` seeds' residuals under their own coarse
    * assignment — seed-sized work, re-derived at search time rather than
    * stored (the corpus-sized artifact is the code table, not this).
    */
  private def pqCodewords(corpus: DataFrame, coarse: DataFrame,
                          pqPred: Column): DataFrame =
    coarseResiduals(corpus.filter(pqPred), coarse, 1)
      .select(col("vec_id").as("cw_id"), col("r").as("rc"))

  /** Per-subspace ADC terms: residual rows × broadcast codebook →
    * (idOut, co_id, cw_id, s, d) with d the exact sub-L2².
    */
  private def adcScores(res: DataFrame, cw: DataFrame, m: Int,
                        idOut: String): DataFrame =
    res.join(broadcast(cw), lit(true)) // × PQ codebook BY DESIGN
      .select(col("vec_id").as(idOut), col("co_id"), col("cw_id"),
        posexplode(subDists(col("r"), col("rc"), m)).as(Seq("s", "d")))

  /** IVF-PQ index BUILD — the corpus-sized artifact a production
    * pipeline materializes once (the [[embeddingStore]] /
    * signature-store pattern): one row per vector, `(vec_id, co_id,
    * codes)` where `codes[s]` is the nearest codeword for subspace s
    * (tie → lowest cw_id). Everything is integral, so the table
    * survives a parquet round trip exactly (spec-pinned); at 100 TB
    * this is the only thing the search scan ever reads — m longs +
    * a list id per vector instead of 4·D raw bytes.
    */
  def ivfpqIndex(embeddings: DataFrame, coarsePred: Column, pqPred: Column,
                 m: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    pqEncode(corpus, coarse, pqCodewords(corpus, coarse, pqPred), m)
  }

  /** Incremental [[ivfpqIndex]] maintenance — the ingestion path: a new
    * batch encodes against the EXISTING codebooks (derived, as at build
    * time, from the seed vectors `coarsePred`/`pqPred` select in
    * `embeddings` — BOTH predicates must be batch-stable for exactness)
    * and appends; the stored corpus is never re-encoded. Because
    * encoding is per-vector given fixed codebooks, append(index(old),
    * batch) == index(old ∪ batch) exactly under that stability
    * (spec-pinned) — so nightly ingestion costs O(batch · codebooks),
    * not O(corpus). IDEMPOTENT: already-indexed vec_ids are anti-joined
    * out of the batch before encoding — a duplicate index row would
    * otherwise silently DOUBLE that vector's ADC sums in
    * [[ivfpqSearchStored]] (2m joined terms) and demote it from every
    * top-k; skipping makes a retried or overlapping ingestion converge
    * instead (one churn-sized anti-join per append — use a Bloom
    * pre-filter on vec_id if the index outgrows a comfortable shuffle).
    */
  def ivfpqIndexAppend(index: DataFrame, embeddings: DataFrame,
                       batch: DataFrame, coarsePred: Column, pqPred: Column,
                       m: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val cw = pqCodewords(corpus, coarse, pqPred)
    val fresh = pqQuantChecked(batch, m)
      .join(index.select("vec_id"), Seq("vec_id"), "left_anti")
    index.unionByName(pqEncode(fresh, coarse, cw, m))
  }

  /** Per-list occupancy of a stored IVF(-PQ) index — (co_id, cnt).
    * The list sizes ARE the index's health signal: the fullest list
    * bounds every probe's scan cost, and drift concentrates new
    * arrivals into few lists when the frozen centroids stop covering
    * the corpus. Deriving this relation here is a full index scan
    * (corpus-sized at 100 TB) — the CDC consumer
    * [[graft.streaming.StreamingOps.changeFeedAnnIndexCensus]]
    * maintains the same relation incrementally at churn cost (the
    * table itself is nlist-sized — code-sized, not corpus-sized).
    */
  def indexListCounts(index: DataFrame): DataFrame =
    index.groupBy("co_id").agg(count(lit(1)).as("cnt"))

  /** One-row balance report over an IVF index's per-list occupancy —
    * the REBUILD DECISION for a CDC-maintained index: arrivals encode
    * against FROZEN centroids ([[ivfpqIndexAppend]]'s batch-stability
    * contract), so corpus drift shows up as list imbalance long before
    * it shows up as recall loss on stale ground truth. All columns are
    * integral (basis points via integer division) so the relation is
    * hash-gateable: `max_frac_bp` = fullest list's share of the corpus,
    * `imbalance_bp` = fullest list vs the perfectly balanced share
    * (10000 = exactly balanced; NULL on an empty index, matching the
    * oracle's `//` semantics), `rebuild_recommended` flags
    * `imbalance_bp > imbalanceThresholdBp`. `nlist` is the CONFIGURED
    * list count (the coarse book's size — lists with zero members must
    * count as empty, which the occupancy relation alone cannot see).
    * The bp products stay in Long range while max_list · nlist <
    * ~9·10^14 — at larger scales pass pre-scaled counts.
    */
  def indexBalanceReport(listCounts: DataFrame, nlist: Long,
                         imbalanceThresholdBp: Long): DataFrame = {
    require(nlist > 0, "nlist must be positive (the configured list count)")
    listCounts.agg(
        count(lit(1)).as("n_lists_used"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_vectors"),
        coalesce(max(col("cnt")), lit(0L)).as("max_list"))
      .select(
        lit(nlist).as("n_lists"),
        col("n_lists_used"),
        (lit(nlist) - col("n_lists_used")).as("n_lists_empty"),
        col("n_vectors"),
        col("max_list"),
        expr("CASE WHEN n_vectors > 0 THEN (10000 * max_list) div n_vectors END")
          .as("max_frac_bp"),
        expr(s"CASE WHEN n_vectors > 0 THEN (10000 * max_list * ${nlist}L) div n_vectors END")
          .as("imbalance_bp"),
        expr(s"CASE WHEN n_vectors > 0 THEN (10000 * max_list * ${nlist}L) div n_vectors > ${imbalanceThresholdBp}L END")
          .as("rebuild_recommended"))
  }

  /** Encode quantized vectors against fixed (coarse, PQ) codebooks →
    * (vec_id, co_id, codes). Per-subspace argmin as m min(struct)
    * aggregates in ONE groupBy at (vector × codeword) grain — no
    * explode to the ×m grain, so the encode shuffle carries N·|C_pq|
    * rows once instead of N·|C_pq|·m through two exchanges (tie →
    * lowest cw_id, as everywhere). Shared by the full build and the
    * incremental append.
    */
  private def pqEncode(vecs: DataFrame, coarse: DataFrame, cw: DataFrame,
                       m: Int): DataFrame = {
    val aggs = (0 until m).map(s =>
      min(struct(element_at(col("ds"), s + 1), col("cw_id")))
        .getField("cw_id").as(s"c$s"))
    coarseResiduals(vecs, coarse, 1)
      .join(broadcast(cw), lit(true)) // × PQ codebook BY DESIGN
      .select(col("vec_id"), col("co_id"), col("cw_id"),
        subDists(col("r"), col("rc"), m).as("ds"))
      .groupBy("vec_id", "co_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), col("co_id"),
        array((0 until m).map(s => col(s"c$s")): _*).as("codes"))
  }

  /** IVF-PQ search over a stored [[ivfpqIndex]] — the repeat-query
    * path: codebooks re-derive from the seed vectors (seed-sized),
    * queries probe their `nprobe` nearest lists with one ADC table per
    * probed list (query residual against THAT list's centroid), and
    * the corpus-side scan reads only the code table. [[ivfpqTopK]] is
    * exactly build-then-search, so the driver oracle covers this whole
    * path. Output: (query_id, hit_id, adist, rnk).
    */
  def ivfpqSearchStored(index: DataFrame, embeddings: DataFrame,
                        queryPred: Column, coarsePred: Column, pqPred: Column,
                        m: Int, k: Int, nprobe: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val cw = pqCodewords(corpus, coarse, pqPred)
    val dt = adcScores(
      coarseResiduals(corpus.filter(queryPred), coarse, nprobe), cw, m, "query_id")
    // m-mismatch guard: an index built with a DIFFERENT m would join
    // only the overlapping subspaces and return silently-wrong
    // distances — assert the stored code width row-side (streams with
    // the scan; assert_true is null on success, so the filter keeps
    // every valid row and the first bad row fails the job loudly)
    val codes = index
      .filter(assert_true(size(col("codes")) === lit(m),
        lit(s"ivfpqSearchStored: stored index code width != m=$m")).isNull)
      .select(col("vec_id"), col("co_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
    adcScan(codes, dt,
      codes("co_id") === dt("co_id") && codes("s") === dt("s") &&
        codes("code") === dt("cw_id"), k)
  }

  /** LEARNED per-subspace residual codebooks for IVF-PQ — the
    * production-knob codebook the seed-residual [[pqCodewords]]
    * approximates (the fixture codebook reuses whole seed residuals
    * across all subspaces; real deployments train each subspace's
    * cells on the residual distribution). `seedPred` residual
    * subvectors seed the cells (size the predicate for ~256 cells per
    * subspace — the classic 8-bit PQ code), then ONE floor-mean Lloyd
    * refinement over the FULL corpus residuals ([[pqTopKLearned]]'s
    * exact-BIGINT idiom, per (cell, subspace)). Output CELL-GRANULAR:
    * (cw_id, s, cs) with cs a D/m-length BIGINT subvector.
    *
    * Scale shape: the refinement is one corpus-residual pass — a
    * broadcast join against the seed cells and two aggregations at
    * N·m grain; the result is codebook-sized. Callers that reference
    * the codebook more than once (index build + search) should
    * materialize it ([[ivfpqTopKLearnedCw]] checkpoints it) rather
    * than re-train per reference.
    */
  def ivfpqLearnedCodebooks(embeddings: DataFrame, coarsePred: Column,
                            seedPred: Column, m: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    learnedCodebooksFromRes(coarseResiduals(corpus, coarse, 1), seedPred, m)
  }

  /** [[ivfpqLearnedCodebooks]] from an already-derived residual frame
    * (vec_id, co_id, r) — lets a build share ONE coarse-assignment
    * pass between training and encode ([[sharedResiduals]]).
    */
  private def learnedCodebooksFromRes(resid: DataFrame, seedPred: Column,
                                      m: Int): DataFrame = {
    val res = resid
      .select(col("vec_id"),
        posexplode(subVectors(col("r"), m)).as(Seq("s", "rs")))
    val cw0 = res.filter(seedPred)
      .select(col("vec_id").as("cw_id"), col("s"), col("rs").as("cs"))
    // assign every corpus residual subvector to its nearest seed cell
    // (tie → lowest cw_id), then refine each cell to the floor-mean of
    // its members — rs is constant within the (vec_id, s) group, so
    // first() carries it without a corpus-sized re-join
    val assigned = res.join(broadcast(cw0), Seq("s"))
      .withColumn("d", l2sq(col("rs"), col("cs")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("cw_id"))).getField("cw_id").as("cw_id"),
        first(col("rs")).as("rs"))
    floorMeanVectors(
      assigned.select(col("cw_id"), col("s"),
        posexplode(col("rs")).as(Seq("j", "vj"))),
      Seq("cw_id", "s"), "j", "vj", "cs")
  }

  /** [[ivfpqIndex]] against a LEARNED cell-granular codebook
    * ((cw_id, s, cs) — [[ivfpqLearnedCodebooks]]): same (vec_id, co_id,
    * codes) artifact, with `codes[s]` the argmin over subspace s's OWN
    * cells. Encode cost is the canonical N·|C|·D multiply count; the
    * only corpus-sized exchanges are the coarse argmin and the
    * per-subspace argmin at N·m grain.
    */
  def ivfpqIndexLearned(embeddings: DataFrame, coarsePred: Column,
                        cw: DataFrame, m: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    indexLearnedFromRes(coarseResiduals(corpus, coarse, 1), cw, m)
  }

  /** [[ivfpqIndexLearned]] from an already-derived residual frame —
    * the encode half of the shared-assignment build.
    */
  private def indexLearnedFromRes(resid: DataFrame, cw: DataFrame,
                                  m: Int): DataFrame = {
    val sub = resid
      .select(col("vec_id"), col("co_id"),
        posexplode(subVectors(col("r"), m)).as(Seq("s", "rs")))
    sub.join(broadcast(cw), Seq("s"))
      .withColumn("d", l2sq(col("rs"), col("cs")))
      .groupBy("vec_id", "co_id", "s")
      .agg(min(struct(col("d"), col("cw_id"))).getField("cw_id").as("code"))
      .groupBy("vec_id", "co_id")
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))
  }

  /** [[ivfpqSearchStored]] against a LEARNED cell-granular codebook:
    * queries probe their `nprobe` nearest lists, one ADC table per
    * probed list built from the query residual against THAT list's
    * centroid, distances from subspace s's own cells. The corpus-side
    * scan still reads only the code table.
    */
  def ivfpqSearchStoredLearned(index: DataFrame, embeddings: DataFrame,
                               queryPred: Column, coarsePred: Column,
                               cw: DataFrame, m: Int, k: Int,
                               nprobe: Int): DataFrame = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val qsub = coarseResiduals(corpus.filter(queryPred), coarse, nprobe)
      .select(col("vec_id").as("query_id"), col("co_id"),
        posexplode(subVectors(col("r"), m)).as(Seq("s", "rs")))
    val dt = qsub.join(broadcast(cw), Seq("s"))
      .select(col("query_id"), col("co_id"), col("cw_id"), col("s"),
        l2sq(col("rs"), col("cs")).as("d"))
    val codes = index
      .filter(assert_true(size(col("codes")) === lit(m),
        lit(s"ivfpqSearchStoredLearned: stored index code width != m=$m")).isNull)
      .select(col("vec_id"), col("co_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
    adcScan(codes, dt,
      codes("co_id") === dt("co_id") && codes("s") === dt("s") &&
        codes("code") === dt("cw_id"), k)
  }

  /** IVF-PQ at PRODUCTION knobs, build-then-search: learned
    * per-subspace codebooks ([[ivfpqLearnedCodebooks]] — checkpointed
    * once, referenced by both encode and search), coarse routing, ADC
    * scan. Pair with [[exactRerank]] via [[ivfpqTopKLearnedReranked]]
    * for the full production quality stack.
    */
  def ivfpqTopKLearnedCw(embeddings: DataFrame, queryPred: Column,
                         coarsePred: Column, seedPred: Column, m: Int,
                         k: Int, nprobe: Int): DataFrame = {
    // codebook-sized; materialized so the index build and the search
    // side don't each re-run the corpus-sized training pass — and both
    // the training and the encode read ONE checkpointed coarse
    // assignment ([[sharedResiduals]]) instead of re-running the
    // N·|C_coarse| argmin each
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val resid = sharedResiduals(corpus, coarse)
    val cw = learnedCodebooksFromRes(resid, seedPred, m).localCheckpoint()
    ivfpqSearchStoredLearned(
      indexLearnedFromRes(resid, cw, m),
      embeddings, queryPred, coarsePred, cw, m, k, nprobe)
  }

  /** [[ivfpqTopKLearnedCw]] with the exact re-rank tail — the complete
    * production recipe: learned codebooks, `k·overscan` ADC
    * candidates, exact integer L2² re-rank to k.
    */
  def ivfpqTopKLearnedReranked(embeddings: DataFrame, queryPred: Column,
                               coarsePred: Column, seedPred: Column, m: Int,
                               k: Int, nprobe: Int,
                               overscan: Int = 4): DataFrame =
    exactRerank(embeddings,
      ivfpqTopKLearnedCw(embeddings, queryPred, coarsePred, seedPred, m,
        k * overscan, nprobe),
      k)

  /** Brute-force EXACT integer L2² top-k — the ground truth the
    * PQ/IVF-PQ family approximates (same ×1e6 quantized domain, same
    * (dist asc, hit_id) tie-break as [[adcScan]]), used as the
    * denominator of [[annRecallReport]] and as the oracle shape of the
    * re-ranked search. O(Q·N) by design: queries broadcast, the corpus
    * is scanned once, only scalar distances cross the top-k exchange.
    * Output: (query_id, hit_id, dist, rnk).
    */
  def bruteForceTopKL2(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = pqQuant(embeddings)
    val queries = pqQuant(embeddings.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("hit_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        l2sq(col("qq"), col("q")).as("dist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** EXACT top-c RE-RANK — the quality stage every production PQ
    * pipeline runs after the ADC scan: the approximate candidates
    * (`cand`: (query_id, hit_id), c per query) are re-scored with the
    * EXACT integer L2² between the raw quantized vectors and re-ranked
    * to top-k by (dist asc, hit_id). ADC error can only reorder WITHIN
    * the candidate set, so the re-rank recovers every true neighbor the
    * routing+coding stage surfaced at all — recall@k of the re-ranked
    * result is ≥ the plain ADC ranking's (spec-pinned, and measured in
    * the nprobe curve of SCALING_r10).
    *
    * Scale shape: candidates are Q·c rows — they BROADCAST; the corpus
    * is scanned twice (hit vectors, query vectors) with a broadcast
    * hash join each, never shuffled, and only candidate-sized rows
    * carry raw vectors into the distance projection. c≈4k per query
    * costs ~c native [[graft.functions.QSubL2]] kernels per query —
    * negligible next to the code scan it corrects.
    * Output: (query_id, hit_id, dist, rnk).
    */
  def exactRerank(embeddings: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val corpus = pqQuant(embeddings)
    val c = cand.select("query_id", "hit_id")
    val hits = corpus.join(broadcast(c), col("vec_id") === col("hit_id"))
      .select(col("query_id"), col("hit_id"), col("q").as("hq"))
    val queries = corpus.join(
        broadcast(c.select("query_id").distinct()),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("q").as("qq"))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("hit_id"))
    hits.join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("hit_id"), l2sq(col("qq"), col("hq")).as("dist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** [[ivfpqTopK]] with an exact re-rank tail: the ADC scan keeps
    * `k·overscan` candidates per query, [[exactRerank]] re-scores them
    * with exact integer L2² and keeps k. The distances in the output
    * are EXACT (not ADC-approximate) — so a true neighbor demoted by
    * code quantization inside the candidate set is restored to its
    * real position. Output: (query_id, hit_id, dist, rnk).
    */
  def ivfpqTopKReranked(embeddings: DataFrame, queryPred: Column,
                        coarsePred: Column, pqPred: Column, m: Int, k: Int,
                        nprobe: Int, overscan: Int = 4): DataFrame =
    exactRerank(embeddings,
      ivfpqTopK(embeddings, queryPred, coarsePred, pqPred, m, k * overscan, nprobe),
      k)

  /** RECALL-vs-nprobe LADDER at the production knobs (learned
    * per-subspace codebooks, ADC scan, exact re-rank): micro-averaged
    * recall@k in exact basis points for each ladder rung, measured on
    * the `samplePred` queries against the exact integer-L2² ground
    * truth. The r12 SCALING table, institutionalized: codebooks and
    * index are built ONCE (checkpointed — codebook-sized artifacts)
    * and every rung re-searches the stored codes, so the ladder costs
    * |ladder| probe/scan passes plus one brute-force pass over the
    * SAMPLE only. At 100 TB the sample is the lever: ground truth is
    * O(|sample|·N) reading int8-quantized vectors, everything else is
    * code-sized. Output: (nprobe, n_exact, n_found, recall_bp),
    * recall_bp = (10000 · Σfound) div (Σexact) — integral, so gates
    * built on this never compare floats.
    */
  def nprobeRecallLadder(embeddings: DataFrame, samplePred: Column,
                         coarsePred: Column, seedPred: Column, m: Int,
                         k: Int, ladder: Seq[Int] = Seq(1, 2, 4),
                         overscan: Int = 4): DataFrame = {
    val (cw, idx) = learnedBuild(embeddings, coarsePred, seedPred, m)
    ladderRecalls(embeddings, samplePred, coarsePred, cw, idx, m, k, ladder,
      overscan)
  }

  /** The corpus residual frame (vec_id, co_id, r) built over a
    * CHECKPOINTED narrow assignment (r15): codebook training and index
    * encoding both need every vector's coarse assignment + residual,
    * and computing it per consumer repeats the N·|C_coarse| argmin —
    * the single most expensive term of a learned build. One argmin
    * pass materializes only (vec_id, co_id) — two longs per vector,
    * never the D-long residual — and each consumer re-derives r with a
    * broadcast join + subtract (linear, no argmin). Row-identical to
    * [[coarseResiduals]](corpus, coarse, 1): both joins are 1:1 (the
    * assignment is unique per vec_id, the coarse book unique per
    * co_id).
    */
  private def sharedResiduals(corpus: DataFrame,
                              coarse: DataFrame): DataFrame = {
    val assign = coarseResiduals(corpus, coarse, 1)
      .select("vec_id", "co_id").localCheckpoint()
    assign.join(corpus, Seq("vec_id"))
      .join(broadcast(coarse), Seq("co_id"))
      .select(col("vec_id"), col("co_id"),
        zip_with(col("q"), col("c"), (a, b) => a - b).as("r"))
  }

  /** The shared build: learned codebooks + stored codes, checkpointed
    * (both are codebook/code-sized artifacts referenced by every rung),
    * with training and encode fed from ONE coarse-assignment pass
    * ([[sharedResiduals]]) instead of one each.
    */
  private def learnedBuild(embeddings: DataFrame, coarsePred: Column,
                           seedPred: Column, m: Int): (DataFrame, DataFrame) = {
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val resid = sharedResiduals(corpus, coarse)
    val cw = learnedCodebooksFromRes(resid, seedPred, m).localCheckpoint()
    (cw, indexLearnedFromRes(resid, cw, m).localCheckpoint())
  }

  /** PUBLIC form of [[learnedBuild]] — the (codebooks, index) artifact
    * pair a stored-index fixture persists. Bit-identical to calling
    * [[ivfpqLearnedCodebooks]] then [[ivfpqIndexLearned]] (the same
    * deterministic operators over the same residuals), at one coarse
    * argmin pass instead of two.
    */
  def ivfpqLearnedArtifacts(embeddings: DataFrame, coarsePred: Column,
                            seedPred: Column, m: Int): (DataFrame, DataFrame) =
    learnedBuild(embeddings, coarsePred, seedPred, m)

  private def ladderRecalls(embeddings: DataFrame, pred: Column,
                            coarsePred: Column, cw: DataFrame, idx: DataFrame,
                            m: Int, k: Int, ladder: Seq[Int],
                            overscan: Int): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.distinct.sorted,
      "nprobe ladder must be ascending and duplicate-free")
    val counts = ladderCountsSides(embeddings, Seq("q" -> pred), coarsePred,
      cw, idx, m, k, ladder, overscan)("q")
    localLadder(embeddings, counts)
  }

  /** [[bruteForceTopKL2]] for SEVERAL query sets in one corpus scan —
    * each set tagged with its side label, the top-k window keyed per
    * (side, query) so every side's rows equal its own single-set brute
    * force exactly (same join, same tie-break `(dist asc, hit_id)`,
    * same self-exclusion). One pass over the corpus replaces one per
    * query set. Output: (side, query_id, hit_id, dist, rnk).
    */
  private def bruteForceTopKL2Sides(embeddings: DataFrame,
                                    sides: Seq[(String, Column)],
                                    k: Int): DataFrame = {
    val corpus = pqQuant(embeddings)
    val queries = sides.map { case (tag, p) =>
      pqQuant(embeddings.filter(p))
        .select(lit(tag).as("side"), col("vec_id").as("query_id"),
          col("q").as("qq"))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy("side", "query_id")
      .orderBy(col("dist").asc, col("hit_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("side"), col("query_id"), col("vec_id").as("hit_id"),
        l2sq(col("qq"), col("q")).as("dist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** ONE-PASS ladder evaluation — every rung's (n_exact, n_found)
    * from a single search scan (optimization guide §2.4/§1.2: remove
    * passes, not tune them). The previous shape evaluated |ladder|
    * independent search→rerank→report chains (unioned into one action
    * for exchange reuse) — still |ladder| code scans and ~10 stages per
    * rung, >100 AQE stage-jobs per autotune entry, measured as pure
    * scheduling overhead on small corpora and |ladder| corpus passes at
    * scale. Key fact the optimizer cannot see: the rung-np candidate
    * set is exactly the rows of the top-rung scan whose probed list
    * ranks ≤ np. So: probe-rank once at max(ladder) (keeping `crnk`),
    * ADC-score once, then per rung filter `crnk ≤ rung`, top-`k·overscan`
    * per (rung, query) in one window, exact-rerank all rungs in one
    * candidate-sized pass, and count found∩exact per rung in one
    * aggregate. Identical output to the per-rung chains (same probe
    * ranking/window, same tie-breaks, same self-exclusion, same
    * left-join count semantics — spec-pinned); the corpus-sized work —
    * the code scan and the two rerank corpus joins — now happens once
    * per ladder instead of once per rung.
    */
  /** The one-pass ladder, generalized to SEVERAL query sets in one pass
    * (r15, verdict item 8): an autotune report evaluates the same
    * ladder over its sample AND its eval queries — two tagged query
    * sets over the same stored artifacts. Running them as one tagged
    * pass halves every corpus-sized term of the report: ONE ground
    * truth corpus scan ([[bruteForceTopKL2Sides]]) instead of one per
    * set, ONE code scan, ONE rerank corpus-join pair, and every count
    * — per-(side, rung) found counts AND per-side exact counts — in a
    * SINGLE collect action (the per-side exact totals ride along as
    * null-rung marker rows). Per side the output is bit-identical to
    * the single-set form: `side` is prepended to every window/group
    * key, so within a side all rankings, tie-breaks (`adist asc,
    * hit_id` / `dist asc, hit_id`), self-exclusion, and the left-semi
    * count semantics are untouched (spec-pinned via the public
    * autotune/search equivalences). Returns, per side, the ladder's
    * (rung, n_exact, n_found) rows in ladder order.
    */
  private def ladderCountsSides(embeddings: DataFrame,
                                sides: Seq[(String, Column)],
                                coarsePred: Column, cw: DataFrame,
                                idx: DataFrame, m: Int, k: Int,
                                ladder: Seq[Int], overscan: Int)
      : Map[String, Seq[(Int, Long, Long)]] = {
    require(sides.map(_._1).distinct.length == sides.length,
      "side tags must be distinct")
    val kc = k * overscan
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val exact = bruteForceTopKL2Sides(embeddings, sides, k)
      .select("side", "query_id", "hit_id").cache()
    try {
      // probe-rank each tagged query set at the TOP rung (rank window
      // per (side, query)), keeping `crnk` for the rung derivation
      val wq = Window.partitionBy("side", "vec_id")
        .orderBy(col("cd").asc, col("co_id"))
      val tagged = sides.map { case (tag, p) =>
        corpus.filter(p).withColumn("side", lit(tag)) }
        .reduce(_.unionByName(_))
      val qsub = tagged.join(broadcast(coarse), lit(true)) // × coarse book BY DESIGN
        .withColumn("cd", l2sq(col("q"), col("c")))
        .withColumn("crnk", row_number().over(wq))
        .filter(col("crnk") <= ladder.max)
        .select(col("side"), col("vec_id").as("query_id"), col("co_id"),
          col("crnk"),
          posexplode(subVectors(zip_with(col("q"), col("c"),
            (a, b) => a - b), m)).as(Seq("s", "rs")))
      val dt = qsub.join(broadcast(cw), Seq("s"))
        .select(col("side"), col("query_id"), col("co_id"), col("crnk"),
          col("cw_id"), col("s"), l2sq(col("rs"), col("cs")).as("d"))
      val codes = idx
        .filter(assert_true(size(col("codes")) === lit(m),
          lit(s"ladderCountsSides: stored index code width != m=$m")).isNull)
        .select(col("vec_id"), col("co_id"),
          posexplode(col("codes")).as(Seq("s", "code")))
      // every row of a (side, query, vec) group shares the vector's
      // single co_id, so crnk is group-constant and min() carries it
      val scored = codes.join(broadcast(dt),
          codes("co_id") === dt("co_id") && codes("s") === dt("s") &&
            codes("code") === dt("cw_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("side"), col("query_id"), col("vec_id"))
        .agg(sum("d").as("adist"), min("crnk").as("cr"))
      val rungArr = array(ladder.map(lit): _*)
      val cand = scored
        .select(col("side"), col("query_id"), col("vec_id").as("hit_id"),
          col("adist"),
          explode(filter(rungArr, r => r >= col("cr"))).as("nprobe"))
        .withColumn("rnk", row_number().over(Window
          .partitionBy("side", "nprobe", "query_id")
          .orderBy(col("adist").asc, col("hit_id"))))
        .filter(col("rnk") <= kc)
        .select("side", "nprobe", "query_id", "hit_id")
      // exact re-rank, rung-aware — candidate-sized exactly like
      // exactRerank, with (side, rung) in the window key
      val hits = corpus.join(broadcast(cand), col("vec_id") === col("hit_id"))
        .select(col("side"), col("nprobe"), col("query_id"), col("hit_id"),
          col("q").as("hq"))
      val queries = corpus.join(
          broadcast(cand.select("side", "query_id").distinct()),
          col("vec_id") === col("query_id"))
        .select(col("side"), col("query_id"), col("q").as("qq"))
      val w = Window.partitionBy("side", "nprobe", "query_id")
        .orderBy(col("dist").asc, col("hit_id"))
      val found = hits.join(broadcast(queries), Seq("side", "query_id"))
        .select(col("side"), col("nprobe"), col("query_id"), col("hit_id"),
          l2sq(col("qq"), col("hq")).as("dist"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      // ONE action: |found ∩ exact| per (side, rung) — the left-join /
      // count semantics of annRecallReport, aggregated — unioned with
      // the per-side exact totals as null-rung marker rows
      val foundCnt = found
        .join(exact, Seq("side", "query_id", "hit_id"), "left_semi")
        .groupBy("side", "nprobe").agg(count(lit(1)).as("n"))
      val exactCnt = exact.groupBy("side").agg(count(lit(1)).as("n"))
        .select(col("side"), lit(null).cast("int").as("nprobe"), col("n"))
      val counted = foundCnt.select("side", "nprobe", "n")
        .unionByName(exactCnt)
      // plan evidence hook (costs nothing unless set): the ladder's
      // whole cost is THIS one action — the final report relation is
      // driver-local, so its explain() can't show the one-pass shape
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_LADDER"))
        System.err.println("[ladderCountsSides plan]\n" +
          counted.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      val rows = counted.collect()
      val foundBy = rows.filter(!_.isNullAt(1))
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val nExact = rows.filter(_.isNullAt(1))
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      sides.map { case (tag, _) =>
        tag -> ladder.map(np =>
          (np, nExact.getOrElse(tag, 0L), foundBy.getOrElse((tag, np), 0L)))
      }.toMap
    } finally exact.unpersist()
  }

  /** The collected rung counts as a local relation with the integral
    * recall column — driver-sized, so the decision tail's joins and
    * aggregates never touch the cluster again.
    */
  private def localLadder(embeddings: DataFrame,
                          counts: Seq[(Int, Long, Long)]): DataFrame = {
    val sp = embeddings.sparkSession
    import sp.implicits._
    counts.toDF("nprobe", "n_exact", "n_found")
      .select(col("nprobe"), col("n_exact"), col("n_found"),
        expr("CASE WHEN n_exact > 0 THEN (10000 * n_found) div n_exact END")
          .as("recall_bp"))
  }

  /** The AUTOTUNE DECISION as a relation — the gate-able artifact
    * behind [[searchWithRecallTarget]]: one row per ladder rung with
    * the measured sample recall, a `chosen` flag on the rung the
    * target picks (smallest rung with sample recall ≥ `targetBp`, top
    * rung as the fallback), and — on the chosen rung only — the
    * recall the choice ACHIEVES on the disjoint `evalPred` queries
    * (the honest number: the tuner never saw them). Build runs once;
    * both ladders search the same stored codes.
    */
  def autotuneReport(embeddings: DataFrame, samplePred: Column,
                     evalPred: Column, coarsePred: Column, seedPred: Column,
                     m: Int, k: Int, targetBp: Int,
                     ladder: Seq[Int] = Seq(1, 2, 4),
                     overscan: Int = 4): DataFrame = {
    // LAZY build (r15): the report's single counting action reads the
    // index and the distance-table side once each, so eagerly
    // materializing (assign, cw, idx) as three blocking
    // localCheckpoints only adds scheduling barriers. persist() makes
    // the shared subtrees (assignment argmin, codebook training)
    // compute ONCE inside that one action; everything is deterministic
    // (exact integer argmin/floor-mean), so eviction-recompute is
    // value-identical. Released after the eager ladder returns — the
    // report relation itself is driver-local.
    val corpus = pqQuantChecked(embeddings, m)
    val coarse = coarseBook(corpus, coarsePred)
    val assign = coarseResiduals(corpus, coarse, 1)
      .select("vec_id", "co_id").persist()
    val resid = assign.join(corpus, Seq("vec_id"))
      .join(broadcast(coarse), Seq("co_id"))
      .select(col("vec_id"), col("co_id"),
        zip_with(col("q"), col("c"), (a, b) => a - b).as("r"))
    val cw = learnedCodebooksFromRes(resid, seedPred, m).persist()
    try
      autotuneOverStored(embeddings, indexLearnedFromRes(resid, cw, m), cw,
        samplePred, evalPred, coarsePred, m, k, targetBp, ladder, overscan)
    finally { assign.unpersist(); cw.unpersist() }
  }

  /** [[autotuneReport]] over a STORED index (r13 verdict item 4): takes
    * the persisted `(idx, cw)` artifacts — e.g. the index a
    * [[graft.streaming.StreamingOps.changeFeedAnnIndex]] consumer
    * maintains — instead of rebuilding codebooks per call, and
    * expresses the ladder as FRACTIONS OF NLIST in basis points
    * (`nprobe = max(1, (nlist · frac) div 10000)`, deduplicated): an
    * absolute `Seq(1, 2, 4)` cannot mean "probe 1% of lists" once
    * nlist grows with the corpus, while a fraction ladder keeps the
    * scan-fraction semantics at every scale. nlist derives from
    * `coarsePred` (the stored coarse book's defining predicate — one
    * count, never a corpus scan). Output and decision semantics are
    * [[autotuneReport]]'s exactly, including `target_met`.
    */
  def autotuneReportStored(embeddings: DataFrame, idx: DataFrame,
                           cw: DataFrame, samplePred: Column,
                           evalPred: Column, coarsePred: Column, m: Int,
                           k: Int, targetBp: Int,
                           ladderFracBp: Seq[Int] = Seq(1250, 2500, 5000),
                           overscan: Int = 4): DataFrame = {
    require(ladderFracBp.nonEmpty &&
        ladderFracBp == ladderFracBp.distinct.sorted &&
        ladderFracBp.forall(f => f > 0 && f <= 10000),
      "ladder fractions must be ascending, duplicate-free, in (0, 10000] bp")
    val nlist = embeddings.filter(coarsePred).count()
    require(nlist > 0, "coarsePred selects no centroid — empty coarse book")
    val ladder = ladderFracBp
      .map(f => math.max(1L, nlist * f / 10000).toInt).distinct
    autotuneOverStored(embeddings, idx, cw, samplePred, evalPred, coarsePred,
      m, k, targetBp, ladder, overscan)
  }

  /** Shared autotune tail: sample + eval ladders over the stored
    * artifacts, then the relational decision — `chosen` flags the
    * smallest rung whose SAMPLE recall meets `targetBp` (top rung as
    * the fallback), `eval_recall_bp` is surfaced on the chosen rung
    * only, and `target_met` (constant per relation) says whether any
    * rung qualified: the fallback is no longer silent — a user asking
    * 90% recall from an index that can give 15% reads FALSE here
    * (r13 verdict item 6).
    */
  private def autotuneOverStored(embeddings: DataFrame, idx: DataFrame,
                                 cw: DataFrame, samplePred: Column,
                                 evalPred: Column, coarsePred: Column,
                                 m: Int, k: Int, targetBp: Int,
                                 ladder: Seq[Int], overscan: Int): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.distinct.sorted,
      "nprobe ladder must be ascending and duplicate-free")
    // BOTH query sets ride ONE tagged one-pass ladder
    // ([[ladderCountsSides]], r15): one ground-truth scan, one code
    // scan, one rerank, one collect — for the whole report, regardless
    // of ladder length or query-set count
    val counts = ladderCountsSides(embeddings,
      Seq("s" -> samplePred, "e" -> evalPred), coarsePred, cw, idx,
      m, k, ladder, overscan)
    val sample = localLadder(embeddings, counts("s"))
    val eval = localLadder(embeddings, counts("e"))
      .select(col("nprobe"), col("recall_bp").as("eval_recall_bp"))
    val pick = sample.agg(
        min(when(col("recall_bp") >= targetBp, col("nprobe"))).as("qual"),
        max(col("nprobe")).as("top"))
      .select(coalesce(col("qual"), col("top")).as("chosen_np"),
        col("qual").isNotNull.as("target_met"))
    sample.crossJoin(broadcast(pick))
      .join(eval, Seq("nprobe"))
      .select(col("nprobe"), col("n_exact"), col("n_found"),
        col("recall_bp").as("sample_recall_bp"),
        (col("nprobe") === col("chosen_np")).as("chosen"),
        when(col("nprobe") === col("chosen_np"), col("eval_recall_bp"))
          .as("eval_recall_bp"),
        col("target_met"))
  }

  /** SEARCH AT A RECALL TARGET — the production ask is "give me ≥95%
    * recall", not "nprobe = 8": measure recall@k on the held-out
    * `samplePred` queries rung by rung up the ladder (early-stopping at
    * the first rung that meets `targetBp`; the build is shared across
    * rungs), then run the real `queryPred` search at the chosen rung.
    * Falls back to the ladder's TOP rung when no rung meets the target
    * (the caller asked for more recall than the index can give — the
    * honest move is max effort, not silent failure, and the constant
    * `target_met` output column says OUT LOUD which case this was).
    * Output: the re-ranked top-k (query_id, hit_id, dist, rnk) plus
    * the constant (nprobe, sample_recall_bp, target_met) columns
    * documenting the choice.
    */
  def searchWithRecallTarget(embeddings: DataFrame, queryPred: Column,
                             samplePred: Column, coarsePred: Column,
                             seedPred: Column, m: Int, k: Int, targetBp: Int,
                             ladder: Seq[Int] = Seq(1, 2, 4),
                             overscan: Int = 4): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.distinct.sorted,
      "nprobe ladder must be ascending and duplicate-free")
    val (cw, idx) = learnedBuild(embeddings, coarsePred, seedPred, m)
    val (chosen, achieved) = chooseRung(embeddings, idx, cw, samplePred,
      coarsePred, m, k, targetBp, ladder, overscan)
    exactRerank(embeddings,
        ivfpqSearchStoredLearned(idx, embeddings, queryPred, coarsePred,
          cw, m, k * overscan, chosen), k)
      .withColumn("nprobe", lit(chosen))
      .withColumn("sample_recall_bp", lit(achieved))
      .withColumn("target_met", lit(achieved >= targetBp))
  }

  /** The ladder DECISION shared by both recall-target searches: one
    * [[ladderCountsSides]] pass over the sample queries, then pick the
    * smallest rung whose recall meets `targetBp` (top rung as the
    * fallback). Identical choice and achieved-recall to the former
    * early-stopping walk (the walk stopped at the first qualifying
    * rung = the smallest one, and fell back to the top rung with its
    * own recall), at ladder-independent cost: the walk re-ran the full
    * search→rerank chain once per evaluated rung.
    */
  private def chooseRung(embeddings: DataFrame, idx: DataFrame,
                         cw: DataFrame, samplePred: Column,
                         coarsePred: Column, m: Int, k: Int, targetBp: Int,
                         ladder: Seq[Int], overscan: Int): (Int, Long) = {
    val counts = ladderCountsSides(embeddings, Seq("q" -> samplePred),
      coarsePred, cw, idx, m, k, ladder, overscan)("q")
    def bp(ne: Long, nf: Long): Long = if (ne > 0) 10000L * nf / ne else 0L
    counts.collectFirst {
      case (np, ne, nf) if bp(ne, nf) >= targetBp => (np, bp(ne, nf))
    }.getOrElse {
      val (np, ne, nf) = counts.last
      (np, bp(ne, nf))
    }
  }

  /** [[searchWithRecallTarget]] over PERSISTED (index, codebooks)
    * artifacts — the production form: [[changeFeedAnnIndex]] maintains
    * the index at churn cost, so a per-call [[learnedBuild]] (corpus ×
    * codebook work) is exactly the cost a stored index exists to
    * avoid. Same decision procedure (early-stopping ladder walk on the
    * held-out sample, top-rung fallback, honest `target_met`), with
    * the ladder expressed as FRACTIONS of nlist like
    * [[autotuneReportStored]] — "probe an eighth of the lists" keeps
    * its scan-fraction meaning as the corpus and its list count grow,
    * where an absolute rung list shrinks toward nothing. Output
    * matches [[searchWithRecallTarget]]: the re-ranked top-k plus the
    * constant (nprobe, sample_recall_bp, target_met) decision columns
    * — and is IDENTICAL to it when the caller passes the same
    * artifacts a fresh build would produce (spec-pinned).
    */
  def searchWithRecallTargetStored(embeddings: DataFrame, idx: DataFrame,
                                   cw: DataFrame, queryPred: Column,
                                   samplePred: Column, coarsePred: Column,
                                   m: Int, k: Int, targetBp: Int,
                                   ladderFracBp: Seq[Int] = Seq(1250, 2500, 5000),
                                   overscan: Int = 4): DataFrame = {
    require(ladderFracBp.nonEmpty &&
        ladderFracBp == ladderFracBp.distinct.sorted &&
        ladderFracBp.forall(f => f > 0 && f <= 10000),
      "ladder fractions must be ascending, duplicate-free, in (0, 10000] bp")
    val nlist = embeddings.filter(coarsePred).count()
    require(nlist > 0, "coarsePred selects no centroid — empty coarse book")
    val ladder = ladderFracBp
      .map(f => math.max(1L, nlist * f / 10000).toInt).distinct
    val (chosen, achieved) = chooseRung(embeddings, idx, cw, samplePred,
      coarsePred, m, k, targetBp, ladder, overscan)
    exactRerank(embeddings,
        ivfpqSearchStoredLearned(idx, embeddings, queryPred, coarsePred,
          cw, m, k * overscan, chosen), k)
      .withColumn("nprobe", lit(chosen.toLong))
      .withColumn("sample_recall_bp", lit(achieved))
      .withColumn("target_met", lit(achieved >= targetBp))
  }

  /** RECALL@k REPORT for an ANN pass against the exact ground truth —
    * the embedding-space analogue of [[Dedup.nearDupRecallReport]]: a
    * user tuning nprobe/m/overscan gets a measured quality curve, not a
    * "recall < 1 by construction" shrug. `found` and `exact` are both
    * (query_id, hit_id, …) top-k frames ([[bruteForceTopKL2]] is the
    * canonical `exact`). Per query: ground-truth size, how many of
    * those the ANN pass surfaced, and recall in integer basis points
    * (exact `div` — no float compare in any gate built on this).
    * Joins are top-k-sized on both sides — report cost never scales
    * past Q·k.
    */
  def annRecallReport(found: DataFrame, exact: DataFrame): DataFrame =
    exact.select("query_id", "hit_id")
      .join(found.select("query_id", "hit_id").distinct()
          .withColumn("hit", lit(1L)),
        Seq("query_id", "hit_id"), "left_outer")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .withColumn("recall_bp", expr("(10000 * n_found) div n_exact"))

  /** Element-wise centroid (mean pooling) per group: vectors explode to
    * (group, dim, quantized component) and ONE partial-combining
    * aggregation produces each centroid component — exact integer sums,
    * then two IEEE divisions, NO rounding: integer→double conversion and
    * division are bit-deterministic, while rounding would land exactly
    * on half-way cases (sum/n/1e6 is a small-denominator rational) where
    * engines disagree on tie direction. The workhorse for class
    * prototypes / IVF codebook refinement: shuffle volume is
    * groups × dims, not the corpus.
    */
  def centroids(embeddings: DataFrame, groupCol: Column): DataFrame =
    embeddings
      .select(groupCol.as("grp"),
        posexplode(quantize(col("embedding"))).as(Seq("i", "qi")))
      .groupBy("grp", "i")
      .agg((sum("qi").cast("double") / count(lit(1)).cast("double")
        / lit(1000000.0)).as("mean_val"))

  // ---- random-hyperplane LSH blocking (the 100 TB near-dup path) ----

  /** Per-vector LSH band values: sign bits of `planes` hyperplane dot
    * products, packed `bandBits` at a time → (vec_id, band_id, band_val).
    *
    * The banding is the native [[graft.functions.QHyperplaneBands]]
    * expression — a scalar map inside whole-stage codegen, so the
    * entire stage is shuffle-free (the earlier composed form exploded
    * the vector and aggregated 32 dot products: a corpus-sized
    * exchange). The hyperplane components are a Knuth multiplicative
    * hash of `j*1024 + i` folded into [-32768, 32768] — pure BIGINT
    * arithmetic any SQL engine reproduces bit for bit, which is what
    * makes the candidate set oracle-checkable. Supports dim ≤ 1024 —
    * enforced at eval time (larger vectors would alias plane components
    * and silently correlate hyperplanes, invisibly to the oracle).
    */
  def hyperplaneBands(quant: DataFrame, planes: Int, bandBits: Int): DataFrame = {
    require(planes % bandBits == 0, "planes must be a multiple of bandBits")
    quant.select(col("vec_id"),
      posexplode(graft.functions.QHyperplaneBands.bands(col("q"), planes, bandBits))
        .as(Seq("band_id", "band_val")))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band, with the
    * number of shared bands. The join key is (band_id, band_val) — at
    * scale each bucket holds corpus_size / 2^bandBits vectors in
    * expectation, never all-pairs. Tune `bandBits` up with corpus size
    * (8 bits for ~10^3..10^5 vectors, 16+ at 10^8).
    */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.select(col("vec_id").as("vec_a"), col("band_id"), col("band_val"))
      .join(bands.select(col("vec_id").as("vec_b"), col("band_id"), col("band_val")),
        Seq("band_id", "band_val"))
      .filter(col("vec_a") < col("vec_b"))
      .groupBy("vec_a", "vec_b").agg(count(lit(1)).as("bands_shared"))

  /** Per-vector MULTI-PROBE band values: primary + `flips` single-bit
    * neighbor probes per band ([[graft.functions.QHyperplaneProbes]] —
    * still one scalar map inside whole-stage codegen, no explode/agg
    * exchange). Output: (vec_id, band_id, p, band_val) with `p = 0`
    * the primary value and `p ≥ 1` the probes in increasing-margin
    * order.
    */
  def hyperplaneProbes(quant: DataFrame, planes: Int, bandBits: Int,
                       flips: Int): DataFrame =
    quant.select(col("vec_id"),
      posexplode(graft.functions.QHyperplaneProbes
        .probes(col("q"), planes, bandBits, flips))
        .as(Seq("idx", "band_val")))
      .select(col("vec_id"),
        floor(col("idx") / lit(flips + 1)).cast("int").as("band_id"),
        pmod(col("idx"), lit(flips + 1)).as("p"), col("band_val"))

  /** MULTI-PROBE near-dup candidates: each vector's probe set (primary
    * + `flips` lowest-margin single-bit flips per band) is joined
    * against the PRIMARY-only band index — a pair is a candidate when
    * either side's probes reach the other's primary bucket. The probe
    * set strictly contains the primary value, so the candidates are a
    * SUPERSET of [[nearDupCandidates]] at the same (planes, bandBits)
    * (spec-asserted) — which is the point: multi-probe holds recall
    * with FEWER bands, i.e. fewer hash tables and a smaller band join,
    * at the cost of (flips+1)× probe rows on one join side only. The
    * index side stays primary-only, so at scale the stored/shuffled
    * index is unchanged; only the probe stream fans out.
    * Output: (vec_a, vec_b, bands_hit, cosine) with `bands_hit` the
    * number of distinct bands where the pair collided in either
    * direction.
    */
  def nearDupCandidatesMultiProbe(embeddings: DataFrame, planes: Int = 16,
                                  bandBits: Int = 8, flips: Int = 1): DataFrame = {
    // the bands_hit aggregate below packs band membership into ONE Long
    // bitmask (shiftleft wraps its shift amount mod 64 — Java semantics —
    // so band_id >= 64 would silently alias onto low bits and undercount);
    // QHyperplaneBands bounds the vector DIM, not the band count, so the
    // single-Long invariant must be enforced here
    require(planes / bandBits <= 64,
      s"band count ${planes / bandBits} exceeds the single-Long band " +
        "bitmask (planes/bandBits must be <= 64)")
    val all = withQuant(embeddings)
    val pr = hyperplaneProbes(all.select(col("vec_id"), col("q")),
      planes, bandBits, flips)
    val primary = pr.filter(col("p") === 0)
      .select(col("vec_id").as("id_b"), col("band_id"), col("band_val"))
    // primary↔primary collisions are SYMMETRIC (equal values), so each
    // unordered pair is emitted exactly once (id_a < id_b) — the naive
    // full-probe-stream join produced every such pair twice and left
    // the aggregate to dedupe, the dominant share of multi-probe's CPU
    // premium over single-probe at equal bands
    val prim0 = pr.filter(col("p") === 0)
      .select(col("vec_id").as("id_a"), col("band_id"), col("band_val"))
    val e0 = prim0.join(primary, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("band_id"))
    // flip-probe hits are NOT symmetric — each side flips its OWN
    // lowest-margin bits, so a one-bit-apart pair may be reachable from
    // only one direction; both stay, the bitmask union below dedupes
    val e1 = pr.filter(col("p") >= 1)
      .select(col("vec_id").as("id_a"), col("band_id"), col("band_val"))
      .join(primary, Seq("band_id", "band_val"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("vec_a"),
        greatest(col("id_a"), col("id_b")).as("vec_b"), col("band_id"))
    // distinct-band count as bit_or of a band bitmask + popcount: ONE
    // partial-combining aggregate (map-side combine on the join output)
    // where countDistinct planned a two-phase distinct expansion; band
    // count = planes/bandBits ≤ 64 by QHyperplaneBands' dim bound
    val cand = e0.unionAll(e1)
      .groupBy("vec_a", "vec_b")
      .agg(expr("cast(bit_count(bit_or(shiftleft(1L, band_id))) as bigint)")
        .as("bands_hit"))
    val a = all.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"))
    val b = all.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"))
    cand.join(a, Seq("vec_a")).join(b, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("bands_hit"),
        cosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
  }

  /** All LSH candidate pairs with shared-band count and exact cosine —
    * the blocking stage exposed as its own operator (no threshold).
    */
  def nearDupCandidates(embeddings: DataFrame, planes: Int = 32,
                        bandBits: Int = 8): DataFrame = {
    val all = withQuant(embeddings)
    val cand = lshCandidates(hyperplaneBands(all, planes, bandBits))
    val a = all.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"))
    val b = all.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"))
    cand.join(a, Seq("vec_a")).join(b, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("bands_shared"),
        cosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
  }

  /** Near-duplicate pairs (a < b) with cosine ≥ threshold, blocked by
    * random-hyperplane LSH: vectors are banded (`planes` sign bits,
    * `bandBits` per band), only pairs sharing ≥1 band are scored with the
    * exact quantized cosine. Recall < 1 by construction (pairs colliding
    * in no band are never scored) but deterministic: the hyperplanes are
    * fixed integers, so the candidate set — and hence the result — is
    * reproducible in any engine. This is the default (100 TB) path; the
    * all-pairs [[nearDupPairsExact]] remains for small corpora and
    * recall measurement.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double,
                   planes: Int = 32, bandBits: Int = 8): DataFrame =
    nearDupCandidates(embeddings, planes, bandBits)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .filter(col("cosine") >= threshold)

  /** TWO-LEVEL centroid assignment — the scale path for when the fine
    * codebook outgrows a broadcast (the [[assign]] scaladoc's promised
    * fix). A small COARSE codebook routes twice: each fine centroid
    * registers under its nearest coarse centroid, and each vector
    * probes its `nprobeCoarse` nearest coarse buckets, scoring only the
    * fine centroids registered there — an EQUI join on the coarse id,
    * so the k-sized fine codebook is never broadcast and per-vector
    * work drops from k to ~nprobeCoarse·k/√k. Approximate by
    * construction (the true nearest fine centroid can live in an
    * unprobed coarse bucket — raise `nprobeCoarse` for recall);
    * exhaustive probing reproduces the flat assignment exactly
    * (spec-asserted). Output: (vec_id, bucket).
    */
  def assignTwoLevel(embeddings: DataFrame, finePred: Column, coarsePred: Column,
                     nprobeCoarse: Int = 2): DataFrame =
    assignTwoLevelQ(withQuant(embeddings).cache(), finePred, coarsePred, nprobeCoarse)

  /** [[assignTwoLevel]] over an already-quantized (and ideally cached)
    * corpus — shared by the standalone query and the SemDeDup tail so
    * both reuse one cached quantization pass.
    */
  private def assignTwoLevelQ(corpus: DataFrame, finePred: Column, coarsePred: Column,
                              nprobeCoarse: Int): DataFrame = {
    val fine = seedCents(corpus, finePred)
    val coarse = corpus.filter(coarsePred)
      .select(col("vec_id").as("co_id"), col("q").as("oq"), col("nrm").as("on"))
    val fw = Window.partitionBy("cent_id").orderBy(col("fcos").desc, col("co_id"))
    val fineRouted = fine.join(broadcast(coarse), lit(true))
      .withColumn("fcos", cosine(qdot(col("cq"), col("oq")), col("cn"), col("on")))
      .withColumn("r", row_number().over(fw)).filter(col("r") === 1)
      .select(col("co_id"), col("cent_id"), col("cq"), col("cn"))
    // vectors probe only REGISTERED coarse buckets (those holding at
    // least one fine centroid): ranking over the raw coarse codebook
    // could spend all nprobe probes on EMPTY buckets, and the fine join
    // below would then emit NO row for that vector — silently violating
    // the one-row-per-vector contract (a dropped vector is neither
    // marked duplicate nor kept by SemDeDup)
    val registered = fineRouted.select("co_id").distinct()
    val probeable = coarse.join(registered, Seq("co_id"), "left_semi")
    val vw = Window.partitionBy("vec_id").orderBy(col("vcos").desc, col("co_id"))
    val probes = corpus.join(broadcast(probeable), lit(true))
      .withColumn("vcos", cosine(qdot(col("q"), col("oq")), col("nrm"), col("on")))
      .withColumn("r", row_number().over(vw)).filter(col("r") <= nprobeCoarse)
      .select(col("vec_id"), col("q"), col("nrm"), col("co_id"))
    val aw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    probes.join(fineRouted, Seq("co_id"))
      .withColumn("ccos", cosine(qdot(col("cq"), col("q")), col("cn"), col("nrm")))
      .withColumn("r2", row_number().over(aw)).filter(col("r2") === 1)
      .select(col("vec_id"), col("cent_id").as("bucket"))
  }

  /** SemDeDup-style SEMANTIC dedup: spherical-k-means-cluster the
    * embedding space (seed codebook from `centroidPred`, `lloydIters`
    * floor-mean refinements — the [[ivfTopKLearned]] build), then mark
    * as duplicate any vector whose cosine to a LOWER-id member of its
    * OWN cluster reaches `threshold`. This is the published SemDeDup
    * recipe (Abbas et al. 2023) with one determinism substitution: the
    * keep-representative rule is min-id (relational, engine-portable)
    * rather than distance-to-centroid.
    *
    * Cost model at scale — exactly the paper's: clustering makes the
    * candidate set per vector its OWN cluster only, so the pairwise
    * stage is Σ(cluster²) not N²; the codebook size is the lever that
    * keeps clusters small (k ∝ N/target-cluster-size), and at 100 TB
    * the codebook is trained once on a sample. Output: one row per
    * vector — (vec_id, cluster_id, is_dup).
    */
  def semanticDedup(embeddings: DataFrame, centroidPred: Column,
                    threshold: Double = 0.9, lloydIters: Int = 1): DataFrame = {
    val corpus = withQuant(embeddings).cache()
    var cents = seedCents(corpus, centroidPred)
    for (_ <- 1 to lloydIters) cents = lloydStep(corpus, cents)
    markDups(assign(corpus, cents).cache(), threshold)
  }

  /** SemDeDup over the TWO-LEVEL assignment — the variant for codebooks
    * too large to broadcast (k grows with N to hold the target cluster
    * size, so at 100 TB the flat broadcast-NLJ assignment is the first
    * thing to break). Clusters come from [[assignTwoLevel]] (coarse
    * routing, equi-join scoring of registered fine centroids); the
    * within-cluster dup rule is identical to [[semanticDedup]].
    * Exhaustive coarse probing reproduces the flat seed-codebook
    * assignment, so the two variants agree exactly there
    * (spec-asserted). Output: (vec_id, cluster_id, is_dup).
    */
  def semanticDedupTwoLevel(embeddings: DataFrame, finePred: Column,
                            coarsePred: Column, nprobeCoarse: Int = 2,
                            threshold: Double = 0.9): DataFrame =
    semanticDedupTwoLevelStored(withQuant(embeddings), finePred, coarsePred,
      nprobeCoarse, threshold)

  /** [[semanticDedupTwoLevel]] against a persisted [[embeddingStore]] —
    * the production shape: ingestion quantizes once, and the semantic
    * pass (like [[crossSetMatchesStored]]) runs entirely from the stored
    * (vec_id, q, nrm) integers with no float re-read. The recomputing
    * entry point above routes through here, so the `dedup_semantic2`
    * oracle covers this whole path; exactness across the parquet round
    * trip is additionally spec-pinned.
    */
  def semanticDedupTwoLevelStored(corpusStore: DataFrame, finePred: Column,
                                  coarsePred: Column, nprobeCoarse: Int = 2,
                                  threshold: Double = 0.9): DataFrame = {
    val corpus = corpusStore.cache()
    val assigned = assignTwoLevelQ(corpus, finePred, coarsePred, nprobeCoarse)
      .join(corpus, Seq("vec_id"))
    markDups(assigned.cache(), threshold)
  }

  /** Shared SemDeDup tail: given (vec_id, q, nrm, bucket), mark every
    * vector with a lower-id same-bucket neighbor at cosine ≥ threshold.
    * The self-join key is the bucket — pairwise cost is Σ(cluster²),
    * never N².
    */
  private def markDups(assigned: DataFrame, threshold: Double): DataFrame = {
    val dups = assigned
      .select(col("bucket"), col("vec_id").as("vec_a"),
        col("q").as("aq"), col("nrm").as("an"))
      .join(assigned.select(col("bucket"), col("vec_id").as("vec_b"),
        col("q").as("bq"), col("nrm").as("bn")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(qdot(col("aq"), col("bq")), col("an"), col("bn")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("bucket").as("cluster_id"))
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }

  /** CROSS-SET embedding decontamination: every (benchmark, corpus)
    * pair with cosine ≥ threshold, blocked by the same deterministic
    * hyperplane LSH as [[nearDupPairs]] — the embedding-space analogue
    * of the n-gram benchmark decontamination in
    * [[TextAnalysis.decontaminate]], catching paraphrased eval leakage
    * that exact-gram overlap misses. Both sets band identically (same
    * integer hyperplanes), so a bench vector and its corpus paraphrase
    * collide whenever their sign patterns share a band; only colliding
    * pairs pay the exact quantized cosine.
    *
    * Scale shape: the benchmark is orders of magnitude smaller than the
    * corpus, so its banded form broadcasts and the corpus makes ONE
    * map-side banding pass + a broadcast hash join — the corpus is
    * never self-joined and never shuffled on the band key. The
    * candidate `distinct` is bounded by collisions, not the corpus.
    * Output: (bench_id, vec_id, cosine).
    */
  def crossSetMatches(corpus: DataFrame, bench: DataFrame, threshold: Double,
                      planes: Int = 32, bandBits: Int = 8): DataFrame =
    crossSetMatchesStored(withQuant(corpus), bench, threshold, planes, bandBits)

  /** The quantized form of an embedding table — (vec_id, q, nrm) — as a
    * persistable STORE: an ingestion pipeline materializes this once and
    * every downstream pass (cross-set decontamination, banding, ANN
    * probing) runs from storage with no float re-read. The embedding
    * analogue of [[Dedup.signatureStore]]; exactness survives the
    * parquet round trip because every value is integral (spec-pinned).
    */
  def embeddingStore(embeddings: DataFrame): DataFrame = withQuant(embeddings)

  /** [[crossSetMatches]] against a persisted [[embeddingStore]] — the
    * production decontamination path: corpus floats are never re-read;
    * the (small) benchmark is quantized fresh per run.
    */
  def crossSetMatchesStored(corpusStore: DataFrame, bench: DataFrame,
                            threshold: Double, planes: Int = 32,
                            bandBits: Int = 8): DataFrame = {
    val c = corpusStore
    val b = withQuant(bench)
    val bb = hyperplaneBands(b.select(col("vec_id"), col("q")), planes, bandBits)
      .select(col("vec_id").as("bench_id"), col("band_id"), col("band_val"))
    val cand = broadcast(bb)
      .join(hyperplaneBands(c.select(col("vec_id"), col("q")), planes, bandBits),
        Seq("band_id", "band_val"))
      .select(col("bench_id"), col("vec_id")).distinct()
    cand
      .join(broadcast(b.select(col("vec_id").as("bench_id"),
        col("q").as("bq"), col("nrm").as("bn"))), Seq("bench_id"))
      .join(c, Seq("vec_id"))
      .select(col("bench_id"), col("vec_id"),
        cosine(qdot(col("bq"), col("q")), col("bn"), col("nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** All near-duplicate pairs (a < b) with cosine ≥ threshold. Exact but
    * all-pairs O(N²) — verification/recall baseline for modest corpora
    * only; production near-dup goes through [[nearDupPairs]].
    */
  def nearDupPairsExact(embeddings: DataFrame, threshold: Double): DataFrame = {
    val all = withQuant(embeddings)
    val b = all.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"))
    all.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"))
      .join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Two-stage quantized ANN: an INT8 coarse pass ranks the corpus per
    * query on the 4×-compressed representation a 100 TB vector index
    * actually scans (int8 dot products — quarter the memory bandwidth,
    * SIMD-friendly), keeps the top `overscan`·k survivors, and re-ranks
    * only those with the full-precision (1e6-quantized) cosine. The
    * final top-k therefore pays full-precision arithmetic on `overscan·k`
    * rows per query, not N — the quantized-scan + rerank shape every
    * production ANN service runs.
    *
    * Determinism: `qv = floor(v·127 / amax)` (the [[quantizeInt8]]
    * formulas, already oracle-proven), int8 dots and norms are exact
    * BIGINT sums, both cosines fixed IEEE sequences. All-zero vectors
    * (amax = 0) are excluded from both sides — their int8 cosine is
    * 0/0. Output: (query_id, hit_id, cosine, rnk) like the other ANN
    * variants, where `cosine` is the full-precision rerank score.
    */
  def int8RerankTopK(embeddings: DataFrame, queryPred: Column, k: Int,
                     overscan: Int = 4): DataFrame = {
    val qv8 = transform(col("v"), x =>
      floor((x.cast("double") * lit(127.0)) / col("amax")).cast("long"))
    // cached like the sibling operators' quantized corpora: this frame
    // feeds FOUR branches of one action (coarse scan, int8 queries,
    // full-precision rerank, full-precision queries) — uncached, each
    // branch re-runs the scan + amax + quantize + norm work
    val corpus = embeddings
      .select(col("vec_id"), col("embedding").as("v"), quantize(col("embedding")).as("q"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x.cast("double")))))
      .filter(col("amax") > 0d)
      .withColumn("q8", qv8)
      .select(col("vec_id"), col("q8"), qdot(col("q8"), col("q8")).as("n8"),
        col("q"), qdot(col("q"), col("q")).as("nrm"))
      .cache()
    val queries8 = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q8").as("qq8"), col("n8").as("qn8"))
    // coarse pass touches ONLY int8 columns (column pruning keeps the
    // full-precision arrays out of this scan branch), and only scalar
    // doubles cross the top-k window exchange
    val w8 = Window.partitionBy("query_id").orderBy(col("cos8").desc, col("hit_id"))
    val survivors = corpus.select(col("vec_id"), col("q8"), col("n8"))
      .join(broadcast(queries8), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        cosine(qdot(col("qq8"), col("q8")), col("qn8"), col("n8")).as("cos8"))
      .withColumn("rnk8", row_number().over(w8))
      .filter(col("rnk8") <= k * overscan)
      .select(col("query_id"), col("hit_id"))
    // rerank: only overscan·k rows per query rejoin the full-precision
    // table — the survivor set broadcasts, the corpus is never shuffled
    val full = corpus.select(col("vec_id"), col("q"), col("nrm"))
    val queriesF = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    broadcast(survivors).join(full, col("hit_id") === col("vec_id"))
      .join(broadcast(queriesF), Seq("query_id"))
      .select(col("query_id"), col("hit_id"),
        cosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Symmetric int8 scalar quantization — the compression step before
    * shipping an embedding table to an ANN index or training job:
    * `q_i = floor(v_i · 127 / amax)` with per-vector `amax = max|v_i|`
    * (all-zero vectors quantize to zeros). Purely map-side: one row in,
    * one row out, no shuffle — at 100 TB this runs at scan speed.
    *
    * Output keeps audit columns rather than the raw int8 array payload:
    * `amax` (the dequant scale numerator), `q_sum`/`n_sat` (saturation
    * and bias diagnostics), and `q_checksum` (md5 of the comma-joined
    * components — any engine reproducing the quantization reproduces
    * it). Portability: float→double is exact, ·127 then ÷amax is a
    * fixed IEEE op sequence, floor avoids the round-half tie Spark and
    * DuckDB break differently.
    */
  def quantizeInt8(embeddings: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val qv = transform(col("v"), x =>
      when(col("amax") === 0d, lit(0L)).otherwise(
        floor((x.cast("double") * lit(127.0)) / col("amax")).cast("long")))
    embeddings.select(col(idCol), col(vecCol).as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x.cast("double")))))
      .withColumn("qv", qv)
      .select(col(idCol),
        size(col("v")).cast("long").as("n_dims"),
        col("amax"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
        size(filter(col("qv"), x => abs(x) >= 127)).cast("long").as("n_sat"),
        md5(array_join(transform(col("qv"), _.cast("string")), ",").cast("binary"))
          .as("q_checksum"))
  }
}
