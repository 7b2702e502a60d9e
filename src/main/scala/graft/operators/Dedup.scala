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
  *  - MinHash/LSH shuffles per stage on `doc_id`, then joins candidates
  *    on band values — the classic shingle → signature → band → bucket
  *    join pipeline, linear in corpus size, never all-pairs;
  *  - SimHash blocks on signature bands, so the quadratic verify only
  *    runs inside buckets;
  *  - verification joins are restricted to LSH candidates.
  */
object Dedup {

  /** Lower-cased whitespace tokens with their original positions. */
  def tokenize(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("i", "w")))
      .filter(col("w") =!= "")

  /** Distinct word n-gram shingles per document. Indexes into the token
    * array directly (`explode(sequence)` + `element_at`) — shuffle-free,
    * unlike a `lead()` window which would repartition by document.
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
      .distinct()
  }

  /** Distinct character n-gram shingles per document. Built with
    * `explode(sequence)` + `substr` — all codegen'd; a
    * `transform(...)` lambda here runs interpreted and is ~5× slower.
    */
  def charShingles(docs: DataFrame, n: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= n) // sequence(1,0) would run backwards
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), length(col("t")) - (n - 1))).as("i"))
      .select(col(idCol), col("t").substr(col("i"), lit(n)).as("shingle"))
      .distinct()

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

  /** MinHash signature: 8 independent min-sketches per document. Hash
    * tabulation trick: TWO md5 evaluations per shingle (plain + salted),
    * each split into four 8-hex-char chunks → 8 independent 32-bit hash
    * families at a quarter of the md5 cost. Any engine with md5 + substr
    * reproduces the sketch bit for bit.
    */
  def minhashSignature(sh: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val h1 = md5(col("shingle").cast("binary"))
    val h2 = md5(concat(lit("x:"), col("shingle")).cast("binary"))
    val mins = (0 until 8).map { j =>
      val src = if (j < 4) h1 else h2
      min(substring(src, 1 + 8 * (j % 4), 8)).as(s"m$j")
    }
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: signature rows → (doc, band-hash) pairs; docs sharing
    * any band are candidate duplicates. At scale the band value is the
    * shuffle key — buckets are bounded, never all-pairs.
    */
  def lshBands(sig: DataFrame, bandSize: Int = 4, numHashes: Int = 8,
               idCol: String = "doc_id"): DataFrame = {
    val bandCols = (0 until numHashes / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(j => col(s"m$j"))
      md5(concat(cols: _*).cast("binary"))
    }
    // one explode pass, not N unioned re-derivations of the signature plan
    sig.select(col(idCol), explode(array(bandCols: _*)).as("band"))
  }

  /** Candidate pairs (a < b) from shared LSH bands. */
  def candidatePairs(bands: DataFrame, idCol: String = "doc_id"): DataFrame =
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()

  /** Exact Jaccard over shingle sets, evaluated only for candidate
    * pairs.
    */
  def jaccardVerify(cand: DataFrame, sh: DataFrame, threshold: Double,
                    idCol: String = "doc_id"): DataFrame = {
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col(idCol).as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    val j = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter")).cast("double")
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → bands →
    * candidates → exact-Jaccard verify.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.5,
                      shingleSize: Int = 3): DataFrame =
    lshNearDups(shingles(docs, shingleSize), threshold)

  /** Shared LSH tail: signature → bands → candidates → exact-Jaccard
    * verify. The shingle set feeds the signature AND both sides of the
    * verify join, and the signature feeds both sides of the band
    * self-join — cache both (distinct shingles + one row per doc) so
    * each plan runs once instead of 3-4×.
    */
  def lshNearDups(shinglesDf: DataFrame, threshold: Double): DataFrame = {
    val sh = shinglesDf.cache()
    val sig = minhashSignature(sh).cache()
    jaccardVerify(candidatePairs(lshBands(sig)), sh, threshold)
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
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id"): DataFrame = {
    // cache: the signature plan would otherwise re-run for every band
    // branch on both sides of the self-join (up to 8×). The bit string
    // is also packed into two BIGINT halves here (one conv() per doc) so
    // the per-pair Hamming distance is two xor + bit_count ops instead
    // of 64 substring comparisons.
    val sig = simhashSignature(docs, idCol)
      .withColumn("hi", expr("CAST(conv(substring(simhash, 1, 32), 2, 10) AS BIGINT)"))
      .withColumn("lo", expr("CAST(conv(substring(simhash, 33, 32), 2, 10) AS BIGINT)"))
      .cache()
    val bands = sig.select(col(idCol), col("hi"), col("lo"),
      explode(array((0 until 4).map(k =>
        substring(col("simhash"), 1 + 16 * k, 16)): _*)).as("band"))
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col("a.hi").as("hi_a"), col("a.lo").as("lo_a"),
        col(s"b.$idCol").as("doc_b"), col("b.hi").as("hi_b"), col("b.lo").as("lo_b"))
    // pairs sharing several bands appear several times — recomputing the
    // two-instruction hamming beats an early wide-row distinct shuffle
    cand.withColumn("hamming",
      (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
        bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
  }
}
