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

  /** Distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, n: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("i")
    val parts: Seq[Column] = (0 until n).map(k =>
      if (k == 0) col("w") else lead(col("w"), k).over(w))
    val joined = parts.reduce((a, b) => concat(a, lit(" "), b))
    tokenize(docs, textCol, idCol)
      .withColumn("shingle", joined)
      .filter(col("shingle").isNotNull)
      .select(col(idCol), col("shingle")).distinct()
  }

  /** Distinct character n-gram shingles per document. */
  def charShingles(docs: DataFrame, n: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      explode(transform(sequence(lit(1), length(lower(col(textCol))) - (n - 1)),
        i => lower(col(textCol)).substr(i, lit(n)))).as("shingle"))
      .filter(length(col("shingle")) === n)
      .select(col(idCol), col("shingle")).distinct()

  /** Exact dedup: canonical = lowest id per md5(text) group. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    val w = Window.partitionBy("text_hash")
    docs.withColumn("text_hash", h)
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col(idCol), col("text_hash"), col("canonical_id"),
        col("n_copies"), (col(idCol) === col("canonical_id")).as("is_canonical"))
  }

  /** MinHash signature: `numHashes` independent min-of-md5 sketches per
    * document (the bottom-sketch form of MinHash; seeds are salt
    * prefixes, so any engine with md5 reproduces it).
    */
  def minhashSignature(sh: DataFrame, numHashes: Int = 8,
                       idCol: String = "doc_id"): DataFrame = {
    val mins = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("shingle")).cast("binary"))).as(s"m$j"))
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: signature rows → (doc, band-hash) pairs; docs sharing
    * any band are candidate duplicates.
    */
  def lshBands(sig: DataFrame, bandSize: Int = 4, numHashes: Int = 8,
               idCol: String = "doc_id"): DataFrame = {
    val bands = (0 until numHashes / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(j => col(s"m$j"))
      sig.select(col(idCol), md5(concat(cols: _*).cast("binary")).as("band"))
    }
    bands.reduce(_ unionAll _)
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
                      shingleSize: Int = 3): DataFrame = {
    val sh = shingles(docs, shingleSize)
    jaccardVerify(candidatePairs(lshBands(minhashSignature(sh))), sh, threshold)
  }

  /** 32-bit SimHash over word unigrams. The hash basis is the first 8
    * hex chars of md5(word); bit b of hex char p contributes ±1 to
    * accumulator (p,b); the signature is the 32-char '0'/'1' string of
    * accumulator signs (ordered by (p,b)).
    */
  def simhashSignature(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val wh = tokenize(docs).select(col(idCol), md5(col("w").cast("binary")).as("h")).distinct()
    val ps = explode(sequence(lit(1), lit(8))).as("p")
    val bs = explode(sequence(lit(0), lit(3))).as("b")
    val bit = expr("(CAST(instr('0123456789abcdef', substring(h, p, 1)) - 1 AS INT) div CAST(pow(2, b) AS INT)) % 2")
    wh.select(col(idCol), col("h"), ps).select(col(idCol), col("h"), col("p"), bs)
      .withColumn("v", when(bit === 1, lit(1)).otherwise(lit(-1)))
      .groupBy(idCol, "p", "b").agg(sum("v").as("s"))
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("b"),
          when(col("s") >= 0, lit("1")).otherwise(lit("0")).as("c")))),
          x => x.getField("c")), "").as("simhash"))
  }

  /** SimHash near-dup pairs: block on 8-bit bands, keep pairs with
    * Hamming distance ≤ `maxHamming` over the 32-bit signatures.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id"): DataFrame = {
    val sig = simhashSignature(docs, idCol)
    val bands = (0 until 4).map(k =>
      sig.select(col(idCol), col("simhash"),
        substring(col("simhash"), 1 + 8 * k, 8).as("band")))
      .reduce(_ unionAll _)
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col("a.simhash").as("sig_a"),
        col(s"b.$idCol").as("doc_b"), col("b.simhash").as("sig_b"))
      .distinct()
    cand.withColumn("hamming",
      aggregate(
        transform(sequence(lit(1), lit(32)),
          p => when(col("sig_a").substr(p, lit(1)) === col("sig_b").substr(p, lit(1)),
            lit(0)).otherwise(lit(1))),
        lit(0), (acc, x) => acc + x))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
