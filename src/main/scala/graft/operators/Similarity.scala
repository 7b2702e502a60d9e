package graft.operators

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
  * Performance strategy: each vector is WIDENED to `dim` scalar BIGINT
  * columns before joining. Array higher-order functions
  * (`aggregate`/`zip_with`) drop out of whole-stage codegen, and
  * `element_at` over a derived array re-inlines the whole derivation per
  * access (O(d²) per pair after projection collapse); scalar columns keep
  * every quantization O(1) and the dot product a straight-line codegen'd
  * sum — O(d) per pair.
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

  /** Embedding dimensionality, probed from the first row. */
  def dimOf(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).head.getInt(0)

  /** Widen to (idAs, p1..p`dim`, pn) — scalar quantized components plus
    * the exact squared norm.
    */
  private def widen(embeddings: DataFrame, dim: Int, p: String,
                    idAs: String): DataFrame = {
    val comps = (1 to dim).map(i =>
      floor(element_at(col("embedding"), i).cast("double") * lit(1000000.0))
        .cast("bigint").as(s"$p$i"))
    val nrm = (1 to dim).map(i => col(s"$p$i") * col(s"$p$i")).reduce(_ + _)
    embeddings.select(col("vec_id").as(idAs) +: comps: _*)
      .withColumn(s"${p}n", nrm)
  }

  private def dot(dim: Int, a: String, b: String): Column =
    (1 to dim).map(i => col(s"$a$i") * col(s"$b$i")).reduce(_ + _)

  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double"))

  /** Brute-force cosine top-k: every `queryPred` vector against the whole
    * corpus (minus itself). Output: (query_id, hit_id, cosine, rnk).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val dim = dimOf(embeddings)
    val corpus = widen(embeddings, dim, "a", "hit_id")
    val queries = widen(embeddings.filter(queryPred), dim, "b", "query_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    corpus.join(broadcast(queries), col("hit_id") =!= col("query_id"))
      .select(col("query_id"), col("hit_id"),
        cosine(dot(dim, "a", "b"), col("bn"), col("an")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF-style ANN: `centroidPred` vectors act as the coarse codebook;
    * every vector is assigned to its nearest centroid (one pass), and a
    * query searches only the `nprobe` nearest buckets. Recall < 1 by
    * construction; the bucketing is the 100 TB path.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, centroidPred: Column,
              k: Int, nprobe: Int): DataFrame = {
    val dim = dimOf(embeddings)
    val corpus = widen(embeddings, dim, "a", "vid")
    val cents = widen(embeddings.filter(centroidPred), dim, "c", "cent_id")

    // assignment: nearest centroid per vector (rank 1 by cosine)
    val aw = Window.partitionBy("vid").orderBy(col("ccos").desc, col("cent_id"))
    val assigned = corpus.join(broadcast(cents), lit(true))
      .withColumn("ccos", cosine(dot(dim, "a", "c"), col("cn"), col("an")))
      .withColumn("arnk", row_number().over(aw))
      .filter(col("arnk") === 1)
      .select(col("vid") +: (1 to dim).map(i => col(s"a$i")) :+
        col("an") :+ col("cent_id").as("bucket"): _*)

    // probe list: nprobe nearest centroids per query
    val queries = widen(embeddings.filter(queryPred), dim, "b", "query_id")
    val pw = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("cent_id"))
    val probes = queries.join(broadcast(cents), lit(true))
      .withColumn("pcos", cosine(dot(dim, "b", "c"), col("cn"), col("bn")))
      .withColumn("prnk", row_number().over(pw))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id") +: (1 to dim).map(i => col(s"b$i")) :+
        col("bn") :+ col("cent_id").as("bucket"): _*)

    // search only the probed buckets
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    broadcast(probes).join(assigned, Seq("bucket"))
      .filter(col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("hit_id"),
        cosine(dot(dim, "a", "b"), col("bn"), col("an")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** All near-duplicate pairs (a < b) with cosine ≥ threshold. Exact
    * (all-pairs) — intended for modest corpora or LSH-pre-blocked input.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val dim = dimOf(embeddings)
    val a = widen(embeddings, dim, "a", "vec_a")
    val b = widen(embeddings, dim, "b", "vec_b")
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(dot(dim, "a", "b"), col("an"), col("bn")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
