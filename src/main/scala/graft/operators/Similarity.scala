package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism strategy: floats are quantized to BIGINT (×1e6, truncating
  * cast) before any arithmetic, so dot products and norms are EXACT,
  * associative integers — immune to float summation order — and the final
  * cosine is a fixed sequence of double ops any engine reproduces bit for
  * bit. The quantization error (~1e-6 relative) is far below any
  * meaningful similarity resolution.
  *
  * Scale design: brute force is the O(Q·N) baseline — each query is a
  * broadcast row against a partitioned scan of the corpus, with the fold
  * fully codegen'd (`zip_with` + `aggregate`, no UDF). The IVF variant is
  * the scale path: vectors are bucketed by nearest centroid once (one
  * shuffle), queries probe only `nprobe` buckets — at 100 TB the bucket
  * assignment is a partition key and each probe touches a bounded slice.
  */
object Similarity {

  /** `array<float>` → exact `array<bigint>`, ×1e6 then `floor` — floor is
    * identical in every engine, whereas double→int CASTs are not (Spark
    * truncates toward zero, DuckDB rounds).
    */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1000000.0)).cast("bigint"))

  /** Exact integer dot product of two quantized vectors — a sequential
    * fold (`aggregate`), deterministic under any partitioning.
    */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def withQuant(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", qdot(col("q"), col("q")))

  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double"))

  /** Brute-force cosine top-k: every `queryPred` vector against the whole
    * corpus (minus itself). Output: (query_id, hit_id, cosine, rnk).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val all = withQuant(embeddings)
    val queries = all.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        cosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF-style ANN: `centroidPred` vectors act as the coarse codebook;
    * every vector is assigned to its nearest centroid (one pass), and a
    * query searches only the `nprobe` nearest buckets. Recall < 1 by
    * construction; the bucketing is the 100 TB path (assignment is a
    * partition key; probes touch bounded slices).
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, centroidPred: Column,
              k: Int, nprobe: Int): DataFrame = {
    val all = withQuant(embeddings)
    val cents = all.filter(centroidPred)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nrm").as("cn"))

    // assignment: nearest centroid per vector (rank 1 by cosine)
    val aw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    val assigned = all.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("q"), col("nrm"), col("cent_id"),
        cosine(qdot(col("cq"), col("q")), col("cn"), col("nrm")).as("ccos"))
      .withColumn("arnk", row_number().over(aw))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("q"), col("nrm"), col("cent_id").as("bucket"))

    // probe list: nprobe nearest centroids per query
    val queries = all.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    val pw = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("cent_id"))
    val probes = queries.join(broadcast(cents), lit(true))
      .select(col("query_id"), col("qq"), col("qn"), col("cent_id"),
        cosine(qdot(col("cq"), col("qq")), col("cn"), col("qn")).as("pcos"))
      .withColumn("prnk", row_number().over(pw))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("qq"), col("qn"), col("cent_id").as("bucket"))

    // search only the probed buckets
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("hit_id"))
    probes.join(assigned, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("hit_id"),
        cosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** All near-duplicate pairs (a < b) with cosine ≥ threshold. Exact
    * (all-pairs) — intended for modest corpora or LSH-pre-blocked input.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val all = withQuant(embeddings)
    val b = all.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"))
    all.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"))
      .join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
