package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over the engine's similarity/linkage graphs — the
  * diagnostics layer above [[Dedup.clusterLabels]]: components tell you
  * WHAT merged; degrees and triangles tell you WHY and HOW DENSELY
  * (a near-dup cluster that is a clique is template spam; a star is one
  * anchor document with orbiting variants; a long path is drift).
  *
  * Edges are canonically oriented (`a < b`, one row per undirected
  * edge), which makes triangle counting a two-join chain over the
  * ORIENTED list: (a<b)∧(b<c)∧(a<c) enumerates each triangle exactly
  * once — the standard distributed formulation; at scale, orienting by
  * DEGREE instead of id bounds the join fan-out by arboricity
  * (documented trade; id-orientation keeps the DuckDB oracle exact and
  * the semantics identical).
  */
object GraphMetrics {

  private def oriented(pairs: DataFrame): DataFrame =
    pairs.select(
      least(col("doc_a"), col("doc_b")).as("a"),
      greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Per-node degree over the undirected edge set. */
  def degrees(pairs: DataFrame): DataFrame = {
    val e = oriented(pairs)
    e.select(col("a").as("doc_id")).unionAll(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
  }

  /** All triangles, one row each, vertices sorted (x < y < z). */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = oriented(pairs)
    e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
  }

  /** Per-node triangle participation (every triangle credits its three
    * vertices) — the local clustering signal.
    */
  def trianglesPerNode(pairs: DataFrame): DataFrame =
    triangles(pairs)
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
}
