package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** END-TO-END ENTITY RESOLUTION (record linkage): fuzzy duplicate
  * detection WITHIN one table, transitive grouping, and a golden-record
  * pick — the master-data pipeline (vendor/customer reconciliation)
  * composed from the engine's independently-oracled primitives:
  * trigram-blocked exact edit distance ([[FuzzyJoin]]) and min-label
  * connected components ([[Dedup.clusterLabels]]).
  *
  * The reference's warehouse keys terminals/clients on exact ids
  * (`/root/reference/main.ddl`); the moment two source systems spell
  * one vendor two ways, exact keys silently double-count — this is the
  * operator that closes that gap.
  *
  * Scale shape: the one corpus-squared hazard is the trigram block
  * (mitigations in FuzzyJoin's scaladoc: stop-gram cap / length-bucket
  * compound keys — and identifier-bearing names block near-linearly,
  * as the driver query demonstrates); candidates pay one codegen'd
  * `levenshtein` each; components run endpoint-only label rounds; the
  * golden pick is one window over |records|.
  */
object RecordLinkage {

  /** Fuzzy duplicate pairs within `records`, canonically oriented
    * (`id_a < id_b`, so each undirected duplicate claim appears once).
    */
  def duplicatePairs(records: DataFrame, idCol: String, nameCol: String,
                     maxDist: Int): DataFrame = {
    val l = records.select(col(idCol).as("id_a"), col(nameCol).as("name_a"))
    val r = records.select(col(idCol).as("id_b"), col(nameCol).as("name_b"))
    FuzzyJoin.trigramBlocked(l, r, "id_a", "name_a", "id_b", "name_b", maxDist)
      .filter(col("id_a") < col("id_b"))
  }

  /** One row per input record: `entity_id` = the smallest id reachable
    * through duplicate pairs (transitive — A~B, B~C groups A,B,C even
    * when A and C exceed `maxDist`), the entity's canonical record
    * (`canonical_id`: longest name, ties to the lowest id), whether
    * this row IS the canonical, and the entity's member count.
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              maxDist: Int): DataFrame = {
    val pairs = duplicatePairs(records, idCol, nameCol, maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = Dedup.clusterLabels(pairs, records.select(col(idCol).as("doc_id")))
      .select(col("doc_id").as(idCol), col("cluster_id").as("entity_id"))
    val perEntity = Window.partitionBy("entity_id")
    val rank = Window.partitionBy("entity_id")
      .orderBy(length(col(nameCol)).desc, col(idCol))
    labels.join(records.select(col(idCol), col(nameCol)), Seq(idCol))
      .withColumn("rk", row_number().over(rank))
      .withColumn("canonical_id", min(when(col("rk") === 1, col(idCol))).over(perEntity))
      .withColumn("n_members", count(lit(1)).over(perEntity))
      .select(col(idCol), col("entity_id"), col("canonical_id"),
        (col("rk") === 1).as("is_canonical"), col("n_members"))
  }
}
