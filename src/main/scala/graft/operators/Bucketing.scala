package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for SHUFFLE-FREE repeated joins — the
  * co-location strategy for fact↔dim and fact↔fact joins that recur on
  * the same key at warehouse scale. Writing both sides bucketed (and
  * sorted) by the join key with the same bucket count lets Spark's
  * bucketed-scan rule satisfy the join's distribution requirement from
  * the FILES themselves: the physical plan carries no Exchange on
  * either side (spec-asserted), so a 100 TB fact table pays the
  * partition-by-key cost ONCE at write time instead of on every join.
  *
  * This complements the Warehouse's date-partitioned facts (pruning)
  * — partitioning prunes IO, bucketing kills the join shuffle; a
  * production fact table uses both (`partitionBy(date).bucketBy(key)`).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. Bucket count must
    * match across tables that will join — it IS the (fixed) parallelism
    * of the shuffle being avoided, so size it for the LARGER side and
    * the target cluster, not the current data (resizing means a
    * rewrite, the usual bucketing trade).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two same-bucket-count tables on their bucket key —
    * plans with zero Exchange nodes.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
