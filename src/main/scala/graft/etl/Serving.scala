package graft.etl

import org.apache.spark.sql.DataFrame

/** The warehouse's ONE-STOP interactive read path, stacking the three
  * serving layers that until now composed only by hand
  * ([[graft.plans.MvRewrite]] routing, [[Warehouse.readSkipping]]
  * file pruning, [[ResultCache]] memoization):
  *
  *  1. the query builds its frames through SKIP-SCAN reads — pushed
  *     point/range predicates prune files at planning time against the
  *     commit-time stats sidecars, below whatever plan ultimately wins;
  *  2. MV ROUTING is active while the frame is evaluated — a covered
  *     aggregate is rewritten at optimizer time to scan the stored
  *     view instead of the base table;
  *  3. the result is admitted to / served from the RESULT CACHE.
  *
  * Layer order is identity-safe by construction: the cache key is the
  * ANALYZED plan over the scanned root paths, fixed before the
  * optimizer runs — so whether a given evaluation was routed to a view
  * or pruned to three files, re-asking the same question hits the same
  * entry, and a later commit to any scanned table changes the paths
  * and so the key (the cache's usual invalidation contract).
  *
  * At 100 TB this is the difference between a dashboard query costing
  * a full fact scan and costing a view lookup the first time and a
  * cache read every time after. Skip-scan reads are PLAIN scans even
  * for bucketed tables ([[Warehouse.readSkipping]]) — merges and
  * co-located joins should keep using [[Warehouse.read]]; this entry
  * point is for the filter/aggregate serving tier.
  */
object Serving {

  /** Evaluate `q` under the full serving stack. `q` receives a reader
    * (table name → skip-scan frame over the CURRENT committed image);
    * build every frame through it. The session's optimizer state is
    * restored on exit; views registered with
    * [[graft.plans.MvRewrite.registerWarehouse]] route here and
    * nowhere else unless the caller also activates the rule.
    */
  def read(wh: Warehouse)(q: (String => DataFrame) => DataFrame): DataFrame = {
    val spark = wh.spark
    val prev = spark.experimental.extraOptimizations
    if (!prev.contains(graft.plans.MvRewrite))
      spark.experimental.extraOptimizations = prev :+ graft.plans.MvRewrite
    try ResultCache.through(wh, q(t => wh.readSkipping(t)._1))
    finally spark.experimental.extraOptimizations = prev
  }
}
