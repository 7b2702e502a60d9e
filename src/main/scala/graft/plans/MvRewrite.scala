package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Cast, Coalesce, EqualTo, Expression, HllSketchEstimate, IsNotNull, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, HllSketchAgg, HllUnionAgg, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** TRANSPARENT MATERIALIZED-VIEW ROUTING — the optimizer half of the
  * [[graft.operators.MaterializedAgg]] story: a `Rule[LogicalPlan]`
  * that rewrites `base.groupBy(keys).agg(...)` into a SCAN OF THE
  * STORED VIEW when a registered MV covers the query. The user keeps
  * writing queries against the 100 TB base table; queries the view
  * answers never touch it. (The Calcite/BigQuery/Databricks
  * "aggregate awareness" feature, scoped to the engine's own MV
  * contract.)
  *
  * Deliberately NARROW, favoring never-wrong over often-applied — a
  * rewrite fires only when every condition below holds, otherwise the
  * plan is untouched:
  *
  *  - the aggregate's child is the registered base relation (matched
  *    by its file-source root paths — stable across separate reads of
  *    the same table), under nothing but pure column-pruning Projects,
  *    the warehouse's per-dir UNION, and FILTERS WHOSE REFERENCES ARE
  *    ALL GROUPING KEYS of the view (a key predicate holds uniformly
  *    inside a group, so filtering view rows == filtering base rows;
  *    any predicate touching a non-key column disqualifies);
  *  - grouping expressions are attribute references forming a SUBSET
  *    of the registered keys — the view's exact grain routes to a
  *    projection of the stored rows; a coarser grain routes to a
  *    RE-AGGREGATION of the view (roll-up: counts and sums re-sum,
  *    min/max re-minimize, sketches re-union — the partial-state
  *    algebra the view stores was chosen exactly so this is sound);
  *  - every aggregate is `count(lit)` / `count(col)` / `sum(col)` /
  *    `min(col)` / `max(col)` (no DISTINCT, no filter clause) matching
  *    a registered measure BY KIND, INPUT COLUMN, and RESULT TYPE; or
  *    `avg(col)` with BOTH `sum(col)` and the non-null `count(col)`
  *    registered (the derived-measure readout re-uses Average's own
  *    `evaluateExpression` with the stored sum/count substituted for
  *    its buffer, so result type and null semantics are Spark's, not
  *    ours); or `hll_sketch_estimate(hll_sketch_agg(col))` with an
  *    `hll` measure at the same `lgConfigK` (sound because DataSketches
  *    HLL is merge-invariant: same registers whether built whole or
  *    unioned from any split — spec-asserted in MaterializedAggSpec).
  *
  * Floating-point note: a `sum`/`avg` over DOUBLE routes to a sum that
  * was accumulated in a different order than the direct query would
  * use. Spark itself does not guarantee bitwise-stable double sums
  * across partitionings, so the rewrite stays inside the engine's own
  * tolerance; exact types (integral, decimal) are bit-identical.
  *
  * The replacement re-aliases under the aggregate's ORIGINAL output
  * exprIds, so parent operators are untouched. Registration is
  * session-scoped ([[MvRewrite.register]]); inject via
  * `spark.experimental.extraOptimizations` or `GraftExtensions`
  * (plain-SQL sessions).
  *
  * The view must be CURRENT for the rewrite to be sound — the engine's
  * refresh contract (`MaterializedAgg.refresh` inside the same
  * warehouse transaction as the fact append) is what earns it. A stale
  * registration is the caller's bug, same as every MV system.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Marks aggregates this rule itself emitted (including a delta view's
    * full-recompute FALLBACK, whose shape matches the registry by
    * construction — same base paths, same keys/measures). Without the
    * tag, the extraOptimizations batch (FixedPoint) re-rewrites that
    * fallback into a FRESH provider plan on every iteration — the plans
    * are canonically equal but instance-distinct, so the batch never
    * converges and burns maxIterations on no-op rewrites.
    */
  private val RoutedTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.mv.routed")

  /** (outName, kind, input column name or None for count(*)).
    * Kinds: `count` (input None = count(*), Some = non-null count of
    * that column), `sum`, `min`, `max`, `hll` (a DataSketches HLL
    * sketch built at `lgK`, default 12 = `hll_sketch_agg`'s default).
    */
  final case class MeasureSig(name: String, kind: String, input: Option[String],
                              lgK: Option[Int] = None)

  /** Paths and plan are PROVIDERS, resolved per query: a warehouse
    * table's dir set moves with every commit, and the stored view's
    * dir moves with every refresh — a snapshot taken at registration
    * time would go stale (and stale here means WRONG ANSWERS, the one
    * thing the rule must never produce).
    */
  /** `partial = true` marks a view whose plan may hold MULTIPLE rows
    * per key (stored rows ∪ delta partials — [[registerWarehouseDelta]]):
    * routing must then MERGE even at the view's exact grain, never
    * project stored rows through.
    */
  final case class MvDef(basePaths: () => Set[String], mvPlan: () => LogicalPlan,
                         keys: Seq[String], measures: Seq[MeasureSig],
                         partial: Boolean = false)

  private val registry = new scala.collection.mutable.ArrayBuffer[MvDef]

  def register(base: DataFrame, mv: DataFrame, keys: Seq[String],
               measures: Seq[MeasureSig]): Unit = synchronized {
    val paths = rootPaths(base.queryExecution.analyzed)
    require(paths.nonEmpty, "base must be a file-backed relation")
    val mvPlan = mv.queryExecution.analyzed
    registry += MvDef(() => paths, () => mvPlan, keys, measures)
  }

  /** Warehouse-table registration: base paths and the view's plan are
    * re-derived from the CURRENT catalog on every query, so the
    * routing follows appends and refreshes automatically — provided
    * base and view move in the same commit (the engine's refresh
    * contract: `MaterializedAgg.refresh` in the same `Txn` as the
    * fact append).
    */
  def registerWarehouse(wh: graft.etl.Warehouse, baseTable: String,
                        mvTable: String, keys: Seq[String],
                        measures: Seq[MeasureSig]): Unit = synchronized {
    registry += MvDef(
      () => rootPaths(wh.read(baseTable).queryExecution.analyzed),
      () => wh.read(mvTable).queryExecution.analyzed,
      keys, measures)
  }

  /** Delta-aware registration of a PARTIAL view maintained by
    * [[graft.etl.DeltaMv]]: the routed plan is the stored view UNIONED
    * with per-grain partials of exactly the base dirs the view hasn't
    * seen ([[graft.etl.DeltaMv.currentImage]], re-derived per query) —
    * so the view can refresh on its own schedule while routed answers
    * stay exactly current, and a routed query never re-reads covered
    * dirs. `build` are the Spark-side measures (the same ones
    * `DeltaMv.refresh` uses); `measures` their signatures for
    * matching. Always merges (`partial = true`).
    */
  def registerWarehouseDelta(wh: graft.etl.Warehouse, baseTable: String,
                             mvTable: String, keys: Seq[String],
                             measures: Seq[MeasureSig],
                             build: Seq[graft.operators.MaterializedAgg.Measure])
      : Unit = synchronized {
    registry += MvDef(
      () => rootPaths(wh.read(baseTable).queryExecution.analyzed),
      () => graft.etl.DeltaMv.currentImage(wh, baseTable, mvTable, keys, build)
        .queryExecution.analyzed,
      keys, measures, partial = true)
  }

  /** Aggregate-over-JOIN view: the registered shape is ONE inner
    * equi-join of two base tables (each matched by root paths, either
    * order), aggregated at `inner.keys`. Narrow by design, like the
    * single-table rule: the query's join must be Inner with exactly
    * the registered equi pairs (any non-equi conjunct disqualifies),
    * each side must decompose to its base image through pruning
    * Projects / key-only Filters / the per-dir Union, and filters must
    * reference view keys BY THE NAME THE VIEW STORES — a predicate or
    * grouping on a join key under its other-side name does not route
    * (missed rewrite, never a wrong one). Inferred `IsNotNull(joinKey)`
    * filters are discarded before matching: an inner equi-join implies
    * them, so the view built over the same join already embodies them.
    */
  final case class JoinMvDef(leftPaths: () => Set[String],
                             rightPaths: () => Set[String],
                             keyPairs: Set[(String, String)], inner: MvDef,
                             ambiguousNames: Set[String] = Set.empty)

  private val joinRegistry = new scala.collection.mutable.ArrayBuffer[JoinMvDef]

  /** Register an aggregate-over-join view stored in the warehouse.
    * `joinKeys` are (leftCol, rightCol) equi pairs. Refresh contract:
    * the view must be rebuilt (or refreshed) in the same `Txn` as any
    * commit to EITHER base — both path providers re-derive from the
    * current catalog per query, so a stale registration routes wrong
    * answers exactly like every MV system.
    */
  def registerWarehouseJoin(wh: graft.etl.Warehouse,
                            leftTable: String, rightTable: String,
                            joinKeys: Seq[(String, String)], mvTable: String,
                            keys: Seq[String], measures: Seq[MeasureSig])
      : Unit = synchronized {
    // names living in BOTH base schemas (beyond self-named equi pairs,
    // whose two sides are equal by the join) are AMBIGUOUS under the
    // rule's name-keyed mapping — captured from the DECLARED schemas at
    // registration, because by rule time column pruning may have
    // removed the unused twin from the plan and hidden the ambiguity
    val ambiguous = wh.schemas(leftTable).fieldNames.toSet
      .intersect(wh.schemas(rightTable).fieldNames.toSet)
      .filterNot(n => joinKeys.contains((n, n)))
    joinRegistry += JoinMvDef(
      () => rootPaths(wh.read(leftTable).queryExecution.analyzed),
      () => rootPaths(wh.read(rightTable).queryExecution.analyzed),
      joinKeys.toSet,
      MvDef(() => Set.empty,
        () => wh.read(mvTable).queryExecution.analyzed, keys, measures),
      ambiguous)
  }

  def clear(): Unit = synchronized { registry.clear(); joinRegistry.clear() }

  // scheme-normalized ("file:/x" == "/x"): a skip-scan read's
  // StatsFileIndex reports unqualified local paths where a plain
  // parquet read qualifies them — same dirs, and they must match
  private def rootPaths(plan: LogicalPlan): Set[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(p => p.toUri.getPath)
      case _ => Nil
    }
  }.flatten.toSet

  /** The aggregate's child decomposed into (base-image root paths,
    * filters found on the way down). Descends through pure column-
    * pruning Projects, Filters, and the warehouse's per-dir UNION; any
    * other operator (join, generate, window, …) disqualifies. By the
    * time this rule runs the optimizer has usually replicated a
    * query-level filter into every union branch — branches must carry
    * the SAME predicate set (compared structurally with attributes
    * name-canonicalized, since each branch has its own exprIds).
    */
  private def imageFiltered(plan: LogicalPlan): Option[(Set[String], Seq[Expression])] =
    plan match {
      case lr: LogicalRelation => Some((rootPaths(lr), Nil))
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
        imageFiltered(child)
      case Filter(cond, child) =>
        imageFiltered(child).map { case (p, cs) => (p, cond +: cs) }
      case u: Union =>
        val parts = u.children.map(imageFiltered)
        if (parts.exists(_.isEmpty)) None
        else {
          val keys = parts.map(_.get._2.map(condKey))
          if (keys.distinct.size == 1)
            Some((parts.flatMap(_.get._1).toSet, parts.head.get._2))
          else None
        }
      case _ => None
    }

  /** Name-canonical form of a predicate, for cross-branch comparison
    * only (never executed): attribute identity reduced to the column
    * name, then Catalyst canonicalization for commutative ordering.
    */
  private def condKey(e: Expression): Expression =
    e.transform { case a: AttributeReference => Literal("attr:" + a.name) }
      .canonicalized

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate if agg.getTagValue(RoutedTag).isEmpty =>
      val rewritten = for {
        (paths, filters) <- imageFiltered(agg.child) if paths.nonEmpty
        d <- synchronized(registry.toSeq).find(_.basePaths() == paths)
        out <- tryRewrite(agg, filters, d)
      } yield out
      lazy val joinRewritten = for {
        (lp, rp, pairs, ambiguous, filters) <- imageJoined(agg.child)
        // a name present on BOTH join sides without being an equi pair
        // is ambiguous under the rule's name-keyed mapping: a filter or
        // aggregate over it could bind to the OTHER side's values in
        // the view. Disqualify rather than guess — missed rewrite, never
        // a wrong one. (Equi-pair names are exempt: the join equality
        // makes both sides' values identical.)
        if ambiguous.isEmpty ||
          (agg.references.map(_.name).toSet ++
            filters.flatMap(_.references.map(_.name))).intersect(ambiguous).isEmpty
        d <- synchronized(joinRegistry.toSeq).find(j =>
          (j.leftPaths() == lp && j.rightPaths() == rp && j.keyPairs == pairs) ||
            (j.leftPaths() == rp && j.rightPaths() == lp &&
              j.keyPairs == pairs.map(_.swap)))
        // registration-time ambiguity: names in BOTH base SCHEMAS (the
        // plan-side check above can be blinded by column pruning)
        if (agg.references.map(_.name).toSet ++
          filters.flatMap(_.references.map(_.name)))
          .intersect(d.ambiguousNames).isEmpty
        out <- tryRewrite(agg, filters, d.inner)
      } yield out
      rewritten.orElse(joinRewritten)
        .map { out =>
          out.foreach { case a: Aggregate => a.setTagValue(RoutedTag, ()); case _ => () }
          out
        }
        .getOrElse(agg)
  }

  /** The aggregate's child decomposed as ONE inner equi-join of two
    * base images: (left paths, right paths, equi pairs as
    * (leftName, rightName), filters from above the join and both
    * sides, inferred join-key IsNotNulls dropped).
    */
  private def imageJoined(plan: LogicalPlan)
      : Option[(Set[String], Set[String], Set[(String, String)], Set[String], Seq[Expression])] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
        imageJoined(child)
      case Filter(cond, child) =>
        imageJoined(child).map { case (l, r, p, amb, cs) => (l, r, p, amb, cond +: cs) }
      case Join(left, right, Inner, Some(cond), _) =>
        for {
          (lp, lf) <- imageFiltered(left) if lp.nonEmpty
          (rp, rf) <- imageFiltered(right) if rp.nonEmpty
          pairs <- equiPairs(cond, left.outputSet, right.outputSet)
        } yield {
          // the join-key ATTRIBUTES (not names): an inferred IsNotNull
          // must only be discarded for the key attribute itself — a
          // same-named NON-key column's IsNotNull is a genuine user
          // predicate the inner join does not imply
          val keyAttrs = conjuncts(cond).flatMap {
            case EqualTo(a: AttributeReference, b: AttributeReference) => Seq(a, b)
            case _ => Nil
          }
          // names living on BOTH sides that are NOT an equi pair of
          // themselves — the name-keyed mapping downstream cannot tell
          // the two columns apart (see apply's disqualifier)
          val ambiguous = left.output.map(_.name).toSet
            .intersect(right.output.map(_.name).toSet)
            .filterNot(n => pairs.contains((n, n)))
          // split pushed compound conditions so an inferred join-key
          // IsNotNull buried inside an And can be discarded alone
          val kept = (lf ++ rf).flatMap(conjuncts).filterNot {
            case IsNotNull(a: AttributeReference) =>
              keyAttrs.exists(_.semanticEquals(a))
            case _ => false
          }
          (lp, rp, pairs, ambiguous, kept)
        }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** The join condition as pure equi pairs oriented (left, right);
    * any other conjunct disqualifies.
    */
  private def equiPairs(cond: Expression, left: AttributeSet, right: AttributeSet)
      : Option[Set[(String, String)]] = {
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (left.contains(a) && right.contains(b)) Some((a.name, b.name))
        else if (left.contains(b) && right.contains(a)) Some((b.name, a.name))
        else None
      case _ => None
    }
    if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten.toSet)
  }

  private def tryRewrite(agg: Aggregate, filters: Seq[Expression],
                         d: MvDef): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    if (groupNames.exists(_.isEmpty)) return None
    val queryKeys = groupNames.flatten.toSet
    if (!queryKeys.subsetOf(d.keys.toSet)) return None

    val mvPlan = d.mvPlan()
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap

    for {
      cond <- rewriteFilters(filters, d, mvOut)
      child = cond.map(Filter(_, mvPlan)).getOrElse(mvPlan)
      out <-
        if (queryKeys == d.keys.toSet && !d.partial)
          projectRewrite(agg.aggregateExpressions, d, mvOut, child)
        else rollupRewrite(agg, d, mvOut, child)
    } yield out
  }

  /** Map the pushed-down filters onto the view's attributes. Sound
    * only when every reference is a grouping key (constant within its
    * group); deterministic, no subqueries. Returns None to disqualify
    * the whole rewrite, Some(None) when there is nothing to filter.
    */
  private def rewriteFilters(filters: Seq[Expression], d: MvDef,
                             mvOut: Map[String, Attribute]): Option[Option[Expression]] = {
    if (filters.isEmpty) return Some(None)
    val cond = filters.reduce(And)
    val mappable = cond.references.forall { r =>
      d.keys.contains(r.name) && mvOut.get(r.name).exists(_.dataType == r.dataType)
    }
    val clean = cond.deterministic &&
      cond.collectFirst { case p: PlanExpression[_] => p }.isEmpty
    if (!mappable || !clean) None
    else Some(Some(cond.transform {
      case a: AttributeReference => mvOut(a.name)
    }))
  }

  // ---------------------------------------------------------------------
  // Exact-grain path: query keys == view keys; measures read straight off
  // the stored row (avg derived from sum/count, sketches estimated).
  // ---------------------------------------------------------------------

  private def projectRewrite(aggExprs: Seq[NamedExpression], d: MvDef,
                             mvOut: Map[String, Attribute],
                             child: LogicalPlan): Option[LogicalPlan] = {
    val projected = aggExprs.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name) if d.keys.contains(a.name) =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, name)(exprId = al.exprId))
      case al @ Alias(e, name) =>
        readout(e, al, d, mvOut).map(r => Alias(r, name)(exprId = al.exprId))
      case _ => None
    }
    if (projected.exists(_.isEmpty)) None
    else Some(Project(projected.flatten, child))
  }

  /** Stored-row readout for one aggregate at the view's own grain. */
  private def readout(e: Expression, al: Alias, d: MvDef,
                      mvOut: Map[String, Attribute]): Option[Expression] = e match {
    case ae: AggregateExpression if simple(ae) =>
      ae.aggregateFunction match {
        case a: Average => avgReadout(a, d, mvOut)
        case f => measureOf(f, d).flatMap(m => mvOut.get(m.name))
          .filter(_.dataType == al.dataType)
      }
    case HllSketchEstimate(ae: AggregateExpression) if simple(ae) =>
      ae.aggregateFunction match {
        case h: HllSketchAgg => hllMeasure(h, d, mvOut).map(HllSketchEstimate(_))
        case _ => None
      }
    case _ => None
  }

  /** avg(col) = Average's own final-result expression with the stored
    * sum/count substituted for its aggregation buffer — result type,
    * decimal precision handling, and divide-null semantics are exactly
    * the ones the unrewritten query would have had.
    */
  private def avgReadout(a: Average, d: MvDef,
                         mvOut: Map[String, Attribute]): Option[Expression] =
    for {
      in <- attrChild(a.child)
      sumA <- find(d, mvOut, "sum", Some(in.name))
      cntA <- find(d, mvOut, "count", Some(in.name))
      if cntA.dataType == LongType
      sumE <- widen(sumA, a.sumDataType)
    } yield substituteAvg(a, sumE, cntA)

  private def substituteAvg(a: Average, sumE: Expression, cntE: Expression): Expression =
    a.evaluateExpression.transformUp {
      case ar: AttributeReference if ar.exprId == a.sum.exprId => sumE
      case ar: AttributeReference if ar.exprId == a.count.exprId => cntE
    }

  // ---------------------------------------------------------------------
  // Roll-up path: query keys ⊂ view keys; the view re-aggregates with the
  // partial-state merge algebra (counts/sums re-sum, min/max re-minimize,
  // sketches re-union), output cast back to the query's own result types.
  // ---------------------------------------------------------------------

  private def rollupRewrite(agg: Aggregate, d: MvDef,
                            mvOut: Map[String, Attribute],
                            child: LogicalPlan): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
      case _ => None
    }
    if (groupAttrs.exists(_.isEmpty)) return None

    val out = agg.aggregateExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name) if d.keys.contains(a.name) =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, name)(exprId = al.exprId))
      case al @ Alias(e, name) =>
        remerge(e, al, d, mvOut).map(r => Alias(r, name)(exprId = al.exprId))
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else Some(Aggregate(groupAttrs.map(_.get), out.flatten, child))
  }

  /** Re-aggregation expression for one aggregate at a coarser grain. */
  private def remerge(e: Expression, al: Alias, d: MvDef,
                      mvOut: Map[String, Attribute]): Option[Expression] = e match {
    case ae: AggregateExpression if simple(ae) =>
      ae.aggregateFunction match {
        case _: Count =>
          // sum of stored group counts; 0 (not null) on empty input,
          // matching count's own empty-relation result
          measureOf(ae.aggregateFunction, d).flatMap(m => mvOut.get(m.name))
            .filter(_.dataType == LongType)
            .map(v => Coalesce(Seq(aggOf(Sum(v)), Literal(0L))))
        case _: Sum =>
          measureOf(ae.aggregateFunction, d).flatMap(m => mvOut.get(m.name)).map { v =>
            val re = aggOf(Sum(v)) // may widen (decimal p+10); cast back
            if (re.dataType == al.dataType) re else Cast(re, al.dataType)
          }
        case _: Min =>
          measureOf(ae.aggregateFunction, d).flatMap(m => mvOut.get(m.name))
            .filter(_.dataType == al.dataType).map(v => aggOf(Min(v)))
        case _: Max =>
          measureOf(ae.aggregateFunction, d).flatMap(m => mvOut.get(m.name))
            .filter(_.dataType == al.dataType).map(v => aggOf(Max(v)))
        case a: Average =>
          for {
            in <- attrChild(a.child)
            sumA <- find(d, mvOut, "sum", Some(in.name))
            cntA <- find(d, mvOut, "count", Some(in.name))
            if cntA.dataType == LongType
            reSum = aggOf(Sum(sumA))
            sumE <- if (reSum.dataType == a.sumDataType) Some(reSum)
                    else Some(Cast(reSum, a.sumDataType))
          } yield substituteAvg(a, sumE, aggOf(Sum(cntA)))
        case _ => None
      }
    case HllSketchEstimate(ae: AggregateExpression) if simple(ae) =>
      ae.aggregateFunction match {
        case h: HllSketchAgg => hllMeasure(h, d, mvOut)
          .map(v => HllSketchEstimate(aggOf(new HllUnionAgg(v, Literal(false)))))
        case _ => None
      }
    case _ => None
  }

  // ---------------------------------------------------------------------
  // Shared matching helpers
  // ---------------------------------------------------------------------

  private def simple(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty

  private def aggOf(f: AggregateFunction): AggregateExpression =
    AggregateExpression(f, Complete, isDistinct = false)

  private def attrChild(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case _ => None
  }

  private def find(d: MvDef, mvOut: Map[String, Attribute], kind: String,
                   input: Option[String]): Option[Attribute] =
    d.measures.find(m => m.kind == kind && m.input == input)
      .flatMap(m => mvOut.get(m.name))

  /** The registered measure matching a plain aggregate function, by
    * kind + input column.
    */
  private def measureOf(f: AggregateFunction, d: MvDef): Option[MeasureSig] = f match {
    case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
      d.measures.find(m => m.kind == "count" && m.input.isEmpty)
    case c: Count => c.children match {
      case Seq(a: AttributeReference) =>
        d.measures.find(m => m.kind == "count" && m.input.contains(a.name))
      case _ => None
    }
    case s: Sum => attrChild(s.child).flatMap(a =>
      d.measures.find(m => m.kind == "sum" && m.input.contains(a.name)))
    case m: Min => attrChild(m.child).flatMap(a =>
      d.measures.find(ms => ms.kind == "min" && ms.input.contains(a.name)))
    case m: Max => attrChild(m.child).flatMap(a =>
      d.measures.find(ms => ms.kind == "max" && ms.input.contains(a.name)))
    case _ => None
  }

  private def hllMeasure(h: HllSketchAgg, d: MvDef,
                         mvOut: Map[String, Attribute]): Option[Attribute] =
    attrChild(h.left).flatMap { a =>
      d.measures.find(m => m.kind == "hll" && m.input.contains(a.name) &&
          m.lgK.getOrElse(12) == h.lgConfigK)
        .flatMap(m => mvOut.get(m.name))
    }

  /** The stored sum adapted to Average's accumulator type: identical
    * types pass through; an exact integral sum widens to the double
    * accumulator (the direct query accumulates in double from the
    * start, with at-least-as-much rounding). Anything else — e.g. a
    * decimal stored sum against a double accumulator — disqualifies.
    */
  private def widen(attr: Attribute, target: org.apache.spark.sql.types.DataType): Option[Expression] =
    if (attr.dataType == target) Some(attr)
    else (attr.dataType, target) match {
      case (ByteType | ShortType | IntegerType | LongType, DoubleType) =>
        Some(Cast(attr, DoubleType))
      case _ => None
    }
}
