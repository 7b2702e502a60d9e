package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  *    the same table), bare or under the optimizer's own column-
  *    pruning Project; any OTHER intervening operator (a filter, a
  *    join) disqualifies — the stored view doesn't cover filtered
  *    aggregates;
  *  - grouping expressions are exactly the registered keys (any
  *    order, attribute references only);
  *  - every aggregate is `count(lit)` / `sum(col)` / `min(col)` /
  *    `max(col)` (no DISTINCT, no filter clause) matching a registered
  *    measure BY KIND, INPUT COLUMN, and RESULT TYPE. Sketch measures
  *    never match here — their stored state is not the query's result.
  *
  * The replacement is a Project over the view's plan that re-aliases
  * view columns under the aggregate's ORIGINAL output exprIds, so
  * parent operators are untouched. Registration is session-scoped
  * ([[MvRewrite.register]]); inject via `spark.experimental
  * .extraOptimizations` or `GraftExtensions` (plain-SQL sessions).
  *
  * The view must be CURRENT for the rewrite to be sound — the engine's
  * refresh contract (`MaterializedAgg.refresh` inside the same
  * warehouse transaction as the fact append) is what earns it. A stale
  * registration is the caller's bug, same as every MV system.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** (outName, kind, input column name or None for count). */
  final case class MeasureSig(name: String, kind: String, input: Option[String])

  /** Paths and plan are PROVIDERS, resolved per query: a warehouse
    * table's dir set moves with every commit, and the stored view's
    * dir moves with every refresh — a snapshot taken at registration
    * time would go stale (and stale here means WRONG ANSWERS, the one
    * thing the rule must never produce).
    */
  final case class MvDef(basePaths: () => Set[String], mvPlan: () => LogicalPlan,
                         keys: Seq[String], measures: Seq[MeasureSig])

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

  def clear(): Unit = synchronized { registry.clear() }

  private def rootPaths(plan: LogicalPlan): Set[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case _ => Nil
    }
  }.flatten.toSet

  /** The root paths of the aggregate's child when it is the bare table
    * image — file relations under nothing but pure column-pruning
    * Projects and the warehouse's per-dir UNION (a date-partitioned
    * table reads as one scan per dir). Anything else (filter, join,
    * generate, …) disqualifies: the stored view doesn't cover it.
    */
  private def imagePaths(plan: LogicalPlan): Option[Set[String]] = plan match {
    case lr: LogicalRelation => Some(rootPaths(lr))
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
      imagePaths(child)
    case u: Union =>
      val cs = u.children.map(imagePaths)
      if (cs.forall(_.isDefined)) Some(cs.flatMap(_.get).toSet) else None
    case _ => None
  }

  private def sigOf(e: Expression): Option[(String, Option[String])] = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
          Some(("count", None))
        case s: Sum => s.child match {
          case a: AttributeReference => Some(("sum", Some(a.name)))
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference => Some(("min", Some(a.name)))
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference => Some(("max", Some(a.name)))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate =>
      val rewritten = for {
        paths <- imagePaths(agg.child) if paths.nonEmpty
        d <- synchronized(registry.toSeq).find(_.basePaths() == paths)
        out <- tryRewrite(agg.groupingExpressions, agg.aggregateExpressions, d)
      } yield out
      rewritten.getOrElse(agg)
  }

  private def tryRewrite(groupings: Seq[Expression],
                         aggExprs: Seq[NamedExpression],
                         d: MvDef): Option[LogicalPlan] = {
    val groupNames = groupings.map {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    if (groupNames.exists(_.isEmpty) ||
        groupNames.flatten.toSet != d.keys.toSet) return None
    val mvPlan = d.mvPlan()
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap

    val projected = aggExprs.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        mvOut.get(a.name).filter(_.dataType == a.dataType)
          .map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case al @ Alias(e, name) =>
        sigOf(e).flatMap { case (kind, input) =>
          d.measures.find(m => m.kind == kind && m.input == input)
            .flatMap(m => mvOut.get(m.name))
            .filter(_.dataType == al.dataType)
            .map(mv => Alias(mv, name)(exprId = al.exprId))
        }
      case _ => None
    }
    if (projected.exists(_.isEmpty)) None
    else Some(Project(projected.flatten, mvPlan))
  }
}
