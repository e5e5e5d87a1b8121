package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType,
  LongType}

/** AUTOMATIC AGGREGATE REWRITE onto incremental materialized views —
  * the classic OLAP answer-query-from-summary optimization (the
  * Calcite/"materialized view matching" literature shape): a grouped
  * aggregate over a versioned table is answered from a registered
  * [[MaterializedView]] of that table when — and only when — the view
  * provably holds the same answer. At 100 TB this turns a fact-table
  * rollup (read everything, shuffle, aggregate) into a read of an
  * already-aggregated view that is smaller by the group cardinality
  * ratio — the same plan a user would hand-write against the view,
  * minted automatically and *safely*:
  *
  *  - '''Registry-gated''': only views opted in through
  *    [[MaterializedView.enableRewrite]] participate. Nothing changes
  *    for any query until a view is explicitly enabled.
  *  - '''Freshness-gated, snapshot-exact''': the rewrite fires only
  *    when the view's refresh watermark equals the EXACT source
  *    version the query's scan was planned against
  *    ([[GraftFileIndex.snapshotVersion]]) — not "the current head",
  *    which may have moved since planning. A stale view (or a
  *    time-traveling query the view is AHEAD of) never substitutes;
  *    the query silently keeps its base-table plan.
  *  - '''Exactness-preserving only''': `count( * )`, `count(c)`,
  *    `sum(c)`, `min(c)`, `max(c)`, `avg(c)` — aggregates whose rollup
  *    compensation over the view's STORED state is the same arithmetic
  *    the direct plan performs (partial aggregation reorders floating
  *    additions identically). Sketch aggregates
  *    (`approx_count_distinct`: a different estimator than Spark's
  *    HLL++) and the second moments (stored state is double-cast) are
  *    never rewritten; `avg` over decimals is declined (Spark's
  *    decimal `avg` rounds differently than sum/count division).
  *    DISTINCT and FILTER-ed aggregates decline.
  *  - '''Rollup compensation''': the query may group by any SUBSET of
  *    the view's grouping columns — `count( * ) → sum(_mv_gcount)`,
  *    `count(c) → sum(_mv_cnt)`, `sum → sum(_mv_sum)`,
  *    `min/max → min/max(_mv_min/_mv_max)`,
  *    `avg → sum(_mv_sum)/sum(_mv_cnt)` (NULL-correct: a group whose
  *    non-null values all died folds to null/0 = null, matching
  *    recompute) — and filter on any subset of the grouping columns
  *    (filters commute with grouping; they prune the view's own
  *    indexed scan). Anything else — a filter or aggregate touching a
  *    non-group column, an expression group key, a view defined with
  *    its own WHERE — declines.
  *
  * The rule installs per session via
  * `spark.experimental.extraOptimizations` (so it is live on ANY
  * session the moment a view is enabled — no extension config), and
  * every decision path is fail-open: any metadata error, shape
  * mismatch, or type drift returns the original plan untouched. The
  * rewritten subtree reads the view through [[GraftScan.read]], so
  * stats/partition pruning and deletion vectors apply to the view
  * exactly as to any table, and the output [[Alias]]es carry the
  * original expression ids — parents of the aggregate resolve
  * unchanged.
  *
  * Provenance: reference's static rollups (`wiki/ddl.sql`,
  * `queries.py:34-64`) re-read their base tables on every refresh;
  * this engine's MVs maintain incrementally and — with this rule —
  * serve matching queries transparently.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Install onto a session (idempotent) — called by
    * [[MaterializedView.enableRewrite]].
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!MaterializedView.rewriteEnabledAnywhere) plan
    else plan.transformDown {
      case agg: Aggregate =>
        try tryRewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }

  /** The aggregate's child unwrapped to a graft snapshot scan:
    * attribute-only Projects pass through, Filters collect (they sit
    * below the Aggregate after predicate pushdown, above it never —
    * the optimizer has already run), anything else declines.
    */
  private def unwrap(p: LogicalPlan, conds: Seq[Expression])
      : Option[(GraftFileIndex, Seq[Expression])] = p match {
    case f: Filter if f.condition.deterministic =>
      unwrap(f.child, conds :+ f.condition)
    case pr: Project
        if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(pr.child, conds)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case gi: GraftFileIndex => Some((gi, conds))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val spark = SparkSession.active
    for {
      (gi, conds) <- unwrap(agg.child, Nil)
      if gi.snapshotVersion >= 0
      rewritten <- MaterializedView.rewriteCandidates(gi.tablePath)
        .to(LazyList)
        .flatMap(v => matchView(spark, agg, gi, conds, v))
        .headOption
    } yield rewritten
  }

  /** One candidate view against the aggregate: all gates below, then
    * the compensated Aggregate over the view's indexed scan.
    */
  private def matchView(spark: SparkSession, agg: Aggregate,
                        gi: GraftFileIndex, conds: Seq[Expression],
                        viewPath: String): Option[LogicalPlan] = {
    val vd = MaterializedView.rewriteDefinition(spark, viewPath)
    if (vd.where.nonEmpty) return None
    // snapshot-exact freshness: the view reflects EXACTLY the source
    // version this scan was planned against
    if (MaterializedView.refreshedVersion(spark, viewPath)
        != gi.snapshotVersion) return None

    val groupColSet = vd.groupCols.map(_.toLowerCase).toSet
    // group keys: plain attributes, each a view grouping column
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if groupColSet(a.name.toLowerCase) => a
      case _ => return None
    }
    // filters reference grouping columns only (they commute with the
    // group-by and prune the view's scan)
    if (!conds.forall(_.references.forall(a =>
        groupColSet(a.name.toLowerCase)))) return None

    // the view's raw stored frame: group columns + _mv_* state,
    // pruned/DV-correct like any versioned-table read
    val viewPlan = GraftScan.read(spark, viewPath).queryExecution.analyzed
    val vOut: Map[String, Attribute] =
      viewPlan.output.map(a => a.name.toLowerCase -> a).toMap
    def vAttr(n: String): Option[Attribute] = vOut.get(n.toLowerCase)

    def sumOf(a: Attribute): Expression =
      new Sum(a).toAggregateExpression()
    def countLike(stateCol: String): Option[Expression] =
      vAttr(stateCol).map(c => Coalesce(Seq(sumOf(c), Literal(0L))))
    // the def whose stored state serves column `c` for kind `fns`
    def defFor(c: String, fns: Set[String]): Option[MaterializedView.AggDef] =
      vd.aggs.find(a => fns(a.fn) && a.col.equalsIgnoreCase(c))

    def compensate(fn: AggregateFunction, target: DataType)
        : Option[Expression] = {
      val e: Option[Expression] = fn match {
        // count over non-null constants only: `count(null)` is 0 per
        // row-set, NOT the group's row count — it must decline
        case Count(cs) if cs.forall(c =>
            c.foldable && c.eval(null) != null) =>
          countLike("_mv_gcount")
        case Count(Seq(a: AttributeReference)) =>
          defFor(a.name, Set("count", "sum", "avg"))
            .filter(d => !(d.fn == "count" && d.col == "*"))
            .flatMap(d => countLike(s"_mv_cnt_${d.alias}"))
        case Sum(a: AttributeReference, _) =>
          defFor(a.name, Set("sum", "avg"))
            .flatMap(d => vAttr(s"_mv_sum_${d.alias}")).map(sumOf)
        case Min(a: AttributeReference) =>
          defFor(a.name, Set("min"))
            .flatMap(d => vAttr(s"_mv_min_${d.alias}"))
            .map(c => Min(c).toAggregateExpression())
        case Max(a: AttributeReference) =>
          defFor(a.name, Set("max"))
            .flatMap(d => vAttr(s"_mv_max_${d.alias}"))
            .map(c => Max(c).toAggregateExpression())
        case Average(a: AttributeReference, _)
            if !a.dataType.isInstanceOf[DecimalType] =>
          defFor(a.name, Set("sum", "avg")).flatMap { d =>
            for {
              s <- vAttr(s"_mv_sum_${d.alias}")
              c <- vAttr(s"_mv_cnt_${d.alias}")
            } yield new Divide(Cast(sumOf(s), DoubleType),
              Cast(sumOf(c), DoubleType))
          }
        case _ => None
      }
      e.map(x => if (x.dataType == target) x else Cast(x, target))
    }

    val groupIds = groupAttrs.map(_.exprId).toSet
    // one output expression, recursively: aggregates compensate, group
    // attributes rebind to the view's columns, deterministic scaffolding
    // (round, arithmetic, literals) carries over its compensated
    // children. MANUAL recursion, not `transform` — a transform would
    // descend into the freshly-built compensation and try to compensate
    // its inner Sum(_mv_*) again.
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case _ if !e.deterministic => None
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        compensate(ae.aggregateFunction, ae.dataType)
      // DISTINCT over VIEW GROUPING columns is exactly answerable — the
      // view holds every live group tuple once, so the argument's
      // distinct value set per query-group is identical over the view's
      // rows (the `COUNT(DISTINCT user_id) GROUP BY day` shape from a
      // (day, user_id) view): same function, arguments rebound, the
      // DISTINCT flag kept (view rows still repeat an argument across
      // the residual grouping columns)
      case ae: AggregateExpression
          if ae.isDistinct && ae.filter.isEmpty &&
            ae.aggregateFunction.children.nonEmpty &&
            ae.aggregateFunction.children.forall {
              case a: AttributeReference => groupColSet(a.name.toLowerCase)
              case _ => false
            } && (ae.aggregateFunction match {
              case _: Count | _: Sum | _: Min | _: Max | _: Average => true
              case _ => false
            }) =>
        val rebound = ae.aggregateFunction.children.map {
          case a: AttributeReference => vAttr(a.name).getOrElse(return None)
        }
        Some(ae.copy(aggregateFunction = ae.aggregateFunction
          .withNewChildren(rebound).asInstanceOf[AggregateFunction]))
      case _: AggregateExpression => None
      case a: AttributeReference =>
        if (groupIds(a.exprId)) vAttr(a.name) else None
      case _ if e.children.isEmpty => Some(e)
      case _ =>
        val ch = e.children.map(rewriteExpr)
        if (ch.exists(_.isEmpty)) None
        else Some(e.withNewChildren(ch.map(_.get)))
    }
    val newOutput: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupIds(a.exprId) =>
        vAttr(a.name) match {
          case Some(v) => Alias(v, a.name)(exprId = a.exprId,
            qualifier = a.qualifier)
          case None => return None
        }
      case al @ Alias(child, name) =>
        rewriteExpr(child) match {
          case Some(c) => Alias(c, name)(exprId = al.exprId,
            qualifier = al.qualifier)
          case None => return None
        }
      case _ => return None
    }

    val newGroups: Seq[Expression] = groupAttrs.map(a =>
      vAttr(a.name).getOrElse(return None))
    val rebound = conds.map(_.transform {
      case a: AttributeReference => vAttr(a.name).getOrElse(return None)
    })
    val child = rebound.foldLeft(viewPlan)((p, c) => Filter(c, p))
    val out = Aggregate(newGroups, newOutput, child, None)
    // safety net: the substituted plan must expose byte-identical
    // output types — anything else is a compensation bug, so decline
    if (out.output.map(_.dataType) != agg.output.map(_.dataType)) None
    else Some(out)
  }
}
