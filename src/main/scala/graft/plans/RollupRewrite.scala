package graft.plans

import graft.operators.RollupNav
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

/** Optimizer rule: route a fact-table aggregate to its materialized
  * [[RollupNav]] cube — the classic materialized-view rewrite, applied
  * to the one view shape this engine materializes (day × dims, additive
  * partials). Callers keep writing the plain aggregate against the fact
  * table; when a registered cube can answer it, the fact scan is
  * replaced by the (day-partition-pruned, kilobytes-sized) rollup scan
  * with each aggregate re-expressed over the stored partials:
  *
  *   count(*)        → sum(n_rows)
  *   sum(m)          → sum(m_sum)
  *   min(m) / max(m) → min(m_min) / max(m_max)
  *
  * Soundness is the same additivity argument as [[RollupNav.answer]]
  * (exact integer partials re-aggregate losslessly), so the rewrite is
  * value-IDENTICAL, proven by the q_agg_routed_rollup oracle hash. The
  * rule is conservative exactly where the router is: it fires only when
  * every grouping expression is a cube dim, the day column, or a
  * day-coarsening (trunc/date_trunc/cast over day), and every aggregate
  * is a plain non-distinct, unfiltered COUNT(*)/SUM/MIN/MAX over a cube
  * measure — anything else (DISTINCT, AVG, FILTER clauses, non-cube
  * columns, predicates between the aggregate and the scan) leaves the
  * plan untouched and the fact table answers as before.
  *
  * Matching is by scan identity: [[register]] records the fact table's
  * qualified root path; the cube's file list resolves through its
  * [[StoreManifest]] pointer at REWRITE time, so a routed answer always
  * reads the current committed version — maintenance batches need no
  * re-register. Output attribute ids and names are preserved
  * through aliases, so parents of the Aggregate are untouched — the
  * standard view-rewrite discipline.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** One registered cube: fact scan root path → cube dir + shape. */
  private case class Reg(factPath: String, cubeDir: String,
                         rollup: RollupNav.Rollup)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Reg]()

  private def qualify(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Register `cubeDir` (built by [[RollupNav.materialize]] over the
    * fact parquet at `factDir`) as the routing target for aggregates
    * scanning `factDir`. The cube's manifest is resolved PER ROUTED
    * QUERY (a metadata-sized read that only happens when a matching
    * fact aggregate is being rewritten), so answers are never stale
    * after [[RollupNav.maintain]] commits new days — no re-register
    * contract.
    */
  def register(spark: SparkSession, factDir: String, cubeDir: String,
               rollup: RollupNav.Rollup): Unit = {
    registry.put(qualify(spark, factDir),
      Reg(qualify(spark, factDir), cubeDir, rollup))
    ()
  }

  def clear(): Unit = registry.clear()

  /** Idempotently append this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
    }

  // ---------------------------------------------------------------------

  /** The fact scan under the aggregate plus the Project aliases between
    * them (the optimizer extracts complex grouping expressions into a
    * Project as `_groupingexpression#N`); anything but pure
    * attributes-and-aliases between aggregate and scan → not routable.
    */
  private def scanOf(p: LogicalPlan)
      : Option[(LogicalRelation, Map[ExprId, Expression])] = p match {
    case lr: LogicalRelation => Some((lr, Map.empty))
    case Project(projs, lr: LogicalRelation)
      if projs.forall {
        case _: AttributeReference => true
        case Alias(_, _)           => true
        case _                     => false
      } =>
      Some((lr, projs.collect { case a @ Alias(e, _) => a.exprId -> e }.toMap))
    case _ => None
  }

  private def rootPath(lr: LogicalRelation): Option[String] = lr.relation match {
    case h: HadoopFsRelation if h.location.rootPaths.length == 1 =>
      Some(h.location.rootPaths.head.toString)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        (for {
          (lr, aliases) <- scanOf(child)
          path <- rootPath(lr)
          reg <- Option(registry.get(path))
          rewritten <- rewrite(agg, reg, aliases)
        } yield rewritten).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, reg: Reg,
                      aliases: Map[ExprId, Expression]): Option[LogicalPlan] = {
    // resolve the cube's CURRENT committed version (manifest read —
    // metadata-sized, and only on an actually-routed aggregate); fresh
    // relation instance per rewrite keeps exprIds self-join-safe
    val cube = RollupNav.readStore(SparkSession.active, reg.cubeDir)
      .queryExecution.analyzed.transformUp {
        case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      }
    val cubeAttr: Map[String, Attribute] = cube.output.map(a => a.name -> a).toMap
    val dims = reg.rollup.dims.toSet
    val measures = reg.rollup.measures.toSet

    // map a fact-side GROUPING expression onto the cube; None = not routable
    def grouping(e: Expression): Option[Expression] = e match {
      // an extracted `_groupingexpression` alias inlines first
      case a: AttributeReference if aliases.contains(a.exprId) =>
        grouping(aliases(a.exprId))
      case a: AttributeReference if dims.contains(a.name) => cubeAttr.get(a.name)
      case a: AttributeReference if a.name == "day" =>
        // cube stores day as the STRING partition value; yyyy-MM-dd casts
        // back to the fact's DATE exactly
        cubeAttr.get("day").map(Cast(_, DateType))
      case t @ TruncDate(sub, _: Literal) =>
        grouping(sub).map(s => t.copy(date = s))
      case t @ TruncTimestamp(_: Literal, sub, _) =>
        grouping(sub).map(s => t.copy(timestamp = s))
      case c @ Cast(sub, _, _, _) => grouping(sub).map(s => c.copy(child = s))
      case _ => None
    }

    // a MEASURE reference must be the scan's own column: an attribute
    // the child Project ALIASED (e.g. v_us redefined as v_us * 2)
    // shares the name but not the semantics — routing it to the raw
    // partials would be silently wrong, so those bail
    def isMeasure(a: AttributeReference): Boolean =
      measures.contains(a.name) && !aliases.contains(a.exprId)

    // map a fact-side AGGREGATE call onto the stored partials
    def aggFn(ae: AggregateExpression): Option[AggregateExpression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.foldable) =>
          // COUNT(*) / COUNT(1): n_rows partials re-aggregate by SUM;
          // sum-of-longs returns LongType, matching count's type
          cubeAttr.get("n_rows").map(n => ae.copy(aggregateFunction = Sum(n)))
        case s @ Sum(a: AttributeReference, _) if isMeasure(a) =>
          cubeAttr.get(s"${a.name}_sum")
            .map(p => ae.copy(aggregateFunction = s.copy(child = p)))
        case m @ Min(a: AttributeReference) if isMeasure(a) =>
          cubeAttr.get(s"${a.name}_min")
            .map(p => ae.copy(aggregateFunction = m.copy(child = p)))
        case m @ Max(a: AttributeReference) if isMeasure(a) =>
          cubeAttr.get(s"${a.name}_max")
            .map(p => ae.copy(aggregateFunction = m.copy(child = p)))
        case _ => None
      }
    }

    // a GLOBAL aggregate must not route: count(*) over an empty cube
    // would become sum(n_rows) = NULL where count = 0 — the one case
    // where the partial re-aggregation is not value-identical
    if (agg.groupingExpressions.isEmpty) return None
    val newGrouping = agg.groupingExpressions.map(grouping)
    if (newGrouping.exists(_.isEmpty)) return None
    val groupMap: Map[Expression, Expression] =
      agg.groupingExpressions.zip(newGrouping.map(_.get)).toMap

    // result expressions: preserve every output name AND exprId so the
    // Aggregate's parents never notice the swap
    val newResults: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(ae: AggregateExpression, name) =>
        aggFn(ae).map(f => Alias(f, name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata))
      case al @ Alias(e, name) if groupMap.contains(e) =>
        Some(Alias(groupMap(e), name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata))
      case ar: AttributeReference if groupMap.contains(ar) =>
        Some(Alias(groupMap(ar), ar.name)(exprId = ar.exprId))
      case _ => None // anything else (expressions over aggs, literals…): bail
    }
    if (newResults.exists(_.isEmpty)) return None
    Some(Aggregate(newGrouping.map(_.get), newResults.map(_.get), cube))
  }
}
