package graft.plans

import graft.operators.RollupNav
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
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
  * every grouping expression AND every scan-side filter predicate is a
  * deterministic function of cube keys (dims, the day column, or any
  * day-coarsening — a key-only predicate keeps or drops whole
  * (day, dims) groups, so day-range dashboards route WITH their range,
  * which prunes the cube's day partitions), and every aggregate is a
  * plain non-distinct, unfiltered, grouped COUNT(*)/SUM/MIN/MAX over a
  * cube measure — anything else (DISTINCT, AVG, FILTER clauses,
  * global aggregates, measure-referencing predicates, non-cube
  * columns) leaves the plan untouched and the fact table answers as
  * before.
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

  private val suspended = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  /** Run `f` with routing suspended on this thread. [[RollupNav]]'s own
    * maintenance wraps its work in this: a maintenance batch aggregates
    * the REGISTERED fact path with exactly the routable shape, so
    * without the exemption the delta would be computed FROM the stale
    * cube — an empty delta, silently freezing the cube forever (caught
    * by RollupRewriteSpec's staleness test when filter routing landed).
    */
  def withoutRouting[T](f: => T): T = {
    val prev = suspended.get()
    suspended.set(true)
    try f finally suspended.set(prev)
  }

  /** Idempotently append this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
    }

  // ---------------------------------------------------------------------

  /** What sits between the aggregate and the fact scan: Project aliases
    * (the optimizer extracts complex grouping expressions as
    * `_groupingexpression#N`) and Filter predicates, in any stacking —
    * anything else → not routable. Filters are collected, not refused:
    * a predicate over cube KEYS alone (day range, dim membership) keeps
    * or drops whole (day, dims) groups, so it routes as the same filter
    * over cube rows (rewrite() verifies the references).
    */
  private case class Shape(lr: LogicalRelation,
                           aliases: Map[ExprId, Expression],
                           filters: Seq[Expression])

  private def scanOf(p: LogicalPlan): Option[Shape] = p match {
    case lr: LogicalRelation => Some(Shape(lr, Map.empty, Nil))
    case Project(projs, child)
      if projs.forall {
        case _: AttributeReference => true
        case Alias(_, _)           => true
        case _                     => false
      } =>
      scanOf(child).map(s => s.copy(aliases = s.aliases ++
        projs.collect { case a @ Alias(e, _) => a.exprId -> e }.toMap))
    case Filter(cond, child) =>
      scanOf(child).map(s => s.copy(filters = cond +: s.filters))
    case _ => None
  }

  private def rootPath(lr: LogicalRelation): Option[String] = lr.relation match {
    case h: HadoopFsRelation if h.location.rootPaths.length == 1 =>
      Some(h.location.rootPaths.head.toString)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty || suspended.get()) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        (for {
          shape <- scanOf(child)
          path <- rootPath(shape.lr)
          reg <- Option(registry.get(path))
          rewritten <- rewrite(agg, reg, shape)
        } yield rewritten).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, reg: Reg,
                      shape: Shape): Option[LogicalPlan] = {
    val aliases = shape.aliases
    // CHEAP bails before any store IO: a GLOBAL aggregate must not
    // route (count over an empty cube: sum(n_rows)=NULL ≠ 0), and an
    // obviously non-routable aggregate list (AVG, DISTINCT, FILTER,
    // functions other than COUNT/SUM/MIN/MAX) shouldn't pay a manifest
    // read per optimization pass — .count() over a registered fact
    // stays free
    if (agg.groupingExpressions.isEmpty) return None
    val cheapOk = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case _: Count | _: Sum | _: Min | _: Max => true
          case _                                   => false
        })
      case _ => true // grouping outputs — judged in the full pass below
    }
    if (!cheapOk) return None
    // resolve the cube's CURRENT committed version (manifest read —
    // metadata-sized, and only on a plausibly-routed aggregate); a
    // missing/unreadable cube falls back to the fact scan instead of
    // failing the user's query from inside the optimizer. Fresh
    // relation instance per rewrite keeps exprIds self-join-safe.
    val cube = try {
      RollupNav.readStore(SparkSession.active, reg.cubeDir)
        .queryExecution.analyzed.transformUp {
          case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
        }
    } catch { case scala.util.control.NonFatal(_) => return None }
    val cubeAttr: Map[String, Attribute] = cube.output.map(a => a.name -> a).toMap
    val dims = reg.rollup.dims.toSet
    val measures = reg.rollup.measures.toSet

    // map a fact-side KEY expression (grouping expr or filter
    // predicate) onto the cube. Sound for ANY deterministic function of
    // day/dims: cube rows are exact on those keys, so grouping or
    // filtering by f(keys) over partials ≡ over fact rows. None = the
    // expression touches a measure or unknown column — not routable.
    def mapKeyExpr(e: Expression): Option[Expression] = e match {
      // an extracted `_groupingexpression` / projected alias inlines first
      case a: AttributeReference if aliases.contains(a.exprId) =>
        mapKeyExpr(aliases(a.exprId))
      case a: AttributeReference if dims.contains(a.name) => cubeAttr.get(a.name)
      case a: AttributeReference if a.name == "day" && a.dataType == DateType =>
        // cube stores day as the STRING partition value; yyyy-MM-dd casts
        // back to the fact's DATE exactly. The type check matters: a fact
        // whose day column is STRING would need a different (identity)
        // mapping — bail rather than build a type-incoherent predicate
        cubeAttr.get("day").map(Cast(_, DateType))
      case a: AttributeReference
        if a.name == "day" && a.dataType == org.apache.spark.sql.types.StringType =>
        cubeAttr.get("day") // string fact day ≡ the cube's partition value
      case _: AttributeReference => None // measure / unknown column
      case e if !e.deterministic => None
      case e if e.children.isEmpty => Some(e) // literals
      case e =>
        val mapped = e.children.map(mapKeyExpr)
        if (mapped.exists(_.isEmpty)) None
        else Some(e.withNewChildren(mapped.map(_.get)))
    }
    def grouping(e: Expression): Option[Expression] = mapKeyExpr(e)

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
    // key-only filters ride along as cube-row filters (day ranges prune
    // the cube's day partitions; dim predicates drop whole groups)
    val newFilters = shape.filters.map(mapKeyExpr)
    if (newFilters.exists(_.isEmpty)) return None
    val child = newFilters.map(_.get).foldRight(cube: LogicalPlan)(Filter(_, _))
    Some(Aggregate(newGrouping.map(_.get), newResults.map(_.get), child))
  }
}
