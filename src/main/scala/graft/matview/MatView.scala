package graft.matview

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view routing (SURVEY §2.3 J5 / §2.10 M3 / §4 "candidate for
  * a custom Rule").
  *
  * The reference maintains `create join` results at INSERT time so that
  * later SELECTs read pre-joined rows (/root/reference/server.py:806-894,
  * README.md:29-64). The Spark-first equivalent splits that into:
  *
  *  1. materialize: write the join once (batch) or incrementally
  *     (graft.streaming.Streams.maintainJoin) to parquet;
  *  2. route: a Catalyst optimizer `Rule` that replaces any inner join
  *     matching a registered view with a scan of the materialized parquet —
  *     every SELECT over that join then skips the join, which is exactly
  *     the read-path benefit the reference buys with insert-time
  *     maintenance.
  *
  * The rule runs with `spark.experimental.extraOptimizations`, i.e. AFTER
  * column pruning/pushdown have reshaped the query, so matching is
  * structural rather than plan-identity: a Join qualifies when (a) its
  * leaf relations are the view's leaf relations and (b) its inner
  * equi-condition involves the same column-name pairs. The substitute scan
  * is wrapped in a by-name Project aliased to the join's original
  * expression ids, so pruned queries and parents keep resolving.
  * Limitation (by construction of CREATE JOIN views): column names across
  * the joined tables must be distinct — true for every view the HashQL
  * surface can register.
  */
object MatView {

  private final case class Key(leaves: Set[String], cond: Set[(String, String)])
  private final case class Entry(name: String, key: Key, replacement: LogicalPlan)
  private final case class AggEntry(name: String, canonical: LogicalPlan,
                                    replacement: LogicalPlan)

  private val registries =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.ListBuffer[Entry]]()
  private val aggRegistries =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.ListBuffer[AggEntry]]()

  private def registry(spark: SparkSession): scala.collection.mutable.ListBuffer[Entry] =
    registries.synchronized {
      var r = registries.get(spark)
      if (r == null) { r = scala.collection.mutable.ListBuffer.empty; registries.put(spark, r) }
      r
    }

  private def aggRegistry(spark: SparkSession): scala.collection.mutable.ListBuffer[AggEntry] =
    aggRegistries.synchronized {
      var r = aggRegistries.get(spark)
      if (r == null) { r = scala.collection.mutable.ListBuffer.empty; aggRegistries.put(spark, r) }
      r
    }

  /** A join side qualifies only if it is a bare relation under pruning-
    * inserted Projects and optimizer-inserted IsNotNull(joinkey) filters —
    * any USER filter (or other operator) means the query's join is NOT the
    * registered view (e.g. a filtered variant), and substituting would
    * silently drop it. */
  private def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }
  /** Flatten an inner-equi-join TREE (n-way, any shape — the reference's own
    * `create join` smoke is 3-way, example.py:151-238) into its leaf
    * relations plus the union of all equi-condition column-name pairs.
    * Returns None if anything other than a bare relation (modulo
    * pruning-Projects / IsNotNull-Filters) or a plain inner equi-join
    * appears — a user filter means the query is NOT the registered view,
    * and so does a Project that COMPUTES anything (only attribute-list
    * Projects, the shape column pruning inserts, are transparent —
    * substituting through e.g. `upper(n_name).as("n_name")` would silently
    * drop the computation). */
  private def flatten(plan: LogicalPlan): Option[(Set[String], Set[(String, String)])] =
    plan match {
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        flatten(child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if conjuncts(f.condition).forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull]) =>
        flatten(f.child)
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        for ((ll, lc) <- flatten(j.left); (rl, rc) <- flatten(j.right))
          yield (ll ++ rl, lc ++ rc ++ condKey(j))
      case leaf if leaf.children.isEmpty => Some((Set(leaf.canonicalized.toString), Set.empty))
      case _ => None
    }

  private def condKey(j: Join): Set[(String, String)] =
    j.condition.toSeq.flatMap(_.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (a.name <= b.name) (a.name, b.name) else (b.name, a.name)
    }).toSet

  private def keyOf(j: Join): Option[Key] =
    flatten(j).map { case (leaves, conds) => Key(leaves, conds) }

  /** By-name substitution wrapper: every column `orig` still outputs must
    * exist in the materialized parquet, and parents keep resolving because
    * the aliases reuse the original expression ids. */
  private def substitute(orig: LogicalPlan, replacement: LogicalPlan): Option[LogicalPlan] = {
    val byName = replacement.output.map(a => a.name -> a).toMap
    if (orig.output.forall(o => byName.contains(o.name)))
      Some(Project(orig.output.map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId)), replacement))
    else None
  }

  private final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val entries = registry(spark)
      val aggEntries = aggRegistry(spark)
      if (entries.isEmpty && aggEntries.isEmpty) plan
      else plan.transformUp {
        // pre-aggregated summaries match on the CANONICALIZED whole
        // aggregate (grouping + agg expressions + child), so a repeated
        // dashboard-style group-by answers from the summary scan without
        // touching fact rows. Canonicalization normalizes expr ids but not
        // names; the by-name check below keeps differently-aliased
        // lookalikes untouched.
        case a: Aggregate if aggEntries.nonEmpty =>
          aggEntries.find(_.canonical == a.canonicalized)
            .flatMap(e => substitute(a, e.replacement)).getOrElse(a)
        case j: Join if j.joinType == Inner && j.condition.isDefined =>
          entries.find(e => keyOf(j).contains(e.key))
            .flatMap(e => substitute(j, e.replacement)).getOrElse(j)
      }
    }
  }

  /** Materialize `view` (an inner equi-join chain — 2-way or n-way, any
    * tree shape) to `path` and install the routing rule: from now on any
    * query in this session joining the same relations on the same keys
    * reads the parquet instead. Call again to refresh after base-table
    * changes. */
  def materialize(spark: SparkSession, name: String, view: DataFrame, path: String): Unit = {
    val analyzed = view.queryExecution.optimizedPlan
    // collectFirst visits pre-order, so the first Join is the topmost —
    // keyOf flattens the whole chain under it.
    val joinKey = analyzed.collectFirst { case j: Join => keyOf(j) }.flatten.getOrElse(
      throw new IllegalArgumentException(
        "materialize expects an inner equi-join (chain) of plain relations"))
    view.write.mode("overwrite").parquet(path)
    val replacement = spark.read.parquet(path).queryExecution.analyzed
    val reg = registry(spark)
    reg.filterInPlace(_.name != name)
    reg += Entry(name, joinKey, replacement)
    installRule(spark)
  }

  private def installRule(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[Rewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new Rewrite(spark)

  /** Materialize an AGGREGATE view (a group-by over a relation or join
    * chain) and route REPEATED occurrences of the same aggregation to the
    * summary parquet — the rollup-serving path the join rule can't cover.
    * Matching is exact-plan (canonicalized): same grouping, same
    * aggregates, same child — the verbatim-repeat workload dashboards
    * generate. Coarser or differently-keyed group-bys deliberately do NOT
    * match (containment reasoning over grouping sets is out of scope and
    * silently answering a *different* aggregate would be wrong).
    *
    * Register the aggregate view EITHER over base tables OR over a
    * registered join view's tables, not both at once: the join rule
    * rewrites the child first (transformUp is bottom-up), which changes
    * the aggregate's canonical form away from one registered against raw
    * tables. */
  def materializeAggregate(spark: SparkSession, name: String, view: DataFrame,
                           path: String): Unit = {
    val plan = view.queryExecution.optimizedPlan
    require(plan.exists(_.isInstanceOf[Aggregate]),
      "materializeAggregate expects a plan containing an Aggregate")
    view.write.mode("overwrite").parquet(path)
    val replacement = spark.read.parquet(path).queryExecution.analyzed
    val reg = aggRegistry(spark)
    reg.filterInPlace(_.name != name)
    reg += AggEntry(name, plan.canonicalized, replacement)
    installRule(spark)
  }

  /** Drop a view's routing (the parquet stays on disk). */
  def drop(spark: SparkSession, name: String): Unit = {
    registry(spark).filterInPlace(_.name != name)
    aggRegistry(spark).filterInPlace(_.name != name)
  }
}
