package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** FK-based join elimination: an inner equi-join against a declared
  * dimension whose columns nothing above consumes is dead weight — under a
  * declared referential-integrity constraint (every non-null FK matches
  * exactly ONE dimension PK: key uniqueness + containment, the RELY
  * constraint warehouses act on), the join neither drops nor duplicates
  * fact rows beyond discarding NULL FKs. The rule therefore rewrites
  *
  *   Project/Aggregate(refs ⊆ fact) over (fact ⋈_{fk = pk} dim)
  *     ==> Project/Aggregate over Filter(fk IS NOT NULL, fact)
  *
  * preserving inner-join NULL semantics exactly without trusting any
  * NOT-NULL declaration. BI-generated SQL joins every dimension in the
  * model regardless of the columns a given report uses; at 100 TB each
  * eliminated join is a broadcast build (or worse, a shuffle) that never
  * runs. The declared constraint is the caller's promise, exactly as in
  * commercial warehouses — data violating it makes the rewrite unsound.
  *
  * Matching is conservative: inner join only, single EqualTo on the
  * declared PK attribute of the declared dim parquet relation (optionally
  * under an attribute-only Project), parent references none of the dim's
  * output. Registered per dim path; remove with [[JoinElimination.deregister]].
  */
final case class JoinElimination(dimPath: String, pkCol: String)
    extends Rule[LogicalPlan] {

  private def isDim(p: LogicalPlan): Boolean = p match {
    case Project(projList, inner)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      isDim(inner)
    // Catalyst's join constraint propagation wraps the dim scan in
    // Filter(isnotnull(pk)) — safe to see through: a non-null FK can only
    // match non-null PKs, so that filter never drops a matched dim row.
    // Any OTHER dim-side predicate makes elimination unsound (it could
    // drop rows the join would have matched) and is NOT matched.
    case Filter(IsNotNull(a: AttributeReference), inner)
        if a.name.equalsIgnoreCase(pkCol) =>
      isDim(inner)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        val want = dimPath.stripSuffix("/")
        fs.location.rootPaths.exists { rp =>
          val got = rp.toUri.getPath.stripSuffix("/")
          got == want || got.endsWith("/" + want.dropWhile(_ == '/'))
        }
      case _ => false
    }
    case _ => false
  }

  /** The fact-side FK when the join is eliminable, else None. */
  private def eliminableFk(left: LogicalPlan, right: LogicalPlan,
                           cond: Option[Expression]): Option[Attribute] =
    cond match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference))
          if isDim(right) =>
        val (fk, pk) =
          if (left.outputSet.contains(a) && right.outputSet.contains(b))
            (a, b)
          else if (left.outputSet.contains(b) && right.outputSet.contains(a))
            (b, a)
          else return None
        if (pk.name.equalsIgnoreCase(pkCol)) Some(fk) else None
      case _ => None
    }

  private def refsOnlyLeft(exprs: Seq[Expression],
                           left: LogicalPlan): Boolean =
    exprs.forall(_.references.subsetOf(left.outputSet))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Join(l, r, Inner, cond, _))
        if refsOnlyLeft(projList, l) =>
      eliminableFk(l, r, cond)
        .map(fk => Project(projList, Filter(IsNotNull(fk), l)))
        .getOrElse(p)
    case a @ Aggregate(groupings, aggs, Join(l, r, Inner, cond, _), _)
        if refsOnlyLeft(groupings ++ aggs, l) =>
      eliminableFk(l, r, cond)
        .map(fk => Aggregate(groupings, aggs, Filter(IsNotNull(fk), l)))
        .getOrElse(a)
  }
}

object JoinElimination {

  /** Register elimination for joins against `dimPath` on `pkCol`
    * (idempotent per dim path). The declaration asserts PK uniqueness AND
    * FK containment for every fact joined to this dimension.
    */
  def register(spark: SparkSession, dimPath: String, pkCol: String): Unit = {
    val rule = JoinElimination(dimPath, pkCol)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case JoinElimination(p, _) => p == dimPath
        case _ => false
      } :+ rule
  }

  /** Remove the rule for `dimPath`; callers registering inside a query
    * must deregister in a finally (session-global state).
    */
  def deregister(spark: SparkSession, dimPath: String): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case JoinElimination(p, _) => p == dimPath
        case _ => false
      }
  }
}
