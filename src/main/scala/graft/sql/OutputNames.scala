package graft.sql

import scala.annotation.tailrec
import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** The reference engine's output-column naming policy
  * (vinum/planner/planner.py:290-328 `_column_names`):
  *
  *   - explicit `AS alias`      -> the alias;
  *   - bare column reference    -> the column's own name;
  *   - function call            -> the function name (`sum(x)` -> "sum",
  *     `np.log(x)` -> "np.log" — README.rst z-score shows `score`);
  *   - any other expression     -> "col_N", N counting unnamed items;
  *   - duplicate names          -> "_1", "_2", ... suffixes in select
  *     order (README shows `score`, `score_1`).
  *
  * Spark instead leaks generated names like `sum(x)` and `(a + b)`. The
  * policy is recovered from Spark's UNRESOLVED parse tree, where explicit
  * aliases ([[Alias]]), bare references ([[UnresolvedAttribute]]) and
  * function calls ([[UnresolvedFunction]]) are still distinguishable —
  * after analysis every output is an Alias and the provenance is gone.
  */
object OutputNames {

  /** Reference-policy names for the top-level select list of a parsed
    * (unresolved) plan, or None when the policy cannot apply cleanly
    * (star expansion, set operations, arity surprises).
    */
  def vinumNames(plan: LogicalPlan): Option[Seq[String]] = {
    @tailrec def findSelect(p: LogicalPlan): Option[Seq[Expression]] = p match {
      case pr: Project   => Some(pr.projectList)
      case ag: Aggregate => Some(ag.aggregateExpressions)
      case d: Distinct   => findSelect(d.child)
      case s: Sort       => findSelect(s.child)
      case l: GlobalLimit => findSelect(l.child)
      case l: LocalLimit  => findSelect(l.child)
      case o: Offset      => findSelect(o.child)
      case f: Filter      => findSelect(f.child)
      case w: WithCTE     => findSelect(w.plan)
      case u: UnresolvedWith => findSelect(u.child)
      case _ => None
    }
    findSelect(plan).flatMap { items =>
      val hasStar = items.exists {
        case _: UnresolvedStar => true
        case ua: UnresolvedAlias => ua.child.isInstanceOf[UnresolvedStar]
        case _ => false
      }
      if (hasStar) None else Some(assignNames(items))
    }
  }

  private def assignNames(items: Seq[Expression]): Seq[String] = {
    var unnamed = 0
    val seen = mutable.Map.empty[String, Int]
    items.map { e =>
      val base = baseName(e) match {
        case Some(n) => n
        case None => val n = s"col_$unnamed"; unnamed += 1; n
      }
      seen.get(base) match {
        case Some(c) => seen(base) = c + 1; s"${base}_${c + 1}"
        case None    => seen(base) = 0; base
      }
    }
  }

  private def baseName(e: Expression): Option[String] = e match {
    case a: Alias                => Some(a.name)
    case a: UnresolvedAttribute  => Some(a.nameParts.last)
    case ua: UnresolvedAlias     => baseName(ua.child)
    case f: UnresolvedFunction   => Some(functionName(f))
    case w: WindowExpression     => baseName(w.windowFunction)
    case _                       => None
  }

  /** Function display name; the dialect pre-pass turned `np.f` into
    * `np_f`, map it back so the output column reads like the reference.
    */
  private def functionName(f: UnresolvedFunction): String = {
    val n = f.nameParts.last
    if (n.startsWith("np_")) "np." + n.stripPrefix("np_") else n
  }
}
