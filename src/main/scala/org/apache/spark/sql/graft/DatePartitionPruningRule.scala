package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DateType

/** Optimizer rule: the Date-key twin of [[IdRangePruningRule]] — rewrite
  * date predicates on a Date-keyed store column into predicates on its
  * derived `__p_<col>` partition column, so the natural
  * `where(col("d") >= "1997-06-01")` partition-prunes without the user
  * ever naming the partner column (README.md:191-198's date layout).
  *
  * Unlike the ID rule (whose `from_X_to_Y` labels stay strings and need
  * parsing), partition-value type inference reads the `yyyy-MM-dd`
  * directory names back as a DateType column, so the derived conjunct
  * compares dates directly with the original literals — the rows of a
  * partition share exactly the partition's date, making every rewrite
  * below an equivalence on non-null labels:
  *
  *   - `x >= v` / `x > v`  →  `p >= v`  (x > v still admits same-day rows)
  *   - `x <= v` / `x < v`  →  `p <= v`
  *   - `x = v`             →  `p = v`
  *   - `x IN (…)`          →  `p IN (…)`
  *
  * A NULL partition value (null date key → `__HIVE_DEFAULT_PARTITION__`)
  * is always kept (`IsNull(p) OR pred`) — AND-ing a null-valued conjunct
  * would drop rows the original predicate admits. Both the data column
  * and its partner must carry the leaf relation's exprIds (no alias
  * misbinding), mirroring the ID rule's guard. Only DateType data
  * columns participate: a TIMESTAMP's label is its write-session-zone
  * date, which a plan-time rewrite cannot reproduce.
  */
object DatePartitionPruningRule extends Rule[LogicalPlan] {

  private val MaxInListSize = 64

  private def guarded(p: Attribute, pred: Expression): Expression =
    Or(IsNull(p), pred)

  private def boundsFor(cond: Expression, x: Attribute, p: Attribute): Option[Expression] =
    cond match {
      case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, GreaterThanOrEqual(p, l)))
      case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, GreaterThanOrEqual(p, l)))
      case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, LessThanOrEqual(p, l)))
      case LessThan(a: Attribute, l: Literal) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, LessThanOrEqual(p, l)))
      case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, EqualTo(p, l)))
      case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(x) && l.dataType == DateType =>
        Some(guarded(p, EqualTo(p, l)))
      case In(a: Attribute, list) if a.semanticEquals(x) &&
          list.nonEmpty && list.length <= MaxInListSize &&
          list.forall { case l: Literal => l.dataType == DateType; case _ => false } =>
        Some(guarded(p, In(p, list)))
      case InSet(a: Attribute, hset) if a.semanticEquals(x) &&
          a.dataType == DateType && hset.nonEmpty && hset.size <= MaxInListSize =>
        Some(guarded(p, InSet(p, hset)))
      case _ => None
    }

  private def leafOutputIds(p: LogicalPlan): Option[Set[ExprId]] = p match {
    case l: LeafNode => Some(l.output.map(_.exprId).toSet)
    case u if u.children.size == 1 => leafOutputIds(u.children.head)
    case _ => None
  }

  private val Tag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.datePruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if f.getTagValue(Tag).isEmpty =>
      val leafIds = leafOutputIds(child).getOrElse(Set.empty)
      val partnersByName: Map[String, Attribute] =
        child.output.collect {
          case p if p.name.startsWith("__p_") && p.dataType == DateType &&
              leafIds.contains(p.exprId) => p.name -> p
        }.toMap
      if (partnersByName.isEmpty) f
      else {
        val derived = splitConjuncts(cond).flatMap { c =>
          c.references.toSeq match {
            case Seq(x) if x.dataType == DateType && leafIds.contains(x.exprId) =>
              partnersByName.get(s"__p_${x.name}")
                .flatMap(p => boundsFor(c, x, p))
            case _ => None
          }
        }
        if (derived.isEmpty) f
        else {
          val nf = Filter(derived.foldLeft(cond)(And(_, _)), child)
          nf.setTagValue(Tag, true)
          nf
        }
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
