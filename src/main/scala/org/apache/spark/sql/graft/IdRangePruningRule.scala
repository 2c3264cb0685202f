package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Optimizer rule: rewrite numeric predicates on an ID-keyed column into
  * predicates on its derived `__p_<col>` range-partition label so the
  * scan partition-prunes (SURVEY.md §4's "ID-range predicate → bucket
  * rewrite", the one deferred custom rule).
  *
  * A store table ID-keyed on `x` carries both `x` and the partition
  * column `__p_x` with directory values `from_<lo>_to_<hi>` (rows satisfy
  * lo ≤ x < hi). For a conjunct on `x` with a literal bound this rule
  * adds the implied conjunct on the label's parsed bounds:
  *
  *   - `x >= a` / `x > a`  →  parsedHi > a
  *   - `x <= b` / `x < b`  →  parsedLo <= b
  *   - `x = v`             →  parsedLo <= v AND parsedHi > v
  *
  * where parsedLo/parsedHi = `CAST(split(__p_x, '_')[1|3] AS BIGINT)`.
  * FileSourceStrategy evaluates any deterministic predicate over
  * partition attributes at planning time, so the added conjunct prunes
  * directories without knowing the bucket width. The original predicate
  * stays — the rewrite is purely additive, hence always sound.
  *
  * Inject with `spark.experimental.extraOptimizations` or via
  * [[GraftExtensions]].
  */
object IdRangePruningRule extends Rule[LogicalPlan] {

  private def parsedBound(p: Attribute, idx: Int): Expression =
    Cast(
      GetArrayItem(
        StringSplit(p, Literal("_"), Literal(-1)),
        Literal(idx)),
      LongType)

  /** Guarded derived conjunct: rows whose partition value does not parse
    * as a `from_<lo>_to_<hi>` label (foreign `__p_*` columns, NULLs) are
    * always kept — otherwise the added conjunct would evaluate to NULL
    * and AND-drop rows the original predicate admits.
    */
  private def guarded(p: Attribute, pred: Expression): Expression =
    Coalesce(Seq(
      Or(
        Not(RLike(p, Literal("^from_-?[0-9]+_to_-?[0-9]+$"))),
        pred),
      Literal(true)))

  private def boundsFor(cond: Expression, x: Attribute, p: Attribute): Option[Expression] = {
    def lo = parsedBound(p, 1)
    def hi = parsedBound(p, 3)
    cond match {
      case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(x) =>
        Some(guarded(p, GreaterThan(hi, Cast(l, LongType))))
      case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(x) =>
        Some(guarded(p, GreaterThan(hi, Cast(l, LongType))))
      case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(x) =>
        Some(guarded(p, LessThanOrEqual(lo, Cast(l, LongType))))
      case LessThan(a: Attribute, l: Literal) if a.semanticEquals(x) =>
        Some(guarded(p, LessThanOrEqual(lo, Cast(l, LongType))))
      case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(x) =>
        Some(guarded(p,
          And(LessThanOrEqual(lo, Cast(l, LongType)), GreaterThan(hi, Cast(l, LongType)))))
      case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(x) =>
        Some(guarded(p,
          And(LessThanOrEqual(lo, Cast(l, LongType)), GreaterThan(hi, Cast(l, LongType)))))
      case In(a: Attribute, list) if a.semanticEquals(x) &&
          list.nonEmpty && list.length <= MaxInListSize &&
          list.forall(_.isInstanceOf[Literal]) =>
        Some(guarded(p, list.map[Expression] { l =>
          And(LessThanOrEqual(lo, Cast(l, LongType)), GreaterThan(hi, Cast(l, LongType)))
        }.reduceLeft(Or(_, _))))
      case InSet(a: Attribute, hset) if a.semanticEquals(x) &&
          hset.nonEmpty && hset.size <= MaxInListSize =>
        Some(guarded(p, hset.toSeq.map[Expression] { v =>
          val l = Literal(v, a.dataType) // InSet holds internal-format values
          And(LessThanOrEqual(lo, Cast(l, LongType)), GreaterThan(hi, Cast(l, LongType)))
        }.reduceLeft(Or(_, _))))
      case _ => None
    }
  }

  /** Cap on IN-list expansion: each value becomes one (lo ≤ v < hi) OR
    * disjunct evaluated per partition directory at planning time; a
    * 10k-value IN list isn't worth a 10k-term planning predicate.
    */
  private val MaxInListSize = 64

  /** The rewrite binds `x` to `__p_<x.name>` by NAME, which is only
    * sound when both attributes are the LEAF relation's own columns —
    * after a self-join both sides carry identically-named attributes,
    * and even on a unary chain a projection can alias some other column
    * to the data column's name (`select(col("v").as("id"), col("__p_id"))`),
    * either of which would pair a value with the wrong partition label
    * and incorrectly drop rows. So: the plan below the filter must be a
    * unary chain to one leaf, AND both the data column and its `__p_`
    * partner must carry the leaf's own exprIds (aliases mint fresh
    * exprIds, so any renaming in between disqualifies the rewrite).
    * Store reads surface filters over exactly this shape — pass-through
    * projections over one scan — so the restriction loses nothing.
    */
  private def leafOutputIds(p: LogicalPlan): Option[Set[ExprId]] = p match {
    case l: LeafNode => Some(l.output.map(_.exprId).toSet)
    case u if u.children.size == 1 => leafOutputIds(u.children.head)
    case _ => None
  }

  /** Marker so we never re-add the same derived conjunct. */
  private val Tag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.idRangePruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if f.getTagValue(Tag).isEmpty =>
      val leafIds = leafOutputIds(child).getOrElse(Set.empty)
      val partnersByName: Map[String, Attribute] =
        child.output.collect {
          case p if p.name.startsWith("__p_") && p.dataType == StringType &&
              leafIds.contains(p.exprId) => p.name -> p
        }.toMap
      if (partnersByName.isEmpty) f
      else {
        val conjuncts = splitConjuncts(cond)
        val derived = conjuncts.flatMap { c =>
          c.references.toSeq match {
            case Seq(x) if leafIds.contains(x.exprId) =>
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
