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

  /** The rewrite binds `x` to `__p_<x.name>` by NAME, which is only sound
    * when everything in scope comes from a single relation — after e.g. a
    * self-join of two store tables, both sides carry identically-named
    * attributes and a name-bound conjunct could pair one side's data
    * column with the OTHER side's partition label and incorrectly drop
    * rows. Store reads surface filters over a unary chain (scan →
    * project/alias → filter), so restricting to that shape loses nothing.
    */
  private def singleRelationBelow(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case u if u.children.size == 1 => singleRelationBelow(u.children.head)
    case _ => false
  }

  /** Marker so we never re-add the same derived conjunct. */
  private val Tag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.idRangePruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child)
        if f.getTagValue(Tag).isEmpty && singleRelationBelow(child) =>
      val partnersByName: Map[String, Attribute] =
        child.output.collect {
          case p if p.name.startsWith("__p_") && p.dataType == StringType => p.name -> p
        }.toMap
      if (partnersByName.isEmpty) f
      else {
        val conjuncts = splitConjuncts(cond)
        val derived = conjuncts.flatMap { c =>
          c.references.toSeq match {
            case Seq(x) =>
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
