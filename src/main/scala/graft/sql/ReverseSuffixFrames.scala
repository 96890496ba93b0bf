package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites suffix window frames (`ROWS/RANGE BETWEEN x FOLLOWING AND
  * UNBOUNDED FOLLOWING`) onto a REVERSED-order running frame
  * (optimization round 18, guide §1.2 step 1).
  *
  * Spark evaluates a frame whose upper bound is UNBOUNDED FOLLOWING with
  * `UnboundedFollowingWindowFunctionFrame`, which rebuilds the aggregate
  * from the current row to the partition end FOR EVERY ROW — O(n²) per
  * partition. The EXCLUDE lowerings (w15/w16/w19 family) emit exactly
  * this shape for their "after the current row" leg, and at 5,600 rows
  * per partition the leg was the entire cost of w15 (47M aggregate
  * updates for 17k rows).
  *
  * The same row set enumerated in the OPPOSITE order is a prefix: a
  * frame [cur+x, end] under ORDER BY k ASC is the frame
  * [start, cur−x] under ORDER BY k DESC. Prefix frames evaluate with
  * `UnboundedPrecedingWindowFunctionFrame` — one incremental update per
  * row, O(n) — at the price of one extra partition-local sort (no new
  * exchange: the reversed Window keeps the same partitioning).
  *
  * Exactness:
  *   - RANGE frames address rows by ORDER-KEY VALUE, so the frame's row
  *     SET is identical under either enumeration, ties included.
  *   - ROWS frames address rows positionally; with tied order keys the
  *     suffix's membership is enumeration-dependent — in Spark AND in
  *     every other engine (the before/after EXCLUDE legs are only
  *     well-defined on tie-free keys, which is what every declared
  *     query uses). The reversal preserves the well-defined cases
  *     bit-for-bit and keeps the arbitrary cases arbitrary.
  *   - The aggregate must be ORDER-INSENSITIVE over the set: MIN/MAX of
  *     any orderable type, COUNT, and SUM over integral/decimal (a
  *     double SUM accumulates in row order and is not reversible
  *     bitwise). DISTINCT/FILTER forms and everything else stay put.
  *
  * Window nodes host one (partition, order) pair, so rewritten
  * expressions split into a stacked Window with the reversed order —
  * alias exprIds are preserved, parents resolve unchanged.
  *
  * Env kill-switch for A/B: SPARK_GRAFT_NO_REV_SUFFIX.
  */
object ReverseSuffixFrames extends Rule[LogicalPlan] {

  private def orderInsensitive(agg: AggregateExpression): Boolean =
    !agg.isDistinct && agg.filter.isEmpty && (agg.aggregateFunction match {
      case _: Min | _: Max | _: Count => true
      case s: Sum => s.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             _: DecimalType => true
        case _ => false
      }
      case _ => false
    })

  /** x FOLLOWING (positive literal) → x PRECEDING, and vice versa;
    * CurrentRow is its own mirror. Only numeric literals and the
    * special boundaries are handled — anything else refuses the
    * rewrite.
    */
  private def mirror(bound: Expression): Option[Expression] = bound match {
    case CurrentRow => Some(CurrentRow)
    case Literal(v, t @ (ByteType | ShortType | IntegerType | LongType)) =>
      Some(Literal.create(negate(v), t))
    case UnaryMinus(e, _) => Some(e)
    case _ => None
  }

  private def negate(v: Any): Any = v match {
    case i: java.lang.Integer => -i.intValue()
    case l: java.lang.Long => -l.longValue()
    case s: java.lang.Short => (-s.shortValue()).toShort
    case b: java.lang.Byte => (-b.byteValue()).toByte
    case other => other
  }

  private def reverse(so: SortOrder): SortOrder = {
    val dir = so.direction match {
      case Ascending => Descending
      case Descending => Ascending
    }
    val nulls = so.nullOrdering match {
      case NullsFirst => NullsLast
      case NullsLast => NullsFirst
    }
    SortOrder(so.child, dir, nulls, Seq.empty)
  }

  /** The suffix-frame shape this rule targets. A RANGE frame's null
    * order-key rows take a separate comparison path in the frame
    * machinery, so the RANGE arm additionally requires a non-nullable
    * order key (the w16/w19 lowerings order by dense_rank — never
    * null); ROWS frames are positional and reverse exactly regardless.
    */
  private def suffixFrame(e: Expression): Boolean = e match {
    case WindowExpression(agg: AggregateExpression,
        WindowSpecDefinition(_, order,
          SpecifiedWindowFrame(ft, lower, UnboundedFollowing)))
        if order.nonEmpty && lower != UnboundedPreceding &&
          orderInsensitive(agg) && mirror(lower).isDefined =>
      ft == RowFrame || order.forall(!_.child.nullable)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (sys.env.contains("SPARK_GRAFT_NO_REV_SUFFIX")) plan
    else plan.transform {
      case w @ Window(wexprs, part, order, child, hint) if order.nonEmpty &&
          wexprs.exists(_.exists(suffixFrame)) =>
        val revOrder = order.map(reverse)
        val (toReverse, toKeep) = wexprs.partition {
          case Alias(we: WindowExpression, _) => suffixFrame(we)
          case _ => false
        }
        if (toReverse.isEmpty) w
        else {
          val rewritten = toReverse.map {
            case al @ Alias(WindowExpression(agg,
                WindowSpecDefinition(p, _,
                  SpecifiedWindowFrame(ft, lower, UnboundedFollowing))), name) =>
              val newFrame = SpecifiedWindowFrame(
                ft, UnboundedPreceding, mirror(lower).get)
              val newExpr = WindowExpression(agg,
                WindowSpecDefinition(p, revOrder, newFrame))
              Alias(newExpr, name)(al.exprId, al.qualifier,
                al.explicitMetadata, al.nonInheritableMetadataKeys)
            case other => other
          }
          val reversedWin = Window(rewritten, part, revOrder, child, hint)
          if (toKeep.isEmpty) reversedWin
          else Window(toKeep, part, order, reversedWin, hint)
        }
    }
}
