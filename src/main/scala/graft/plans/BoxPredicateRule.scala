package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{MobCall, MobCodec, MobSchemas, VSpan, VSpanF, VSTBox, VTBox}

/** The Spark-native analogue of the reference's R-tree scan rewrite
  * (ref src/index/rtree_optimize_scan.cpp:20-147): where the reference's
  * optimizer extension swaps a sequential scan whose pushed filter is
  * `&&(STBOX, constant)` for an R-tree index scan, this rule AUGMENTS a
  * Filter containing `op_overlaps(box_column, foldable_box)` with the
  * equivalent min/max range conjuncts on the box's STRUCT FIELDS:
  *
  *   op_overlaps(b, STBOX(...))  ==>  ... AND b.xmin <= cXmax AND
  *     b.xmax >= cXmin AND b.ymin <= cYmax AND ... (time likewise)
  *
  * The original predicate is kept (exact bound-inclusivity semantics);
  * the derived conjuncts are a superset filter that Catalyst's
  * PushDownPredicates (same fixed-point batch) pushes into the parquet
  * scan, where nested-column min/max statistics prune row groups — a
  * user writing the natural box predicate gets pruning without
  * hand-flattened columns. Spans (tstzspan etc.) get the same
  * treatment on lower/upper.
  */
object BoxPredicateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = split(cond)
      val derived = conjuncts.flatMap(ranges)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And), child)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** Derived sargable ranges for one conjunct, empty if not applicable. */
  private def ranges(e: Expression): Seq[Expression] = e match {
    case MobCall("op_overlaps", Seq(a, b))
        if !a.foldable && b.foldable && boxKind(a).isDefined &&
          boxKind(a) == boxKind(b) =>
      derive(a, b)
    case MobCall("op_overlaps", Seq(b, a))
        if !a.foldable && b.foldable && boxKind(a).isDefined &&
          boxKind(a) == boxKind(b) =>
      derive(a, b)
    case _ => Nil
  }

  private def boxKind(e: Expression): Option[String] =
    MobSchemas.kindOf(e.dataType).filter(Set("stbox", "tbox", "span", "spanF"))

  /** col's struct field by name (schema is one of ours, so it resolves). */
  private def field(col: Expression, name: String): Expression = {
    val st = col.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    GetStructField(col, st.fieldIndex(name), Some(name))
  }

  /** Box dimensions are optional PER ROW (hasX/hasT): overlapsST/overlapsT
    * skip a dimension absent on either side, so a T-only row can overlap an
    * XT literal via time alone. Each derived comparison is therefore guarded
    * by the row's own flag — `hasX = false OR cmp` — which stays a superset
    * filter for every row. The guard is an Or of two simple comparisons, so
    * DataSourceStrategy still translates it into a pushable parquet filter;
    * on the common all-flags-true data, row-group stats collapse the guard
    * branch to false and the range side alone prunes. */
  private def guarded(col: Expression, flag: String,
                      cs: Seq[Expression]): Seq[Expression] =
    cs.map(c => Or(EqualTo(field(col, flag), Literal(false)), c))

  private def derive(col: Expression, litE: Expression): Seq[Expression] = {
    val v = litE.eval(null)
    if (v == null) return Nil
    MobCodec.decode(litE.dataType, v) match {
      case VSTBox(b) =>
        val x = if (!b.hasX) Nil else guarded(col, "hasX", Seq(
          LessThanOrEqual(field(col, "xmin"), Literal(b.xmax, DoubleType)),
          GreaterThanOrEqual(field(col, "xmax"), Literal(b.xmin, DoubleType)),
          LessThanOrEqual(field(col, "ymin"), Literal(b.ymax, DoubleType)),
          GreaterThanOrEqual(field(col, "ymax"), Literal(b.ymin, DoubleType))))
        val t = if (!b.hasT) Nil else guarded(col, "hasT", Seq(
          LessThanOrEqual(field(col, "tmin"), Literal(b.tmax, LongType)),
          GreaterThanOrEqual(field(col, "tmax"), Literal(b.tmin, LongType))))
        x ++ t
      case VTBox(b) =>
        val x = if (!b.hasX) Nil else guarded(col, "hasX", Seq(
          LessThanOrEqual(field(col, "xmin"), Literal(b.xmax, DoubleType)),
          GreaterThanOrEqual(field(col, "xmax"), Literal(b.xmin, DoubleType))))
        val t = if (!b.hasT) Nil else guarded(col, "hasT", Seq(
          LessThanOrEqual(field(col, "tmin"), Literal(b.tmax, LongType)),
          GreaterThanOrEqual(field(col, "tmax"), Literal(b.tmin, LongType))))
        x ++ t
      case VSpan(s, _) => Seq(
        LessThanOrEqual(field(col, "lower"), Literal(s.upper, LongType)),
        GreaterThanOrEqual(field(col, "upper"), Literal(s.lower, LongType)))
      case VSpanF(s) => Seq(
        LessThanOrEqual(field(col, "lower"), Literal(s.upper, DoubleType)),
        GreaterThanOrEqual(field(col, "upper"), Literal(s.lower, DoubleType)))
      case _ => Nil
    }
  }
}

/** Session extension entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => BoxPredicateRule)
}
