package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite an inner join whose ONLY link is a range
  * predicate `v >= lo AND v <= hi` against a LITERAL band table
  * (LocalRelation) into a binned equi-join — the logical-plan form of
  * [[graft.operators.Relational.rangeJoinBinned]]:
  *
  *   fact JOIN bands ON v BETWEEN lo AND hi
  *   ==>
  *   Project(origOutput,
  *     Join(fact + floor(v/w) AS __bin,
  *          Generate(explode(sequence(floor(lo/w), floor(hi/w))), bands),
  *          __bin = __bin AND v BETWEEN lo AND hi))
  *
  * Without it, Spark can only plan BroadcastNestedLoopJoin for the
  * non-equi condition — per-row scans of every band, and a broken
  * plan shape at 100 TB fact sizes. With it, the planner sees an
  * equi-join key and picks a hash join; the original predicate stays
  * as the residual, so results are identical.
  *
  * The rewrite fires only when the band table is a LocalRelation
  * (literal `Seq(...).toDF` / VALUES), because the bin width is
  * derived from the actual band bounds at plan time: w = the mean
  * band width, so each band explodes into ~2 bins. Rows whose bands
  * would explode past [[MaxBinsPerRange]] bail out to the original
  * plan. Registered via `spark.experimental.extraOptimizations` or
  * [[graft.GraftExtensions]] (injectOptimizerRule).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxBinsPerRange = 256

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) => tryRewrite(j).getOrElse(j)
  }

  private def isNumeric(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val local = j.right.collectFirst { case lr: LocalRelation => lr }.getOrElse(return None)
    // the right side must be the band table itself (possibly aliased),
    // not a derived projection — attributes must resolve in the
    // LocalRelation so the bounds can be read at plan time
    def isBand(a: AttributeReference) = local.output.exists(_.exprId == a.exprId)
    def isLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // Already equi-linked joins don't need binning — and this guard is
    // also the fixpoint: the rewrite adds exactly such a conjunct, so
    // the FixedPoint optimizer batch can't re-fire on its own output.
    val hasEquiLink = conjuncts.exists {
      case EqualTo(a, b) =>
        // both sides must actually REFERENCE a side — a literal's
        // empty reference set is vacuously a subset of anything
        a.references.nonEmpty && b.references.nonEmpty &&
          ((a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
            (b.references.subsetOf(j.left.outputSet) && a.references.subsetOf(j.right.outputSet)))
      case _ => false
    }
    if (hasEquiLink) return None
    val lows = conjuncts.collect {
      case GreaterThanOrEqual(v, lo: AttributeReference) if isLeft(v) && isBand(lo) => (v, lo)
      case LessThanOrEqual(lo: AttributeReference, v) if isLeft(v) && isBand(lo)    => (v, lo)
    }
    val highs = conjuncts.collect {
      case LessThanOrEqual(v, hi: AttributeReference) if isLeft(v) && isBand(hi)    => (v, hi)
      case GreaterThanOrEqual(hi: AttributeReference, v) if isLeft(v) && isBand(hi) => (v, hi)
    }
    val rangePair = (for {
      (v, lo) <- lows
      (v2, hi) <- highs if v.semanticEquals(v2)
    } yield (v, lo, hi)).headOption
    rangePair.flatMap { case (v, lo, hi) =>
      val loIdx = local.output.indexWhere(_.exprId == lo.exprId)
      val hiIdx = local.output.indexWhere(_.exprId == hi.exprId)
      if (local.data.isEmpty || !isNumeric(v) || !isNumeric(lo) || !isNumeric(hi)) None
      else {
        def num(row: org.apache.spark.sql.catalyst.InternalRow, i: Int): Option[Double] =
          if (row.isNullAt(i)) None
          else local.output(i).dataType match {
            case ByteType    => Some(row.getByte(i).toDouble)
            case ShortType   => Some(row.getShort(i).toDouble)
            case IntegerType => Some(row.getInt(i).toDouble)
            case LongType    => Some(row.getLong(i).toDouble)
            case FloatType   => Some(row.getFloat(i).toDouble)
            case DoubleType  => Some(row.getDouble(i))
            case _           => None
          }
        val bounds = local.data.map(r => (num(r, loIdx), num(r, hiIdx)))
        // Every band must carry finite lo <= hi: a reversed or NaN
        // band would make the Generate-side sequence descend (default
        // step -1 → unbounded array) where BETWEEN was simply false,
        // so bail to the original plan instead.
        val valid = bounds.forall {
          case (Some(l), Some(h)) =>
            !l.isNaN && !h.isNaN && !l.isInfinite && !h.isInfinite && h >= l
          case _ => false
        }
        val widths = bounds.collect { case (Some(l), Some(h)) => h - l }
        if (!valid || widths.isEmpty || widths.exists(_.isInfinite)) None
        else {
          val binW = math.max(widths.sum / widths.size, 1e-9)
          val loMin = bounds.map(_._1.get).min
          val hiMax = bounds.map(_._2.get).max
          // bin indices must stay far inside Long range even for the
          // clamped extremes (tiny binW + huge band magnitudes); the
          // !isFinite check also catches binW overflowing to Infinity
          // (width sum past Double.MaxValue), where the comparisons
          // below would be vacuous NaNs
          val maxAbsBin = (math.abs(loMin) + math.abs(hiMax)) / binW + 4
          if (!binW.isFinite || !maxAbsBin.isFinite ||
            widths.max / binW + 1 > MaxBinsPerRange || maxAbsBin > (Long.MaxValue / 4).toDouble) None
          else {
            def bin(e: Expression): Expression =
              Cast(Floor(Divide(Cast(e, DoubleType), Literal(binW))), LongType)
            // The fact-side bin input is NaN-mapped and clamped to
            // just outside the band hull: under ANSI mode a raw
            // cast(floor(NaN or 1e300 / w) as long) would THROW where
            // the original BETWEEN was simply false. Out-of-hull
            // values land in a sentinel bin no band explodes into, so
            // they drop exactly as the predicate dropped them.
            def safeBin(e: Expression): Expression = {
              val sentinel = Literal(loMin - 2 * binW)
              val guarded = Least(Seq(
                Greatest(Seq(NaNvl(Cast(e, DoubleType), sentinel), sentinel)),
                Literal(hiMax + binW)))
              Cast(Floor(Divide(guarded, Literal(binW))), LongType)
            }
            val leftBin = Alias(safeBin(v), "__bin")()
            val newLeft = Project(j.left.output :+ leftBin, j.left)
            val binAttr = AttributeReference("__bin", LongType, nullable = false)()
            // Sequence is TimeZoneAware — it resolves only with an
            // explicit zone, even over integral bounds
            val newRight = Generate(
              Explode(Sequence(bin(lo), bin(hi), None, Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = j.right)
            val newCond = And(EqualTo(leftBin.toAttribute, binAttr), j.condition.get)
            Some(Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint)))
          }
        }
      }
    }
  }

}
