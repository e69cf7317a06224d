package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule rewriting point-in-interval range joins into binned
  * equi-joins.
  *
  * A genomic range join written naturally —
  * {{{
  *   points.join(intervals,
  *     pChrom === iChrom && pos >= start && pos <= end)
  * }}}
  * — gives Spark only the chromosome as an equi-key (~25 distinct values:
  * catastrophic skew at scale) or, without one, a broadcast-nested-loop
  * join. The scalable plan is the fixed-width-bin equi-join that
  * [[graft.operators.IntervalJoin.pointsInIntervals]] builds by hand
  * (reference semantics: /root/reference/src/modules/vcf_reader.py:79-125,
  * a single-threaded sweep). This rule derives it automatically: intervals
  * explode to the bins they overlap, points map to their bin, the bin
  * equality joins alongside the original keys, and the original predicate
  * stays as the residual filter — so the rewrite is semantics-preserving
  * for ANY inner join whose condition bounds one side's integral column
  * between two columns of the other side (bin equality is implied by
  * containment; null coordinates produce null bins / empty sequences and
  * match nothing, exactly like the original predicate).
  *
  * Config: spark.sql.graft.rangeJoin.enabled (default true),
  * spark.sql.graft.rangeJoin.binSize (default 10000),
  * spark.sql.graft.rangeJoin.maxBins (default 100000). An interval wider
  * than maxBins*binSize raises a clear runtime error naming the configs —
  * a loud failure instead of a silent multi-million-element explode (e.g.
  * epoch-millisecond windows against the genomic-scale default binSize):
  * raise binSize for wide domains or disable the rule.
  * Injected by [[GraftExtensions]] (spark.sql.extensions) or per-session
  * via [[RangeJoinRule.register]].
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val binAttrName = "_graft_bin"

  /** Append to the session's extra optimizations (idempotent). */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinRule))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRule
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType => true
    case _ => false
  }

  /** (point, start, end) when the conjuncts bound `point` (attribute of
    * `pointSide`) between two attributes of `intervalSide`; strict bounds
    * qualify too (narrower than the bin containment they imply).
    */
  private def boundsOf(conjuncts: Seq[Expression], pointSide: LogicalPlan,
                       intervalSide: LogicalPlan)
    : Option[(Attribute, Attribute, Attribute)] = {
    def fromPoint(a: Expression) = a match {
      case ar: AttributeReference
        if pointSide.outputSet.contains(ar) && isIntegral(ar) => Some(ar)
      case _ => None
    }
    def fromInterval(a: Expression) = a match {
      case ar: AttributeReference
        if intervalSide.outputSet.contains(ar) && isIntegral(ar) => Some(ar)
      case _ => None
    }
    // pos >= start (or start <= pos), strict variants included
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, s) => (fromPoint(p), fromInterval(s))
      case GreaterThan(p, s) => (fromPoint(p), fromInterval(s))
      case LessThanOrEqual(s, p) => (fromPoint(p), fromInterval(s))
      case LessThan(s, p) => (fromPoint(p), fromInterval(s))
    }.collect { case (Some(p), Some(s)) => (p, s) }
    // pos <= end (or end >= pos)
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, e) => (fromPoint(p), fromInterval(e))
      case LessThan(p, e) => (fromPoint(p), fromInterval(e))
      case GreaterThanOrEqual(e, p) => (fromPoint(p), fromInterval(e))
      case GreaterThan(e, p) => (fromPoint(p), fromInterval(e))
    }.collect { case (Some(p), Some(e)) => (p, e) }
    (for {
      (p1, s) <- lowers
      (p2, e) <- uppers if p1.semanticEquals(p2)
    } yield (p1, s, e)).headOption
  }

  // timeZoneId set explicitly: expressions built after analysis skip
  // ResolveTimeZone, and TimeZoneAware expressions stay unresolved without it
  private def floorBin(e: Expression, binSize: Long): Expression =
    Floor(Divide(Cast(e, DoubleType, Some(conf.sessionLocalTimeZone)),
      Literal(binSize.toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.sql.graft.rangeJoin.enabled", "true")
      .toBoolean) return plan
    val binSize = conf
      .getConfString("spark.sql.graft.rangeJoin.binSize", "10000").toLong

    val maxBins = conf
      .getConfString("spark.sql.graft.rangeJoin.maxBins", "100000").toLong

    // skip joins this rule already rewrote AND joins already binned by
    // hand (IntervalJoin.pointsInIntervals joins on a "_bin" column whose
    // residual range filter gets pushed into the join condition by
    // PushPredicateThroughJoin — re-binning it would double the explode)
    val binNames = Set(binAttrName, "_bin")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(a => binNames.contains(a.name)) &&
          !left.output.exists(a => binNames.contains(a.name)) &&
          !right.output.exists(a => binNames.contains(a.name)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hit = boundsOf(conjuncts, left, right).map((_, false))
          .orElse(boundsOf(conjuncts, right, left).map((_, true)))
        hit match {
          case Some(((pos, start, end), swapped)) =>
            val (pointSide, intervalSide) =
              if (swapped) (right, left) else (left, right)
            // point side: one bin per row
            val pBin = Alias(floorBin(pos, binSize), binAttrName)()
            val pointProj = Project(pointSide.output :+ pBin, pointSide)
            // interval side: explode to every overlapped bin
            val iBinAttr =
              AttributeReference(binAttrName, LongType, nullable = false)()
            // loud runtime guard instead of a silent huge explode: an
            // interval spanning more than maxBins bins raises with the
            // configs to adjust
            val floorS = floorBin(start, binSize)
            val floorE = floorBin(end, binSize)
            val guardedStop = If(
              GreaterThan(Subtract(floorE, floorS), Literal(maxBins)),
              Cast(new RaiseError(Literal(
                s"graft range join: interval spans more than $maxBins" +
                  s" bins of $binSize; raise spark.sql.graft.rangeJoin" +
                  ".binSize / .maxBins or disable " +
                  "spark.sql.graft.rangeJoin.enabled")),
                LongType, Some(conf.sessionLocalTimeZone)),
              floorE)
            val gen = Generate(
              Explode(Sequence(floorS, guardedStop, None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(iBinAttr), child = intervalSide)
            val newCond = And(cond,
              EqualTo(pBin.toAttribute, iBinAttr))
            val (nl, nr) =
              if (swapped) (gen, pointProj) else (pointProj, gen)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
