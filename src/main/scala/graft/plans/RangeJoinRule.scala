package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure range-predicate inner join
  *
  *   Join(a, b, a.p >= b.lo AND a.p < b.hi [AND rest...])
  *
  * — which Spark can only plan as BroadcastNestedLoopJoin / CartesianProduct
  * (O(n·m) comparisons) — into the binned equi-join [[graft.ops.RangeJoin]]
  * computes by hand: intervals replicated once per overlapped bin, points
  * mapped to their bin, equi-join on the bin id with the original predicate
  * kept as a residual. SQL queries get the scalable plan without being
  * rewritten.
  *
  * Bin width ≈ the typical interval length. `graft.rangejoin.binWidth`
  * semantics: a positive long pins the width explicitly; unset (or "auto")
  * derives it at rewrite time by running a planning-time aggregate over the
  * interval side — `ceil(avg(hi - lo))` — so each interval overlaps ~2 bins
  * on average (the same interval-statistics collection DuckDB's IEJoin and
  * Postgres's range selectivity estimation do at plan time); `0` or a
  * negative value disables the rule. The derivation job scans only the two
  * bound columns of the interval side (column-pruned), the side that is
  * small by construction in a point-in-interval join — at 100 TB the points
  * are the big table, the intervals the dimension.
  *
  * Conservative matching: inner join; point/lo/hi are integral-typed
  * attributes (fractional bounds would make the `hi-1` upper-bin arithmetic
  * wrong) or all DateType (binned on epoch days — `binWidth` is then a
  * width in days); the range pair references opposite sides; no equi-conjunct
  * between the sides already exists (if one does, Spark hash-joins on it
  * and binning would only add replication). Null bounds behave identically:
  * a null bin/sequence drops the row exactly where the null range predicate
  * would.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val ConfKey = "graft.rangejoin.binWidth"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Dates are epoch-day integers underneath (`unix_date`), so a date range
    * join bins the day number line; `binWidth` is then a width in days.
    * Mixing date and integral attributes in one range pair is rejected —
    * their bin domains are incomparable. */
  private def binnable(p: Expression, lo: Expression, hi: Expression): Boolean =
    (integral(p) && integral(lo) && integral(hi)) ||
      (p.dataType == DateType && lo.dataType == DateType && hi.dataType == DateType)

  /** Epoch-day/identity bridge to LongType for bin arithmetic. */
  private def asLong(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case _ => Cast(e, LongType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(ConfKey, "auto").trim
    val explicit: Option[Long] =
      if (raw.equalsIgnoreCase("auto")) None
      else raw.toLongOption match {
        case Some(w) if w > 0 => Some(w)
        case _ => return plan // 0, negative, or unparseable → disabled
      }
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, explicit).getOrElse(j)
    }
  }

  private case class RangePair(point: Attribute, lo: Attribute, hi: Attribute,
      pointOnLeft: Boolean)

  private def rewrite(j: Join, cond: Expression,
      explicit: Option[Long]): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    // an existing cross-side equi-conjunct means a hash join is already
    // available — leave the plan alone
    val hasEqui = conjuncts.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        crossSides(j, a, b)
      case _ => false
    }
    if (hasEqui) return None
    for {
      pair <- findRangePair(j, conjuncts)
      intervalSide0 = if (pair.pointOnLeft) j.right else j.left
      width <- explicit.orElse(deriveWidth(intervalSide0, pair.lo, pair.hi))
    } yield {
      val (pointSide, intervalSide) =
        if (pair.pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // integral floor division — floor(x / w) in double mis-bins longs
      // above 2^53 (boundary values round across bins and silently drop
      // matches). (x - pmod(x, w)) is exactly floor(x/w)·w, then the
      // integral divide is exact at any magnitude. Input is pre-bridged to
      // LongType (epoch days for DateType).
      def overW(x: Expression): Expression = {
        val w = Literal(width)
        IntegralDivide(Subtract(x, Pmod(x, w)), w)
      }

      val pbin = Alias(overW(asLong(pair.point)), "__pbin")()
      val newPointSide = Project(pointSide.output :+ pbin, pointSide)

      val ibinAttr = AttributeReference("__ibin", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved (ResolveTimeZone only runs during analysis)
      val seq = new Sequence(
        overW(asLong(pair.lo)),
        overW(Subtract(asLong(pair.hi), Literal(1L))),
        None).withTimeZone(conf.sessionLocalTimeZone)
      val newIntervalSide = Generate(
        Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ibinAttr), child = intervalSide)

      val (newLeft, newRight) =
        if (pair.pointOnLeft) (newPointSide, newIntervalSide)
        else (newIntervalSide, newPointSide)
      val binEq = EqualTo(pbin.toAttribute, ibinAttr)
      val rejoined = Join(newLeft, newRight, Inner,
        Some(And(binEq, cond)), j.hint)
      Project(j.output, rejoined)
    }
  }

  /** Auto mode: one planning-time job computing `ceil(avg(hi - lo))` over
    * the interval side (bridged to epoch days for dates). Column-pruned to
    * the two bound columns; the interval side of a point-in-interval join
    * is the dimension-sized side. Returns None (no rewrite) when the side
    * is empty or the average is non-positive — an empty interval table
    * joins to nothing regardless of plan shape. The derivation plan itself
    * contains no unrewritten range join (transformUp already visited the
    * children), so the rule cannot recurse. */
  private def deriveWidth(intervalSide: LogicalPlan, lo: Attribute,
      hi: Attribute): Option[Long] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val len = Alias(Subtract(asLong(hi), asLong(lo)), "__len")()
    val df = org.apache.spark.sql.graft.DatasetBridge.ofRows(
      spark, Project(Seq(len), intervalSide))
    val row = df.agg(org.apache.spark.sql.functions.avg("__len")).head()
    if (row.isNullAt(0)) None
    else {
      val avg = row.getDouble(0)
      if (avg.isNaN || avg <= 0) None else Some(math.ceil(avg).toLong)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def crossSides(j: Join, a: Attribute, b: Attribute): Boolean =
    (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
      (j.right.outputSet.contains(a) && j.left.outputSet.contains(b))

  /** One `p >= lo` (or flipped) + one `p < hi` (or flipped) conjunct pair
    * over the same integral point attribute, bounds both from the opposite
    * side. */
  private def findRangePair(j: Join, conjuncts: Seq[Expression]): Option[RangePair] = {
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p: AttributeReference, lo: AttributeReference) => (p, lo)
      case LessThanOrEqual(lo: AttributeReference, p: AttributeReference) => (p, lo)
    }
    val uppers = conjuncts.collect {
      case LessThan(p: AttributeReference, hi: AttributeReference) => (p, hi)
      case GreaterThan(hi: AttributeReference, p: AttributeReference) => (p, hi)
    }
    val pairs = for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.exprId == p2.exprId
      if binnable(p1, lo, hi)
      pointOnLeft =
        if (j.left.outputSet.contains(p1)) Some(true)
        else if (j.right.outputSet.contains(p1)) Some(false)
        else None
      side <- pointOnLeft
      intervalSide = if (side) j.right else j.left
      if intervalSide.outputSet.contains(lo) && intervalSide.outputSet.contains(hi)
    } yield RangePair(p1, lo, hi, side)
    pairs.headOption
  }
}
