package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
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
  * interval side — `ceil(avg(hi - lo))`, clamped so no single interval
  * replicates into more than [[RangeJoinRule.MaxBinsPerInterval]] bins (the
  * same interval-statistics collection DuckDB's IEJoin and Postgres's range
  * selectivity estimation do at plan time); `0` or a negative value disables
  * the rule.
  *
  * Auto-derivation discipline (it runs a real job at plan time, so it must
  * be rare and bounded):
  *   - the result is memoized per canonicalized interval-side subtree for
  *     the lifetime of the session — one job per distinct interval relation,
  *     not one per `explain()`/action/micro-batch;
  *   - a streaming interval side never derives (a batch action over a
  *     streaming plan throws at plan time) — no rewrite unless an explicit
  *     width is configured;
  *   - derivation is skipped when the interval side's estimated size exceeds
  *     `graft.rangejoin.autoMaxBytes` (default 1 GiB): the interval side of
  *     a point-in-interval join is dimension-sized by construction, and a
  *     plan-time scan of a fact-sized table is never acceptable. Plans with
  *     unknown (huge-sentinel) stats are skipped for the same reason.
  * The derivation job scans only the two bound columns (column-pruned) of
  * the session owning the plan — threaded through the rule constructor, not
  * `SparkSession.active`, which can be a different session in multi-session
  * apps.
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
class RangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {
  import RangeJoinRule._

  /** Session-scoped memo (held in the companion — `injectOptimizerRule`
    * builders are re-invoked per optimization, so instance state would be
    * reborn empty every planning). */
  private val widthCache = RangeJoinRule.widthCacheFor(session)

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
      // empty/inverted intervals (hi <= lo) match nothing under the
      // residual predicate, but Sequence(a, b) generates a DESCENDING
      // range when bin(lo) > bin(hi-1) — one swapped-bounds row would
      // replicate into millions of junk bins or exceed the max array
      // size. graft.ops.RangeJoin.binned carries the same guard; null
      // bounds filter identically to the null residual predicate.
      val guarded = Filter(
        GreaterThan(asLong(pair.hi), asLong(pair.lo)), intervalSide)
      val newIntervalSide = Generate(
        Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ibinAttr), child = guarded)

      val (newLeft, newRight) =
        if (pair.pointOnLeft) (newPointSide, newIntervalSide)
        else (newIntervalSide, newPointSide)
      val binEq = EqualTo(pbin.toAttribute, ibinAttr)
      val rejoined = Join(newLeft, newRight, Inner,
        Some(And(binEq, cond)), j.hint)
      Project(j.output, rejoined)
    }
  }

  /** Auto mode: one planning-time job computing `ceil(avg(hi - lo))` and
    * `max(hi - lo)` over the interval side (bridged to epoch days for
    * dates), memoized per canonicalized subtree. The width is clamped up to
    * `maxLen / MaxBinsPerInterval` so one outlier-long interval cannot
    * explode into millions of replicated bin rows. Returns None (no
    * rewrite) when the side is streaming, estimated larger than the auto
    * cap, empty, or has a non-positive average length — an empty interval
    * table joins to nothing regardless of plan shape. The derivation plan
    * itself contains no unrewritten range join (transformUp already visited
    * the children), so the rule cannot recurse. */
  private def deriveWidth(intervalSide: LogicalPlan, lo: Attribute,
      hi: Attribute): Option[Long] = {
    if (intervalSide.isStreaming) return None
    val maxBytes = BigInt(conf.getConfString(AutoMaxBytesKey,
      (1L << 30).toString).toLong)
    // Gate on BOTH the subtree estimate and every leaf feeding it: an
    // ungrouped aggregate estimates ~1 output row while still scanning a
    // fact-sized input, and the plan-time job pays for the SCAN. Unknown
    // leafs surface as a huge sentinel and are correctly skipped by the cap.
    val leafMax = intervalSide.collectLeaves()
      .map(_.stats.sizeInBytes).foldLeft(BigInt(0))(_.max(_))
    if (intervalSide.stats.sizeInBytes > maxBytes || leafMax > maxBytes)
      return None
    val len = Alias(Subtract(asLong(hi), asLong(lo)), "__len")()
    val lenPlan = Project(Seq(len), intervalSide)
    // Key by (semanticHash, treeString) of the canonicalized plan, NOT the
    // plan object: a cached LogicalRelation/LogicalRDD value strongly
    // references its SparkSession, which would reach the WeakHashMap key
    // and defeat the session weak-keying. A key collision merely reuses a
    // similar plan's width — widths affect performance only, never results.
    val canon = lenPlan.canonicalized
    val key = (canon.semanticHash(), canon.toString)
    val cached = widthCache.get(key)
    if (cached != null) return cached
    derivationCount(session).incrementAndGet()
    val df = org.apache.spark.sql.graft.DatasetBridge.ofRows(session, lenPlan)
    import org.apache.spark.sql.functions.{avg, max}
    val row = df.agg(avg("__len"), max("__len")).head()
    val derived: Option[Long] =
      if (row.isNullAt(0)) None
      else {
        val mean = row.getDouble(0)
        if (mean.isNaN || mean <= 0) None
        else {
          val maxLen = row.getLong(1)
          val clamp = math.ceil(maxLen.toDouble / MaxBinsPerInterval).toLong
          Some(math.max(math.ceil(mean).toLong, math.max(clamp, 1L)))
        }
      }
    widthCache.put(key, derived)
    derived
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

object RangeJoinRule {

  val ConfKey = "graft.rangejoin.binWidth"

  /** Auto derivation refuses to scan an interval side estimated above this
    * many bytes — the plan-time job must stay dimension-sized. */
  val AutoMaxBytesKey = "graft.rangejoin.autoMaxBytes"

  /** Upper bound on per-interval bin replication under auto width: the
    * derived width is raised until the longest interval spans at most this
    * many bins. */
  val MaxBinsPerInterval = 64L

  private case class RangePair(point: Attribute, lo: Attribute, hi: Attribute,
      pointOnLeft: Boolean)

  /** Per-session count of planning-time derivation jobs actually run
    * (cache misses). Test hook: asserts memoization — re-planning the same
    * query must not re-pay the job. Keyed by session so parallel suites
    * cannot pollute each other's counts. */
  // WEAK keys: a strong SparkSession key would pin closed sessions (and the
  // canonicalized plans cached under them) for JVM lifetime in multi-session
  // drivers — exactly the apps the session-bound constructor exists for.
  private val derivationCounts = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, AtomicLong]())

  private[plans] def derivationCount(s: SparkSession): AtomicLong =
    derivationCounts.computeIfAbsent(s, _ => new AtomicLong(0L))

  /** Canonicalized `Project(len, intervalSide)` → derived width (None =
    * underivable: empty side, non-positive lengths). Bounded LRU per
    * session — a session touches a handful of interval relations, not
    * thousands; 64 entries is plenty and keeps retained plans small. */
  private val widthCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Map[(Int, String), Option[Long]]]())

  private def widthCacheFor(s: SparkSession): java.util.Map[(Int, String), Option[Long]] =
    widthCaches.computeIfAbsent(s, _ =>
      java.util.Collections.synchronizedMap(
        new java.util.LinkedHashMap[(Int, String), Option[Long]](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(Int, String), Option[Long]]): Boolean =
            size() > 64
        }))

  def derivations(s: SparkSession): Long = derivationCount(s).get()

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
}
