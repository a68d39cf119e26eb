package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Session extensions: graft's SQL function surface + the automatic
  * binned range-join optimization. Installed everywhere via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession,
  * Verify, Bench), so the config-driven SQL transform surface
  * (SURVEY §2 #5) can call the codegen'd kernels and inequality
  * range joins are rewritten without the caller knowing about
  * binning.
  *
  * Reference grounding: the reference's transform step is arbitrary
  * Spark SQL (template.py:319-322); exposing graft's kernels as SQL
  * functions keeps that surface complete. The range-join rule is the
  * optimization OSS Spark lacks (Spark plans point-in-interval joins
  * as SMJ + per-key quadratic filter, or a broadcast nested loop).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BinnedRangeJoinRule)
    ext.injectOptimizerRule(_ => MvRewriteRule)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  private def one(name: String)(f: Expression => Expression): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, name), { args =>
      require(args.size == 1, s"$name takes 1 argument")
      f(args.head)
    })

  private def two(name: String)(f: (Expression, Expression) => Expression): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, name), { args =>
      require(args.size == 2, s"$name takes 2 arguments")
      f(args(0), args(1))
    })

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$name: argument must be an INT literal, got $e")
  }

  /** The SQL function surface: each maps 1:1 onto a codegen'd graft
    * expression already used by the DataFrame API.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    two("graft_cosine")(CosineSimilarity(_, _)),
    two("graft_dot")(DotProduct(_, _)),
    one("graft_fingerprint64")(Fingerprint64(_)),
    one("graft_simhash64")(SimHash64(_)),
    two("graft_shingle_hashes")((s, n) => HashedShingles(s, litInt(n, "graft_shingle_hashes"))),
    (FunctionIdentifier("graft_interleave_bits"), info("graft_interleave_bits", ""),
      (args: Seq[Expression]) => InterleaveBits(args)),
    // Aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression(Complete), exactly as for native sum/max.
    (FunctionIdentifier("graft_top_k"), info("graft_top_k", ""),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_top_k takes (score, id, k)")
        TopKAggregate(args(0), args(1), litInt(args(2), "graft_top_k"))
      }),
    (FunctionIdentifier("graft_freq_sketch"), info("graft_freq_sketch", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_freq_sketch takes (value, capacity)")
        FreqSketchAggregate(args(0), litInt(args(1), "graft_freq_sketch"))
      }),
    (FunctionIdentifier("graft_cms_sketch"), info("graft_cms_sketch", ""),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_cms_sketch takes (term, depth, width)")
        CmsAggregate(args(0), litInt(args(1), "graft_cms_sketch"),
          litInt(args(2), "graft_cms_sketch"))
      }),
    (FunctionIdentifier("graft_cms_bucket"), info("graft_cms_bucket", ""),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_cms_bucket takes (term, row, width)")
        CmsBucket(args(0), litInt(args(1), "graft_cms_bucket"),
          litInt(args(2), "graft_cms_bucket"))
      }))
}

/** Rewrites an inner join whose condition contains a
  * point-in-interval predicate (`lo <= p AND p <= hi`, strict or not)
  * into a binned equi-join, opt-in via
  * `spark.graft.rangeJoin.binWidth` (> 0 enables; pick ~ the typical
  * interval length).
  *
  * Scale rationale (same as operators.RangeJoin, but as an optimizer
  * rule so ANY SQL/DataFrame inequality join benefits): Spark executes
  * `l.k = r.k AND p BETWEEN lo AND hi` as a sort-merge on k with a
  * per-key quadratic filter — O(Σ |Lk|·|Rk|) — and a keyless range
  * join as a broadcast nested loop, O(|L|·|R|). Quantizing the domain
  * into width-w bins turns containment into equality: the interval
  * side explodes to its ~(len/w + 1) overlapping bins, the point side
  * maps to exactly one bin, and the join runs through the normal
  * hash-shuffle path on (bin [, keys]), refined by the original exact
  * predicate.
  *
  * Monotonicity makes double binning safe for the full long domain:
  * floor(x/w) under correctly-rounded double division is
  * non-decreasing in x, so lo <= p <= hi always lands bin(p) within
  * [bin(lo), bin(hi)] even where doubles lose integer precision.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val binWidthKey = "spark.graft.rangeJoin.binWidth"
  private val binPrefix = "_graft_bin"

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType => true
    case _ => false
  }

  /** (point, bound, isLower): normalized view of one inequality
    * conjunct, from the point's perspective.
    */
  private def asBound(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _ => Seq.empty
  }

  private def binOf(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed conf value must not take down optimization
    val w = scala.util.Try(conf.getConfString(binWidthKey, "0").toLong).getOrElse(0L)
    if (w <= 0) return plan
    plan.transformUp {
      // never rewrite streaming joins: the raw time-range condition is
      // what the micro-batch planner analyzes for watermark-based
      // state eviction — hiding it behind a Generate would change the
      // state lifecycle
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming &&
            !(left.output ++ right.output).exists(_.name.startsWith(binPrefix)) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = conjuncts.flatMap(asBound)

    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left, Some(false)=right
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }

    val pair = (for {
      (p, lo, true) <- bounds
      if integral(p) && p.deterministic
      (p2, hi, false) <- bounds
      if p.semanticEquals(p2) && integral(lo) && integral(hi) && lo.deterministic && hi.deterministic
      pSide <- sideOf(p)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != pSide
    } yield (p, lo, hi, pSide)).headOption

    pair.map { case (p, lo, hi, pointOnLeft) =>
      val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)

      val binAlias = Alias(binOf(p, w), s"${binPrefix}_p")()
      val pointPlan = Project(pointSide.output :+ binAlias, pointSide)

      val loBin = binOf(lo, w)
      val hiBin = binOf(hi, w)
      // Greatest guards hi < lo: Sequence would otherwise infer a
      // negative step and still emit bins for an empty interval.
      // TimeZoneAwareExpression: unresolved until the zone is pinned,
      // and the optimizer runs post-analysis so nobody pins it for us.
      val seq = new Sequence(loBin, Greatest(Seq(loBin, hiBin)), None)
        .withTimeZone(conf.sessionLocalTimeZone)
      val ivAttr = AttributeReference(s"${binPrefix}_iv", LongType, nullable = true)()
      val intervalPlan = Generate(Explode(seq), Nil, outer = false, None, Seq(ivAttr), intervalSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
      val newCond = (conjuncts :+ EqualTo(binAlias.toAttribute, ivAttr)).reduce(And)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
