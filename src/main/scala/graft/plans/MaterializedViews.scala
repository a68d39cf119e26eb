package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column => SqlColumn, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Materialized-view rewrite — the classic OLAP accelerator: a rollup
  * (GROUP BY G, additive aggregates) is computed ONCE and persisted;
  * afterwards any aggregate query over the base table whose grouping
  * keys are a subset of G, whose filters touch only G, and whose
  * aggregates are derivable from the stored partials is transparently
  * rewritten by a Catalyst rule to RE-AGGREGATE THE VIEW — a scan of
  * |groups| rows instead of |base| rows. At 100 TB the MV is the
  * difference between a dashboard query reading gigabytes of rollup
  * and one reading the lake: the base scan disappears from the plan
  * entirely (the spec plan-locks scan paths).
  *
  * Rewrite algebra (why re-aggregation is exact):
  *   SUM(x)    = SUM of per-group sum_x        (associative)
  *   COUNT(*)  = SUM of per-group cnt_rows
  *   COUNT(x)  = SUM of per-group cnt_x        (non-null counts add)
  *   MIN/MAX(x)= MIN/MAX of per-group min_x/max_x
  *   AVG(x)    = SUM(sum_x) / SUM(cnt_x)       (never AVG of avgs)
  * Non-decomposable aggregates (DISTINCT, percentiles, collect_*) and
  * filters on non-group columns make the rule BAIL — the query runs
  * against the base unchanged. Wrong answers are impossible by
  * construction: either the MV provably covers the query, or the
  * rewrite does not happen.
  *
  * Freshness is the caller's contract, exactly as in Hive/BigQuery
  * materialized views: [[refresh]] recomputes after base changes (the
  * incremental-maintenance kernels — q_inc_agg — compose here for
  * O(changes) refresh of versioned bases). The registry is
  * session-global and path-keyed; `deregister` restores base scans.
  *
  * Reference grounding: the reference's report queries re-aggregate
  * the same orders/customers rollup on every scheduled run
  * (template.py:471-516) — this operator is that repeated work paid
  * once.
  */
object MaterializedViews {

  /** A registered view: base parquet path (canonical, the match key),
    * the MV root path, the grouping columns, the base columns whose
    * (sum/cnt/min/max) partials the MV stores, and the CURRENT
    * generation's data dir (MV data lives in `gen-NNNNNN` dirs so a
    * refresh can land a complete new generation and repoint the
    * registry atomically — a rewritten query never scans a
    * half-written view).
    */
  final case class MvDef(
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      aggCols: Seq[String],
      dataDir: String,
      physicalPath: String)

  private[plans] val registry = new ConcurrentHashMap[String, MvDef]()

  /** Scheme-insensitive path identity (file:/// vs bare path). */
  private[plans] def canonical(p: String): String = {
    val noScheme = p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")
    val collapsed = noScheme.replaceAll("/+", "/")
    if (collapsed.length > 1) collapsed.stripSuffix("/") else collapsed
  }

  private def partialAggs(aggCols: Seq[String]) = aggCols.flatMap(c => Seq(
    sum(col(c)).as(s"sum_$c"),
    count(col(c)).as(s"cnt_$c"),
    min(col(c)).as(s"min_$c"),
    max(col(c)).as(s"max_$c"))) :+ count(lit(1)).as("cnt_rows")

  private def genDir(mvPath: String, n: Int): String = f"$mvPath/gen-$n%06d"

  private def genOf(dataDir: String): Int =
    dataDir.substring(dataDir.lastIndexOf("gen-") + 4).toInt

  private def commitGen(spark: SparkSession, d: MvDef, rows: org.apache.spark.sql.DataFrame,
      nextGen: Int): MvDef = {
    val next = genDir(d.mvPath, nextGen)
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(next)
    val committed = d.copy(dataDir = next)
    registry.put(committed.basePath, committed) // repoint: atomic for new queries
    // drop superseded generations (new queries already see `next`)
    val root = new org.apache.hadoop.fs.Path(d.mvPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("gen-") && name != f"gen-$nextGen%06d") fs.delete(st.getPath, true)
    }
    committed
  }

  /** Compute the rollup of `basePath` and register it. One scan of
    * the base, one map-side-combined shuffle on G, |groups| rows
    * written — the standard MV build.
    */
  def define(
      spark: SparkSession,
      basePath: String,
      groupCols: Seq[String],
      aggCols: Seq[String],
      mvPath: String): MvDef = {
    require(groupCols.nonEmpty, "an MV needs at least one grouping column")
    require(aggCols.nonEmpty, "an MV needs at least one aggregated column")
    deregister(basePath) // a stale twin must not rewrite our own build
    val base = spark.read.parquet(basePath)
    val partials = partialAggs(aggCols)
    val rows = base.groupBy(groupCols.map(col): _*).agg(partials.head, partials.tail: _*)
    val d0 = MvDef(canonical(basePath), mvPath, groupCols, aggCols, genDir(mvPath, 0), basePath)
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(d0.dataDir)
    registry.put(d0.basePath, d0)
    d0
  }

  /** Recompute the MV from the current base (full rebuild; use
    * [[refreshIncremental]] for the O(batch) append path).
    */
  def refresh(spark: SparkSession, d: MvDef): MvDef =
    define(spark, d.basePath, d.groupCols, d.aggCols, d.mvPath)

  /** Fold an APPEND batch into the view — O(|batch| + |groups|), the
    * base is never rescanned: the batch's partials re-aggregate with
    * the stored ones (sums and counts ADD, mins/maxes MIN/MAX — all
    * decomposable under INSERTS, which is exactly why [[MvRewriteRule]]
    * restricts itself to these aggregates). The new generation lands
    * completely before the registry repoints, so a concurrent
    * rewritten query scans either the old complete view or the new
    * one, never a torn mix.
    *
    * Insert-only BY CONTRACT: deletes/updates in the base are not
    * representable (a removed row cannot be subtracted from a stored
    * MIN) — for those, [[refresh]] rebuilds. This matches the
    * lakehouse norm (BigQuery/Hive incremental MV maintenance is
    * append-scoped; general-change maintenance falls back to full
    * recompute).
    */
  def refreshIncremental(spark: SparkSession, d: MvDef, appended: org.apache.spark.sql.DataFrame): MvDef = {
    val partials = partialAggs(d.aggCols)
    val batch = appended.groupBy(d.groupCols.map(col): _*).agg(partials.head, partials.tail: _*)
    val current = spark.read.parquet(d.dataDir)
    val foldAggs = d.aggCols.flatMap(c => Seq(
      sum(col(s"sum_$c")).as(s"sum_$c"),
      sum(col(s"cnt_$c")).as(s"cnt_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c"))) :+ sum(col("cnt_rows")).as("cnt_rows")
    val combined = current.unionByName(batch)
      .groupBy(d.groupCols.map(col): _*)
      .agg(foldAggs.head, foldAggs.tail: _*)
    // sum(cnt) widens to LongType already; sum(sum_int) widens long->long,
    // but sum over a DECIMAL sum col widens precision — cast each
    // combined column back to the stored schema so generations never
    // drift types
    val typed = combined.select(current.columns.map { c =>
      val want = current.schema(c).dataType
      if (combined.schema(c).dataType == want) col(c) else col(c).cast(want)
    }: _*)
    commitGen(spark, d, typed, genOf(d.dataDir) + 1)
  }

  /** Fold a CDC batch (insert / delete / update pre+post images —
    * the [[graft.operators.SnapshotDiff.changeFeed]] shape) into the
    * view. SUM/COUNT partials are exactly retraction-maintainable
    * (pre-images subtract, post-images add). MIN/MAX are NOT — a
    * removed row that WAS the group's stored extreme invalidates it —
    * so those groups, and only those, get a TARGETED recompute: one
    * scan of the (already-updated) base filtered to the affected
    * group keys, its pushdown-able predicate bounded by |affected
    * groups|, never a full rebuild. This is the production partial-
    * recompute algorithm; the common CDC batch touches no extremes
    * and folds in O(batch + groups). Groups whose cnt_rows reaches 0
    * are dropped (the group no longer exists in the base).
    *
    * The base at `d.basePath` must already reflect the change feed
    * (same contract as IncrementalAgg.refreshFromChanges: the feed
    * DESCRIBES the base transition that has happened).
    */
  def refreshFromChanges(
      spark: SparkSession,
      d: MvDef,
      changes: org.apache.spark.sql.DataFrame,
      changeTypeCol: String = "change_type"): MvDef = {
    val sign = when(col(changeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .when(col(changeTypeCol).isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(
        lit("MV refreshFromChanges: unknown change type "), col(changeTypeCol))).cast("long"))
    // signed partials of the batch: sums/counts fold exactly; the
    // batch min/max of RETRACTED values tells which groups' stored
    // extremes might be invalidated
    val signedAggs = d.aggCols.flatMap(c => Seq(
      sum(col("_s") * col(c)).as(s"d_sum_$c"),
      sum(when(col(c).isNotNull, col("_s")).otherwise(lit(0L))).as(s"d_cnt_$c"),
      min(when(col("_s") === -1L, col(c))).as(s"retracted_min_$c"),
      max(when(col("_s") === -1L, col(c))).as(s"retracted_max_$c"),
      min(when(col("_s") === 1L, col(c))).as(s"added_min_$c"),
      max(when(col("_s") === 1L, col(c))).as(s"added_max_$c"))) :+
      sum(col("_s")).as("d_rows")
    val delta = changes.withColumn("_s", sign)
      .groupBy(d.groupCols.map(col): _*)
      .agg(signedAggs.head, signedAggs.tail: _*)
    val current = spark.read.parquet(d.dataDir)
    val joined = current.join(delta, d.groupCols, "full_outer")
    // a group needs a min/max recompute iff any retraction hit its
    // stored extreme (equality is conservative-exact: removing a
    // non-extreme value can never move min/max)
    val needsRecompute = d.aggCols.map(c =>
      (col(s"retracted_min_$c").isNotNull && col(s"retracted_min_$c") <= col(s"min_$c")) ||
        (col(s"retracted_max_$c").isNotNull && col(s"retracted_max_$c") >= col(s"max_$c")))
      .reduce(_ || _)
    val foldedCols: Seq[SqlColumn] = d.groupCols.map(col) ++ d.aggCols.flatMap(c => Seq(
      (coalesce(col(s"sum_$c"), lit(0)) + coalesce(col(s"d_sum_$c"), lit(0)))
        .as(s"sum_$c"),
      (coalesce(col(s"cnt_$c"), lit(0L)) + coalesce(col(s"d_cnt_$c"), lit(0L)))
        .as(s"cnt_$c"),
      least(col(s"min_$c"), col(s"added_min_$c")).as(s"min_$c"),
      greatest(col(s"max_$c"), col(s"added_max_$c")).as(s"max_$c"))) :+
      (coalesce(col("cnt_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L))).as("cnt_rows")
    val folded = joined
      .withColumn("_recompute", coalesce(needsRecompute, lit(false)))
      .select(foldedCols :+ col("_recompute"): _*)
      .filter(col("cnt_rows") > 0L)
    val clean = folded.filter(!col("_recompute")).drop("_recompute")
    val dirtyKeys = folded.filter(col("_recompute")).select(d.groupCols.map(col): _*)
    // targeted recompute of the dirty groups only: semi-join the base
    // to the affected keys (broadcast — the dirty set is small by
    // construction), one grouped pass over just those rows
    val partials = partialAggs(d.aggCols)
    val recomputed = spark.read.parquet(d.physicalPath)
      .join(broadcast(dirtyKeys), d.groupCols, "left_semi")
      .groupBy(d.groupCols.map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val next = clean.unionByName(recomputed)
    val typed = next.select(current.columns.map { c =>
      val want = current.schema(c).dataType
      if (next.schema(c).dataType == want) col(c) else col(c).cast(want)
    }: _*)
    commitGen(spark, d, typed, genOf(d.dataDir) + 1)
  }

  def deregister(basePath: String): Unit = {
    registry.remove(canonical(basePath)); ()
  }
}

/** The optimizer rule. Matches Aggregate → [Filter/Project]* →
  * parquet relation of a registered base and swaps in the MV when the
  * checks in [[MaterializedViews]] pass. Output attributes keep the
  * ORIGINAL exprIds (a final Project aliases the re-aggregated values
  * back onto them), so parent operators — HAVING filters, sorts,
  * joins — resolve unchanged.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaterializedViews.registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Peel attribute-only Projects and Filters down to the relation,
    * collecting filter conjuncts. Anything else (joins, generators,
    * computed projections) → no rewrite.
    */
  private def strip(p: LogicalPlan, conds: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case f: Filter => strip(f.child, conds :+ f.condition)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      strip(pr.child, conds)
    case r: LogicalRelation => Some((r, conds))
    case _ => None
  }

  private def rootOf(r: LogicalRelation): Option[String] = r.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths match {
      case Seq(single) => Some(MaterializedViews.canonical(single.toString))
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (rel, conds) <- strip(agg.child, Nil)
      root <- rootOf(rel)
      mv <- Option(MaterializedViews.registry.get(root))
      rewritten <- rewriteWith(agg, rel, conds, mv)
    } yield rewritten
  }

  private def rewriteWith(
      agg: Aggregate,
      rel: LogicalRelation,
      conds: Seq[Expression],
      mv: MaterializedViews.MvDef): Option[LogicalPlan] = {
    val groupSet = mv.groupCols.toSet

    // every grouping expression must be a bare base attribute among
    // the MV's grouping columns
    val groupAttrs: Option[Seq[AttributeReference]] =
      Some(agg.groupingExpressions).filter(_.forall {
        case a: AttributeReference => groupSet.contains(a.name)
        case _ => false
      }).map(_.map(_.asInstanceOf[AttributeReference]))

    // every filter may reference grouping columns only (group rows
    // survive or die wholesale, so filtering the MV is exact)
    val filtersOk = conds.forall(c => c.deterministic && c.references.forall {
      case a: AttributeReference => groupSet.contains(a.name)
      case _ => false
    })

    if (groupAttrs.isEmpty || !filtersOk) return None

    // fresh MV relation instance (fresh exprIds per use site)
    val spark = SparkSession.active
    val mvRel = spark.read.parquet(mv.dataDir).queryExecution.analyzed match {
      case r: LogicalRelation => r.newInstance()
      case other => other
    }
    val mvAttr: Map[String, AttributeReference] =
      mvRel.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap

    def mvCol(n: String): Option[AttributeReference] = mvAttr.get(n)

    // translate one aggregate call into (inner partial-re-aggregation
    // expression, finisher over the inner result attribute)
    def translate(ae: AggregateExpression)
        : Option[(Alias, Attribute => Expression)] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def attrArg(e: Expression): Option[String] = e match {
        case a: AttributeReference if mv.aggCols.contains(a.name) => Some(a.name)
        case _ => None
      }
      def reAgg(f: AggregateFunction): Alias =
        Alias(AggregateExpression(f, Complete, isDistinct = false), "_mv_part")()
      ae.aggregateFunction match {
        // TRY eval mode bails: a TRY sum silently nulls on overflow,
        // which re-aggregation over partials could answer differently.
        // LEGACY wraps identically on both routes; ANSI throws loudly
        // on either route (an intermediate-partial overflow surfaces
        // in the MV build, never as a wrong answer).
        case Sum(e, m) if m != EvalMode.TRY => attrArg(e).flatMap(c => mvCol(s"sum_$c").map { p =>
          (reAgg(Sum(p)), (a: Attribute) => Cast(a, ae.dataType))
        })
        case Min(e) => attrArg(e).flatMap(c => mvCol(s"min_$c").map { p =>
          (reAgg(Min(p)), (a: Attribute) => Cast(a, ae.dataType))
        })
        case Max(e) => attrArg(e).flatMap(c => mvCol(s"max_$c").map { p =>
          (reAgg(Max(p)), (a: Attribute) => Cast(a, ae.dataType))
        })
        case Count(Seq(e)) if e.foldable && e.eval() != null =>
          mvCol("cnt_rows").map { p =>
            (reAgg(Sum(p)), (a: Attribute) => Coalesce(Seq(Cast(a, LongType), Literal(0L))))
          }
        case Count(Seq(e)) => attrArg(e).flatMap(c => mvCol(s"cnt_$c").map { p =>
          (reAgg(Sum(p)), (a: Attribute) => Coalesce(Seq(Cast(a, LongType), Literal(0L))))
        })
        case Average(e, m) if m != EvalMode.TRY && ae.dataType == DoubleType =>
          attrArg(e).flatMap(c => for {
            s <- mvCol(s"sum_$c"); n <- mvCol(s"cnt_$c")
          } yield {
            // one inner alias carries both partial sums as a struct so
            // the finisher is a pure projection over a single attribute
            val pair = CreateNamedStruct(Seq(
              Literal("s"),
              AggregateExpression(Sum(s), Complete, isDistinct = false),
              Literal("n"),
              AggregateExpression(Sum(n), Complete, isDistinct = false)))
            (Alias(pair, "_mv_part")(),
              (a: Attribute) => Divide(
                Cast(GetStructField(a, 0, Some("s")), DoubleType),
                Cast(GetStructField(a, 1, Some("n")), DoubleType)))
          })
        case _ => None
      }
    }

    // walk the output list: grouping passthroughs map to MV group
    // attrs; each aggregate call must translate; anything else bails
    val innerAggs = scala.collection.mutable.ArrayBuffer.empty[Alias]
    val finishers = scala.collection.mutable.ArrayBuffer.empty[(NamedExpression, Attribute => Expression, Int)]
    val groupFinishers = scala.collection.mutable.ArrayBuffer.empty[(NamedExpression, String)]

    def translateNamed(ne: NamedExpression): Boolean = ne match {
      case a: AttributeReference if groupSet.contains(a.name) =>
        groupFinishers += ((a, a.name)); true
      case al @ Alias(a: AttributeReference, _) if groupSet.contains(a.name) =>
        groupFinishers += ((al, a.name)); true
      case al @ Alias(ae: AggregateExpression, _) =>
        translate(ae) match {
          case Some((inner, fin)) =>
            innerAggs += inner
            finishers += ((al, fin, innerAggs.size - 1))
            true
          case None => false
        }
      case _ => false
    }

    if (!agg.aggregateExpressions.forall(translateNamed)) return None

    // grouping keys of the re-aggregation: MV attrs of the query's keys
    val innerGroup = groupAttrs.get.map(a => mvAttr(a.name))
    val innerList: Seq[NamedExpression] = innerGroup ++ innerAggs
    val mvFiltered =
      if (conds.isEmpty) mvRel
      else Filter(
        conds.map(_.transform {
          case a: AttributeReference => mvAttr(a.name)
        }).reduce(And), mvRel)
    val innerAgg = Aggregate(innerGroup, innerList, mvFiltered)

    // final projection pins the ORIGINAL output attributes (name,
    // exprId, type) onto the re-aggregated values
    val innerOut = innerAgg.output
    val byIdx: Map[Int, Attribute] = innerAggs.indices
      .map(i => i -> innerOut(innerGroup.size + i)).toMap
    val projected: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      groupFinishers.find(_._1 eq ne) match {
        case Some((_, gname)) =>
          val src = mvAttr(gname)
          val cast = if (src.dataType == ne.dataType) src else Cast(src, ne.dataType)
          Alias(cast, ne.name)(exprId = ne.exprId)
        case None =>
          val (_, fin, idx) = finishers.find(_._1 eq ne).get
          val e = fin(byIdx(idx))
          val cast = if (e.dataType == ne.dataType) e else Cast(e, ne.dataType)
          Alias(cast, ne.name)(exprId = ne.exprId)
      }
    }
    Some(Project(projected, innerAgg))
  }
}
