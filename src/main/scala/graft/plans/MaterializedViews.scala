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

  /** Maintenance reads of the BASE must never be answered by the view
    * being maintained: a targeted-recompute scan is itself an
    * aggregate-over-base that [[MvRewriteRule]] would happily rewrite
    * to the CURRENT (stale) generation — the refresh would then
    * "recompute" dirty groups from exactly the stale values it is
    * trying to fix, silently. (Caught live: the single-group-column
    * pruned recompute is a pure Filter+Aggregate, precisely the rule's
    * match shape; the old semi-join plan only escaped because a Join
    * makes the rule bail.) Refresh paths run under this thread-local
    * suspension; queries on other threads keep rewriting throughout.
    */
  private[plans] val maintenanceDepth: ThreadLocal[Integer] =
    ThreadLocal.withInitial[Integer](() => 0)

  private def withoutRewrite[T](body: => T): T = {
    maintenanceDepth.set(maintenanceDepth.get + 1)
    try body finally maintenanceDepth.set(maintenanceDepth.get - 1)
  }

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

  /** Land `rows` as a complete new generation of the view at `mvPath`
    * and drop superseded generations, RETAINING the immediately-
    * previous one: a rewritten query planned against gen N-1 before
    * this commit may still be mid-scan — deleting its files would fail
    * it with FileNotFoundException. Generation N-1 dies only when N+1
    * commits, by which time any reader of N-1 predates TWO refreshes
    * (the same one-generation grace Delta/Iceberg give in-flight
    * snapshot reads before VACUUM).
    */
  private def commitGenDir(spark: SparkSession, mvPath: String,
      rows: org.apache.spark.sql.DataFrame, nextGen: Int): String = {
    val next = genDir(mvPath, nextGen)
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(next)
    val root = new org.apache.hadoop.fs.Path(mvPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("gen-") &&
          scala.util.Try(name.stripPrefix("gen-").toInt).toOption.exists(_ < nextGen - 1))
        fs.delete(st.getPath, true)
    }
    next
  }

  private def commitGen(spark: SparkSession, d: MvDef, rows: org.apache.spark.sql.DataFrame,
      nextGen: Int): MvDef = {
    val committed = d.copy(dataDir = commitGenDir(spark, d.mvPath, rows, nextGen))
    registry.put(committed.basePath, committed) // repoint: atomic for new queries
    committed
  }

  /** Fold an append batch's rows into the stored rollup at `dataDir`:
    * batch partials re-aggregate with the stored ones (sums/counts
    * ADD, mins/maxes MIN/MAX), types pinned back to the stored schema
    * so generations never drift. Shared by the single-table and the
    * join-view incremental refresh.
    */
  private def foldAppend(
      spark: SparkSession,
      dataDir: String,
      groupCols: Seq[String],
      aggCols: Seq[String],
      batchRows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val partials = partialAggs(aggCols)
    val batch = batchRows.groupBy(groupCols.map(col): _*).agg(partials.head, partials.tail: _*)
    val current = spark.read.parquet(dataDir)
    val foldAggs = aggCols.flatMap(c => Seq(
      sum(col(s"sum_$c")).as(s"sum_$c"),
      sum(col(s"cnt_$c")).as(s"cnt_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c"))) :+ sum(col("cnt_rows")).as("cnt_rows")
    val combined = current.unionByName(batch)
      .groupBy(groupCols.map(col): _*)
      .agg(foldAggs.head, foldAggs.tail: _*)
    // sum(cnt) widens to LongType already; sum(sum_int) widens long->long,
    // but sum over a DECIMAL sum col widens precision — cast each
    // combined column back to the stored schema so generations never
    // drift types
    combined.select(current.columns.map { c =>
      val want = current.schema(c).dataType
      if (combined.schema(c).dataType == want) col(c) else col(c).cast(want)
    }: _*)
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
      mvPath: String): MvDef = withoutRewrite {
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
  def refreshIncremental(spark: SparkSession, d: MvDef, appended: org.apache.spark.sql.DataFrame): MvDef = withoutRewrite {
    val typed = foldAppend(spark, d.dataDir, d.groupCols, d.aggCols, appended)
    commitGen(spark, d, typed, genOf(d.dataDir) + 1)
  }

  /** Fold a CDC batch (insert / delete / update pre+post images —
    * the [[graft.operators.SnapshotDiff.changeFeed]] shape) into the
    * view. SUM/COUNT partials are exactly retraction-maintainable
    * (pre-images subtract, post-images add). MIN/MAX are NOT — a
    * removed row that WAS the group's stored extreme invalidates it —
    * so those groups, and only those, get a TARGETED recompute: the
    * dirty key set (small by construction) is collected and pushed
    * into the base scan as per-column IN/IS NULL literals, so parquet
    * footer stats SKIP every file holding none of the affected keys —
    * the recompute reads O(|dirty groups|) files off a 100 TB base,
    * never a full rebuild (above `maxPruneKeys` it falls back to an
    * unpruned scan, loudly). This is the production partial-recompute
    * algorithm; the common CDC batch touches no extremes and folds in
    * O(batch + groups). Groups whose cnt_rows reaches 0 are dropped
    * (the group no longer exists in the base). NULL grouping keys are
    * first-class: the fold and the dirty-group machinery join with
    * null-safe equality throughout.
    *
    * The base at `d.basePath` must already reflect the change feed
    * (same contract as IncrementalAgg.refreshFromChanges: the feed
    * DESCRIBES the base transition that has happened).
    */
  def refreshFromChanges(
      spark: SparkSession,
      d: MvDef,
      changes: org.apache.spark.sql.DataFrame,
      changeTypeCol: String = "change_type",
      maxPruneKeys: Int = 1000): MvDef = withoutRewrite {
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
    // NULL-SAFE fold: a USING-column join matches keys with `=`, so a
    // NULL grouping key on either side never pairs — a delete/update
    // delta for the null-keyed group would land on an UNMATCHED row,
    // get dropped by the cnt_rows filter, and leave the stored partials
    // silently stale. Join on `<=>` per group column instead (NULL
    // matches NULL, exactly once), and reconstruct the key from
    // whichever side is present — a `_cur` presence marker
    // distinguishes "current-side row exists" from "key is NULL".
    val curM = current.withColumn("_cur", lit(1))
    val deltaM = d.groupCols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"_dk_$c"))
    val joinCond = d.groupCols.map(c => curM(c) <=> deltaM(s"_dk_$c")).reduce(_ && _)
    val joined = curM.join(deltaM, joinCond, "full_outer")
    val keyCols: Seq[SqlColumn] = d.groupCols.map(c =>
      when(col("_cur").isNotNull, col(c)).otherwise(col(s"_dk_$c")).as(c))
    // a group needs a min/max recompute iff any retraction hit its
    // stored extreme (equality is conservative-exact: removing a
    // non-extreme value can never move min/max)
    val needsRecompute = d.aggCols.map(c =>
      (col(s"retracted_min_$c").isNotNull && col(s"retracted_min_$c") <= col(s"min_$c")) ||
        (col(s"retracted_max_$c").isNotNull && col(s"retracted_max_$c") >= col(s"max_$c")))
      .reduce(_ || _)
    val foldedCols: Seq[SqlColumn] = keyCols ++ d.aggCols.flatMap(c => Seq(
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
    // Targeted recompute of the dirty groups only. The dirty set is
    // small by construction (groups whose stored extreme a retraction
    // hit), so COLLECT it (bounded at maxPruneKeys+1) and push
    // per-column IN / IS NULL literals into the base scan — parquet
    // footer stats then SKIP every file holding none of the affected
    // keys, so the recompute reads O(|dirty groups|) files, not the
    // table. An over-bound dirty set (a retraction storm) falls back
    // to the unpruned scan with a loud warning — correct, just full-
    // scan priced.
    val dirtyLocal = dirtyKeys.limit(maxPruneKeys + 1).collect().toIndexedSeq
    val partials = partialAggs(d.aggCols)
    val recomputeInput =
      if (dirtyLocal.isEmpty) {
        spark.read.parquet(d.physicalPath).filter(lit(false))
      } else if (dirtyLocal.length <= maxPruneKeys) {
        dirtyRecomputeScan(spark, d, dirtyLocal)
      } else {
        logger.warn(
          s"MV refreshFromChanges: ${dirtyLocal.length}+ dirty groups exceed " +
            s"maxPruneKeys=$maxPruneKeys — targeted recompute falls back to an " +
            s"unpruned scan of ${d.physicalPath}")
        val dkM = d.groupCols.foldLeft(dirtyKeys)((df, c) => df.withColumnRenamed(c, s"_dk_$c"))
        val base = spark.read.parquet(d.physicalPath)
        base.join(broadcast(dkM),
          d.groupCols.map(c => base(c) <=> col(s"_dk_$c")).reduce(_ && _), "left_semi")
      }
    val recomputed = recomputeInput
      .groupBy(d.groupCols.map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val next = clean.unionByName(recomputed)
    val typed = next.select(current.columns.map { c =>
      val want = current.schema(c).dataType
      if (next.schema(c).dataType == want) col(c) else col(c).cast(want)
    }: _*)
    commitGen(spark, d, typed, genOf(d.dataDir) + 1)
  }

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The file-skipping targeted-recompute scan: base rows of exactly
    * the collected dirty group keys. Two layers compose:
    *  - a PUSHDOWN-ABLE superset filter — per group column, `IN
    *    (distinct non-null dirty values)` OR'd with `IS NULL` when a
    *    dirty key is null — which reaches the parquet footers
    *    (PushedFilters, plan-locked by the spec) and skips every file
    *    whose column stats exclude all dirty values;
    *  - an exact NULL-SAFE tuple filter (broadcast semi join on `<=>`
    *    against the collected keys) that trims the superset's cross-
    *    product remainder for multi-column keys.
    * Exposed private[graft] so the plan spec can assert the pushdown.
    */
  private[graft] def dirtyRecomputeScan(
      spark: SparkSession,
      d: MvDef,
      keys: Seq[org.apache.spark.sql.Row]): org.apache.spark.sql.DataFrame = {
    val base = spark.read.parquet(d.physicalPath)
    val superset = d.groupCols.zipWithIndex.map { case (c, i) =>
      val vals = keys.map(_.get(i)).filter(_ != null).distinct
      val hasNull = keys.exists(_.isNullAt(i))
      (vals.nonEmpty, hasNull) match {
        case (true, true)  => col(c).isin(vals: _*) || col(c).isNull
        case (true, false) => col(c).isin(vals: _*)
        case (false, true) => col(c).isNull
        case (false, false) => lit(false) // unreachable: keys non-empty
      }
    }.reduce(_ && _)
    val pruned = base.filter(superset)
    if (d.groupCols.size == 1) pruned // single-column: the IN list IS the exact set
    else {
      val schema = StructType(d.groupCols.map(c =>
        StructField(c, base.schema(c).dataType, nullable = true)))
      val keysDf = spark.createDataFrame(
        spark.sparkContext.parallelize(keys, 1), schema)
      val dkM = d.groupCols.foldLeft(keysDf)((df, c) => df.withColumnRenamed(c, s"_dk_$c"))
      pruned.join(broadcast(dkM),
        d.groupCols.map(c => pruned(c) <=> col(s"_dk_$c")).reduce(_ && _), "left_semi")
    }
  }

  def deregister(basePath: String): Unit = {
    registry.remove(canonical(basePath)); ()
  }

  /** Re-key a maintained view at a (possibly new) base path — the
    * versioned-table composition: a mirror's live snapshot moves to a
    * new `vNNNNNNNN` dir on every commit, so the view that describes
    * it must follow (and the OLD version's key must be deregistered by
    * the caller, or a time-travel read of the old snapshot would be
    * answered with the new rollup). Returns the registered def.
    */
  def registerFor(d: MvDef, basePath: String): MvDef = {
    val r = d.copy(basePath = canonical(basePath), physicalPath = basePath)
    registry.put(r.basePath, r)
    r
  }

  /** The registered view for a base path, if any. */
  def registered(basePath: String): Option[MvDef] =
    Option(registry.get(canonical(basePath)))

  // -----------------------------------------------------------------
  // Aggregate-over-JOIN views — the reference's flagship report shape
  // (template.py:485-490: orders ⋈ customers + a priority filter,
  // re-aggregated on every scheduled run). A join view stores the
  // same (sum/cnt/min/max/cnt_rows) partials, computed over the
  // JOINED rows of two base tables; [[MvRewriteRule]] then answers
  // any covered aggregate over that join from |groups| rows — BOTH
  // base scans AND the join itself disappear from the plan.
  // -----------------------------------------------------------------

  /** A registered join view: canonical base paths (the match key),
    * the equi-join key pairs (leftCol, rightCol), grouping/aggregate
    * columns (names must be unambiguous across the two sides), and
    * the current generation dir. Same generational commit protocol
    * as [[MvDef]].
    */
  final case class JoinMvDef(
      leftPath: String,
      rightPath: String,
      joinKeys: Seq[(String, String)],
      groupCols: Seq[String],
      aggCols: Seq[String],
      mvPath: String,
      dataDir: String,
      leftPhysical: String,
      rightPhysical: String)

  private[plans] val joinRegistry = new ConcurrentHashMap[(String, String), JoinMvDef]()

  private def joinedBase(spark: SparkSession, d: JoinMvDef): org.apache.spark.sql.DataFrame =
    joinSides(spark.read.parquet(d.leftPhysical), spark.read.parquet(d.rightPhysical), d.joinKeys)

  private def joinSides(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      keys: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    l.join(r, keys.map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _))

  /** Compute the rollup of `left ⋈ right` and register it: one scan
    * of each base, the join's shuffle paid ONCE, |groups| rows
    * written. Covered report queries then skip both scans and the
    * join entirely.
    */
  def defineJoin(
      spark: SparkSession,
      leftPath: String,
      rightPath: String,
      joinKeys: Seq[(String, String)],
      groupCols: Seq[String],
      aggCols: Seq[String],
      mvPath: String): JoinMvDef = withoutRewrite {
    require(joinKeys.nonEmpty, "a join view needs at least one equi-join key pair")
    require(groupCols.nonEmpty, "a join view needs at least one grouping column")
    require(aggCols.nonEmpty, "a join view needs at least one aggregated column")
    deregisterJoin(leftPath, rightPath)
    val d0 = JoinMvDef(canonical(leftPath), canonical(rightPath), joinKeys,
      groupCols, aggCols, mvPath, genDir(mvPath, 0), leftPath, rightPath)
    val partials = partialAggs(aggCols)
    val rows = joinedBase(spark, d0)
      .groupBy(groupCols.map(col): _*).agg(partials.head, partials.tail: _*)
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(d0.dataDir)
    joinRegistry.put((d0.leftPath, d0.rightPath), d0)
    d0
  }

  /** Fold a LEFT-side (fact) append into the join view: the batch
    * joins against the CURRENT right (dimension) side — O(|batch| ⋈
    * dim + |groups|), the fact history is never rescanned. Insert-only
    * on the fact side and a static dim by contract (the reference
    * shape: orders stream in, customers are the slowly-read dim);
    * a dim change requires [[refreshJoin]] — exactly the append-scoped
    * contract [[refreshIncremental]] documents for single-table views.
    */
  def refreshJoinIncremental(
      spark: SparkSession,
      d: JoinMvDef,
      appendedLeft: org.apache.spark.sql.DataFrame): JoinMvDef = withoutRewrite {
    val batchJoined = joinSides(appendedLeft, spark.read.parquet(d.rightPhysical), d.joinKeys)
    val typed = foldAppend(spark, d.dataDir, d.groupCols, d.aggCols, batchJoined)
    val committed = d.copy(dataDir = commitGenDir(spark, d.mvPath, typed, genOf(d.dataDir) + 1))
    joinRegistry.put((committed.leftPath, committed.rightPath), committed)
    committed
  }

  /** Full rebuild of a join view from the current bases. */
  def refreshJoin(spark: SparkSession, d: JoinMvDef): JoinMvDef =
    defineJoin(spark, d.leftPhysical, d.rightPhysical, d.joinKeys,
      d.groupCols, d.aggCols, d.mvPath)

  def deregisterJoin(leftPath: String, rightPath: String): Unit = {
    joinRegistry.remove((canonical(leftPath), canonical(rightPath))); ()
  }
}

/** The optimizer rule. Matches Aggregate → [Filter/Project]* →
  * parquet relation of a registered base and swaps in the MV when the
  * checks in [[MaterializedViews]] pass. Output attributes keep the
  * ORIGINAL exprIds (a final Project aliases the re-aggregated values
  * back onto them), so parent operators — HAVING filters, sorts,
  * joins — resolve unchanged.
  */
object MvRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // maintenanceDepth: never serve a refresh's own base reads from
    // the view it is refreshing (see MaterializedViews.maintenanceDepth)
    if ((MaterializedViews.registry.isEmpty && MaterializedViews.joinRegistry.isEmpty) ||
        MaterializedViews.maintenanceDepth.get > 0) plan
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

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    trySingleTable(agg).orElse(tryJoinView(agg))

  private def trySingleTable(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (rel, conds) <- strip(agg.child, Nil)
      root <- rootOf(rel)
      mv <- Option(MaterializedViews.registry.get(root))
      rewritten <- rewriteWith(agg, conds, mv.groupCols, mv.aggCols, mv.dataDir)
    } yield rewritten
  }

  /** Peel attribute-only Projects and Filters down to an INNER join,
    * collecting the filter conjuncts met on the way.
    */
  private def stripToJoin(p: LogicalPlan, conds: Seq[Expression])
      : Option[(Join, Seq[Expression])] = p match {
    case f: Filter => stripToJoin(f.child, conds :+ f.condition)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      stripToJoin(pr.child, conds)
    case j: Join => Some((j, conds))
    case _ => None
  }

  /** The join's condition must be EXACTLY the registered equi-key
    * pairs — each conjunct a null-unsafe equality between one left
    * attr and one right attr named as a registered pair (either
    * operand order), every registered pair present, nothing else.
    * Anything beyond that shape (extra predicates, non-equi terms,
    * expressions over keys) bails: the stored partials were computed
    * under precisely the registered join semantics.
    */
  private def joinCondMatches(
      cond: Expression,
      keys: Seq[(String, String)],
      left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def side(a: Attribute): Option[Boolean] = // Some(true)=left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None
    val conjuncts = splitConjunctivePredicates(cond)
    val matched = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (side(a), side(b)) match {
          case (Some(true), Some(false)) => keys.find(k => k._1 == a.name && k._2 == b.name)
          case (Some(false), Some(true)) => keys.find(k => k._1 == b.name && k._2 == a.name)
          case _ => None
        }
      case _ => None
    }
    matched.forall(_.isDefined) && matched.flatten.toSet == keys.toSet
  }

  /** Aggregate over [Filter/Project]* over an inner equi-join of two
    * registered base relations → re-aggregate the join view. Filters
    * may sit above OR below the join (the optimizer pushes group-col
    * filters into the sides before this rule runs) — all of them must
    * reference grouping columns only, which keeps filtering the view
    * exact: a joined row's group membership decides its survival
    * wholesale on both routes.
    */
  private def tryJoinView(agg: Aggregate): Option[LogicalPlan] = {
    if (MaterializedViews.joinRegistry.isEmpty) return None
    for {
      (join, condsAbove) <- stripToJoin(agg.child, Nil)
      if join.joinType == org.apache.spark.sql.catalyst.plans.Inner
      cond <- join.condition
      (lrel, lconds) <- strip(join.left, Nil)
      (rrel, rconds) <- strip(join.right, Nil)
      lroot <- rootOf(lrel)
      rroot <- rootOf(rrel)
      mv <- Option(MaterializedViews.joinRegistry.get((lroot, rroot)))
      if joinCondMatches(cond, mv.joinKeys, join.left, join.right)
      rewritten <- rewriteWith(agg, dropImpliedKeyNotNulls(
        condsAbove ++ lconds ++ rconds, mv.joinKeys),
        mv.groupCols, mv.aggCols, mv.dataDir)
    } yield rewritten
  }

  /** `IsNotNull(joinKey)` conjuncts are IMPLIED by the inner equi-join
    * (null keys never match), and the optimizer infers them onto the
    * sides from the join condition — every view row already satisfies
    * them, so they are dropped rather than (unsatisfiably) applied to
    * a view that does not store the key columns.
    */
  private def dropImpliedKeyNotNulls(
      conds: Seq[Expression], keys: Seq[(String, String)]): Seq[Expression] = {
    val keyNames = keys.flatMap(k => Seq(k._1, k._2)).toSet
    conds.flatMap(splitConjunctivePredicates).filterNot {
      case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
      case _ => false
    }
  }

  private def rewriteWith(
      agg: Aggregate,
      conds: Seq[Expression],
      mvGroupCols: Seq[String],
      mvAggCols: Seq[String],
      mvDataDir: String): Option[LogicalPlan] = {
    val groupSet = mvGroupCols.toSet

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
    val mvRel = spark.read.parquet(mvDataDir).queryExecution.analyzed match {
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
        case a: AttributeReference if mvAggCols.contains(a.name) => Some(a.name)
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
    // attrs; each output expression may be ANY deterministic
    // expression OVER translatable aggregate calls and grouping attrs
    // (the optimizer collapses final projections INTO the Aggregate,
    // so `cast(sum(x) as double) AS total` is a normal shape here) —
    // every embedded aggregate call must translate, every remaining
    // attribute must be a grouping column; anything else bails
    val innerAggs = scala.collection.mutable.ArrayBuffer.empty[Alias]
    // per output expr: the positions+finishers of its embedded
    // aggregate calls, to rebuild the expr over the inner agg's output
    val exprFinishers = scala.collection.mutable.ArrayBuffer
      .empty[(NamedExpression, Seq[(AggregateExpression, Attribute => Expression, Int)])]
    val groupFinishers = scala.collection.mutable.ArrayBuffer.empty[(NamedExpression, String)]

    def translateNamed(ne: NamedExpression): Boolean = ne match {
      case a: AttributeReference if groupSet.contains(a.name) =>
        groupFinishers += ((a, a.name)); true
      case al @ Alias(a: AttributeReference, _) if groupSet.contains(a.name) =>
        groupFinishers += ((al, a.name)); true
      case al: Alias if al.child.deterministic =>
        val aes = al.child.collect { case ae: AggregateExpression => ae }
        // every non-aggregated attribute in the expr must be a group col
        val outsideRefs = al.child.collect {
          case a: AttributeReference if !aes.exists(_.exists(_ eq a)) => a
        }
        if (aes.isEmpty || !outsideRefs.forall(a => groupSet.contains(a.name))) false
        else {
          val translated = aes.map(ae => translate(ae).map { case (inner, fin) => (ae, inner, fin) })
          if (translated.exists(_.isEmpty)) false
          else {
            val items = translated.flatten.map { case (ae, inner, fin) =>
              innerAggs += inner
              (ae, fin, innerAggs.size - 1)
            }
            exprFinishers += ((al, items))
            true
          }
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
          // rebuild the output expression over the inner aggregation:
          // each embedded aggregate call becomes its finisher over the
          // matching inner attr; remaining (grouping) attrs remap to
          // the MV's attrs by name
          val (al, items) = exprFinishers.find(_._1 eq ne).get
          val rebuilt = al.asInstanceOf[Alias].child.transform {
            case ae: AggregateExpression if items.exists(_._1 eq ae) =>
              val (_, fin, idx) = items.find(_._1 eq ae).get
              fin(byIdx(idx))
            case a: AttributeReference if groupSet.contains(a.name) =>
              mvAttr(a.name)
          }
          val cast = if (rebuilt.dataType == ne.dataType) rebuilt else Cast(rebuilt, ne.dataType)
          Alias(cast, ne.name)(exprId = ne.exprId)
      }
    }
    Some(Project(projected, innerAgg))
  }
}
