package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table branching and three-way merge over the versioned table — the
  * lakehouse branch/merge workflow (Nessie / LakeFS style) on top of
  * [[UpsertWriter]]'s commit timeline: fork a branch at a committed
  * version for ZERO copy cost, write to it in isolation while main
  * keeps moving, then merge it back with per-record conflict
  * detection against the common base. The reference's pipeline writes
  * straight to the live table (generate_hudi_table.py:86-214); a
  * branch is how the same write path runs as a dry-run/staging
  * environment that either merges atomically or is thrown away.
  *
  * Layout: a branch lives at `<table>/_branches/<name>/` as its OWN
  * version timeline plus a `branch.json` recording the fork point.
  * Creating a branch writes ONE tiny metadata file — no data is
  * copied at any table size; the base version's files are shared
  * until the branch's first commit. The fork version is PINNED
  * savepoint-style while the branch lives: every retention path
  * (inline cleaner, `clean` service, restore) skips versions named
  * by a `branch.json`, so main can keep moving under any
  * `keepVersions` without stranding the merge base; `deleteBranch`
  * releases the pin.
  *
  * Scale shape: branch reads and writes are exactly main-table reads
  * and writes (same merge/commit machinery). The three-way merge is
  * ONE hash shuffle: the three snapshots union with a side tag and
  * aggregate per record key (each snapshot holds a key at most once,
  * so one `first(when(tag...))` per side rebuilds the b/o/t triple)
  * — one Exchange of 3× the data instead of chaining two full-outer
  * sort-merge joins (two Exchanges, two sorts, ~5 exchange payloads).
  * The conflicts dry-run shares the identical keyed plan and only
  * changes the final filter/projection, so predicting a merge can
  * never cost more than running it. Nothing anywhere is O(history);
  * only the three involved snapshots are read.
  */
object Branching {

  private def branchDir(table: Path, name: String) = new Path(new Path(table, "_branches"), name)
  private def metaPath(dir: Path) = new Path(dir, "branch.json")

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fork `name` from the table's latest committed version (or an
    * explicit `fromVersion`). Zero-copy: writes only branch.json.
    * Fails loudly if the branch exists or the table has no commits.
    */
  def create(spark: SparkSession, tablePath: String, name: String,
      fromVersion: Option[Int] = None): Int = {
    require(name.nonEmpty && !name.contains("/"), s"bad branch name: $name")
    val table = new Path(tablePath)
    val fs = fsFor(spark, table)
    val versions = UpsertWriter.committedVersions(fs, table)
    require(versions.nonEmpty, s"cannot branch $tablePath: no committed versions")
    val base = fromVersion.getOrElse(versions.last._1)
    require(versions.exists(_._1 == base),
      s"cannot branch from version $base: not in the retained timeline " +
        s"(have: ${versions.map(_._1).mkString(", ")})")
    val dir = branchDir(table, name)
    if (fs.exists(metaPath(dir)))
      throw new IllegalStateException(s"branch $name already exists at $dir")
    fs.mkdirs(dir)
    val out = fs.create(metaPath(dir), false)
    out.write(s"""{"base_version": $base}""".getBytes("UTF-8"))
    out.close()
    base
  }

  /** The branch's fork-point version number. */
  def baseVersion(spark: SparkSession, tablePath: String, name: String): Int = {
    val dir = branchDir(new Path(tablePath), name)
    val fs = fsFor(spark, dir)
    if (!fs.exists(metaPath(dir)))
      throw new IllegalArgumentException(s"no branch $name under $tablePath")
    val in = fs.open(metaPath(dir))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"base_version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt) match {
      case Some(m) => m.group(1).toInt
      case None => throw new IllegalStateException(s"corrupt branch.json for $name: $txt")
    }
  }

  /** Snapshot read of the branch: its latest own commit, or (before
    * any branch commit) the fork-point version of main.
    */
  def readBranch(spark: SparkSession, tablePath: String, name: String): DataFrame = {
    val table = new Path(tablePath)
    val dir = branchDir(table, name)
    val fs = fsFor(spark, table)
    val own = UpsertWriter.committedVersions(fs, dir)
    if (own.nonEmpty) spark.read.parquet(own.last._2.toString)
    else UpsertWriter.readVersion(spark, tablePath, baseVersion(spark, tablePath, name))
  }

  /** Upsert into the branch: latest-wins merge against the branch's
    * current state (which starts as the fork-point snapshot),
    * committed as the branch's next version. Main is untouched.
    */
  def upsertBranch(updates: DataFrame, tablePath: String, name: String,
      recordKeys: Seq[String], precombine: String,
      keepVersions: Int = 2, targetFileBytes: Long = 512L * 1024 * 1024): Unit = {
    val spark = updates.sparkSession
    val table = new Path(tablePath)
    val dir = branchDir(table, name)
    val fs = fsFor(spark, table)
    val own = UpsertWriter.committedVersions(fs, dir)
    // before the first branch commit, the fork-point snapshot plays
    // the role of "latest committed version" in the merge
    val mergeBase =
      if (own.nonEmpty) own
      else {
        val bv = baseVersion(spark, tablePath, name)
        UpsertWriter.committedVersions(fs, table).filter(_._1 == bv).map { case (_, p) => (0, p) }
      }
    require(mergeBase.nonEmpty,
      s"branch $name fork point was cleaned from main's timeline; cannot merge-base. " +
        "Live branches PIN their fork version against every graft cleaner " +
        "(UpsertWriter.pinnedVersions) — this table's old versions were removed " +
        "by something that bypassed branch.json; delete and re-fork the branch")
    val nextNum = own.lastOption.map(_._1 + 1).getOrElse(1)
    UpsertWriter.mergeAndCommit(updates, spark, fs, dir, mergeBase, nextNum,
      recordKeys, precombine, Nil, Nil, keepVersions, targetFileBytes)
  }

  /** Delete by key on the branch: anti-join the branch state against
    * the tombstone batch, committed as the branch's next version.
    */
  def deleteFromBranch(tombstones: DataFrame, tablePath: String, name: String,
      recordKeys: Seq[String], keepVersions: Int = 2): Unit = {
    val spark = tombstones.sparkSession
    val table = new Path(tablePath)
    val dir = branchDir(table, name)
    val fs = fsFor(spark, table)
    val current = readBranch(spark, tablePath, name)
    val kept = current.join(broadcast(tombstones.select(recordKeys.map(col): _*).distinct()),
      recordKeys, "left_anti")
    val nextNum = UpsertWriter.committedVersions(fs, dir).lastOption.map(_._1 + 1).getOrElse(1)
    UpsertWriter.commitVersion(fs, dir, kept, nextNum, Nil, keepVersions)
  }

  /** Drop the branch (its versions and metadata). Main is untouched. */
  def deleteBranch(spark: SparkSession, tablePath: String, name: String): Unit = {
    val dir = branchDir(new Path(tablePath), name)
    fsFor(spark, dir).delete(dir, true): Unit
  }

  /** Pure three-way merge of snapshots sharing one schema: for each
    * record key, take the side that changed relative to the common
    * base (change = any non-null-safe-unequal field, including
    * insertion and deletion); when BOTH sides changed and disagree,
    * apply `onConflict`:
    *   - "fail"   — raise on the first conflicting key (dry-run gate)
    *   - "ours"   — main wins
    *   - "theirs" — branch wins
    *   - "latest" — higher `precombine` wins (tie → theirs, matching
    *     upsert's updates-win convention); a DELETION cannot win
    *     "latest" (no row, no precombine): delete-vs-modify resolves
    *     to the modify, the conservative lost-update-free choice
    * Both-sides-identical changes merge trivially (no conflict).
    * Rows resolved to no-row (deletions) vanish from the result.
    */
  /** The shared keyed form both merge and dry-run consume: the three
    * snapshots union with a side tag and collapse per record key to
    * one row carrying the (_b, _o, _t) struct triple — a SINGLE hash
    * Exchange. Each snapshot holds a record key at most once (the
    * versioned table's invariant), so `first(when(tag), ignoreNulls)`
    * is deterministic: there is at most one candidate per tag per
    * key. Null record keys group together, matching the null-safe
    * (`<=>`) join keys of the former two-join form.
    */
  private def packedKeyed(base: DataFrame, ours: DataFrame, theirs: DataFrame,
      recordKeys: Seq[String]): DataFrame = {
    val cols = ours.columns.toSeq
    require(base.columns.toSeq == cols && theirs.columns.toSeq == cols,
      "three-way merge requires identical column sets (align schemas first): " +
        s"base=${base.columns.toSeq} ours=$cols theirs=${theirs.columns.toSeq}")
    def side(df: DataFrame, tag: String): DataFrame = df.select(
      recordKeys.map(col) :+ lit(tag).as("_tag") :+ struct(cols.map(col): _*).as("_s"): _*)
    side(base, "b").unionByName(side(ours, "o")).unionByName(side(theirs, "t"))
      .groupBy(recordKeys.map(col): _*)
      .agg(
        first(when(col("_tag") === "b", col("_s")), ignoreNulls = true).as("_b"),
        first(when(col("_tag") === "o", col("_s")), ignoreNulls = true).as("_o"),
        first(when(col("_tag") === "t", col("_s")), ignoreNulls = true).as("_t"))
  }

  def threeWayMerge(base: DataFrame, ours: DataFrame, theirs: DataFrame,
      recordKeys: Seq[String], precombine: String, onConflict: String): DataFrame = {
    require(Set("fail", "ours", "theirs", "latest")(onConflict),
      s"onConflict must be fail|ours|theirs|latest, got $onConflict")
    val keyed = packedKeyed(base, ours, theirs, recordKeys)
    val oursChanged = !(col("_o") <=> col("_b"))
    val theirsChanged = !(col("_t") <=> col("_b"))
    val conflictValue: Column = onConflict match {
      case "ours"   => col("_o")
      case "theirs" => col("_t")
      case "latest" =>
        when(col("_t").isNull, col("_o"))
          .when(col("_o").isNull, col("_t"))
          .when(col(s"_t.$precombine") >= col(s"_o.$precombine"), col("_t"))
          .otherwise(col("_o"))
      case "fail" =>
        // raise_error is NullType — it coerces into the struct-typed
        // when-chain and detonates lazily on the first conflicting row
        raise_error(concat(lit("branch merge conflict on key ("),
          concat_ws(", ", recordKeys.map(k => col(k).cast("string")): _*),
          lit("): both sides changed since the fork point")))
    }
    val resolved =
      when(!theirsChanged, col("_o"))
        .when(!oursChanged, col("_t"))
        .when(col("_t") <=> col("_o"), col("_o")) // convergent edit: no conflict
        .otherwise(conflictValue)
    keyed.withColumn("_r", resolved)
      .filter(col("_r").isNotNull)
      .select(col("_r.*"))
  }

  /** Dry-run conflict report: the keys both sides changed (relative
    * to the fork point) to DIFFERENT values, with each side's
    * precombine. Empty ⇒ `mergeBranch` is conflict-free under every
    * policy. Shares [[packedKeyed]]'s single-Exchange plan with the
    * merge itself — predicting can't cost more than doing.
    */
  def conflicts(spark: SparkSession, tablePath: String, name: String,
      recordKeys: Seq[String], precombine: String): DataFrame = {
    val (base, ours, theirs) = mergeInputs(spark, tablePath, name)
    packedKeyed(base, ours, theirs, recordKeys)
      .filter(!(col("_o") <=> col("_b")) && !(col("_t") <=> col("_b")) &&
        !(col("_t") <=> col("_o")))
      .select(recordKeys.map(col) ++ Seq(
        col(s"_o.$precombine").as("ours_precombine"),
        col(s"_t.$precombine").as("theirs_precombine")): _*)
  }

  private def mergeInputs(spark: SparkSession, tablePath: String,
      name: String): (DataFrame, DataFrame, DataFrame) = {
    val bv = baseVersion(spark, tablePath, name)
    val base = UpsertWriter.readVersion(spark, tablePath, bv)
    val ours = UpsertWriter.read(spark, tablePath)
    val theirs = readBranch(spark, tablePath, name)
    // align column order to ours (sets must already match)
    (base.select(ours.columns.map(col).toSeq: _*), ours,
      theirs.select(ours.columns.map(col).toSeq: _*))
  }

  /** Merge the branch into main: three-way merge of (fork-point base,
    * main's latest, branch's latest) committed as main's next
    * version. The branch is left in place (re-merging after more
    * commits is allowed — rebase semantics: the fork point does NOT
    * advance, matching git's repeated-merge behavior for this simple
    * model). Returns the new main version number.
    */
  def mergeBranch(spark: SparkSession, tablePath: String, name: String,
      recordKeys: Seq[String], precombine: String, onConflict: String = "fail",
      partitionBy: Seq[String] = Nil, keepVersions: Int = 2): Int = {
    val table = new Path(tablePath)
    val fs = fsFor(spark, table)
    // the merge commit is a WRITER: it holds the next version slot's
    // OCC claim, and `ours` (main's latest) is read INSIDE the claim —
    // two racing publishers serialize cleanly (the loser re-merges on
    // top of the winner's commit) instead of colliding in one
    // version dir's _temporary; exhausted contention fails loudly.
    UpsertWriter.withNextVersionClaim(fs, table) { next =>
      val (base, ours, theirs) = mergeInputs(spark, tablePath, name)
      val merged = threeWayMerge(base, ours, theirs, recordKeys, precombine, onConflict)
      UpsertWriter.commitVersion(fs, table, merged, next, partitionBy, keepVersions)
      next
    }
  }
}
