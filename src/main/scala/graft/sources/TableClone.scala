package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Table lifecycle services around the versioned-table layout:
  * deep clone (Delta `CREATE TABLE ... DEEP CLONE` semantics — a
  * physically independent copy carrying the retained history, for
  * dev/test copies and DR) and vacuum (remove uncommitted debris the
  * marker protocol orphans: crashed-write version dirs that never
  * gained their commit marker, abandoned purge stagings, stale OCC
  * claims). Zero-copy forks with SHARED history are [[Branching]]'s
  * job; clone is the isolation-by-copy complement.
  */
object TableClone {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Deep clone: copy every COMMITTED version directory (data files,
    * commit metadata, marker) to `destPath`, preserving version
    * numbers — reads, time travel and history behave identically on
    * the clone, and subsequent writes to either table leave the
    * other untouched (spec-proven). Uncommitted debris, OCC claims
    * and branch metadata are deliberately NOT cloned: the clone
    * starts with a clean root. Returns the cloned version numbers.
    *
    * Scale shape: a pure file copy — O(retained bytes), no
    * shuffle, no decode; at cluster scale this is the storage
    * layer's server-side copy (the layout is the contract, the
    * transport is pluggable).
    */
  def deepClone(spark: SparkSession, sourcePath: String, destPath: String): Seq[Int] = {
    val src = new Path(sourcePath)
    val dst = new Path(destPath)
    val sfs = fsFor(spark, src)
    val dfs = fsFor(spark, dst)
    val versions = UpsertWriter.committedVersions(sfs, src)
    require(versions.nonEmpty, s"no committed versions to clone at $sourcePath")
    require(!dfs.exists(dst) || dfs.listStatus(dst).isEmpty,
      s"clone destination $destPath is not empty")
    dfs.mkdirs(dst)
    versions.map { case (num, dir) =>
      val out = new Path(dst, dir.getName)
      if (!FileUtil.copy(sfs, dir, dfs, out, false, true,
        spark.sparkContext.hadoopConfiguration))
        throw new java.io.IOException(s"deepClone: copy $dir -> $out failed")
      num
    }
  }

  /** Vacuum: delete ORPHANS from the table root — artifacts the
    * crash-safe protocols leave behind and no reader will ever
    * resolve: (a) version directories WITHOUT a commit marker whose
    * last modification is older than `ttlMs` (a writer that crashed
    * mid-write; the age gate keeps an in-flight writer's dir safe),
    * (b) `*.purging` stagings older than `ttlMs` (a crashed
    * [[UpsertWriter.purge]]), (c) `*_claim` files older than `ttlMs`
    * (a crashed OCC writer — same staleness rule the claim protocol
    * itself applies). Committed versions are NEVER touched; retention
    * of those is [[UpsertWriter.clean]]'s job. Before any deletion,
    * interrupted purge swaps are RECOVERED
    * ([[UpsertWriter.recoverPurgeDebris]]): a `.purging` or `.old`
    * dir that is the only surviving copy of a committed version is
    * rolled back into place, never reaped — after recovery the only
    * `.purging` dirs left are true debris (their committed twin is
    * live). Returns the deleted paths (relative names) for the audit
    * log.
    */
  def vacuum(spark: SparkSession, tablePath: String, ttlMs: Long = 3600_000L): Seq[String] = {
    val root = new Path(tablePath)
    val fs = fsFor(spark, root)
    if (!fs.exists(root)) return Nil
    UpsertWriter.recoverPurgeDebris(fs, root)
    val now = System.currentTimeMillis()
    // an uncommitted dir whose writer holds a FRESH OCC claim is an
    // in-flight write, not debris: the claim file's mtime is the
    // writer's heartbeat (upsertConcurrent creates it before writing)
    // and protects a slow writer whose data dir has aged past ttl.
    // Plain upsert takes no claim and relies on the dir age gate.
    def freshClaim(vname: String): Boolean = {
      val cp = new Path(root, vname + "_claim")
      fs.exists(cp) && now - fs.getFileStatus(cp).getModificationTime < ttlMs
    }
    val doomed = fs.listStatus(root).toSeq.filter { st =>
      val name = st.getPath.getName
      val old = now - st.getModificationTime >= ttlMs
      val uncommittedVersion = st.isDirectory &&
        name.matches("v\\d{8}") &&
        !fs.exists(new Path(st.getPath, "_graft_commit")) &&
        !freshClaim(name)
      val purgeDebris = st.isDirectory && name.matches("v\\d{8}\\.purging")
      val staleClaim = !st.isDirectory && name.matches("v\\d{8}_claim")
      old && (uncommittedVersion || purgeDebris || staleClaim)
    }
    doomed.foreach(st => fs.delete(st.getPath, true))
    doomed.map(_.getPath.getName)
  }
}
