package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for PERSISTED per-file metadata indexes with
  * O(changes) incremental maintenance — the bloom index (10s/10s3)
  * and the zone-map index (10k/10v) both ride this:
  *
  *  - one row per data file, keyed by the file's canonical path;
  *  - refresh diffs the CURRENT file listing against the indexed set
  *    (pure FS metadata — Spark's own FileIndex listing, no data
  *    read): files ADDED since the last refresh are scanned — and
  *    ONLY those — in one distributed pass; files REMOVED
  *    (compaction, cleaning, overwrites) drop their rows with no
  *    scan; an up-to-date index is a metadata no-op;
  *  - commit protocol: new rows land in a fresh `rows-NNNNNN`
  *    generation dir, the one-line `HEAD` pointer is rewritten LAST
  *    (atomic create-overwrite), then stale generations are dropped.
  *    A crash anywhere leaves HEAD on the previous complete
  *    generation — the index is stale, never torn;
  *  - index parameters are pinned in a meta file: a refresh with
  *    different parameters fails loudly (entries would be
  *    incomparable) — delete the index dir to rebuild under new ones.
  *
  * This is what makes file-skipping metadata maintainable on a table
  * that takes a commit a minute: per-commit cost tracks the COMMIT
  * (MOR delta appends, streaming sink batches, insert-appends), not
  * the table. Copy-on-write full rewrites degrade to rebuild cost by
  * construction — every file IS new — and the stats say so.
  */
private[operators] object GenerationalFileIndex {

  /** (filesScanned, rowsRemoved, totalIndexedFiles) of one refresh. */
  final case class Stats(added: Long, removed: Long, indexedFiles: Long)

  private val HeadFile = "HEAD"
  private val MetaFile = "_index_meta"

  def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Scheme-insensitive file identity: `input_file_name()` yields a
    * URI (`file:///root/...`) while driver-side listings may carry a
    * different scheme spelling; compare authority+path only.
    */
  def canonical(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")

  private def headDir(fs: FileSystem, root: Path): Option[(Int, Path)] = {
    val head = new Path(root, HeadFile)
    if (!fs.exists(head)) None
    else {
      val in = fs.open(head)
      try {
        val n = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        Some((n, new Path(root, f"rows-$n%06d")))
      } finally in.close()
    }
  }

  private def readMetaContent(fs: FileSystem, root: Path): Option[String] = {
    val mp = new Path(root, MetaFile)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  private def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The committed index rows, or a loud error if nothing committed. */
  def load(spark: SparkSession, indexPath: String, what: String): DataFrame = {
    val root = new Path(indexPath)
    val fs = fsOf(spark, root)
    val (_, dir) = headDir(fs, root).getOrElse(
      throw new IllegalStateException(s"no committed $what at $indexPath — run refresh first"))
    spark.read.parquet(dir.toString)
  }

  /** Build or incrementally refresh the index at `indexPath` for the
    * parquet table at `dir`. `metaContent` pins the index parameters;
    * `indexRowsFor` scans EXACTLY the given files into per-file index
    * rows (must emit a `file` column carrying input_file_name);
    * `emptyRows` keeps the schema for an empty table.
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      what: String,
      metaContent: String,
      indexRowsFor: Seq[String] => DataFrame,
      emptyRows: () => DataFrame): Stats = {
    val root = new Path(indexPath)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) fs.mkdirs(root)
    readMetaContent(fs, root) match {
      case Some(prior) =>
        if (prior != metaContent)
          throw new IllegalStateException(
            s"$what at $indexPath was built with parameters [$prior]; refusing refresh with " +
              s"[$metaContent] (entries incomparable) — delete the index to rebuild")
      case None => writeText(fs, new Path(root, MetaFile), metaContent)
    }

    val table = spark.read.parquet(dir)
    // driver-side listing: Spark's own FileIndex metadata, no data scan
    val listed = table.inputFiles
    val listedDf = spark.createDataset(listed.toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("file")
      .withColumn("_cf", canonical(col("file")))

    val (gen, keptRows, removed, addedFiles) = headDir(fs, root) match {
      case Some((n, prev)) =>
        val idx = spark.read.parquet(prev.toString).withColumn("_cf", canonical(col("file")))
        val kept = idx.join(listedDf.select("_cf"), Seq("_cf"), "left_semi").drop("_cf")
        val removedN = idx.count() - kept.count()
        val added = listedDf
          .join(idx.select("_cf"), Seq("_cf"), "left_anti")
          .select("file").collect().map(_.getString(0))
        (n + 1, kept, removedN, added)
      case None =>
        (0, null: DataFrame, 0L, listed)
    }

    if (gen > 0 && addedFiles.isEmpty && removed == 0L)
      return Stats(0L, 0L, keptRows.count()) // up to date: metadata no-op

    val newRows =
      if (addedFiles.isEmpty) None
      else Some(indexRowsFor(addedFiles.toIndexedSeq))
    val outRows = (Option(keptRows), newRows) match {
      case (Some(k), Some(a)) => k.unionByName(a)
      case (Some(k), None)    => k
      case (None, Some(a))    => a
      case (None, None)       => emptyRows()
    }

    val genDir = new Path(root, f"rows-$gen%06d")
    outRows.write.mode(SaveMode.Overwrite).parquet(genDir.toString)
    val total = spark.read.parquet(genDir.toString).count()
    writeText(fs, new Path(root, HeadFile), gen.toString) // commit point
    // Drop superseded generations (crash-safe: HEAD already moved),
    // RETAINING the immediately-previous one: a reader that loaded
    // HEAD just before this commit may still be scanning rows-(N-1) —
    // deleting it mid-scan fails that reader with FileNotFound.
    // rows-(N-1) dies when N+1 commits. Compare by NAME: listStatus
    // returns fully-qualified paths.
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("rows-") &&
          scala.util.Try(name.stripPrefix("rows-").toInt).toOption.exists(_ < gen - 1))
        fs.delete(st.getPath, true)
    }
    Stats(addedFiles.length.toLong, removed, total)
  }
}
