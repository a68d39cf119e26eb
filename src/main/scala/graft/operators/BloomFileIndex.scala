package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom index — point-predicate data skipping on columns
  * the layout does NOT cluster, the gap [[ZoneMaps]] leaves open: on
  * an unclustered column every file's [min,max] spans the whole
  * domain and zone maps prune nothing, but a per-file membership
  * filter still knows which files can contain `key = v`. This is
  * Hudi's bloom index / the Delta-Iceberg bloom file-skipping shape:
  * the index answers "which files can hold this key" from metadata;
  * the read re-applies the exact predicate (the filter admits FALSE
  * POSITIVES — extra candidate files — never false negatives, so the
  * pruned read is row-identical to the full scan by construction).
  *
  * Representation: a k=1 Bloom filter per file over `m` hash buckets
  * (`xxhash64(canonical(key)) pmod m`), stored as the SORTED ARRAY of
  * set bucket positions rather than a packed bitmap — bounded at `m`
  * ints per file either way, and exact-integer enough for a
  * cross-engine oracle to re-derive bucket-for-bucket. At a million
  * files the index is file-count-sized metadata, built with ONE
  * distributed scan whose per-file partial (collect_set, capped at m
  * values) combines map-side; expected false-positive rate per file
  * is its fill fraction (distinct keys / m), so size m to the
  * per-file key cardinality, not the table's.
  *
  * Hash canonicalization — the no-false-negative contract's fine
  * print: xxhash64 is input-TYPE-sensitive (the Long 7 and the Int 7
  * hash differently), so both build and probe sides hash the value's
  * STRING form. A probe literal whose type drifted from the indexed
  * column (Int vs Long, a re-read schema widening) still lands in the
  * same bucket; the exact re-applied predicate keeps the final rows
  * type-correct. (Fractional/decimal types render scale-sensitively —
  * `7.0` vs `7.00` — so probe fractional columns with the SAME type
  * as indexed; integral/string keys, the point-lookup shape this
  * index exists for, are canonical by construction.)
  */
object BloomFileIndex {

  private def bucket(c: Column, m: Int): Column =
    pmod(xxhash64(c.cast("string")), lit(m.toLong))

  /** One row per parquet file: (file, n_rows, bits) — `bits` the
    * sorted distinct hash buckets of `keyCol` present in the file.
    */
  def build(spark: SparkSession, dir: String, keyCol: String, m: Int = 4096): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    indexRows(spark.read.parquet(dir), keyCol, m)
  }

  private def indexRows(df: DataFrame, keyCol: String, m: Int): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        array_sort(collect_set(bucket(col(keyCol), m))).as("bits"))

  /** Files that can contain ANY of the probed key values (the
    * candidate set of an `IN`-list probe). Driver-side collect is
    * intentional and bounded: candidates shrink with the filter's
    * fill fraction, and the paths must reach the PLANNER for the
    * scan to skip file opens — same contract as
    * [[ZoneMaps.candidateFiles]].
    */
  def candidateFiles(index: DataFrame, values: Seq[Any], m: Int = 4096): Seq[String] = {
    require(values.nonEmpty, "probe at least one value")
    val probeBits = values.map(v => bucket(lit(v), m))
    index
      .filter(probeBits.map(b => array_contains(col("bits"), b)).reduce(_ || _))
      .select("file").collect().map(_.getString(0)).toIndexedSeq
  }

  /** Point/IN-list read via the index: open ONLY candidate files,
    * then re-apply the exact predicate. Row-identical to the full
    * scan; cheaper by every file whose filter proves the keys absent.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      keyCol: String,
      values: Seq[Any],
      m: Int = 4096): DataFrame = {
    val files = candidateFiles(index, values, m)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol).isin(values: _*))
  }

  /** Fully-distributed variant for probe sets too large to enumerate
    * on the driver: probes stay a DataFrame, their buckets join the
    * EXPLODED index (file, bit) to derive candidate files, and those
    * broadcast into a left-semi join against `input_file_name()` of
    * one table scan — then an equi-join against the probe set gives
    * exact rows. The driver never sees a file name or a probe value;
    * as with [[ZoneMaps.prunedReadSemiJoin]], this shape prunes row
    * WORK (and lets parquet row-group stats do the rest) while
    * keeping memory flat at any file or probe count.
    */
  def prunedReadSemiJoin(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      keyCol: String,
      probes: DataFrame,
      probeCol: String,
      m: Int = 4096): DataFrame = {
    val probeBits = probes.select(bucket(col(probeCol), m).as("_pb")).distinct()
    val cand = index
      .select(col("file"), explode(col("bits")).as("_b"))
      .join(probeBits, col("_b") === col("_pb"), "left_semi")
      .select(col("file")).distinct()
    spark.read.parquet(dir)
      .withColumn("_bf_file", input_file_name())
      .join(broadcast(cand), col("_bf_file") === col("file"), "left_semi")
      .drop("_bf_file")
      .join(probes.select(col(probeCol).as("_pv")).distinct(),
        col(keyCol) === col("_pv"), "left_semi")
  }

  // -----------------------------------------------------------------
  // Persisted index with O(changes) incremental maintenance
  // -----------------------------------------------------------------

  /** Outcome of a [[refresh]]: how many files were newly indexed
    * (the only ones SCANNED) and how many dropped (metadata-only).
    */
  final case class RefreshStats(added: Long, removed: Long, indexedFiles: Long)

  private val HeadFile = "HEAD"
  private val MetaFile = "_bloom_meta"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Scheme-insensitive file identity: `input_file_name()` yields a
    * URI (`file:///root/...`) while driver-side listings may carry a
    * different scheme spelling; compare authority+path only.
    */
  private def canonical(c: Column): Column =
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

  private def readMeta(fs: FileSystem, root: Path): Option[(String, Int)] = {
    val mp = new Path(root, MetaFile)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      try {
        val Array(k, m) = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split("\n")
        Some((k, m.toInt))
      } finally in.close()
    }
  }

  private def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The committed index rows at `indexPath` — same schema as
    * [[build]]'s result; usable with every probe above.
    */
  def load(spark: SparkSession, indexPath: String): DataFrame = {
    val root = new Path(indexPath)
    val fs = fsOf(spark, root)
    val (_, dir) = headDir(fs, root).getOrElse(
      throw new IllegalStateException(s"no committed bloom index at $indexPath — run refresh first"))
    spark.read.parquet(dir.toString)
  }

  /** Build or INCREMENTALLY refresh the persisted index at
    * `indexPath` for `keyCol` of the parquet table at `dir`. The
    * current file listing (pure FS metadata — no data read) diffs
    * against the indexed file set: files ADDED since the last refresh
    * are scanned — and ONLY those — in one distributed pass; files
    * REMOVED (compaction, cleaning, overwrites) drop their rows with
    * no scan at all. An up-to-date index is a metadata no-op. This is
    * what makes a file-skipping index maintainable on a table that
    * takes a commit a minute: the per-commit cost tracks the COMMIT
    * (MOR delta appends, streaming sink batches, insert-appends), not
    * the table. Copy-on-write full rewrites degrade to rebuild cost
    * by construction — every file IS new — and say so in the stats.
    *
    * Commit protocol: new rows land in a fresh `rows-NNNNNN`
    * generation, the one-line `HEAD` pointer is rewritten LAST
    * (atomic create-overwrite), then stale generations are dropped.
    * A crash anywhere leaves `HEAD` on the previous complete
    * generation — the index is stale, never torn (the recoverable-
    * swap lesson from the versioned table's purge path).
    *
    * `keyCol`/`m` are pinned in index metadata: a refresh with
    * different parameters fails loudly (buckets would be
    * incomparable) — delete the index dir to rebuild under new ones.
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      keyCol: String,
      m: Int = 4096): RefreshStats = {
    require(m >= 2, s"m must be >= 2, got $m")
    val root = new Path(indexPath)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) fs.mkdirs(root)
    readMeta(fs, root) match {
      case Some((k0, m0)) =>
        if (k0 != keyCol || m0 != m)
          throw new IllegalStateException(
            s"bloom index at $indexPath was built over keyCol=$k0, m=$m0; refusing refresh with " +
              s"keyCol=$keyCol, m=$m (buckets incomparable) — delete the index to rebuild")
      case None => writeText(fs, new Path(root, MetaFile), s"$keyCol\n$m")
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
      return RefreshStats(0L, 0L, keptRows.count()) // up to date: metadata no-op

    val newRows =
      if (addedFiles.isEmpty) None
      else Some(indexRows(spark.read.parquet(addedFiles.toIndexedSeq: _*), keyCol, m))
    val outRows = (Option(keptRows), newRows) match {
      case (Some(k), Some(a)) => k.unionByName(a)
      case (Some(k), None)    => k
      case (None, Some(a))    => a
      case (None, None)       => // empty table, empty index — keep the schema
        spark.range(0).select(lit("").as("file"), lit(0L).as("n_rows"),
          typedLit(Seq.empty[Long]).as("bits"))
    }

    val genDir = new Path(root, f"rows-$gen%06d")
    outRows.write.mode(SaveMode.Overwrite).parquet(genDir.toString)
    val total = spark.read.parquet(genDir.toString).count()
    writeText(fs, new Path(root, HeadFile), gen.toString) // commit point
    // drop superseded generations (crash-safe: HEAD already moved)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      // compare by NAME: listStatus returns fully-qualified paths,
      // which never equal the relative genDir Path
      if (name.startsWith("rows-") && name != genDir.getName) fs.delete(st.getPath, true)
    }
    RefreshStats(addedFiles.length.toLong, removed, total)
  }
}
