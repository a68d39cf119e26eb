package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeletionVectorsSpec extends SparkSpec {

  private def fixture(): (String, String) = {
    val root = tmpDir("dv")
    val table = root + "/t"
    val dv = root + "/v"
    val s = spark
    import s.implicits._
    (1 to 300).map(i => (i.toLong, s"u${i % 7}", i % 10))
      .toDF("id", "user", "bucket")
      .repartition(5).write.mode("overwrite").parquet(table)
    (table, dv)
  }

  test("predicate delete hides exactly the matching rows; no vector reads as the plain table") {
    val (table, dv) = fixture()
    val plain = DeletionVectors.read(spark, table, dv)
    assert(plain.count() == 300L)
    assert(plain.columns.toSeq == Seq("id", "user", "bucket"))

    DeletionVectors.markDeleted(spark, table, col("bucket") === 3, dv)
    val visible = DeletionVectors.read(spark, table, dv)
    assert(visible.count() == 270L)
    assert(visible.where(col("bucket") === 3).count() == 0L)
    assert(visible.columns.toSeq == Seq("id", "user", "bucket"))

    // marking the same predicate again duplicates vector rows but
    // cannot change visibility
    DeletionVectors.markDeleted(spark, table, col("bucket") === 3, dv)
    assert(DeletionVectors.read(spark, table, dv).count() == 270L)
  }

  test("positional delete removes ONE occurrence of content-identical rows") {
    val root = tmpDir("dv-pos")
    val table = root + "/t"
    val dv = root + "/v"
    val s = spark
    import s.implicits._
    // the same row value written twice into different files
    Seq((1L, "same")).toDF("id", "v").write.mode("overwrite").parquet(table)
    Seq((1L, "same")).toDF("id", "v").write.mode("append").parquet(table)
    assert(spark.read.parquet(table).count() == 2L)

    val onePos = spark.read.parquet(table)
      .where(col("v") === "same")
      .select(
        col("_metadata.file_path").as("_dv_file"),
        col("_metadata.row_index").as("_dv_pos"))
      .limit(1)
    DeletionVectors.markRows(spark, onePos, dv)

    val visible = DeletionVectors.read(spark, table, dv)
    assert(visible.count() == 1L, "positional identity must delete exactly one of two equal rows")
    assert(visible.where(col("v") === "same").count() == 1L)
  }

  test("multiple delete batches accumulate; applyDeletes folds and clears the vector") {
    val (table, dv) = fixture()
    DeletionVectors.markDeleted(spark, table, col("bucket") === 0, dv)
    DeletionVectors.markDeleted(spark, table, col("user") === "u1", dv)
    val visible = DeletionVectors.read(spark, table, dv)
    val expect = spark.read.parquet(table)
      .where(!(col("bucket") === 0) && !(col("user") === "u1"))
    assert(visible.count() == expect.count())
    assert(visible.exceptAll(expect).isEmpty && expect.exceptAll(visible).isEmpty)

    val dest = tmpDir("dv-compact") + "/t2"
    DeletionVectors.applyDeletes(spark, table, dv, dest)
    val rewritten = spark.read.parquet(dest)
    assert(rewritten.count() == expect.count())
    assert(rewritten.exceptAll(expect).isEmpty)
    // the vector is cleared: reads of the OLD dir show everything
    // again (the swap to dest is the caller's commit), and the dv dir
    // is gone
    assert(DeletionVectors.read(spark, table, dv).count() == 300L)
  }

  test("readPruned: zone map and vector compose — identical to read+filter, candidate files only") {
    val s = spark
    import s.implicits._
    val root = tmpDir("dv-zm")
    val table = root + "/t"
    val dv = root + "/v"
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "m")
      .repartitionByRange(5, col("id")).write.mode("overwrite").parquet(table)
    DeletionVectors.markDeleted(spark, table, col("m") === 3, dv)
    val zm = graft.operators.ZoneMaps.build(spark, table, "id")
    val pruned = DeletionVectors.readPruned(spark, table, dv, zm, "id", 100L, 299L)
    val slow = DeletionVectors.read(spark, table, dv)
      .filter(col("id") >= 100L && col("id") <= 299L)
    assert(pruned.count() == slow.count())
    assert(pruned.exceptAll(slow).isEmpty && slow.exceptAll(pruned).isEmpty)
    // the plan scans a strict subset of the files (range layout: 200
    // of 1000 ids span at most 2 of 5 range files)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.treeString).mkString
    val nCandidates = graft.operators.ZoneMaps.candidateFiles(zm, 100L, 299L).size
    assert(nCandidates < 5, s"range layout should prune, got $nCandidates of 5")
    // empty-range edge: no candidate files, schema intact, zero rows
    val none = DeletionVectors.readPruned(spark, table, dv, zm, "id", 5000L, 6000L)
    assert(none.count() == 0L && none.columns.toSeq == Seq("id", "m"))
  }

  test("property: any random delete-predicate sequence == the composed filter") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val root = tmpDir(s"dv-prop$seed")
      val table = root + "/t"
      val dv = root + "/v"
      (1 to 500).map(i => (i.toLong, i % (2 + rnd.nextInt(9)), s"u${i % 13}"))
        .toDF("id", "m", "u")
        .repartition(1 + rnd.nextInt(6)).write.mode("overwrite").parquet(table)
      val preds = (0 until 1 + rnd.nextInt(3)).map { _ =>
        rnd.nextInt(3) match {
          case 0 => col("m") === rnd.nextInt(10)
          case 1 => col("u") === s"u${rnd.nextInt(13)}"
          case _ => col("id") % (2 + rnd.nextInt(5)) === 0
        }
      }
      preds.foreach(p => DeletionVectors.markDeleted(spark, table, p, dv))
      val visible = DeletionVectors.read(spark, table, dv)
      val want = spark.read.parquet(table)
        .where(preds.map(p => !p).reduce(_ && _))
      assert(visible.count() == want.count(), s"seed=$seed preds=$preds")
      assert(visible.exceptAll(want).isEmpty && want.exceptAll(visible).isEmpty,
        s"seed=$seed diverged")
    }
  }

  test("read-side broadcast is metadata-decided: the small-vector plan broadcasts") {
    val (table, dv) = fixture()
    DeletionVectors.markDeleted(spark, table, col("bucket") === 5, dv)
    val plan = DeletionVectors.read(spark, table, dv)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"small vector should broadcast:\n$plan")
  }
}
