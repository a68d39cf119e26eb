package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized cross-format merge equivalence: the SAME seeded
  * sequence of upsert batches applied through [[TableLoader.upsert]]
  * to all four layouts — graft versioned, Delta (DV-mask), Hudi COW
  * (group rewrite), Iceberg (equality deletes) — must converge to the
  * SAME final table as a plain in-memory map, and the Delta/Iceberg
  * CHANGE FEEDS folded from the bootstrap must reproduce it too. One
  * property run exercises every merge path against every other.
  */
class ForeignUpsertPropertySpec extends SparkSpec {

  test("property: N random upsert batches — four formats, one in-memory model, identical ends") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    val model = scala.collection.mutable.Map.empty[Long, (String, Long)]
    def toDf(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.toDF("id", "key", "v")

    // bootstrap: ids 1..40
    val base = (1 to 40).map(i => (i.toLong, s"k$i", i * 2L))
    base.foreach { case (id, k, v) => model(id) = (k, v) }

    val root = tmpDir("upsert-prop")
    val delta = root + "/delta"; val hudi = root + "/hudi"
    val ice = root + "/ice"; val graftT = root + "/graft"
    val s1Delta = { DeltaTableWriter.create(toDf(base), delta); 0L }
    HudiTableWriter.create(toDf(base), hudi, recordKeys = Seq("id")): Unit
    val s1Ice = IcebergTableWriter.create(toDf(base), ice)
    UpsertWriter.upsert(toDf(base), graftT, Seq("id"), precombine = "v")

    // N random batches: each picks unique keys from 1..60 (mix of
    // updates and inserts) with fresh values
    (1 to 5).foreach { step =>
      val ids = rnd.shuffle((1L to 60L).toVector).take(5 + rnd.nextInt(8)).sorted
      val batch = ids.map(id => (id, s"s$step-$id", rnd.nextInt(100000).toLong))
      batch.foreach { case (id, k, v) => model(id) = (k, v) }
      Seq(delta, hudi, ice, graftT).foreach { p =>
        TableLoader.upsert(toDf(batch), p, Seq("id")): Unit
      }
    }

    val expect = toDf(model.toSeq.map { case (id, (k, v)) => (id, k, v) }.sortBy(_._1))
    def check(name: String, got: DataFrame): Unit = {
      val g = got.select("id", "key", "v")
      assert(g.exceptAll(expect).isEmpty && expect.exceptAll(g).isEmpty,
        s"$name diverged from the model: " +
          s"extra=${g.exceptAll(expect).count()} missing=${expect.exceptAll(g).count()}")
    }
    check("delta", DeltaTableReader.snapshot(spark, delta))
    check("hudi", HudiTableReader.snapshot(spark, hudi))
    check("iceberg", IcebergTableReader.snapshot(spark, ice))
    check("graft", UpsertWriter.read(spark, graftT))

    // the CHANGE FEEDS folded from the bootstrap reproduce the end
    // too — applied per commit, the consumer's shape
    val dFeed = DeltaTableReader.changeFeedSince(spark, delta, s1Delta)
    val dVersions = dFeed.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted
    var mirror = DeltaTableReader.snapshotAsOf(spark, delta, s1Delta)
      .select("id", "key", "v")
    dVersions.foreach { v =>
      val dels = dFeed.where(col("_commit_version") === v &&
        col("_change_type") === "delete").select("id", "key", "v")
      val ins = dFeed.where(col("_commit_version") === v &&
        col("_change_type") === "insert").select("id", "key", "v")
      mirror = mirror.join(dels, Seq("id", "key", "v"), "left_anti").unionByName(ins)
        .localCheckpoint()
    }
    check("delta change-feed fold", mirror)

    val iFeed = IcebergTableReader.changeFeedSince(spark, ice, s1Ice)
    val iSnaps = iFeed.select("_snapshot_id").distinct().collect().map(_.getLong(0)).sorted
    var iMirror = IcebergTableReader.snapshotAsOf(spark, ice, s1Ice)
      .select("id", "key", "v")
    iSnaps.foreach { sid =>
      val dels = iFeed.where(col("_snapshot_id") === sid &&
        col("_change_type") === "delete").select("id")
      val ins = iFeed.where(col("_snapshot_id") === sid &&
        col("_change_type") === "insert").select("id", "key", "v")
      iMirror = iMirror.join(dels, Seq("id"), "left_anti").unionByName(ins)
        .localCheckpoint()
    }
    check("iceberg change-feed fold", iMirror)
  }
}
