package graft.sources

import graft.SparkSpec
import graft.functions.GraftHash
import org.apache.spark.sql.functions._

import IcebergTransforms._

/** Partition transforms locked three ways: the bucket hash against
  * the Iceberg spec's OWN published vectors (Appendix B), the
  * Column/eval faces against each other on real data, and the full
  * write→prune round trip on days()/bucket()/truncate()-partitioned
  * tables (file-set cuts proven by the plan, results by the residual
  * filter).
  */
class IcebergTransformsSpec extends SparkSpec {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private def eventsDf(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map { i =>
      (i.toLong, ts(f"2024-03-${1 + (i % 20)}%02dT0${i % 10}:15:00Z"), s"u${i % 7}", i * 3L)
    }.toDF("id", "etime", "user", "v")
  }

  // ---------------------------------------------------- hash vectors

  test("bucket hash matches the Iceberg spec's published vectors") {
    // iceberg.apache.org spec, Appendix B: hash(34) for int AND long
    assert(GraftHash.icebergHashLong(34L) == 2017239379)
    // string "iceberg"
    assert(GraftHash.icebergHashBytes("iceberg".getBytes("UTF-8")) == 1210000089)
    // date 2017-11-16 = 17486 days from epoch
    assert(GraftHash.icebergHashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 UTC in MICROSECONDS
    assert(GraftHash.icebergHashLong(1510871468000000L) == -2047944441)
  }

  test("parse / specString round-trips the spec's transform strings") {
    assert(parse("grp") == PartitionField("grp", "grp", Identity))
    assert(parse("bucket(16, id)") == PartitionField("id_bucket", "id", Bucket(16)))
    assert(parse("truncate(3, name)") == PartitionField("name_trunc", "name", Truncate(3)))
    assert(parse("days(ts)") == PartitionField("ts_day", "ts", Day))
    assert(parse("hours(ts)") == PartitionField("ts_hour", "ts", Hour))
    assert(parse("months(ts)") == PartitionField("ts_month", "ts", Month))
    assert(parse("years(ts)") == PartitionField("ts_year", "ts", Year))
    for (t <- Seq[Transform](Identity, Bucket(16), Truncate(3), Year, Month, Day, Hour))
      assert(parseSpecString(specString(t)) == t)
    // the plural forms some writers emit parse too; unknown refuses
    assert(parseSpecString("days") == Day)
    intercept[IllegalArgumentException](parseSpecString("void"))
    intercept[IllegalArgumentException](parse("zap(3, x)"))
  }

  // ------------------------------------------- column ≡ eval lockstep

  test("the Column and driver-eval faces agree on every transform") {
    import org.apache.spark.sql.types._
    val df = eventsDf(50)
    def check(f: PartitionField, dt: DataType, pick: org.apache.spark.sql.Row => Any): Unit = {
      val rows = df.select(col(f.sourceCol), IcebergTransforms.column(f, dt).as("t")).collect()
      rows.foreach { r =>
        assert(pick(r) == eval(f.transform, r.get(0)),
          s"${f.transform} disagrees on ${r.get(0)}")
      }
    }
    check(parse("days(etime)"), TimestampType, _.getInt(1))
    check(parse("hours(etime)"), TimestampType, _.getInt(1))
    check(parse("months(etime)"), TimestampType, _.getInt(1))
    check(parse("years(etime)"), TimestampType, _.getInt(1))
    check(parse("bucket(8, id)"), LongType, _.getInt(1))
    check(parse("bucket(8, user)"), StringType, _.getInt(1))
    check(parse("truncate(10, v)"), LongType, _.getLong(1))
    check(parse("truncate(2, user)"), StringType, _.getString(1))
    // known day value: 2024-03-05 = 19787 days from epoch
    assert(eval(Day, ts("2024-03-05T07:15:00Z")) == 19787)
    assert(eval(Month, ts("2024-03-05T07:15:00Z")) == (2024 - 1970) * 12 + 2)
    assert(eval(Year, ts("2024-03-05T07:15:00Z")) == 54)
    // negative long truncation floors DOWN
    assert(eval(Truncate(10), -1L) == -10L)
  }

  // ------------------------------------------- write → prune round trip

  test("days(ts) table: transform in the spec JSON, appends derive it, range prune cuts files") {
    val table = tmpDir("itx-days") + "/t"
    IcebergTableWriter.create(eventsDf(60), table, partitionBy = Seq("days(etime)")): Unit
    // the metadata records the spec's transform string
    val fields = IcebergTableReader.partitionSpecFields(spark, table)
    assert(fields == Seq(PartitionField("etime_day", "etime", Day)))
    // source column rides the data files (Iceberg does not strip it)
    val aData = new java.io.File(s"$table/data").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(spark.read.parquet(aData.toString).columns.contains("etime"))
    // appends derive the partitioning from the declared transform
    IcebergTableWriter.append(eventsDf(120).where(col("id") > 60), table): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 120L)
    // inverse prune: a 3-day range keeps only those days' files
    val lo = ts("2024-03-04T00:00:00Z"); val hi = ts("2024-03-06T23:59:59Z")
    val all = IcebergTableReader.planFiles(spark, table).data.size
    val prunedPlan = IcebergTableReader.planFilesPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "etime", lo, hi))
    assert(prunedPlan.data.nonEmpty && prunedPlan.data.size < all,
      s"day-range prune must cut the FILE set (${prunedPlan.data.size} of $all)")
    // pruned + residual filter ≡ full-scan filter
    val pruned = IcebergTableReader.snapshotPrunedRange(spark, table, "etime", lo, hi)
      .where(col("etime").between(lo, hi))
    val full = snap.where(col("etime").between(lo, hi))
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.inputFiles.length == prunedPlan.data.size,
      "the scan must touch exactly the pruned file set")
  }

  test("bucket(N, id) table: equality prunes to one bucket; ranges keep everything") {
    val table = tmpDir("itx-bucket") + "/t"
    IcebergTableWriter.create(eventsDf(80), table, partitionBy = Seq("bucket(4, id)")): Unit
    val all = IcebergTableReader.planFiles(spark, table).data.size
    assert(all >= 4, s"4 buckets must land at least 4 files, got $all")
    // equality: only the key's bucket survives
    val plan = IcebergTableReader.planFilesPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "id", 17L, 17L))
    assert(plan.data.nonEmpty && plan.data.size < all)
    val hit = IcebergTableReader.snapshotPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "id", 17L, 17L))
      .where(col("id") === 17L)
    assert(hit.count() == 1L)
    // a RANGE cannot cut through a hash — conservative keep-all
    val rangePlan = IcebergTableReader.planFilesPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "id", 10L, 20L))
    assert(rangePlan.data.size == all)
  }

  test("truncate(W, string) table: prefix range prunes; external round trip holds") {
    val table = tmpDir("itx-trunc") + "/t"
    IcebergTableWriter.create(eventsDf(70), table, partitionBy = Seq("truncate(2, user)")): Unit
    val fields = IcebergTableReader.partitionSpecFields(spark, table)
    assert(fields.head.transform == Truncate(2))
    val all = IcebergTableReader.planFiles(spark, table).data.size
    val plan = IcebergTableReader.planFilesPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "user", "u3", "u3"))
    assert(plan.data.nonEmpty && plan.data.size < all)
    val got = IcebergTableReader.snapshotPruned(spark, table,
      IcebergTableReader.transformPruner(spark, table, "user", "u3", "u3"))
      .where(col("user") === "u3")
    assert(got.count() == IcebergTableReader.snapshot(spark, table)
      .where(col("user") === "u3").count())
  }

  test("upsert and rewrite services keep a transform-partitioned table consistent") {
    val s = spark
    import s.implicits._
    val table = tmpDir("itx-upsert") + "/t"
    IcebergTableWriter.create(eventsDf(40), table, partitionBy = Seq("days(etime)")): Unit
    val batch = Seq((5L, ts("2024-03-09T00:00:00Z"), "uX", 999L))
      .toDF("id", "etime", "user", "v")
    IcebergTableWriter.upsert(batch, table, Seq("id")): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    assert(snap.where($"id" === 5L).head().getAs[Long]("v") == 999L)
    IcebergTableWriter.rewriteDataFiles(spark, table, targetFiles = 2): Unit
    val after = IcebergTableReader.snapshot(spark, table)
    assert(after.count() == 40L)
    assert(after.where($"id" === 5L).head().getAs[Long]("v") == 999L)
  }
}
