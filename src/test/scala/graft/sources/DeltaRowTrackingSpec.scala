package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ROW TRACKING (delta.io PROTOCOL.md): under the `rowTracking`
  * writer feature every add carries a fresh `baseRowId` range (row id
  * = base + physical row index) and `defaultRowCommitVersion` (the
  * commit that added the file), with the high watermark in the
  * `delta.rowTracking` metadata domain. Ids must be STABLE: DV
  * deletes mask positions without moving rows, restores re-point at
  * the same bytes — both carry the fields verbatim, as do
  * checkpoints. Operations that REWRITE rows (OPTIMIZE, upsert) owe
  * materialized-column preservation this writer does not implement,
  * so they refuse loudly on row-tracked tables.
  */
class DeltaRowTrackingSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  /** one file per commit, rows in `id` order — row ids deterministic */
  private def ordered(r: Range) =
    df(r).repartition(1).sortWithinPartitions("id")

  private def idOf(table: String): Map[Long, (Long, Long)] =
    DeltaTableReader.snapshotWithRowIds(spark, table)
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(row => row.getLong(0) -> ((row.getLong(1), row.getLong(2)))).toMap

  test("create + append assign contiguous fresh ids; watermark domain bumps; dcv = landing version") {
    val table = tmpDir("drt-basic") + "/t"
    DeltaTableWriter.create(ordered(1 to 100), table, enableRowTracking = true): Unit
    val st = DeltaTableReader.snapshotState(spark, table)
    assert(st.protocol.exists(p =>
      p.writerFeatures.toSet == Set("domainMetadata", "rowTracking") &&
        p.minWriterVersion == 7 && p.minReaderVersion == 1))
    assert(st.configuration.get("delta.enableRowTracking").contains("true"))
    assert(st.domainMetadata("delta.rowTracking") == """{"rowIdHighWaterMark":99}""")
    val ids0 = idOf(table)
    assert(ids0.values.map(_._1).toSeq.sorted == (0L to 99L),
      "one ordered file: row ids are exactly 0..99")
    assert(ids0(1L)._1 == 0L && ids0(100L)._1 == 99L, "file order = id order")
    assert(ids0.values.forall(_._2 == 0L), "created files carry dcv 0")
    // the append's file starts past the watermark, dcv = its version
    DeltaTableWriter.append(ordered(101 to 150), table): Unit
    val st1 = DeltaTableReader.snapshotState(spark, table)
    assert(st1.domainMetadata("delta.rowTracking") == """{"rowIdHighWaterMark":149}""")
    val ids1 = idOf(table)
    assert(ids1(101L) == ((100L, 1L)) && ids1(150L) == ((149L, 1L)))
    assert((1L to 100L).forall(k => ids1(k) == ids0(k)), "old ids untouched")
  }

  test("ids are STABLE under DV delete, checkpoint + log cleanup, and restore") {
    val table = tmpDir("drt-stable") + "/t"
    DeltaTableWriter.create(ordered(1 to 100), table, enableRowTracking = true): Unit
    DeltaTableWriter.append(ordered(101 to 200), table): Unit
    val before = idOf(table)
    // DV delete: survivors keep their EXACT ids (positions masked,
    // rows unmoved)
    DeltaTableWriter.delete(spark, table, pmod(col("id"), lit(3)) === 0): Unit
    val afterDelete = idOf(table)
    assert(afterDelete.keySet == before.keySet.filter(_ % 3 != 0))
    assert(afterDelete.forall { case (k, v) => before(k) == v },
      "every surviving row keeps its id and commit version")
    // restore past the delete: the re-activated vector-free files
    // restore their original ids
    DeltaTableWriter.restore(spark, table, 1L): Unit
    assert(idOf(table) == before, "a restore re-points at the same bytes — ids restore")
    // checkpoint, then delete every JSON: the checkpoint is the only
    // copy of baseRowId/dcv/watermark — ids must not change
    DeltaTableWriter.writeCheckpoint(spark, table): Unit
    (0L to 3L).foreach { v =>
      val f = new java.io.File(s"$table/_delta_log", f"$v%020d.json")
      assert(f.delete()); new java.io.File(s"$table/_delta_log", f".$v%020d.json.crc").delete()
    }
    assert(idOf(table) == before, "ids must ride the checkpoint verbatim")
    // and a fresh append AFTER cleanup mints past the checkpointed
    // watermark, never colliding
    DeltaTableWriter.append(ordered(201 to 220), table): Unit
    val finalIds = idOf(table)
    assert(finalIds(201L)._1 == 200L && finalIds(220L)._1 == 219L,
      "the watermark survived the checkpoint: fresh ids start at 200")
  }

  test("OPTIMIZE preserves every row's id by materializing it; fresh ids mint past the bumped watermark") {
    val table = tmpDir("drt-optimize") + "/t"
    DeltaTableWriter.create(ordered(1 to 100), table, enableRowTracking = true): Unit
    DeltaTableWriter.append(ordered(101 to 200), table): Unit
    DeltaTableWriter.delete(spark, table, pmod(col("id"), lit(4)) === 0): Unit
    val before = idOf(table)
    DeltaTableWriter.compact(spark, table, targetFiles = 2): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 150L)
    // the rewrite re-filed every row; ids must be EXACTLY the old ones
    assert(idOf(table) == before,
      "OPTIMIZE must serve the MATERIALIZED ids, not the new files' base ranges")
    // the declared schema is unchanged — a plain snapshot read must
    // NOT leak the materialized columns
    assert(DeltaTableReader.snapshot(spark, table).columns.toSeq ==
      Seq("id", "grp", "v"))
    // the compacted files took fresh (shadowed) base ranges, so the
    // next append mints PAST them — never colliding with live ids
    DeltaTableWriter.append(ordered(201 to 210), table): Unit
    val afterAppend = idOf(table)
    val newIds = (201L to 210L).map(afterAppend(_)._1)
    assert(newIds.toSet.intersect(before.values.map(_._1).toSet).isEmpty,
      "fresh ids must not collide with materialized ones")
    assert((newIds.min >= 200L) && newIds.size == 10)
    // a SECOND optimize re-materializes from the first's columns
    DeltaTableWriter.compact(spark, table, targetFiles = 1): Unit
    assert(idOf(table) == afterAppend, "re-materialization is id-exact")
  }

  test("rewrites refuse; reads refuse honest gaps; mapped composition refuses") {
    val table = tmpDir("drt-refuse") + "/t"
    DeltaTableWriter.create(ordered(1 to 50), table, enableRowTracking = true): Unit
    val e2 = intercept[IllegalStateException](
      DeltaTableWriter.upsert(df(1 to 5), table, Seq("id")))
    assert(e2.getMessage.contains("row ids"))
    // an untracked table has no ids to serve
    val plain = tmpDir("drt-plain") + "/t"
    DeltaTableWriter.create(df(1 to 10), plain): Unit
    val e3 = intercept[IllegalStateException](
      DeltaTableReader.snapshotWithRowIds(spark, plain))
    assert(e3.getMessage.contains("rowTracking"))
    // an EXTERNAL row-tracked table whose add lacks baseRowId is
    // spec-broken: refuse rather than serving null ids
    val broken = tmpDir("drt-broken") + "/t"
    DeltaTableWriter.create(ordered(1 to 10), broken, enableRowTracking = true): Unit
    val log = new java.io.File(s"$broken/_delta_log", f"${0L}%020d.json")
    val src = scala.io.Source.fromFile(log, "UTF-8")
    val stripped = try src.getLines().map(
      _.replaceAll(""","baseRowId":\d+""", "")).mkString("\n") finally src.close()
    val w = new java.io.PrintWriter(log, "UTF-8")
    try w.println(stripped) finally w.close()
    new java.io.File(s"$broken/_delta_log", f".${0L}%020d.json.crc").delete()
    val e4 = intercept[IllegalStateException](
      DeltaTableReader.snapshotWithRowIds(spark, broken))
    assert(e4.getMessage.contains("baseRowId"))
    // a row-tracked table whose watermark domain is gone refuses the
    // append (minting ids blind could collide)
    val log2 = new java.io.File(s"$broken/_delta_log", f"${0L}%020d.json")
    val src2 = scala.io.Source.fromFile(log2, "UTF-8")
    val noDomain = try src2.getLines()
      .filterNot(_.contains(""""domain":"delta.rowTracking""""))
      .mkString("\n") finally src2.close()
    val w2 = new java.io.PrintWriter(log2, "UTF-8")
    try w2.println(noDomain) finally w2.close()
    new java.io.File(s"$broken/_delta_log", f".${0L}%020d.json.crc").delete()
    val e5 = intercept[IllegalStateException](
      DeltaTableWriter.append(df(11 to 20), broken))
    assert(e5.getMessage.contains("rowIdHighWaterMark"))
  }

  test("external fixture: spec-shaped adds read back exact ids") {
    val table = tmpDir("drt-ext") + "/t"
    val d = df(1 to 20).repartition(1).sortWithinPartitions("id")
    val tmp = tmpDir("drt-ext-part")
    d.write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(table).mkdirs()
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(table, "part-0.parquet").toPath): Unit
    val dir = new java.io.File(table, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, f"${0L}%020d.json"), "UTF-8")
    try {
      w.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["domainMetadata","rowTracking"]}}""")
      w.println(s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${d.schema.json.replace("\"", "\\\"")}",""" +
        """"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},""" +
        """"createdTime":1700000000000}}""")
      w.println("""{"domainMetadata":{"domain":"delta.rowTracking",""" +
        """"configuration":"{\"rowIdHighWaterMark\":1019}","removed":false}}""")
      w.println("""{"add":{"path":"part-0.parquet","partitionValues":{},"size":1024,""" +
        """"modificationTime":1700000000000,"dataChange":true,""" +
        """"baseRowId":1000,"defaultRowCommitVersion":0}}""")
    } finally w.close()
    val ids = idOf(table)
    assert(ids(1L) == ((1000L, 0L)) && ids(20L) == ((1019L, 0L)),
      s"external base 1000 serves ids 1000..1019: $ids")
  }
}
