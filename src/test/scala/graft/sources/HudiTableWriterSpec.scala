package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interop contract: what the writer lands must be a layout-true Hudi
  * COW table — the round trip goes through [[HudiTableReader]], which
  * is itself spec-locked against hand-built timeline fixtures.
  */
class HudiTableWriterSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", i * 2L)).toDF("id", "key", "v")
  }

  test("create + append round-trip; incremental pulls exactly the appended commit") {
    val table = tmpDir("hwr-basic") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 60), table, recordKeys = Seq("id"))
    val snap1 = HudiTableReader.snapshot(spark, table)
    assert(snap1.count() == 60L)
    assert(snap1.select("_hoodie_commit_time").distinct().head().getString(0) == c1)
    assert(snap1.where(col("id") === 7L).select("_hoodie_record_key").head().getString(0)
      == "id:7")
    assert(TableLoader.detectFormat(spark, table) == TableLoader.HudiFormat)
    assert(TableLoader.open(spark, table).count() == 60L)

    val c2 = HudiTableWriter.append(df(61 to 90), table, recordKeys = Seq("id"))
    assert(c2 > c1, "instants must be strictly increasing")
    assert(HudiTableReader.snapshot(spark, table).count() == 90L)
    // incremental pull since c1: exactly the appended rows
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 30L)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(61L, 90L))
    // format-agnostic incremental dispatch takes the same instant token
    assert(TableLoader.openIncremental(spark, table, c1).count() == 30L)

    // a drifted column set refuses
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      HudiTableWriter.append(Seq((1L, "x")).toDF("id", "key"), table))
    assert(e.getMessage.contains("columns"))
    // create on an existing table refuses
    val e2 = intercept[IllegalArgumentException](HudiTableWriter.create(df(1 to 5), table))
    assert(e2.getMessage.contains("already"))
  }

  test("layout is Hudi-true: base-file naming, commit stats, COW properties") {
    val table = tmpDir("hwr-layout") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 20), table, tableName = "evts")
    // base files follow <fileId>_<writeToken>_<instant>.parquet
    val bases = new java.io.File(table).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(bases.nonEmpty)
    assert(bases.forall(_.getName.endsWith(s"_$c1.parquet")))
    // hoodie.properties declares COPY_ON_WRITE (the reader's MOR gate reads this)
    val props = scala.io.Source.fromFile(s"$table/.hoodie/hoodie.properties").mkString
    assert(props.contains("hoodie.table.type=COPY_ON_WRITE"))
    assert(props.contains("hoodie.table.name=evts"))
    // the commit names every base file it landed
    val commit = scala.io.Source.fromFile(s"$table/.hoodie/$c1.commit").mkString
    bases.foreach(b => assert(commit.contains(b.getName)))
    // readOptimized == snapshot on a COW table
    assert(HudiTableReader.readOptimized(spark, table).count() == 20L)
  }

  test("record keys are a TABLE property: persisted at create, derived on append") {
    val table = tmpDir("hwr-keys") + "/t"
    HudiTableWriter.create(df(1 to 20), table, recordKeys = Seq("id", "key")): Unit
    val props = scala.io.Source.fromFile(s"$table/.hoodie/hoodie.properties").mkString
    assert(props.contains("hoodie.table.recordkey.fields=id,key"),
      "the declaration must ride hoodie.properties, Hudi's own key")
    assert(HudiTableWriter.declaredRecordKeys(spark, table) == Seq("id", "key"))
    // an append WITHOUT the argument still stamps the declared keys —
    // otherwise base files disagree on _hoodie_record_key and the
    // snapshot schema depends on which footer Spark samples
    HudiTableWriter.append(df(21 to 30), table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.where(col("_hoodie_record_key").isNull).count() == 0L)
    assert(snap.where(col("id") === 25L).select("_hoodie_record_key").head().getString(0)
      == "id:25,key:k25")
    // an append asserting DIFFERENT keys refuses — the table wins
    val e = intercept[IllegalArgumentException](
      HudiTableWriter.append(df(31 to 40), table, recordKeys = Seq("id")))
    assert(e.getMessage.contains("recordkey"))
    // matching assertion is fine
    HudiTableWriter.append(df(31 to 40), table, recordKeys = Seq("id", "key")): Unit
    assert(HudiTableReader.snapshot(spark, table).count() == 40L)
  }
}
