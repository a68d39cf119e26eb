package graft.operators

import graft.SparkSpec
import graft.functions.ZOrderUtil
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave: known bit patterns, MSB-first round-robin") {
    // 2 values, 2 bits each: (0b10, 0b01) -> z = 1,0 then 0,1 = 0b1001
    assert(ZOrderUtil.interleave(Array(2, 1), 2) == 9L)
    assert(ZOrderUtil.interleave(Array(0, 0), 16) == 0L)
    assert(ZOrderUtil.interleave(Array(0xffff, 0xffff), 16) == 0xffffffffL)
    // single column degenerates to the value itself
    assert(ZOrderUtil.interleave(Array(12345), 16) == 12345L)
  }

  test("expression agrees with the Scala kernel and survives codegen") {
    val s = spark
    import s.implicits._
    val df = Seq((3, 5), (0xffff, 0), (7, 7)).toDF("a", "b")
    val out = df.select(graft.functions.ZOrderFunctions.interleaveBits(
      Seq(col("a"), col("b"))).as("z")).collect().map(_.getLong(0))
    val expect = Seq((3, 5), (0xffff, 0), (7, 7)).map { case (a, b) =>
      ZOrderUtil.interleave(Array(a, b), 31) } // expression caps bitsPer at 31
    assert(out.toSeq == expect)
  }

  test("two interleave_bits in one projection don't collide in codegen") {
    val s = spark
    import s.implicits._
    // pre-freshName codegen declared fixed locals v0/v1 — two
    // expressions in one generated function produced duplicate
    // declarations and forced a whole-stage-codegen fallback
    val df = Seq((3, 5), (7, 2)).toDF("a", "b")
    val out = df.select(
      graft.functions.ZOrderFunctions.interleaveBits(Seq(col("a"), col("b"))).as("z1"),
      graft.functions.ZOrderFunctions.interleaveBits(Seq(col("b"), col("a"))).as("z2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = Seq((3, 5), (7, 2)).map { case (a, b) =>
      (ZOrderUtil.interleave(Array(a, b), 31), ZOrderUtil.interleave(Array(b, a), 31)) }
    assert(out.toSeq == expect)
  }

  test("non-integer input fails analysis with a type error, not at runtime") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", 1)).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.ZOrderFunctions.interleaveBits(
        Seq(col("a"), col("b"))).as("z")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("interleave_bits"))
  }

  test("z-order layout bounds BOTH columns per partition; linear sort only one") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
      .select(col("user_id"), col("value"))
    def spanPerPartition(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val spans = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).collect()(0).getDouble(0)
      spans
    }
    val k = 8
    val zed = ZOrder.cluster(ev, Seq("user_id", "value"), k)
    val linear = ev.repartitionByRange(k, col("user_id"), col("value"))
      .sortWithinPartitions("user_id", "value")
    // leading column: both layouts bound it (z a bit looser)
    // second column: linear sort leaves ~the full range in every
    // partition; z-order must cut it substantially
    val zSpan = spanPerPartition(zed, "value")
    val linSpan = spanPerPartition(linear, "value")
    assert(zSpan < linSpan * 0.8, s"z $zSpan vs linear $linSpan")
    // and the layout is only a reordering
    assert(zed.count() == ev.count())
  }

  test("single-column expression returns the value itself (31-bit cap)") {
    val s = spark
    import s.implicits._
    val out = Seq(12345, 0, 0x7fff).toDF("a")
      .select(graft.functions.ZOrderFunctions.interleaveBits(Seq(col("a"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(12345L, 0L, 0x7fffL))
  }

  test("withZValue tolerates an all-null column") {
    val s = spark
    import s.implicits._
    val df = Seq((1, None: Option[Int]), (2, None)).toDF("a", "b")
    assert(ZOrder.withZValue(df, Seq("a", "b")).count() == 2)
  }
}
