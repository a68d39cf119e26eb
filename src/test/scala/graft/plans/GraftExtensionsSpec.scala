package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The session-extension surface: injected SQL functions must resolve
  * and match their DataFrame-API kernels; the binned range-join rule
  * must replace nested-loop/quadratic plans with an equi-join on bins
  * and preserve exact results (including empty/reversed intervals and
  * negative domains, where floor-division binning is easy to get
  * wrong).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withBinWidth[T](w: Long)(f: => T): T = {
    spark.conf.set(BinnedRangeJoinRule.binWidthKey, w.toString)
    try f
    finally spark.conf.unset(BinnedRangeJoinRule.binWidthKey)
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.treeString

  private def points: DataFrame = {
    val s = spark; import s.implicits._
    (1 to 200).map(i => (i.toLong, (i * 7 - 300).toLong)).toDF("pid", "p")
  }

  private def intervals: DataFrame = {
    val s = spark; import s.implicits._
    // includes a reversed interval (hi < lo) that must match nothing
    ((1 to 30).map(j => (j.toLong, (j * 37 - 400).toLong, (j * 37 - 345).toLong)) :+
      (99L, 50L, -50L)).toDF("iid", "lo", "hi")
  }

  private def keyless: DataFrame =
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))

  test("injected SQL functions resolve and match the DataFrame kernels") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS cos,
        |       graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS dot,
        |       graft_fingerprint64('abc') AS fp,
        |       graft_simhash64(array('a', 'b')) AS sh,
        |       size(graft_shingle_hashes(array('a', 'b', 'c', 'd'), 2)) AS nsh,
        |       graft_interleave_bits(3, 1) AS z""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2.0)) < 1e-15)
    assert(r.getDouble(1) == 23.0)
    assert(r.getLong(2) == graft.functions.GraftHash.fnv1a64("abc".getBytes("UTF-8")))
    assert(r.getInt(4) == 3) // 3 distinct 2-shingles of 4 tokens
  }

  test("injected SQL aggregate graft_top_k matches the Column API") {
    val r = spark.sql(
      """SELECT g, graft_top_k(score, id, 2) AS top
        |FROM VALUES (1, 1.0D, 10L), (1, 3.0D, 11L), (1, 2.0D, 12L), (2, 5.0D, 20L)
        |  AS t(g, score, id)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val top1 = r(0).getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))
    assert(top1 == Seq((3.0, 11L), (2.0, 12L)))
    assert(r(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(20L))
  }

  test("injected SQL aggregate graft_freq_sketch tracks the hot value") {
    val r = spark.sql(
      """SELECT graft_freq_sketch(v, 2) AS sk
        |FROM VALUES ('a'), ('a'), ('a'), ('b'), ('c') AS t(v)""".stripMargin).head()
    val top = r.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(top.contains("a"))
  }

  test("injected SQL aggregate graft_cms_sketch agrees with graft_cms_bucket probes") {
    val r = spark.sql(
      """SELECT graft_cms_sketch(v, 4, 16) AS sk
        |FROM VALUES ('a'), ('a'), ('a'), ('b') AS t(v)""".stripMargin).head()
    val cells = r.getSeq[Long](0)
    assert(cells.length == 64 && cells.sum == 16L)
    val probes = spark.sql(
      "SELECT graft_cms_bucket('a', 0, 16) AS b0, graft_cms_bucket('a', 1, 16) AS b1").head()
    assert(cells(probes.getInt(0)) >= 3L)
    assert(cells(16 + probes.getInt(1)) >= 3L)
  }

  test("keyless inequality join: rule replaces the nested loop with a bin equi-join") {
    val expected = keyless.collect().map(_.toSeq).toSet // rule off: BNLJ baseline
    assert(physical(keyless).contains("BroadcastNestedLoopJoin"))
    withBinWidth(64) {
      val df = keyless
      val p = physical(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("Generate explode"), p)
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("keyed range join: equi keys survive and results are exact") {
    val s = spark; import s.implicits._
    val pts = (1 to 300).map(i => (i % 5, i.toLong, (i * 3).toLong)).toDF("k", "pid", "p")
    val ivs = (1 to 40).map(j => (j % 5, j.toLong, (j * 19).toLong, (j * 19 + 30).toLong))
      .toDF("k", "iid", "lo", "hi")
    def q = pts.join(ivs, Seq("k")).filter(col("p") >= col("lo") && col("p") <= col("hi"))
    val expected = q.collect().map(_.toSeq).toSet
    withBinWidth(32) {
      val df = q
      val p = physical(df)
      assert(p.contains("Generate explode"), p)
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("negative domain and bin-boundary points bin correctly") {
    // p = -8..8, one interval [-4, 4], width 4: floor semantics must
    // not split at zero (truncating division would).
    val s = spark; import s.implicits._
    val pts = (-8 to 8).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
    val ivs = Seq((1L, -4L, 4L)).toDF("iid", "lo", "hi")
    def q = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    val expected = q.collect().map(_.toSeq).toSet
    assert(expected.size == 9)
    withBinWidth(4)(assert(q.collect().map(_.toSeq).toSet == expected))
  }

  test("rule leaves manually-binned range joins alone (no double rewrite)") {
    withBinWidth(1800L * 1000 * 1000) {
      val df = graft.Queries.qRangeJoin.run(spark, sfDir)
      // exactly one explode: the manual one from operators.RangeJoin
      assert("Generate explode".r.findAllIn(physical(df)).size == 1)
    }
  }

  test("q_range_join_auto: rule fires on the cloned session and matches the manual binning") {
    val auto = graft.Queries.qRangeJoinAuto.run(spark, sfDir)
    assert(physical(auto).contains("Generate explode"), "rule must have rewritten the join")
    // the shared session's conf is untouched
    assert(spark.conf.getOption(BinnedRangeJoinRule.binWidthKey).isEmpty)
    val manual = graft.Queries.qRangeJoin.run(spark, sfDir)
    assert(auto.collect().map(_.toSeq).toSet == manual.collect().map(_.toSeq).toSet)
  }

  test("rule is inert without the conf") {
    assert(physical(keyless).contains("BroadcastNestedLoopJoin"))
  }

  test("rule skips non-integral domains and same-side bounds") {
    val s = spark; import s.implicits._
    withBinWidth(16) {
      // double domain: not rewritten (binning only defined for int/long)
      val pts = Seq((1L, 2.5)).toDF("pid", "p")
      val ivs = Seq((1L, 1.0, 3.0)).toDF("iid", "lo", "hi")
      val q1 = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!physical(q1).contains("Generate explode"))
      assert(q1.count() == 1)
      // bounds on the SAME side as the point: a filter, not a range join
      val t1 = Seq((5L, 1L, 9L)).toDF("x", "xlo", "xhi")
      val t2 = Seq(42L).toDF("y")
      val q2 = t1.join(t2, col("x") >= col("xlo") && col("x") <= col("xhi"))
      assert(!physical(q2).contains("Generate explode"))
      assert(q2.count() == 1)
    }
  }

  test("randomized equivalence: rule on vs off over fuzzed intervals and widths") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val w = Seq(3L, 17L, 1000L)(trial - 1)
      val pts = Seq.fill(150)((rnd.nextInt(10), rnd.nextInt(4000) - 2000L))
        .zipWithIndex.map { case ((k, p), i) => (k, i.toLong, p) }
        .toDF("k", "pid", "p")
      val ivs = Seq.fill(40)((rnd.nextInt(10), rnd.nextInt(4000) - 2000L, rnd.nextInt(200) - 20L))
        .zipWithIndex.map { case ((k, lo, len), i) => (k, i.toLong, lo, lo + len) } // some reversed
        .toDF("k", "iid", "lo", "hi")
      def q = pts.join(ivs, Seq("k")).filter(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid")
      val expected = q.collect().map(_.toSeq).toSet
      withBinWidth(w) {
        assert(q.collect().map(_.toSeq).toSet == expected, s"width $w diverged")
      }
    }
  }
}
