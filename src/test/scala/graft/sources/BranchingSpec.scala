package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BranchingSpec extends SparkSpec {

  private def df(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "ver", "payload")
  }

  private def snap(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    d.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("create is zero-copy; branch reads fork point until first branch commit") {
    val table = tmpDir("graft-branch-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    val bv = Branching.create(spark, table, "dev")
    assert(bv == 1)
    // main moves on; the branch must keep seeing the fork point
    UpsertWriter.upsert(df((1L, 2L, "a2")), table, Seq("k"), "ver")
    assert(snap(Branching.readBranch(spark, table, "dev")) ==
      Map(1L -> ((1L, "a")), 2L -> ((1L, "b"))))
    assert(snap(UpsertWriter.read(spark, table)) ==
      Map(1L -> ((2L, "a2")), 2L -> ((1L, "b"))))
    // double-create fails loudly
    intercept[IllegalStateException](Branching.create(spark, table, "dev"))
  }

  test("branch writes are isolated from main; deletes commit branch versions") {
    val table = tmpDir("graft-branch-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")), table, Seq("k"), "ver")
    Branching.create(spark, table, "dev")
    Branching.upsertBranch(df((2L, 2L, "B"), (4L, 2L, "new")), table, "dev", Seq("k"), "ver")
    Branching.deleteFromBranch(df((3L, 0L, "")), table, "dev", Seq("k"))
    assert(snap(Branching.readBranch(spark, table, "dev")) ==
      Map(1L -> ((1L, "a")), 2L -> ((2L, "B")), 4L -> ((2L, "new"))))
    // main never saw any of it
    assert(snap(UpsertWriter.read(spark, table)) ==
      Map(1L -> ((1L, "a")), 2L -> ((1L, "b")), 3L -> ((1L, "c"))))
  }

  test("live branch pins its fork version against every cleaner; deleteBranch releases the pin") {
    val table = tmpDir("graft-branch-pin-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver", keepVersions = 99)
    Branching.create(spark, table, "dev") // fork at v1
    // inline cleaner (keepVersions=1) runs on each commit: v1 must
    // survive it while intermediate unpinned versions are retired
    UpsertWriter.upsert(df((1L, 2L, "b")), table, Seq("k"), "ver", keepVersions = 1)
    UpsertWriter.upsert(df((1L, 3L, "c")), table, Seq("k"), "ver", keepVersions = 1)
    assert(UpsertWriter.versions(spark, table) == Seq(1, 3),
      "fork point pinned, unpinned v2 retired, live v3 kept")
    // the out-of-band clean service respects the same pin
    assert(UpsertWriter.clean(spark, table, keepVersions = 1).isEmpty)
    // the branch still merges after main cleaned past the fork
    Branching.upsertBranch(df((2L, 4L, "d")), table, "dev", Seq("k"), "ver")
    Branching.mergeBranch(spark, table, "dev", Seq("k"), "ver", keepVersions = 99)
    assert(snap(UpsertWriter.read(spark, table)) ==
      Map(1L -> ((3L, "c")), 2L -> ((4L, "d"))))
    // dropping the branch releases the pin: the next clean retires v1
    Branching.deleteBranch(spark, table, "dev")
    assert(UpsertWriter.clean(spark, table, keepVersions = 1).contains(1))
  }

  test("threeWayMerge: change-vs-base routing, deletions, convergent edits") {
    val base = df((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"), (4L, 1L, "d"), (5L, 1L, "e"))
    // ours: modified 1, deleted 4, added 6, convergent-edited 5
    val ours = df((1L, 2L, "a-main"), (2L, 1L, "b"), (3L, 1L, "c"), (5L, 3L, "same"), (6L, 2L, "add-o"))
    // theirs: modified 2, deleted 3, added 7, convergent-edited 5
    val theirs = df((1L, 1L, "a"), (2L, 3L, "b-branch"), (4L, 1L, "d"), (5L, 3L, "same"), (7L, 3L, "add-t"))
    val m = snap(Branching.threeWayMerge(base, ours, theirs, Seq("k"), "ver", "fail"))
    assert(m == Map(
      1L -> ((2L, "a-main")),   // ours-only change
      2L -> ((3L, "b-branch")), // theirs-only change
      // 3 deleted by theirs, 4 deleted by ours
      5L -> ((3L, "same")),     // both changed identically: no conflict
      6L -> ((2L, "add-o")), 7L -> ((3L, "add-t"))))
  }

  test("threeWayMerge conflict policies: fail raises, latest picks higher precombine, delete-vs-modify keeps modify") {
    val base = df((1L, 1L, "a"), (2L, 1L, "b"))
    val ours = df((1L, 5L, "ours"), (2L, 2L, "b-main"))   // 1 modified (ver 5); 2 modified
    val theirs = df((1L, 3L, "theirs"))                    // 1 modified (ver 3); 2 DELETED
    val ex = intercept[Exception] {
      Branching.threeWayMerge(base, ours, theirs, Seq("k"), "ver", "fail").collect()
    }
    assert(ex.getMessage.contains("conflict"), ex.getMessage)
    val latest = snap(Branching.threeWayMerge(base, ours, theirs, Seq("k"), "ver", "latest"))
    // key 1: ours ver 5 > theirs ver 3 → ours; key 2: delete-vs-modify → modify survives
    assert(latest == Map(1L -> ((5L, "ours")), 2L -> ((2L, "b-main"))))
    val theirsWin = snap(Branching.threeWayMerge(base, ours, theirs, Seq("k"), "ver", "theirs"))
    assert(theirsWin == Map(1L -> ((3L, "theirs")))) // theirs policy honors the branch deletion
  }

  test("threeWayMerge: randomized scenarios match a scalar reference model") {
    val rnd = new scala.util.Random(13)
    // reference: the documented per-key routing, including deletions
    def refMerge(base: Map[Long, (Long, String)], ours: Map[Long, (Long, String)],
        theirs: Map[Long, (Long, String)]): Map[Long, (Long, String)] = {
      val keys = base.keySet ++ ours.keySet ++ theirs.keySet
      keys.flatMap { k =>
        val b = base.get(k); val o = ours.get(k); val t = theirs.get(k)
        val pick =
          if (t == b) o                        // theirs unchanged (incl. both-absent)
          else if (o == b) t                   // ours unchanged
          else if (t == o) o                   // convergent
          else (o, t) match {                  // conflict under "latest"
            case (None, _) => t                // delete-vs-modify → the modify
            case (_, None) => o
            case (Some(ov), Some(tv)) => if (tv._1 >= ov._1) t else o
          }
        pick.map(k -> _)
      }.toMap
    }
    for (trial <- 1 to 5) {
      val keys = (1L to 30L)
      val base = keys.map(k => k -> ((1L, s"b$k"))).toMap
      def mutate(m: Map[Long, (Long, String)], tag: String, ver: Long) = {
        var r = m
        keys.foreach { k =>
          rnd.nextInt(5) match {
            case 0 => r = r.updated(k, (ver, s"$tag$k"))   // modify
            case 1 => r = r - k                            // delete
            case _ => ()                                   // keep
          }
        }
        // some inserts
        (1 to 3).foreach { i => r = r.updated(100L * ver + i, (ver, s"$tag-new$i")) }
        r
      }
      val ours = mutate(base, "o", 2L + rnd.nextInt(2))
      val theirs = mutate(base, "t", 2L + rnd.nextInt(2))
      def toDf(m: Map[Long, (Long, String)]) =
        df(m.toSeq.map { case (k, (v, p)) => (k, v, p) }: _*)
      val got = snap(Branching.threeWayMerge(
        toDf(base), toDf(ours), toDf(theirs), Seq("k"), "ver", "latest"))
      val want = refMerge(base, ours, theirs)
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want\nours=$ours\ntheirs=$theirs")
    }
  }

  test("mergeBranch commits main's next version; conflicts() is the dry-run view") {
    val table = tmpDir("graft-branch-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")), table, Seq("k"), "ver")
    Branching.create(spark, table, "dev")
    UpsertWriter.upsert(df((1L, 2L, "a-main")), table, Seq("k"), "ver")        // main: modify 1
    Branching.upsertBranch(df((1L, 3L, "a-br"), (3L, 3L, "c-br")), table, "dev",
      Seq("k"), "ver")                                                          // branch: modify 1 and 3
    val confl = Branching.conflicts(spark, table, "dev", Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(confl.toSeq == Seq((1L, 2L, 3L))) // key 1: ours ver 2 vs theirs ver 3
    val v = Branching.mergeBranch(spark, table, "dev", Seq("k"), "ver", onConflict = "latest")
    assert(v == 3)
    assert(snap(UpsertWriter.read(spark, table)) ==
      Map(1L -> ((3L, "a-br")), 2L -> ((1L, "b")), 3L -> ((3L, "c-br"))))
  }
}
