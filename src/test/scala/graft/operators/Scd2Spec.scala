package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class Scd2Spec extends SparkSpec {

  private def changeLog() = {
    val s = spark
    import s.implicits._
    Seq(
      // key 1: a -> a -> b -> b -> a  => intervals a[1,3) b[3,5) a[5,)
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"), (1L, 5L, "a"),
      // key 2: single run
      (2L, 1L, "x"), (2L, 9L, "x"),
      // key 3: null attr participates in runs null -> c -> null
      (3L, 1L, null), (3L, 2L, "c"), (3L, 3L, null)
    ).toDF("k", "seq", "attr")
  }

  test("fromChangeLog collapses unchanged runs and chains intervals") {
    val hist = Scd2.fromChangeLog(changeLog(), "k", "seq", Seq("attr"))
      .orderBy("k", "valid_from").collect().toSeq
    assert(hist == Seq(
      Row(1L, "a", 1L, 3L, false),
      Row(1L, "b", 3L, 5L, false),
      Row(1L, "a", 5L, null, true),
      Row(2L, "x", 1L, null, true),
      Row(3L, null, 1L, 2L, false),
      Row(3L, "c", 2L, 3L, false),
      Row(3L, null, 3L, null, true)))
  }

  test("exactly one current row per key; intervals tile without gaps") {
    val hist = Scd2.fromChangeLog(changeLog(), "k", "seq", Seq("attr"))
    val current = hist.filter("is_current").groupBy("k").count().collect()
    assert(current.forall(_.getLong(1) == 1L))
    // every non-current valid_to equals the next interval's valid_from
    val rows = hist.orderBy("k", "valid_from").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.get(3) == b.get(2), s"gap between $a and $b")
      case _ => ()
    }
  }

  test("applyChanges == full rebuild over the combined change log") {
    val s = spark
    import s.implicits._
    val log = changeLog()
    val dim = Scd2.fromChangeLog(log, "k", "seq", Seq("attr"))
    // batch: key 1 flips to c at 7; key 4 appears; keys 2 and 3 untouched
    val batch = Seq((1L, 7L, "c"), (4L, 1L, "z")).toDF("k", "seq", "attr")
    val merged = Scd2.applyChanges(dim, batch, "k", "seq", Seq("attr"))
    val rebuilt = Scd2.fromChangeLog(log.unionByName(batch), "k", "seq", Seq("attr"))
    assert(merged.orderBy("k", "valid_from").collect().toSeq ==
      rebuilt.orderBy("k", "valid_from").collect().toSeq)
  }

  test("temporalJoin: each probe gets the interval containing it; [from,to) at boundaries") {
    val s = spark
    import s.implicits._
    // key 1: attr a @ [1, 5), b @ [5, ∞)
    val log = Seq((1L, 1L, "a"), (1L, 5L, "b")).toDF("k", "seq", "attr")
    val dim = Scd2.fromChangeLog(log, "k", "seq", Seq("attr"))
    val probes = Seq((10L, 1L, 0L), (11L, 1L, 1L), (12L, 1L, 4L), (13L, 1L, 5L),
      (14L, 1L, 99L), (15L, 2L, 3L)).toDF("pid", "k", "pts")
    val out = Scd2.temporalJoin(probes, dim, Seq("k"), "pts", Seq("attr"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      10L -> None,       // before first interval
      11L -> Some("a"),  // boundary: interval start is inclusive
      12L -> Some("a"),
      13L -> Some("b"),  // boundary: previous interval end is exclusive
      14L -> Some("b"),  // open-ended current interval
      15L -> None))      // unknown key
  }

  test("history builds on one exchange (windows share the per-key sort)") {
    val plan = Scd2.fromChangeLog(changeLog(), "k", "seq", Seq("attr"))
      .queryExecution.executedPlan.treeString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
