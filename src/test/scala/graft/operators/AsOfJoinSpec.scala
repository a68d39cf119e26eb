package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // left: (id, key, ts)   right: (rid, key, ts)
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "c", 7L))
      .toDF("id", "key", "ts")
    val right = Seq((100L, "a", 5L), (101L, "a", 10L), (102L, "a", 15L), (103L, "b", 9L))
      .toDF("rid", "key", "ts")
    (left, right)
  }

  test("asofWithin nulls matches older than the tolerance, keeps fresh ones") {
    val (left, right) = fixture
    val out = AsOfJoin.asofWithin(left, right, Seq("key"), "ts", "ts", Seq("ts", "rid"),
        tolerance = lit(5L))
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(
      1L -> Some(101L), // match at ts=10, left ts=10: age 0 <= 5
      2L -> Some(102L), // match at 15, left 20: age 5 <= 5 (inclusive bound)
      3L -> None,
      4L -> None))
  }

  test("asofWithin with a tight tolerance drops the stale match") {
    val (left, right) = fixture
    val out = AsOfJoin.asofWithin(left, right, Seq("key"), "ts", "ts", Seq("ts", "rid"),
        tolerance = lit(4L))
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2L).isEmpty, "age-5 match must be nulled under tolerance 4")
    assert(out(1L).contains(101L))
  }

  test("asof inclusive: latest right row at-or-before each left ts; no match -> null") {
    val (left, right) = fixture
    val out = AsOfJoin.asof(left, right, Seq("key"), "ts", "ts", Seq("rid"))
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(
      1L -> Some(101L), // tie at ts=10 matches (inclusive)
      2L -> Some(102L), // latest of 5/10/15
      3L -> None,       // only right row for b is later
      4L -> None))      // key with no right rows at all
  }

  test("asof exclusive: a right row at exactly left ts does not match") {
    val (left, right) = fixture
    val out = AsOfJoin.asof(left, right, Seq("key"), "ts", "ts", Seq("rid"), inclusive = false)
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(100L)) // ts=10 row excluded, falls back to ts=5
    assert(out(2L) == Some(102L))
  }

  test("asof: deterministic winner among right rows tied on (key, ts)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a", 10L)).toDF("id", "key", "ts")
    val right = Seq((7L, "a", 10L), (9L, "a", 10L), (8L, "a", 10L)).toDF("rid", "key", "ts")
    val out = AsOfJoin.asof(left, right, Seq("key"), "ts", "ts", Seq("rid"))
      .select("asof_rid").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(9L)) // greatest payload tuple wins the tie
  }

  test("asof matches the theta-join + argmax oracle on real events") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click").select(
      col("event_id").as("cid"), col("user_id").as("cuser"), col("ts").as("cts"))
    val viaAsof = AsOfJoin.asof(p, c.withColumnRenamed("cuser", "user_id"),
        Seq("user_id"), "ts", "cts", Seq("cid"))
      .select("event_id", "asof_cid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val viaTheta = p.join(c, p("user_id") === c("cuser") && c("cts") <= p("ts"), "left")
      .groupBy(p("event_id")).agg(max_by(col("cid"), col("cts")).as("cid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaAsof == viaTheta)
  }

  test("null right timestamps never match; null left ts keeps the row with no match") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a", Some(10L)), (2L, "a", None)).toDF("id", "key", "ts")
    val right = Seq((100L, "a", None: Option[Long]), (101L, "a", Some(4L))).toDF("rid", "key", "ts")
    val out = AsOfJoin.asof(left, right, Seq("key"), "ts", "ts", Seq("rid"))
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(101L), 2L -> None))
  }

  test("asofNearest: closer side wins, equidistant prefers backward, tied-ts tiebreaks") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "a", 100L), // rights at 98 and 101 -> forward (dist 1 < 2)
      (2L, "a", 200L), // rights at 199 and 201 -> equidistant, backward wins
      (3L, "a", 310L), // only a backward right (301)
      (4L, "a", 40L),  // only forward rights, two tied at 45 -> least rid
      (5L, "b", 10L))  // no rights for key b -> null
      .toDF("id", "key", "ts")
    val right = Seq(
      (900L, "a", 98L), (901L, "a", 101L),
      (902L, "a", 199L), (903L, "a", 201L),
      (904L, "a", 301L),
      (905L, "a", 45L), (906L, "a", 45L))
      .toDF("rid", "key", "ts")
    val out = AsOfJoin.asofNearest(left, right, Seq("key"), "ts", "ts", Seq("ts", "rid"))
      .select("id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(
      1L -> Some(901L), 2L -> Some(902L), 3L -> Some(904L),
      4L -> Some(905L), // forward tie at ts 45: least payload wins
      5L -> None))
  }

  test("asofNearest: a right row at the left ts is a distance-zero backward match") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", 50L)).toDF("id", "key", "ts")
    val right = Seq((70L, "k", 50L), (71L, "k", 49L), (72L, "k", 51L)).toDF("rid", "key", "ts")
    val out = AsOfJoin.asofNearest(left, right, Seq("key"), "ts", "ts", Seq("ts", "rid"))
      .select("id", "asof_rid").collect()
    assert(out.head.getLong(1) == 70L)
  }
}
