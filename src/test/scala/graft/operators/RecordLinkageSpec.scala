package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  // (id, name, city, cents) — 1/2/3 are one entity (typos of "alice
  // jones"), 4/5 another ("bob smith" exact dup), 6 a singleton, and
  // 7 shares a block with 1 but must NOT match (different person).
  private def records = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alice jones", "rome", 1000L),
      (2L, "alice jnoes", "rome", 1003L), // transposition, dist 2
      (3L, "alice jones", "pisa", 1000L), // same name, moved city
      (4L, "bob smith", "oslo", 500L),
      (5L, "bob smith", "oslo", 500L),
      (6L, "carol wu", "rome", 77L),
      (7L, "alyce j0nez", "rome", 9999L)) // dist 3 from alice jones
      .toDF("id", "name", "city", "cents")
  }

  private val keys = Seq(
    // first 4 chars of name, and city — union-of-blocks recall
    substring(col("name"), 1, 4), col("city"))

  private val score =
    when(levenshtein(col("a_name"), col("b_name")) === 0, 40L)
      .when(levenshtein(col("a_name"), col("b_name")) <= 2, 25L).otherwise(0L) +
    when(col("a_city") === col("b_city"), 20L).otherwise(0L) +
    when(abs(col("a_cents") - col("b_cents")) <= 10L, 15L).otherwise(0L)

  test("candidatePairs: any-key agreement, deduped, ordered, no self pairs") {
    val pairs = RecordLinkage.candidatePairs(records, "id", keys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2): same name-prefix AND same city — exactly once (deduped)
    assert(pairs.contains((1L, 2L)))
    // (1,3): name-prefix block only (cities differ)
    assert(pairs.contains((1L, 3L)))
    // (1,6): city block only (prefix differs) — union of blocks
    assert(pairs.contains((1L, 6L)))
    // (4,6): no shared key — absent
    assert(!pairs.contains((4L, 6L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("scoredMatches applies the additive score and threshold") {
    val m = RecordLinkage.scoredMatches(records, "id", keys, score, threshold = 45L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 1~2: dist 2 (25) + city (20) + cents |3| (15) = 60
    assert(m((1L, 2L)) == 60L)
    // 1~3: dist 0 (40) + cents 0 (15) = 55 — city moved, still linked
    assert(m((1L, 3L)) == 55L)
    // 4~5: exact dup = 40 + 20 + 15 = 75
    assert(m((4L, 5L)) == 75L)
    // 1~7: dist 3 (0) + city (20) = 20 < 45 — blocked but rejected
    assert(!m.contains((1L, 7L)))
    assert(!m.contains((1L, 6L)))
  }

  test("link: transitive entities with min-id reps, singletons kept") {
    val ents = RecordLinkage.link(records, "id", keys, score, threshold = 45L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 and 3 both link to 1 (2~3 scores 25+0+15=40 < 45: transitivity
    // via components, not direct match, carries them into one entity)
    assert(ents(1L) == 1L && ents(2L) == 1L && ents(3L) == 1L)
    assert(ents(4L) == 4L && ents(5L) == 4L)
    // singletons are their own entity
    assert(ents(6L) == 6L && ents(7L) == 7L)
    assert(ents.size == 7)
  }

  test("candidatePairs: NULL blocking keys block nothing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("x")))
      .toDF("id", "k")
    val pairs = RecordLinkage.candidatePairs(df, "id", Seq(col("k"))).collect()
    assert(pairs.isEmpty)
  }

  test("soundexKey: classic codes, phonetic invariance, digit/punct transparency") {
    val s = spark
    import s.implicits._
    val names = Seq("GERMANY", "Robert", "Jackson", "GERMANI", "GERMANY-37",
      "germany", "UNITED KINGDOM", "UNYTED KYNGDOM", "X", "")
    val out = names.toDF("name")
      .select(col("name"), RecordLinkage.soundexKey("name").as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("GERMANY") == "G655") // classic census code
    assert(out("Robert") == "R163")
    assert(out("Jackson") == "J250") // CKS collapse -> one 2
    // phonetic invariance: Y/I swap and digit suffixes land in one block
    assert(out("GERMANI") == "G655" && out("GERMANY-37") == "G655"
      && out("germany") == "G655")
    assert(out("UNITED KINGDOM") == out("UNYTED KYNGDOM"))
    // degenerate inputs stay well-defined
    assert(out("X") == "X000" && out("") == "0000")
  }
}
