package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {

  /** O(n²) pairwise Mann-Whitney oracle: doubled U (a won pair counts
    * 2, a tied pair 1), floor-divided to basis points — the literal
    * definition aucExact's grouped one-pass formulation must equal.
    */
  private def pairwiseAucBp(rows: Seq[(Boolean, Long)]): Option[Long] = {
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val num2 = (for { p <- pos; q <- neg }
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      Some(num2 * 10000L / (2L * pos.size * neg.size))
    }
  }

  private def aucBp(rows: Seq[(Boolean, Long)]): Option[Long] = {
    val s = spark
    import s.implicits._
    val r = Evaluation.aucExact(rows.toDF("label", "score"), col("label"), col("score"))
      .select(col("auc_bp")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("aucExact equals the O(n²) pairwise Mann-Whitney U, tie-heavy input") {
    val rnd = new scala.util.Random(42)
    // scores drawn from just 6 values: ties dominate, exercising the
    // ½-per-tied-pair convention
    val rows = Seq.fill(300)((rnd.nextBoolean(), rnd.nextInt(6).toLong))
    assert(aucBp(rows) == pairwiseAucBp(rows))
  }

  test("aucExact: perfect separation is 10000 bp, perfect inversion 0, all-tied 5000") {
    val perfect = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L))
    val inverted = perfect.map { case (l, sc) => (!l, sc) }
    val tied = Seq((true, 7L), (false, 7L), (true, 7L), (false, 7L))
    assert(aucBp(perfect).contains(10000L))
    assert(aucBp(inverted).contains(0L))
    assert(aucBp(tied).contains(5000L))
    Seq(perfect, inverted, tied).foreach(r => assert(aucBp(r) == pairwiseAucBp(r)))
  }

  test("aucExact: single-class input yields NULL auc (denominator 0), not a crash") {
    assert(aucBp(Seq((true, 1L), (true, 2L))).isEmpty)
    assert(aucBp(Seq((false, 1L), (false, 2L))).isEmpty)
  }

  test("aucExact accepts 0/1 integral labels and excludes NULL labels") {
    val s = spark
    import s.implicits._
    val withNull = Seq(
      (Some(1), 3L), (Some(1), 4L), (Some(0), 1L), (Some(0), 2L),
      (None, 100L)) // a NULL label must not count as a negative
      .toDF("label", "score")
    val r = Evaluation.aucExact(withNull, col("label"), col("score"))
      .select("n_pos", "n_neg", "auc_bp").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 10000L)
  }

  test("classificationReport matches hand-computed contingency counts") {
    val s = spark
    import s.implicits._
    // truth:  a a a b b c    (c never predicted; d predicted, never true)
    // pred:   a b a b a d
    val df = Seq(("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a"), ("c", "d"))
      .toDF("truth", "pred")
    val got = Evaluation.classificationReport(df, col("truth"), col("pred"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
          (Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // label -> ((tp, fp, fn), (precision_bp, recall_bp, f1_bp))
    assert(got("a")._1 == ((2L, 1L, 1L)))
    assert(got("a")._2 == ((Some(6666L), Some(6666L), Some(6666L))))
    assert(got("b")._1 == ((1L, 1L, 1L)))
    assert(got("b")._2 == ((Some(5000L), Some(5000L), Some(5000L))))
    assert(got("c")._1 == ((0L, 0L, 1L)))
    assert(got("c")._2 == ((None, Some(0L), Some(0L)))) // never predicted: precision undefined
    assert(got("d")._1 == ((0L, 1L, 0L)))
    assert(got("d")._2 == ((Some(0L), None, Some(0L)))) // never true: recall undefined
  }

  test("classificationReport folds NULL-labeled rows into one consistent row") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some("a"), Some("a")), (Some("a"), None), (None, None), (None, Some("a")))
      .toDF("truth", "pred")
    val rows = Evaluation.classificationReport(df, col("truth"), col("pred")).collect()
    assert(rows.length == 2, s"one row per class incl. NULL, got ${rows.toSeq}")
    val byLabel = rows.map(r => Option(r.getString(0)) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // null<=>null is a diagonal hit: tp=1; one null truth predicted a
    // (fn), one a-truth predicted null (fp)
    assert(byLabel(None) == ((1L, 1L, 1L)))
    assert(byLabel(Some("a")) == ((1L, 1L, 1L)))
  }
}
