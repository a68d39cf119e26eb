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

  test("aucExactBy: each group's AUC equals the global operator run on that group alone") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((Seq("a", "b", "c")(rnd.nextInt(3)),
      rnd.nextBoolean(), rnd.nextInt(8).toLong))
    val df = rows.toDF("grp", "label", "score")
    val byGroup = Evaluation.aucExactBy(df, col("grp"), col("label"), col("score"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    Seq("a", "b", "c").foreach { g =>
      val sub = rows.filter(_._1 == g).map(t => (t._2, t._3))
      assert(byGroup(g) == pairwiseAucBp(sub), s"group $g")
    }
    // a single-class group must yield NULL, not poison the others
    val withDegenerate = (rows ++ Seq.fill(5)(("d", true, 3L))).toDF("grp", "label", "score")
    val d = Evaluation.aucExactBy(withDegenerate, col("grp"), col("label"), col("score"))
      .filter(col("grp") === "d").head()
    assert(d.isNullAt(5))
  }

  test("calibration: grouped-distribution binning, all rows of one score share a bin") {
    val s = spark
    import s.implicits._
    // scores 0..9 once each, label = score >= 5, 10 bins: one score
    // per bin, pos rate 0 or 10000
    val clean = (0L to 9L).map(sc => (sc >= 5L, sc)).toDF("label", "score")
    val bins = Evaluation.calibration(clean, col("label"), col("score"), nBins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(bins.keySet == (0L to 9L).toSet)
    (0L to 9L).foreach { b =>
      assert(bins(b) == ((1L, if (b >= 5) 1L else 0L, if (b >= 5) 10000L else 0L, b, b)))
    }
    // ties: {1,1,1,2} with 2 bins -> score 1 wholly in bin 0 (3 rows),
    // score 2 in bin 1 (rows_below=3, 3*2/4=1)
    val tied = Seq((false, 1L), (true, 1L), (false, 1L), (true, 2L)).toDF("label", "score")
    val tb = Evaluation.calibration(tied, col("label"), col("score"), nBins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(tb(0L) == ((3L, 1L, 3333L)))
    assert(tb(1L) == ((1L, 1L, 10000L)))
    // degenerate: every row the same score -> one bin holding everything
    val const = Seq((true, 7L), (false, 7L)).toDF("label", "score")
    val cb = Evaluation.calibration(const, col("label"), col("score"), nBins = 10).collect()
    assert(cb.length == 1 && cb(0).getLong(0) == 0L && cb(0).getLong(1) == 2L)
  }

  test("calibrationBy: each group's bands equal the global operator run on that group alone") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((Seq("x", "y")(rnd.nextInt(2)),
      rnd.nextBoolean(), rnd.nextInt(12).toLong))
    val df = rows.toDF("grp", "label", "score")
    val by = Evaluation.calibrationBy(df, col("grp"), col("label"), col("score"), nBins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    Seq("x", "y").foreach { g =>
      val solo = Evaluation.calibration(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("label", "score"),
        col("label"), col("score"), nBins = 4)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      solo.foreach { case (bin, v) => assert(by((g, bin)) == v, s"group $g bin $bin") }
      assert(by.keys.count(_._1 == g) == solo.size)
    }
  }

  test("precisionThreshold: smallest qualifying cutoff on a non-monotone curve; NULL row when unreachable") {
    val s = spark
    import s.implicits._
    // score 4: 1 pos / 1 neg  -> prec@4 = 5000
    // score 3: 3 pos          -> prec@3 = 4/5 = 8000
    // score 2: 1 neg          -> prec@2 = 4/6 = 6666
    // score 1: 2 pos          -> prec@1 = 6/8 = 7500   (non-monotone)
    val rows = Seq((true, 4L), (false, 4L), (true, 3L), (true, 3L), (true, 3L),
      (false, 2L), (true, 1L), (true, 1L))
    val df = rows.toDF("label", "score")
    val r = Evaluation.precisionThreshold(df, col("label"), col("score"), 7000L).head()
    // smallest t with prec >= 7000 is t=1 (7500), NOT t=3 (8000)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 6L, 2L, 7500L, 8L)))
    val r8 = Evaluation.precisionThreshold(df, col("label"), col("score"), 7600L).head()
    assert(r8.getLong(0) == 3L && r8.getLong(3) == 8000L)
    // unreachable target: one all-NULL row, not an empty result
    val none = Evaluation.precisionThreshold(df, col("label"), col("score"), 9999L)
    assert(none.count() == 1 && none.head().isNullAt(0))
  }

  test("global variants raise loudly past maxDistinctScores; *By forms stay partitioned") {
    val s = spark
    import s.implicits._
    // 200 distinct scores vs a cap of 100: the guard rides the window
    // sort and must fail at EXECUTION, not silently serialize
    val wide = (1L to 200L).map(i => (i % 2 == 0, i)).toDF("label", "score")
    def mustRaise(df: org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception] { df.collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m => m.contains("distinct score")),
        s"expected the distinct-score guard, got: ${e.getMessage}")
    }
    mustRaise(Evaluation.aucExact(wide, col("label"), col("score"), maxDistinctScores = 100))
    mustRaise(Evaluation.calibration(wide, col("label"), col("score"),
      nBins = 10, maxDistinctScores = 100))
    mustRaise(Evaluation.precisionThreshold(wide, col("label"), col("score"),
      targetBp = 5000, maxDistinctScores = 100))
    // under the cap: results unchanged by the guard's zero addend
    val auc = Evaluation.aucExact(wide, col("label"), col("score"), maxDistinctScores = 200)
      .head().getAs[Long]("auc_bp")
    val aucDefault = Evaluation.aucExact(wide, col("label"), col("score"))
      .head().getAs[Long]("auc_bp")
    assert(auc == aucDefault)
    // the partitioned form has no global window to guard: same data
    // through aucExactBy succeeds regardless of the global cap
    val byOk = Evaluation.aucExactBy(wide.withColumn("g", col("score") % 4),
      col("g"), col("label"), col("score")).collect()
    assert(byOk.length == 4)
  }

  test("cohensKappa matches hand-computed values incl. perfect, chance, and negative agreement") {
    val s = spark
    import s.implicits._
    def kappa(rows: Seq[(String, String)]): (Long, Long, Option[Long]) = {
      val r = Evaluation.cohensKappa(rows.toDF("t", "p"), col("t"), col("p")).head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    // perfect agreement: kappa = 1
    assert(kappa(Seq(("a", "a"), ("b", "b"), ("a", "a"))) == ((3L, 3L, Some(10000L))))
    // classic textbook 2x2: po=0.7, pe=0.5, kappa=0.4 -> truncated 3999
    // n=20: diag a:6, b:8; off-diag (a,b):2, (b,a):4
    // marginals: t_a=8,t_b=12; p_a=10,p_b=10; sum_exp=80+120=200
    // kappa = (20*14-200)/(400-200) = 80/200 = 0.4 exactly -> 4000
    val classic = Seq.fill(6)(("a", "a")) ++ Seq.fill(8)(("b", "b")) ++
      Seq.fill(2)(("a", "b")) ++ Seq.fill(4)(("b", "a"))
    assert(kappa(classic) == ((20L, 14L, Some(4000L))))
    // worse than chance: balanced total disagreement, kappa = -1
    assert(kappa(Seq(("a", "b"), ("b", "a"))) == ((2L, 0L, Some(-10000L))))
    // fractional negative: truncation toward zero, not floor
    // cells (a,b):2,(b,a):1,(b,b):1 -> n=4, agree=1
    // marginals t: a=2,b=2; p: a=1,b=3 -> sum_exp=2*1+2*3=8
    // kappa = (4*1-8)/(16-8) = -4/8 = -0.5 -> -5000 exact
    assert(kappa(Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "b"))) == ((4L, 1L, Some(-5000L))))
    // degenerate one-cell table: denominator 0 -> NULL
    assert(kappa(Seq(("a", "a"), ("a", "a"))) == ((2L, 2L, None)))
  }

  /** Literal-definition AP oracle: walk distinct scores descending,
    * each block contributes pos_s · ⌊10¹²·tp/cum⌋, summed in BigInt —
    * the per-block quantization contract averagePrecision documents.
    */
  private def blockApBp(rows: Seq[(Boolean, Long)]): Option[Long] = {
    val pos = rows.count(_._1).toLong
    val neg = rows.size - pos
    if (pos == 0 || neg == 0) None
    else {
      val blocks = rows.groupBy(_._2).toSeq.sortBy(-_._1)
      var tp = 0L; var cum = 0L; var num = BigInt(0)
      for ((_, rs) <- blocks) {
        val p = rs.count(_._1).toLong
        tp += p; cum += rs.size
        num += BigInt(p) * (BigInt(tp) * BigInt("1000000000000") / BigInt(cum))
      }
      Some((num * 10000 / (BigInt(pos) * BigInt("1000000000000"))).toLong)
    }
  }

  private def apBp(rows: Seq[(Boolean, Long)]): Option[Long] = {
    val s = spark
    import s.implicits._
    val r = Evaluation.averagePrecision(
      rows.toDF("label", "score"), col("label"), col("score"))
      .select(col("ap_bp")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("averagePrecision equals the literal block-walk definition, tie-heavy input") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((rnd.nextInt(4) == 0, rnd.nextInt(8).toLong))
    assert(apBp(rows) == blockApBp(rows))
  }

  test("averagePrecision: perfect separation 10000 bp, random-on-imbalance ≈ prevalence") {
    val perfect = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L))
    assert(apBp(perfect).contains(10000L))
    // a constant score collapses to one block: AP = prevalence P/n
    val flat = Seq.fill(3)((true, 5L)) ++ Seq.fill(9)((false, 5L))
    assert(apBp(flat).contains(2500L))
    assert(apBp(flat) == blockApBp(flat))
    // single-class inputs yield NULL, not a crash
    assert(apBp(Seq((true, 1L), (true, 2L))).isEmpty)
    assert(apBp(Seq((false, 1L))).isEmpty)
  }

  test("averagePrecisionBy matches the global form run per group") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((s"g${rnd.nextInt(3)}", rnd.nextBoolean(), rnd.nextInt(6).toLong))
    val got = Evaluation.averagePrecisionBy(
      rows.toDF("g", "label", "score"), col("g"), col("label"), col("score"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sub = rows.filter(_._1 == g).map(r => (r._2, r._3))
      assert(got(g)._3 == blockApBp(sub), s"group $g")
      assert(got(g)._1 == sub.count(_._1).toLong)
    }
  }

  test("rougeN: hand-computed multiset bigram overlap") {
    val s = spark
    import s.implicits._
    // a: bigrams {xy, yx, xy} (x y x y); b: {xy, yz} (x y z)
    // overlap = min(2,1)[xy] = 1; |A|=3 |B|=2
    // p = 1/3 → 3333, r = 1/2 → 5000, f1 = 2/5 → 4000
    val docs = Seq((1L, "x y x y"), (2L, "x y z"), (3L, "q q q")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Evaluation.rougeN(docs, "id", "text", pairs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out((1L, 2L)) == ((1L, 3L, 2L, 3333L, 5000L, 4000L)))
    // disjoint pair: zero overlap still reported (left join), all zeros
    assert(out((1L, 3L)) == ((0L, 3L, 2L, 0L, 0L, 0L)))
    // identical docs: full marks
    val self = Evaluation.rougeN(docs, "id", "text",
      Seq((1L, 1L)).toDF("doc_a", "doc_b"), n = 2).head()
    assert(self.getLong(5) == 10000L && self.getLong(6) == 10000L && self.getLong(7) == 10000L)
  }

  test("rougeN: docs shorter than n drop from the pair list, not divide by zero") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "only"), (2L, "two words")).toDF("id", "text")
    val out = Evaluation.rougeN(docs, "id", "text",
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), n = 2).collect()
    assert(out.isEmpty) // doc 1 has no bigram: pair drops
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
