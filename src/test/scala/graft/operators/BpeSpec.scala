package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  /** Independent in-memory BPE reference: same contract (weighted
    * pair counts over distinct words, ties to lexicographically
    * smallest pair, greedy leftmost apply) implemented with plain
    * collections — the distributed trainer must reproduce it merge
    * for merge.
    */
  private def referenceBpe(words: Map[String, Long], iters: Int): Seq[(Int, String, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, n) => n }(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to iters) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((s, n) <- syms; j <- 0 until s.length - 1)
        counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((i, l, r, n))
        syms = syms.groupMapReduce { case (s, _) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == l && s(j + 1) == r) { b += (l + r); j += 2 }
            else { b += s(j); j += 1 }
          }
          b.result()
        } { case (_, n) => n }(_ + _)
      }
    }
    out.result()
  }

  test("train matches the in-memory reference merge-for-merge (incl. greedy overlap)") {
    val s = spark
    import s.implicits._
    // 'aaab' stresses greedy leftmost ("aa" merges once in "aaa");
    // repeated docs stress the weighting
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "aaab aaab aaab banana low newest",
      "the the the the bane bane").map(Tuple1(_)).toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = referenceBpe(words, 10)
    val got = Bpe.train(docs, iters = 10)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("batched training is byte-identical to one-merge-at-a-time, deep into the vocab") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "aaab aaab aaab banana low newest",
      "the the the the bane bane",
      "lowest newer wider widest bananas").map(Tuple1(_)).toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.length.toLong).toMap
    // 40 merges exhausts most of this tiny corpus — batches must stay
    // exact through conflicts, ties, and the exhaustion tail.
    // driverVocabBound = 0 forces the DISTRIBUTED loop: this test
    // exists to prove the batching machinery, not the driver lane
    val expected = referenceBpe(words, 40)
    val sequential = Bpe.train(docs, iters = 40, maxBatch = 1, driverVocabBound = 0)
    val batched = Bpe.train(docs, iters = 40, maxBatch = 32, driverVocabBound = 0)
    // threshold 2 forces the bound-cut path onto the small disjoint
    // prefixes this char-level fixture produces — the provable-exact
    // batching logic must hold there too, not just at the default
    val aggressive = Bpe.train(docs, iters = 40, maxBatch = 32, batchThreshold = 2,
      driverVocabBound = 0)
    assert(sequential == expected)
    assert(batched == expected, s"\ngot:      $batched\nexpected: $expected")
    assert(aggressive == expected, s"\ngot:      $aggressive\nexpected: $expected")
  }

  test("batched training stays exact under product-symbol collisions (randomized tiny-alphabet corpora)") {
    val s = spark
    import s.implicits._
    // alphabet {a,b,c} makes product collisions routine: 'a'+'bc' and
    // 'ab'+'c' both concatenate to 'abc', so a created pair can land
    // on a pre-existing count — the hole the pre-existing bound and
    // the used-concat rule close. Randomized corpora, aggressive
    // batching, checked merge-for-merge against the in-memory
    // reference.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val words = Seq.fill(14)(
        (1 to (2 + rnd.nextInt(5))).map(_ => "abc"(rnd.nextInt(3))).mkString)
      val docs = Seq(words.mkString(" ")).map(Tuple1(_)).toDF("text")
      val wordMap = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val expected = referenceBpe(wordMap, 12)
      val batched = Bpe.train(docs, iters = 12, maxBatch = 32, batchThreshold = 2,
        driverVocabBound = 0)
      assert(batched == expected, s"trial $trial words=$words\ngot: $batched\nexp: $expected")
    }
  }

  test("driver fast lane is exact: 500-merge train matches the reference, and both lanes agree") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
      .limit(120).select("text")
    val words = graft.operators.Bpe.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deep vocabulary: the in-memory delta loop must stay exact far
    // past where the spec's distributed trains stop — this is the
    // 32k-merge production shape scaled to the fixture
    val expected = referenceBpe(words, 500)
    val driver = Bpe.train(docs, iters = 500)
    assert(driver == expected)
    // lane agreement on a prefix both can afford
    val dist = Bpe.train(docs, iters = 6, driverVocabBound = 0)
    assert(dist == expected.take(6))
  }

  test("segment replays merges greedily: leftmost-first on overlapping pairs") {
    val s = spark
    import s.implicits._
    val words = Seq(("aaa", 1L), ("aab", 1L)).toDF("word", "n")
    val segmented = Bpe.segment(words, Seq((1, "a", "a", 2L)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segmented("aaa") == Seq("aa", "a")) // NOT a,aa
    assert(segmented("aab") == Seq("aa", "b"))
  }

  test("pairCounts weights pairs by word frequency") {
    val s = spark
    import s.implicits._
    val words = Seq(("ab", 5L), ("abc", 2L)).toDF("word", "n")
    val counts = Bpe.pairCounts(Bpe.toSymbols(words))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(("a", "b") -> 7L, ("b", "c") -> 2L))
  }
}
