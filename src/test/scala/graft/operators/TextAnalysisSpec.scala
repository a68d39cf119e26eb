package graft.operators

import graft.SparkSpec
import graft.functions.GraftHash
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace and BPE-ish") {
    val df = docsDf(Seq(1L -> "the cat sat", 2L -> "hello, world 42!"))
    val out = TextAnalysis.withTokenCounts(df)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ((3, 3)))
    // "hello, world 42!" -> hello | , | world | 42 | !  = 5 BPE-ish tokens
    assert(out(2L) == ((3, 5)))
  }

  test("gopher rules: each gate trips on its own violation") {
    val good = ("the data " * 30).trim            // 60 words, stopwords, mean len ok
    val tooShort = "the data pipeline"            // trips word count
    val longWords = Array.fill(60)("abcdefghijklmnop").mkString(" ") // mean len > 10
    val noStops = Array.fill(60)("data").mkString(" ")               // 0 stopword hits
    val df = docsDf(Seq(1L -> good, 2L -> tooShort, 3L -> longWords, 4L -> noStops))
    val out = TextAnalysis.gopherRules(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("rule_word_count"), r.getAs[Boolean]("rule_mean_word_len"),
          r.getAs[Boolean]("rule_alpha_words"), r.getAs[Boolean]("rule_stopwords"),
          r.getAs[Boolean]("gopher_pass")))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(out(2L)._1 == false && out(2L)._5 == false)
    assert(out(3L)._2 == false && out(3L)._5 == false)
    assert(out(4L)._4 == false && out(4L)._5 == false)
  }

  test("quality metrics: ratios in range, stopword-rich text scores higher") {
    val df = docsDf(Seq(
      1L -> "the of and to in is that it was for",
      2L -> "zx qv wk jm pl nt rs bg df hc"))
    val out = TextAnalysis.withQuality(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality_score"))).toMap
    assert(out(1L) > out(2L))
    assert(out.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("language id votes by stopwords, deterministic, und when no hits") {
    val df = docsDf(Seq(
      1L -> "the cat is in the house and it was for sale",
      2L -> "le chat est dans la maison et les oiseaux pour pas",
      3L -> "der hund ist nicht mit der katze und das haus",
      4L -> "zzz qqq www"))
    val out = TextAnalysis.withLangId(df)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(out(1L) == "en" && out(2L) == "fr" && out(3L) == "de" && out(4L) == "und")
  }

  test("fingerprint: normalization collapses case/whitespace; FNV vector stable") {
    val df = docsDf(Seq(1L -> "Hello  World", 2L -> "hello world", 3L -> "other"))
    val fps = TextAnalysis.withFingerprint(df)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("fingerprint"))).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    // documented FNV-1a-with-base-31 kernel is locked to a known value
    assert(fps(2L) == GraftHash.fnv1a64("hello world".getBytes("UTF-8")))
  }

  test("simhash kernel: identical token arrays hash identically, codegen == interpreted") {
    val df = docsDf(Seq(1L -> "a b c d e f", 2L -> "a b c d e f"))
    val sigs = df.select(graft.functions.HashFunctions.simhash64(split(col("text"), " ")))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    val toks = "a b c d e f".split(" ").iterator.map(_.getBytes("UTF-8"))
    assert(sigs(0) == GraftHash.simhash64(toks))
  }

  test("chunk: short doc = one chunk; boundaries and overlap are exact") {
    val words = (1 to 95).map(i => s"w$i")
    val df = docsDf(Seq(1L -> "a b c", 2L -> words.mkString(" ")))
    val out = TextAnalysis.chunk(df, chunkTokens = 50, stride = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3))).toMap
    assert(out((1L, 0)) == ("a b c", 3L))
    // 95 tokens -> chunks at 1..50, 41..90, 81..95
    assert(out((2L, 0))._1 == words.slice(0, 50).mkString(" "))
    assert(out((2L, 1))._1 == words.slice(40, 90).mkString(" "))
    assert(out((2L, 2)) == (words.slice(80, 95).mkString(" "), 15L))
    assert(!out.contains((2L, 3)))
  }

  test("chunk: exact-multiple lengths do not produce an empty tail chunk") {
    val words = (1 to 90).map(i => s"w$i") // 50 + stride 40 exactly
    val out = TextAnalysis.chunk(docsDf(Seq(1L -> words.mkString(" "))), chunkTokens = 50, stride = 40)
      .collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(out.toSet == Set((0, 50L), (1, 50L)))
  }

  test("redact: scrubs email/phone/ip in order and counts pre-redaction matches") {
    val df = docsDf(Seq(
      1L -> "mail a.b+c@ex-ample.org then call +1-555-123-4567 at 192.168.0.1 twice x@y.io",
      2L -> "clean text with no pii at all"))
    val out = TextAnalysis.redact(df)
      .select("doc_id", "redacted", "n_email", "n_phone", "n_ipv4")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail [EMAIL] then call [PHONE] at [IPV4] twice [EMAIL]", 2L, 1L, 1L)))
    assert(out(2L) == (("clean text with no pii at all", 0L, 0L, 0L)))
  }

  test("postings: vocab-restricted, sorted doc lists, df matches list size") {
    val docs = docsDf(Seq(3L -> "a b a", 1L -> "b c", 2L -> "a d"))
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "b").toDF("term")
    val out = TextAnalysis.postings(docs, vocab)
      .collect().map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(out("a") == ((Seq(2L, 3L), 2L)))
    assert(out("b") == ((Seq(1L, 3L), 2L)))
    assert(!out.contains("c") && !out.contains("d"))
  }

  test("skipgrams: window-2 ordered pairs with exact counts") {
    val docs = docsDf(Seq(1L -> "x y z x"))
    val out = TextAnalysis.skipgrams(docs, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: x->y, x->z, y->z, y->x, z->x
    assert(out == Map(("x", "y") -> 1L, ("x", "z") -> 1L,
      ("y", "z") -> 1L, ("y", "x") -> 1L, ("z", "x") -> 1L))
  }

  test("perplexityBuckets: hand-computed bigram surprisal and tercile labels") {
    // reference: "c"×100 then t1..t100 → uni c=100, ti=1, V=101;
    // bigrams (c,c)×99, (c,t1)×1, (ti,ti+1)×1
    val ref = docsDf(Seq(
      0L -> (Seq.fill(100)("c") ++ (1 to 100).map(i => s"t$i")).mkString(" ")))
    val tgt = docsDf(Seq(
      1L -> "c c",   // (100+101) DIV (99+1) = 2   -> bucket 0
      2L -> "c q",   // (100+101) DIV 1     = 201 -> bucket 2
      3L -> "q q",   // (0+101)   DIV 1     = 101 -> bucket 2
      4L -> "t1 t2", // (1+101)   DIV (1+1) = 51  -> bucket 1
      5L -> "solo")) // no bigram: scores 0, sits in the head
    val out = TextAnalysis.perplexityBuckets(tgt, ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 0L, "head")))
    assert(out(2L) == ((1L, 20000L, "middle")))
    assert(out(3L) == ((1L, 20000L, "middle")))
    assert(out(4L) == ((1L, 10000L, "middle")))
    assert(out(5L) == ((0L, 0L, "head")))
  }

  test("perplexityBuckets: corpus split is exhaustive and head holds at least a third") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    val out = TextAnalysis.perplexityBuckets(docs, docs.filter(col("doc_id") % 5 === 0))
    val n = docs.count()
    val byBucket = out.groupBy(col("ppl_bucket")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket.values.sum == n)
    // inclusive cutoffs guarantee the head reaches the tercile mark
    assert(byBucket.getOrElse("head", 0L) * 3 >= n)
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
  }

  test("qualityLinear: hand-computed integer score and gate") {
    // doc1: 6 words ("the" ×2 stopword hits), word_chars=17 → mwl10=28
    //   score = 2·6 + 25·2 − |28−50| = 12 + 50 − 22 = 40 → fail
    val docs = docsDf(Seq(1L -> "the cat sat on the mat"))
    val r = TextAnalysis.qualityLinear(docs, threshold = 40L).collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(byName("n_words")) == 6L)
    assert(r.getLong(byName("stop_hits")) == 2L)
    assert(r.getLong(byName("mwl10")) == 28L)
    assert(r.getLong(byName("q_score")) == 40L)
    assert(r.getBoolean(byName("q_pass"))) // == threshold passes
    val strict = TextAnalysis.qualityLinear(docs, threshold = 41L).collect()(0)
    assert(!strict.getBoolean(byName("q_pass")))
  }

  test("bm25: hand-computed fixed-point contributions, rank and tie order") {
    // N=3 docs, T=9 tokens, query {a}: df(a)=2
    // doc1 (tf=2, dl=3): (2N-2df+1)·11·tf·4T·1e9 / ((2df+1)·(20·tf·T+6T+18·dl·N))
    //   = 3·22·36e9 / (5·(360+54+162)) = 2376e9/2880 = 825_000_000
    // doc2 (tf=1, dl=2): 3·11·36e9 / (5·(180+54+108)) = 1188e9/1710
    //   = 694_736_842.105 → floor 694_736_842
    // doc3: no query term → absent
    val docs = docsDf(Seq(1L -> "a a b", 2L -> "a c", 3L -> "c c c c"))
    val out = TextAnalysis.bm25(docs, Seq("a"), topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(3))).toMap
    assert(out == Map(1L -> (825000000L, 1), 2L -> (694736842L, 2)))
  }

  test("bm25: length normalization — same tf, longer doc scores lower") {
    val docs = docsDf(Seq(
      1L -> "a a b",
      2L -> "a a b b b b b b b b b b",
      3L -> "c c"))
    val out = TextAnalysis.bm25(docs, Seq("a"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(2L))
    assert(!out.contains(3L))
  }

  test("phraseSearch: position arithmetic, overlaps, repeated terms, misses") {
    val df = docsDf(Seq(
      1L -> "a b c a b c",    // "a b c" at 1 and 4
      2L -> "a a a a",        // "a a" overlapping at 1,2,3
      3L -> "a c b",          // terms present, order wrong
      4L -> "b c"))           // first term missing
    def search(ph: String*) = TextAnalysis.phraseSearch(df, ph)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(search("a", "b", "c") == Map(1L -> ((2L, 1L))))
    assert(search("a", "a") == Map(2L -> ((3L, 1L))))
    assert(search("c", "a") == Map(1L -> ((1L, 3L))))
    assert(search("z", "b").isEmpty)
    // single-term phrase degenerates to term occurrence counting
    assert(search("b") == Map(1L -> ((2L, 2L)), 3L -> ((1L, 3L)), 4L -> ((1L, 1L))))
  }

  test("encodingQuality: replacement chars, control chars, ascii share, gate") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "clean ascii text"),                  // all fine
      (2L, "caf� broken dec�de"),      // 2 replacement chars → fail
      (3L, "bin\u0001ary\u0007junk"),     // 2 control chars in 12 (>0.1%) -> fail
      (4L, "tabs\tand\nnewlines\rok"),           // whitespace controls are allowed
      (5L, "全部中文字符"),                        // 0% ascii — reported, NOT gated
      (6L, ""))                                   // empty: NULL ratio, passes
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingQuality(docs)
      .select("doc_id", "n_replacement", "n_control", "ascii_ratio_bp", "enc_pass")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))).toMap
    assert(out(1L) == ((0L, 0L, Some(10000L), true)))
    assert(out(2L) == ((2L, 0L, Some(8888L), false))) // 16/18 ascii
    assert(out(3L)._2 == 2L && !out(3L)._4)
    assert(out(4L) == ((0L, 0L, Some(10000L), true)))
    assert(out(5L) == ((0L, 0L, Some(0L), true)))
    assert(out(6L)._3.isEmpty && out(6L)._4)
  }
}
