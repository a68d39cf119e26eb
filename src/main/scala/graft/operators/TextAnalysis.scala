package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, all built
  * from codegen'd native functions (no UDFs): token counting,
  * quality scoring, stopword-based language ID, fingerprinting.
  *
  * Every arithmetic step is chosen to be bit-reproducible in ANSI SQL
  * (integer counts, single double divisions) so the SQL-expressible
  * ones carry DuckDB oracles.
  */
object TextAnalysis {

  /** Public, tiny per-language stopword lists (frequency-top function
    * words) for the heuristic language scorer. Alphabetical by code;
    * the tie-break order of `langId` follows this ordering.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "uno", "por", "como", "pero"),
    "fr" -> Seq("le", "les", "et", "est", "que", "pour", "dans", "avec", "sur", "pas"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  private def tokens(text: Column): Column = split(text, " ")

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  /** Whitespace + BPE-ish (letter-run / digit-run / symbol) token counts. */
  /** Canonical text normalization — the step that runs BEFORE any
    * hashing/shingling so trivially-different bytes (case, runs of
    * whitespace, control chars) can't defeat dedup. Deliberately
    * restricted to transforms with identical regex semantics across
    * engines (character classes only, no Unicode property classes):
    * strip control chars, collapse whitespace runs, trim, lowercase.
    */
  def normalized(df: DataFrame, textCol: String = "text",
      outCol: String = "text_norm"): DataFrame =
    df.withColumn(outCol,
      lower(trim(regexp_replace(
        regexp_replace(col(textCol), "[\\x00-\\x1f\\x7f]", " "),
        "[ \\t\\n\\r]+", " "))))

  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("ws_tokens", size(toks))
      .withColumn("bpe_ish_tokens", regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
  }

  /** Length / token-shape / stopword-density quality metrics plus a
    * composite score in [0,1]. Single-division doubles throughout.
    */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nChars = length(col(textCol))
    val nTokens = size(toks)
    val alphaChars = nChars - (nTokens - lit(1)) // text is space-joined; non-space chars
    val hits = stopwordHits(toks, Stopwords.toMap.apply("en"))
    df.withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("avg_token_len", alphaChars.cast("double") / nTokens)
      .withColumn("stopword_ratio", hits.cast("double") / nTokens)
      .withColumn("quality_score",
        least(lit(1.0), (nTokens.cast("double") / 100) * 0.5 + (hits.cast("double") / nTokens) * 5 * 0.5))
  }

  /** Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    * Models" §A1.1): word-count bounds, mean-word-length bounds,
    * minimum fraction of alphabetic words, minimum stopword hits.
    * Every comparison is INTEGER arithmetic (`3n ≤ chars ≤ 10n`
    * instead of a float mean) so any engine agrees bit-for-bit.
    * Pure per-row projection — no shuffle, scales linearly.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val wordChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val stopHits = stopwordHits(toks, Stopwords.toMap.apply("en")).cast("long")
    val rWc = nWords >= minWords && nWords <= maxWords
    val rMwl = wordChars >= nWords * minMeanLen && wordChars <= nWords * maxMeanLen
    val rAlpha = alphaWords * 10 >= nWords * 8
    val rStop = stopHits >= 2
    df.withColumn("n_words", nWords)
      .withColumn("word_chars", wordChars)
      .withColumn("rule_word_count", rWc)
      .withColumn("rule_mean_word_len", rMwl)
      .withColumn("rule_alpha_words", rAlpha)
      .withColumn("rule_stopwords", rStop)
      .withColumn("gopher_pass", rWc && rMwl && rAlpha && rStop)
  }

  /** Positional postings: one row per token occurrence
    * (term, doc_id, pos), pos 1-based — the index shape phrase and
    * proximity queries need, where the plain postings list (#40b)
    * only answers membership. Materialize partitioned/bucketed by
    * term for the real index; this builds the rows.
    */
  def positionalPostings(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(filter(split(col(textCol), " "), w => w =!= "")))
      .select(col("col").as("term"), col("doc_id"), (col("pos") + 1).cast("long").as("pos"))

  /** Exact phrase search over the positional postings: the k-word
    * phrase matches at position p iff term i sits at p+i for every i
    * — k−1 equi-joins on (doc, pos−i), each side pre-filtered to ONE
    * term (the filter reaches the scan; on a term-bucketed postings
    * table each leg reads one bucket). This is how a search engine
    * runs phrase queries off an inverted index — intersection by
    * position arithmetic, never re-scanning documents — and the
    * shape is cheapest when the rarest term is the first leg (the
    * standard selectivity ordering, left to the caller since term
    * df is a lookup away).
    *
    * Returns (doc_id, n_matches, first_pos) for docs containing the
    * phrase at least once.
    */
  def phraseSearch(df: DataFrame, phrase: Seq[String], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty), "phrase terms must be non-empty")
    val p = positionalPostings(df, idCol, textCol)
    val first = p.filter(col("term") === phrase.head).select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      acc.join(p.filter(col("term") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos")), Seq("doc_id", "pos"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  /** Encoding-quality gate (the C4/CCNet mojibake filter): flags
    * documents whose bytes survived a bad decode — U+FFFD
    * replacement characters (the tombstone an invalid UTF-8 sequence
    * leaves), raw control characters (binary junk injected into
    * text), and the printable-ASCII share as the coarse
    * charset-sanity signal. All counts are exact integers (the
    * replacement count via the length-difference of a literal
    * replace; the class counts via regexp matches), the ratio in
    * floor basis points — one projection, no shuffle, scan-speed at
    * any size, and bit-identical on any engine.
    *
    * `enc_pass` = zero replacement chars AND control chars ≤ 0.1% of
    * characters. The ASCII share is reported, not gated — it is
    * language-dependent (a clean Chinese document is ~0% ASCII) and
    * belongs to a per-language policy, not a universal rule.
    */
  def encodingQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nRepl = (length(t) - length(regexp_replace(t, "�", ""))).cast("long")
    val ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    val nCtrl = (length(t) - length(regexp_replace(t, ctrl, ""))).cast("long")
    val asciiOk = "[\\x20-\\x7E\\t\\n\\r]"
    val nAscii = (length(t) - length(regexp_replace(t, asciiOk, ""))).cast("long")
    df.withColumn("n_chars", nChars)
      .withColumn("n_replacement", nRepl)
      .withColumn("n_control", nCtrl)
      .withColumn("_n_ascii", nAscii)
      .withColumn("ascii_ratio_bp", expr(
        """CASE WHEN n_chars = 0 THEN CAST(NULL AS BIGINT)
          |     ELSE CAST(CAST(_n_ascii AS DECIMAL(38,0)) * 10000
          |               DIV CAST(n_chars AS DECIMAL(38,0)) AS BIGINT) END""".stripMargin))
      .drop("_n_ascii")
      .withColumn("enc_pass",
        col("n_replacement") === 0L && col("n_control") * 1000L <= col("n_chars"))
  }

  /** Fixed-weight linear quality scorer — the shape of a fastText/
    * logistic quality classifier's inference pass, with weights
    * PINNED as integers so the score (and therefore the keep/drop
    * gate) is bit-identical on any engine: no trained floats, no
    * sigmoid — the monotone score compares against an integer
    * threshold directly. Features are the Gopher-style integer
    * derivations: capped word count, mean word length ×10 (integer
    * div), English stopword hits.
    *
    *   score = 2·min(n_words, 100) + 25·stop_hits − |mwl10 − 50|
    *   where mwl10 = word_chars·10 div n_words
    *
    * One projection, no shuffle, fully codegen'd — at 100 TB this
    * runs at scan speed.
    */
  def qualityLinear(df: DataFrame, textCol: String = "text",
      threshold: Long = 220L): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val wordChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val stopHits = stopwordHits(toks, Stopwords.toMap.apply("en")).cast("long")
    val wc10 = when(nWords > 0, expr("word_chars * 10 div n_words")).otherwise(lit(0L))
    df.withColumn("n_words", nWords)
      .withColumn("word_chars", wordChars)
      .withColumn("stop_hits", stopHits)
      .withColumn("mwl10", wc10)
      .withColumn("q_score",
        lit(2L) * least(col("n_words"), lit(100L)) +
          lit(25L) * col("stop_hits") -
          abs(col("mwl10") - lit(50L)))
      .withColumn("q_pass", col("q_score") >= threshold)
  }

  /** Stopword-count language ID: score each language by function-word
    * hits; winner = max count, ties to the alphabetically-first code,
    * zero hits => "und" (undetermined). Deterministic by construction.
    */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val counted = Stopwords.foldLeft(df) { case (acc, (code, words)) =>
      acc.withColumn(s"hits_$code", stopwordHits(toks, words))
    }
    val best = Stopwords.map(_._1).map(c => col(s"hits_$c")).reduce(greatest(_, _))
    val pick = Stopwords.map(_._1).foldRight(lit("und")) { case (code, els) =>
      when(col(s"hits_$code") === best, lit(code)).otherwise(els)
    }
    counted
      .withColumn("lang_pred", when(best === 0, lit("und")).otherwise(pick))
      .drop(Stopwords.map(c => s"hits_${c._1}"): _*)
  }

  /** Fixed-size token chunking with overlap — the document→training-
    * sample splitter. Chunk i covers tokens [1 + i·stride,
    * 1 + i·stride + chunkTokens); the last chunk may be short; a doc
    * shorter than chunkTokens yields exactly one chunk. Pure per-row
    * projection + explode: no shuffle, parallel over input partitions.
    */
  def chunk(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 50,
      stride: Int = 40): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val w = tokens(col(textCol))
    val n = size(w)
    // chunks past the first exist only for tokens beyond chunkTokens
    val nChunks = lit(1) + greatest(lit(0),
      ceil((n - chunkTokens).cast("double") / stride).cast("int"))
    df.select(col(idCol), w.as("_w"), posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_id", "_i")))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("_w"), col("_i") * stride + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), size(col("_w")) - col("_i") * stride).cast("long").as("chunk_tokens"))
  }

  /** Inverted index over a term list: term → sorted posting list of
    * doc ids (+ df). Restricted to `terms` (typically the built vocab
    * — an unrestricted index on a heavy-tailed corpus is dominated by
    * hapax terms whose postings nobody reads). One shuffle on the
    * term after a broadcast semi-join prune; postings sort LOCALLY
    * inside each aggregation buffer (sort_array), never a global
    * sort. Posting lists are per-term — the classic retrieval layout
    * where a 100 TB corpus still serves lookups from one term's list.
    */
  def postings(df: DataFrame, terms: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      termCol: String = "term"): DataFrame =
    df.select(col(idCol).as("_doc"), explode(array_distinct(tokens(col(textCol)))).as("term"))
      .join(broadcast(terms.select(col(termCol).as("term"))), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("_doc"))).as("posting"),
        count(lit(1)).as("df"))

  /** Skip-gram co-occurrence counts (word2vec/GloVe prep): ordered
    * pairs (t[i], t[i+d]) for d = 1..window, counted corpus-wide.
    * The pair fan-out is ONE scalar array expression with a single
    * consumer (the explode) — the interpreted-HOF inlining trap only
    * bites when CollapseProject duplicates the lambda into many
    * consumers — so the corpus shuffles once, as (a, b) pair rows,
    * already the minimal wire format.
    */
  def skipgrams(df: DataFrame, textCol: String = "text", window: Int = 2): DataFrame = {
    require(window > 0, "window must be positive")
    df.select(tokens(col(textCol)).as("_w"))
      .select(explode(expr(
        s"flatten(transform(_w, (t, i) -> transform(slice(_w, i + 2, $window), u -> struct(t AS a, u AS b))))"))
        .as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Vocabulary build: top-K terms by corpus frequency with document
    * frequency — the first pass of any tokenizer/BPE training run.
    * Distributed explode + hash-aggregate; only the bounded top-K ever
    * leaves the aggregation (TakeOrdered), and the final token-id
    * numbering is a window over just those K rows. Deterministic
    * tie-break: (tf desc, term asc).
    */
  def vocab(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      topK: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("_doc"), explode(tokens(col(textCol))).as("term"))
    terms.groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("_doc")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(topK)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("tf").desc, col("term"))).cast("long"))
      .select(col("token_id"), col("term"), col("tf"), col("df"))
  }

  /** TF-IDF top terms per document — the keyword-extraction /
    * relevance-weighting pass. Term frequencies and document
    * frequencies are two hash aggregations over the exploded tokens;
    * the df side is vocabulary-sized, so the join back onto (doc,
    * term) broadcasts under AQE (runtime size, not the
    * garbage-post-aggregate estimate) and only the per-doc top-K
    * survives the rank.
    *
    * The idf is the RATIONAL variant (n_docs/df, not log(n_docs/df)):
    * IEEE-754 division is correctly rounded, so scores are
    * bit-identical across engines, while log goes through platform
    * libm. Swapping in a log idf changes only this projection.
    */
  def tfIdf(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      topK: Int = 3): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term")).agg(count_distinct(col("doc_id")).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Unigram inverse-frequency surprisal score — the language-model
    * perplexity PROXY a pure-SQL pipeline can compute exactly: each
    * token's surprisal bucket is the decimal magnitude of its inverse
    * corpus frequency, digits(total_tokens DIV tf) − 1 ≈
    * floor(log10(total/tf)), and a document scores the fixed-point
    * mean bucket (×10000, floor division). Rare-token-heavy (high-
    * surprisal) documents score high, boilerplate scores low — the
    * usual "train a 5-gram LM, filter by perplexity" screen, reduced
    * to integer arithmetic that is bit-identical on any engine (a
    * real log-prob LM needs libm log, which is not).
    *
    * Scale: one corpus-wide term-frequency aggregation, one token→tf
    * shuffle join (the TF-IDF cost), a broadcast 1-row total.
    */
  def surprisal(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("_total"))
    tok.join(tf, "term")
      .crossJoin(broadcast(total))
      .withColumn("bucket", (length(expr("CAST(_total DIV tf AS STRING)")) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bucket")).as("sum_bucket"))
      .withColumn("surprisal_x10000", expr("sum_bucket * 10000 DIV n_tokens"))
  }

  /** Within-document repetition metrics (Gopher-style duplicate
    * n-gram quality signals): total and distinct word n-grams, the
    * hottest n-gram's count, and the duplicate fraction. Docs shorter
    * than n tokens are dropped (no n-grams to measure). N-grams here
    * are STRINGS so the cross-engine oracle is exact; the hashed
    * kernel (HashedShingles) is the production path when this feeds a
    * filter rather than a report. The single HOF projection feeds
    * exactly one consumer (the explode), so interpreted-lambda
    * inlining can't multiply it.
    */
  def repetitionMetrics(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_w"))
      .filter(size(col("_w")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(expr(s"transform(sequence(0, size(_w) - $n), i -> concat_ws(' ', slice(_w, i + 1, $n)))")).as("g"))
    grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_ngrams"), count(lit(1)).as("n_distinct"), max(col("c")).as("max_rep"))
      .withColumn("dup_ratio",
        (col("n_ngrams") - col("n_distinct")).cast("double") / col("n_ngrams"))
  }

  /** Encode documents to token ids against a vocabulary (the
    * corpus→tensor step): one row per (doc, position), id null for
    * out-of-vocabulary terms so downstream can count OOV or remap to
    * an UNK id. The vocab is top-K bounded, so the join broadcasts —
    * the corpus explodes but never shuffles.
    */
  def encode(df: DataFrame, vocabDf: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    toks.join(broadcast(vocabDf.select(col("term"), col("token_id"))), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token_id"))
  }

  /** PII redaction patterns: (tag, Java+RE2-compatible regex). The
    * same literals feed the Spark operator and the DuckDB oracle so
    * the two sides can never drift.
    */
  val RedactPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "PHONE" -> "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "IPV4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Scrub PII-shaped substrings, replacing each match with its
    * `[TAG]`, and count matches per pattern (`n_<tag>` columns, from
    * the PRE-redaction text). Chained codegen'd regexp ops — order
    * matters (emails are matched before the IP pattern could eat a
    * dotted fragment), so patterns apply in declaration order.
    */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = RedactPatterns.foldLeft(df) { case (acc, (tag, re)) =>
      acc.withColumn(s"n_${tag.toLowerCase}", regexp_count(col(textCol), lit(re)).cast("long"))
    }
    val redacted = RedactPatterns.foldLeft(col(textCol)) { case (acc, (tag, re)) =>
      regexp_replace(acc, lit(re), lit(s"[$tag]"))
    }
    counted.withColumn("redacted", redacted)
  }

  /** 64-bit FNV-1a rolling fingerprint of the normalized text
    * (lowercased, whitespace collapsed) — dedup/lineage key.
    */
  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val normalized = regexp_replace(lower(col(textCol)), lit("\\s+"), lit(" "))
    df.withColumn("fingerprint", HashFunctions.fingerprint64(normalized))
  }

  /** One row per reference-token occurrence — the unigram-LM feed
    * (`IncrementalAgg.refreshTable` keyed on `t` maintains c1).
    */
  def tokenRows(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(col(textCol))).as("t"))

  /** One row per adjacent-bigram occurrence — the bigram-LM feed
    * (`IncrementalAgg.refreshTable` keyed on (a, b) maintains c12).
    */
  def bigramOccurrences(df: DataFrame, textCol: String = "text"): DataFrame =
    bigramRows(df, textCol, Nil)

  /** Adjacent-token bigrams of `textCol` plus the given carried
    * columns: one row per bigram occurrence, in-document order not
    * preserved (the LM counts are order-free aggregates).
    */
  private def bigramRows(df: DataFrame, textCol: String, carry: Seq[String]): DataFrame = {
    val w = tokens(col(textCol))
    val k = greatest(size(w) - 1, lit(0))
    df.select(carry.map(col) :+ explode(
        zip_with(slice(w, lit(1), k), slice(w, lit(2), k),
          (x, y) => struct(x.as("a"), y.as("b")))).as("_p"): _*)
      .select(carry.map(col) :+ col("_p.a").as("a") :+ col("_p.b").as("b"): _*)
  }

  /** CCNet-style LM perplexity filter (Wenzek et al. 2020: score a
    * crawl against a language model trained on a clean REFERENCE
    * corpus, then split into head/middle/tail thirds — the head is
    * the training-mix gold). The LM here is a Laplace-smoothed
    * BIGRAM model whose per-bigram surprisal is the decimal-magnitude
    * bucket digits((c1(a)+V) DIV (c12(a,b)+1)) − 1 ≈
    * floor(log10(1/p̂(b|a))) — the same integer-arithmetic reduction
    * as `surprisal`, so the whole filter (including the tercile
    * split) is bit-reproducible on any engine, which a libm-log LM
    * is not. A document scores the fixed-point mean bucket (×10000,
    * floor division); docs too short for a bigram score 0 (nothing
    * to judge them on — they sit in the head like CCNet's trivial
    * lines).
    *
    * The tercile cutoffs come from a cumulative histogram of the
    * (small-integer) scores, cross-multiplied: cut_k = min score with
    * 3·cum ≥ k·n. The window runs over the HISTOGRAM — bounded by
    * score cardinality (≤ ~200k distinct values by construction),
    * never the corpus — and the two cutoffs broadcast back into the
    * per-doc labeling join, so no global sort of the corpus exists
    * anywhere in the plan.
    *
    * Scale: reference bigram/unigram aggs (vocab-bounded), one
    * target-bigram → LM shuffle join (the TF-IDF cost shape), one
    * per-doc agg, a histogram agg, two broadcast scalars.
    */
  def perplexityBuckets(
      target: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val refTok = reference.select(explode(tokens(col(textCol))).as("t"))
    val uni = refTok.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val refBi = bigramRows(reference, textCol, Nil)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c12"))
    perplexityBucketsWithLm(target, uni, refBi, idCol, textCol)
  }

  /** `perplexityBuckets` against a PREBUILT language model — `uni` as
    * (t, c1), `bi` as (a, b, c12). The LM counts are plain additive
    * aggregates, so they can equally come from the replay-safe
    * incremental state tables (`IncrementalAgg.refreshTable` keyed on
    * the token/bigram) — reference corpora grow by delivery, and
    * rebuilding an LM over all history per refresh is exactly the
    * rescan the incremental family exists to avoid.
    */
  def perplexityBucketsWithLm(
      target: DataFrame,
      uni: DataFrame,
      bi: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val vocab = uni.agg(count(lit(1)).as("_v"))
    val refBi = bi
    val tgtBi = bigramRows(target.select(col(idCol).as("doc_id"), col(textCol)),
      textCol, Seq("doc_id"))
    val perDoc = tgtBi
      .join(refBi, Seq("a", "b"), "left")
      .join(uni.select(col("t").as("a"), col("c1").as("c1a")), Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("bucket", (length(expr(
        "CAST((coalesce(c1a, CAST(0 AS BIGINT)) + _v) DIV (coalesce(c12, CAST(0 AS BIGINT)) + 1) AS STRING)")) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bucket")).as("sum_bucket"))
    // materialized once (lazy localCheckpoint): both the tercile
    // histogram and the final labeling consume scored — without the
    // checkpoint the whole target-bigram LM join plans TWICE
    val scored = target.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sum_bucket * 10000 DIV n_bigrams"), lit(0L)).as("surprisal_x10000"))
      .localCheckpoint(false)
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col("surprisal_x10000").as("s")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = cum.crossJoin(cum.agg(max(col("cum")).as("_n")))
      .agg(min(when(col("cum") * 3 >= col("_n"), col("s"))).as("_cut1"),
        min(when(col("cum") * 3 >= col("_n") * 2, col("s"))).as("_cut2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("ppl_bucket",
        when(col("surprisal_x10000") <= col("_cut1"), lit("head"))
          .when(col("surprisal_x10000") <= col("_cut2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_bigrams"), col("surprisal_x10000"), col("ppl_bucket"))
  }

  /** BM25 retrieval scoring: top-K documents for a bag-of-words
    * query, scored with the Okapi BM25 family (k1 = 6/5, b = 3/4) —
    * the lexical-retrieval baseline every RAG / hard-negative-mining
    * pipeline starts from.
    *
    * Exact cross-engine arithmetic: every quantity stays RATIONAL.
    * With N docs, T total tokens (avgdl = T/N), per-term df and
    * per-doc (tf, dl), the standard form
    *   idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * cross-multiplies (idf = (N−df+½)/(df+½) — the probabilistic
    * ratio; log-free so no libm) to
    *   contrib = (2N−2df+1) · 11·tf · 4T
    *           / [(2df+1) · (20·tf·T + 6T + 18·dl·N)]
    * and each term's contribution is floor-quantized at 1e-9
    * (decimal(38,0) cross products ≈ 1e35 at N=1e9, T=1e12 — inside
    * decimal range at 100 TB, far past BIGINT). The quantized
    * contributions sum exactly, so ranking is bit-stable on any
    * engine; ties break by doc_id.
    *
    * Scale shape: one tokenize scan feeds both the per-doc lengths
    * and the query-term tf table (the `isin` filter prunes to query
    * terms before the (doc, term) aggregate); df and the (N, T)
    * totals are term-count-sized and broadcast. Global top-K is a
    * TakeOrdered, never a full sort.
    */
  def bm25(df: DataFrame, queryTerms: Seq[String], idCol: String = "doc_id",
      textCol: String = "text", topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(terms.agg(count(lit(1)).as("t_tok")))
    val qTerms = terms.filter(col("term").isin(queryTerms: _*))
    val dfreq = qTerms.groupBy(col("term")).agg(count_distinct(col("doc_id")).as("df"))
    val tf = qTerms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("c", expr(
        """CAST(CAST(2*n_docs - 2*df + 1 AS DECIMAL(38,0)) * (11 * tf) * (4 * t_tok)
          |       * 1000000000
          |     DIV (CAST(2*df + 1 AS DECIMAL(38,0))
          |          * (CAST(20 AS DECIMAL(38,0)) * tf * t_tok + 6 * t_tok
          |             + CAST(18 AS DECIMAL(38,0)) * dl * n_docs)) AS BIGINT)"""
          .stripMargin))
    contrib.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("score_fp"), count(lit(1)).as("n_terms_hit"))
      // TakeOrdered first (orderBy+limit never materializes a global
      // sort), THEN rank — the window runs over topK rows, not the
      // corpus
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score_fp").desc, col("doc_id"))))
  }
}
