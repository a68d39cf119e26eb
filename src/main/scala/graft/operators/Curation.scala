package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation filters that treat their criteria as DATA, not
  * literals — crawl denylists run to millions of domains and change
  * daily, so they arrive as a table, never an IN-list baked into the
  * plan.
  */
object Curation {

  /** Drop rows whose `sourceCol` appears in the blocklist table:
    * broadcast LEFT ANTI join. The fact side stays shuffle-free while
    * the blocklist fits the broadcast threshold and degrades to a
    * shuffled anti join past it — either way no row of the corpus is
    * ever duplicated or re-ordered, so the filter composes with
    * downstream dedup/split stages.
    */
  def dropBlockedSources(
      df: DataFrame,
      sourceCol: String,
      blocklist: DataFrame,
      blockCol: String): DataFrame =
    df.join(broadcast(blocklist), df(sourceCol) === blocklist(blockCol), "left_anti")

  /** Benchmark decontamination: find training documents sharing any
    * word n-gram with the evaluation set. Both sides trade on 64-bit
    * hashed shingles (the codegen'd GraftHash kernel, distinct per
    * doc by construction) — the join shuffles 8-byte longs, never
    * n-word strings, which is what survives at 100 TB. Returns one
    * row per CONTAMINATED training doc: the count of distinct shared
    * n-grams and of distinct test docs hit; anti-join against this to
    * scrub.
    */
  def decontaminate(
      train: DataFrame,
      test: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val tr = train.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    val te = test.select(col(idCol).as("_test_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    tr.join(te, "_sh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("_sh")).as("n_shared_ngrams"),
        count_distinct(col("_test_id")).as("n_test_docs"))
  }

  /** FUZZY benchmark decontamination: a training doc is flagged when
    * it is a MinHash-LSH near-duplicate of a holdout doc (Jaccard ≥
    * threshold on shingle sets) — the paraphrase-robust complement of
    * the exact shared-n-gram gate above (a lightly reworded benchmark
    * item shares few exact 8-grams but keeps high shingle Jaccard).
    * Delegates to [[Dedup.minhashLshPairsCross]]: the holdout side is
    * small and broadcasts; the training corpus is never shuffled by
    * the candidate join. Returns flagged (train_id, holdout_id,
    * jaccard) pairs; anti-join train against this to scrub.
    */
  def decontaminateFuzzy(
      train: DataFrame,
      holdout: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame =
    Dedup.minhashLshPairsCross(train, holdout, idCol, textCol, n, numHashes, bands, threshold)
      .withColumnRenamed("left_id", "train_id")
      .withColumnRenamed("right_id", "holdout_id")

  /** Cluster-aware dedup retention: near-dup PAIRS are collapsed to
    * connected components and ONE survivor is kept per cluster — the
    * argmax-quality member (ties to the lowest id) — alongside every
    * unclustered doc. This is the production near-dup policy: greedy
    * pair-drop (curate_neardup) can evict the best copy of a
    * duplicated document; cluster-argmax provably keeps it, and keeps
    * exactly one row per duplicate group regardless of how many
    * near-dup copies exist.
    *
    * `quality` is (idCol, scoreCol); survivors return with their
    * score (null when unscored). The cluster step is the size-gated
    * union-find / label-propagation of [[Dedup.clusters]]; the argmax
    * is max-score-then-min-id over the (small) clustered-member set —
    * two aggregations over clustered rows only, no window over the
    * corpus. The tie-break works for ANY orderable id type (numeric,
    * string, …): no negation trick, so no silent NULL under non-ANSI
    * semantics. Docs absent from `quality` still survive (treated as
    * unscored: they lose ties to any scored member, and an all-
    * unscored cluster keeps its lowest id) — a cluster can never
    * silently vanish on a quality-coverage gap.
    */
  def keepBestPerCluster(
      docs: DataFrame,
      pairs: DataFrame,
      quality: DataFrame,
      idCol: String = "doc_id",
      scoreCol: String = "q_score",
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val comp = Dedup.clusters(pairs, aCol, bCol) // (doc_id, cluster_rep) for clustered docs
      .withColumnRenamed("doc_id", idCol)
    val members = comp.join(quality, Seq(idCol), "left")
    // max() ignores nulls (all-null cluster → null max); the
    // null-safe <=> keeps exactly the max-score members (or every
    // member when none is scored), then min(id) is the deterministic
    // type-agnostic tie-break
    val mx = members.groupBy(col("cluster_rep")).agg(max(col(scoreCol)).as("_mx"))
    val best = members.join(mx, "cluster_rep")
      .filter(col(scoreCol) <=> col("_mx"))
      .groupBy(col("cluster_rep"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val unclustered = docs.select(col(idCol))
      .join(comp.select(col(idCol)), Seq(idCol), "left_anti")
    unclustered.unionByName(best).join(quality, Seq(idCol), "left")
  }

  /** Sequence packing, concatenate-and-cut style: documents are laid
    * end-to-end per partition (deterministic `orderCol` order) and
    * the token stream is cut into `budget`-sized packs; each doc gets
    * the pack containing its first token plus its offset inside that
    * pack. One running-sum window per partition — at production scale
    * partition by shard (not a global order) so the sort stays
    * bounded; the arithmetic is exact long division, never
    * double-rounded.
    */
  /** Persist the holdout's hashed n-gram index once — benchmarks are
    * static; re-shingling them for every arriving train batch is
    * wasted work at 100 TB ingest rates. (test_id, shingle-hash)
    * pairs, 8-byte keys on the wire.
    */
  def buildDecontamIndex(
      test: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): Unit =
    test.select(col(idCol).as("_test_id"),
        explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
      .write.mode("overwrite").parquet(indexPath)

  /** Check one arriving train batch against the persisted holdout
    * index: identical semantics (and gate oracle) to `decontaminate`,
    * at O(batch) cost — per-doc results depend only on that doc and
    * the holdout, so the union over batches equals the one-shot run.
    */
  def decontaminateIncremental(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    val tr = batch.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    tr.join(spark.read.parquet(indexPath), "_sh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("_sh")).as("n_shared_ngrams"),
        count_distinct(col("_test_id")).as("n_test_docs"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * integer-ratio variant): score raw documents by how much their
    * hashed-unigram distribution looks like a TARGET domain. Tokens
    * hash into `buckets` feature buckets; each occurrence contributes
    * the add-one-smoothed frequency ratio
    * ⌊(target_b+1)·raw_total·scale / ((raw_b+1)·target_total)⌋ in
    * exact decimal — a token common in-target and rare in-raw scores
    * high. Per-doc score = Σ over its tokens; resample the top mass
    * with [[Sampling.reproducibleStratified]] or a threshold. No
    * floats, no logs: bit-identical on any engine (the log-sum of
    * real DSIR is replaced by a ratio-sum — same ordering signal for
    * selection, exact cross-engine arithmetic).
    *
    * Scale shape: two token passes (bucket counts; per-doc sum) with
    * map-side combine, and the bucket table — `buckets` rows — rides
    * as a BROADCAST join. Nothing corpus-sized shuffles except the
    * (doc, bucket) pairs of the scoring pass.
    */
  def importanceWeights(
      docs: DataFrame,
      isTarget: Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 256,
      scale: Long = 10000L): DataFrame = {
    require(buckets > 0 && scale > 0, "buckets and scale must be positive")
    val toks = docs
      .select(col(idCol), isTarget.as("_t"),
        explode(split(col(textCol), " ")).as("_w"))
      .filter(length(col("_w")) >= 1)
      .select(col(idCol), col("_t"),
        pmod(graft.functions.HashFunctions.fingerprint64(col("_w")), lit(buckets.toLong))
          .as("_b"))
    val counts = toks.groupBy(col("_b")).agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("_tc"),
      sum(when(!col("_t"), 1L).otherwise(0L)).as("_rc"))
    val totals = counts.agg(
      sum(col("_tc")).as("_ttot"), sum(col("_rc")).as("_rtot")).collect()(0)
    val (ttot, rtot) = (totals.getLong(0), totals.getLong(1))
    require(ttot > 0 && rtot > 0, "both target and raw corpora must be non-empty")
    // integral `div`, not `/`: Spark's decimal division ROUNDS at the
    // derived scale — floor semantics must match DuckDB's `//`
    val ratio = expr(
      s"""CAST((CAST(_tc + 1 AS DECIMAL(38,0)) * CAST($rtot AS DECIMAL(38,0))
         |      * CAST($scale AS DECIMAL(38,0)))
         | div (CAST(_rc + 1 AS DECIMAL(38,0)) * CAST($ttot AS DECIMAL(38,0)))
         |""".stripMargin.replace('\n', ' ') + " AS BIGINT)")
    toks.join(broadcast(counts.select(col("_b"), ratio.as("_r"))), "_b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("_r")).as("importance"))
  }

  /** Sequence packing, first-fit-decreasing: whole documents are
    * bin-packed into `budget`-token packs (no doc ever splits across
    * packs — the padding-free batching variant training stacks use
    * when attention must not cross document boundaries; FFD is the
    * classic 11/9·OPT+1 guarantee). Within each shard, docs place in
    * (weight desc, id asc) order into the lowest-numbered pack with
    * room; pack ids number by creation, offsets are cumulative fill.
    *
    * Deterministic: the order is a total sort, the placement rule has
    * no ties, so re-running reproduces identical assignments on any
    * engine — but the rule itself is sequential, so it is exposed as
    * a per-shard `flatMapGroups` (the legitimate per-group
    * imperative case), rows-only at the gate with the invariants
    * spec-tested. Shards bound the sequential work exactly as pack's
    * partition column does; the first-fit scan is O(docs·packs) per
    * shard, fine at chunk-bounded shard sizes (a tree lowers it to
    * O(docs·log packs) when shards grow).
    */
  def packFfd(
      df: DataFrame,
      partitionCol: String,
      idCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(partitionCol).cast("string").as("_shard"),
      col(idCol).cast("long").as("_id"),
      col(weightCol).cast("long").as("_w")).as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val items = it.map(t => (t._2, t._3)).toArray.sortBy { case (id, w) => (-w, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (id, w) =>
          require(w <= budget, s"item $id weight $w exceeds pack budget $budget")
          var b = 0
          while (b < fills.length && fills(b) + w > budget) b += 1
          if (b == fills.length) fills += 0L
          val off = fills(b)
          fills(b) += w
          (shard, id, w, b, off)
        }
      }
      .toDF(partitionCol, idCol, weightCol, "pack_id", "pack_off")
  }

  def pack(
      df: DataFrame,
      partitionCol: String,
      orderCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cast ONCE and use the long in both the sum and the subtraction:
    // a fractional weight column must not promote _start to double
    // (the div/% below would then truncate through an implicit cast)
    val wgt = col(weightCol).cast("long")
    df.withColumn("_start", sum(wgt).over(w) - wgt)
      .withColumn("pack_id", expr(s"_start div $budget"))
      .withColumn("pack_off", expr(s"_start % $budget"))
      .drop("_start")
  }

  /** BUDGET-BOUNDED corpus selection: rank rows by (`scoreCol` DESC,
    * `keyCol` ASC — the tiebreak makes the kept SET engine-exact) and
    * keep the maximal prefix whose cumulative `sizeCol` fills
    * `budget`; the row that CROSSES the boundary is included (the
    * "fill the token budget, last doc may overflow" rule:
    * running − size < budget). Semantically one global window — but a
    * global sort of the corpus is exactly what cannot run at 100 TB,
    * so this executes the TWO-PHASE cutoff instead: (1) one
    * `groupBy(score)` histogram, |distinct scores|-bounded on the
    * driver behind a loud probe; (2) the driver walks the histogram
    * to the single crossing score — every better score is kept
    * WHOLESALE with no sort at all, and only the one boundary
    * score-class pays a window, sized by that class, not the corpus.
    * Degenerate scoring (one giant class) still answers, it just
    * sorts that class; the fix is a finer score, and the histogram
    * probe names the class size so the caller can see it.
    */
  def selectUnderBudget(
      df: DataFrame,
      scoreCol: String,
      sizeCol: String,
      keyCol: String,
      budget: Long,
      maxDriverScores: Int = 4000000): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sz = col(sizeCol).cast("long")
    val hist = df.groupBy(col(scoreCol).as("_g_score"))
      .agg(sum(sz).as("_g_bytes"), count(lit(1)).as("_g_rows"))
    val nScores = hist.limit(maxDriverScores + 1).count()
    require(nScores <= maxDriverScores,
      s"selectUnderBudget: > $maxDriverScores distinct $scoreCol values — the histogram " +
        "no longer fits the driver; coarsen the score (bucket it) first")
    // the histogram rows, best score first (driver metadata)
    val rows = hist.collect().map(r =>
      (r.get(0), r.getLong(1), r.getLong(2))).sortBy { case (s, _, _) =>
      s match {
        case n: Number => -n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"selectUnderBudget needs a numeric $scoreCol, got ${other.getClass}")
      }
    }
    var cum = 0L
    var boundary: Option[(Any, Long)] = None // (score, remaining budget at its start)
    val fullScores = Seq.newBuilder[Any]
    rows.iterator.takeWhile(_ => cum < budget).foreach { case (s, bytes, _) =>
      if (cum + bytes <= budget) { fullScores += s; cum += bytes }
      else { boundary = Some((s, budget - cum)); cum += bytes }
    }
    val fullSet = fullScores.result()
    // kept wholesale: scores strictly better than the crossing one —
    // no sort, no window, a plain filter (monotone: the crossing
    // happens once)
    val fullThreshold: Option[Any] = boundary.map(_._1).orElse(fullSet.lastOption)
    val full = fullThreshold match {
      case None => df.limit(0)
      case Some(t) =>
        if (boundary.isDefined) df.filter(col(scoreCol) > lit(t))
        else df.filter(col(scoreCol) >= lit(t))
    }
    boundary match {
      case None => full
      case Some((s0, remaining)) =>
        import org.apache.spark.sql.expressions.Window
        // one score-class sorts — bounded by the class, not the corpus
        val w = Window.orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val edge = df.filter(col(scoreCol) === lit(s0))
          .withColumn("_g_cum", sum(sz).over(w))
          .filter(col("_g_cum") - sz < lit(remaining))
          .drop("_g_cum")
        full.unionByName(edge)
    }
  }
}
