package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: find the records that refer to
  * the same real-world entity across dirty copies (typos, drifted
  * attributes, re-ingested rows), cluster them, and emit one golden
  * record per entity. The structured-record sibling of the text
  * near-dup family — the same blocking-then-verify discipline
  * (candidates from cheap keys, exact scoring only on candidates,
  * never all pairs), but over typed fields with a Fellegi–Sunter-style
  * additive match score instead of a single text similarity.
  *
  * Scale shape (100 TB): the ONLY join that touches every record is
  * the blocking self-join, and it trades (key, id) rows — a few dozen
  * bytes each — grouped by blocking key, so cost is Σ|block|², which
  * the caller controls by key design exactly as in MinHash-LSH band
  * design. Scoring joins the candidate pair list back to the records
  * by id (shuffle on the 8-byte id, standard co-partitioned join);
  * clustering reuses [[Dedup.clusters]] (size-gated union-find /
  * distributed label propagation with lineage truncation).
  * Everything downstream of blocking is O(candidates), not O(n²).
  */
object RecordLinkage {

  /** Candidate pairs via multi-key blocking: each record emits one
    * (key-index, key-value) row per blocking expression; two records
    * become a candidate pair iff they agree on AT LEAST ONE key
    * (union-of-blocks recall — the standard fix for a single key's
    * blind spots), deduplicated, with id_a < id_b. NULL key values
    * block nothing (an absent field should not create a mega-block).
    *
    * Key design contract: keys must bound block sizes — a constant
    * key degenerates to the all-pairs join this operator exists to
    * avoid (same contract as LSH band width).
    */
  def candidatePairs(records: DataFrame, idCol: String, blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key expression is required")
    val keyed = records.select(
      col(idCol).as("_rl_id"),
      explode(array(blockKeys.zipWithIndex.map { case (k, i) =>
        struct(lit(i).as("ki"), k.cast("string").as("kv"))
      }: _*)).as("k"))
      .select(col("_rl_id"), col("k.ki").as("ki"), col("k.kv").as("kv"))
      .filter(col("kv").isNotNull)
    val a = keyed.as("a"); val b = keyed.as("b")
    a.join(b, col("a.ki") === col("b.ki") && col("a.kv") === col("b.kv") &&
        col("a._rl_id") < col("b._rl_id"))
      .select(col("a._rl_id").as("id_a"), col("b._rl_id").as("id_b"))
      // a pair agreeing on several keys must score once, not once per key
      .distinct()
  }

  /** Score candidates and keep matches: candidate pairs are joined
    * back to the full records on both sides (every record column
    * visible as `a_<col>` / `b_<col>`), the caller's additive integer
    * `score` expression is evaluated per pair, and pairs scoring
    * ≥ `threshold` survive. Integer scores keep the decision
    * engine-exact (no float comparator drift), which is what lets the
    * whole linkage pipeline hash-match a SQL re-derivation.
    *
    * Returns (id_a, id_b, match_score).
    */
  def scoredMatches(records: DataFrame, idCol: String, blockKeys: Seq[Column],
      score: Column, threshold: Long): DataFrame = {
    val cands = candidatePairs(records, idCol, blockKeys)
    val pa = records.columns.foldLeft(records)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val pb = records.columns.foldLeft(records)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    cands.join(pa, col("id_a") === col(s"a_$idCol"))
      .join(pb, col("id_b") === col(s"b_$idCol"))
      .withColumn("match_score", score.cast("long"))
      .filter(col("match_score") >= threshold)
      .select(col("id_a"), col("id_b"), col("match_score"))
  }

  /** Entity assignment: connected components over the matched pairs
    * (matching is rarely transitive — A≈B, B≈C forces {A,B,C} into
    * one entity even when A,C never scored; components make that
    * explicit instead of order-dependent), with every unmatched
    * record its own singleton entity. The entity id is the minimum
    * member id — stable under re-runs and re-partitioning.
    *
    * Returns (id, entity_id) with exactly one row per input record.
    */
  def entities(records: DataFrame, idCol: String, matched: DataFrame): DataFrame = {
    val comp = Dedup.clusters(matched.select(col("id_a"), col("id_b")), "id_a", "id_b")
      .select(col("doc_id").as("_rl_cid"), col("cluster_rep").as("_rl_rep"))
    records.select(col(idCol).as("id"))
      .join(comp, col("id") === col("_rl_cid"), "left")
      .select(col("id"), coalesce(col("_rl_rep"), col("id")).as("entity_id"))
  }

  /** The composed pipeline: block → score → threshold → components.
    * Returns the per-record entity assignment; survivorship (which
    * member's fields the golden record keeps) is the caller's
    * aggregation over this assignment — policies differ too much
    * (min-id wins, freshest wins, per-field max) to bake in.
    */
  def link(records: DataFrame, idCol: String, blockKeys: Seq[Column],
      score: Column, threshold: Long): DataFrame =
    entities(records, idCol, scoredMatches(records, idCol, blockKeys, score, threshold))

  /** Phonetic (simplified-Soundex) blocking key: letters-only
    * uppercase, first letter kept, the rest coded
    * B F P V→1  C G J K Q S X Z→2  D T→3  L→4  M N→5  R→6 with
    * vowels/H/W/Y→0, adjacent equal scoring digits collapsed, zeros
    * dropped, padded/truncated to 4 ("GERMANY"→G655, and a typo'd
    * "GERMANY"/"GERMANI" or "-37" suffix still lands in the same
    * block — the property exact keys lack). Deliberately the
    * SIMPLIFIED census variant: no H/W transparency rule, and run
    * collapse is three nested pair-replaces (complete for runs ≤ 8,
    * and — the actual contract — IDENTICAL on any engine running
    * this same expression chain, which is what blocking needs; see
    * [[soundexKeySql]] for the oracle-side text). Built from
    * translate/replace/rpad only: whole-stage-codegen'd, no UDF, no
    * regex backreferences (DuckDB's RE2 has none).
    */
  def soundexKey(nameExpr: String): Column =
    org.apache.spark.sql.functions.expr(soundexKeySql(nameExpr, duckdb = false))

  /** The same key as SQL text for the DuckDB oracle. The ONE
    * cross-engine delta is regexp_replace's global flag (DuckDB
    * replaces first-match-only without 'g'; Spark's 3-arg form is
    * global) — everything else is shared verbatim.
    */
  def soundexKeySql(inExpr: String, duckdb: Boolean): String = {
    val letters =
      if (duckdb) s"regexp_replace(upper($inExpr), '[^A-Z]', '', 'g')"
      else s"regexp_replace(upper($inExpr), '[^A-Z]', '')"
    val coded =
      s"translate($letters, 'AEIOUYHWBFPVCGJKQSXZDTLMNR', '00000000111122222222334556')"
    val collapsed = (1 to 6).foldLeft(coded) { (acc, d) =>
      s"replace(replace(replace($acc, '$d$d', '$d'), '$d$d', '$d'), '$d$d', '$d')"
    }
    s"substr(rpad(substr($letters, 1, 1) || replace(substr($collapsed, 2), '0', ''), 4, '0'), 1, 4)"
  }
}
