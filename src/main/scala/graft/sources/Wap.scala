package graft.sources

import org.apache.spark.sql.DataFrame
import graft.operators.QualityChecks

/** Write-Audit-Publish (WAP) — the lakehouse ingestion pattern (the
  * Iceberg/Netflix workflow) composed from graft's own branch and
  * quality-gate machinery: stage a batch on a zero-copy branch, audit
  * the STAGED snapshot with declarative expectations, and only if
  * every check passes fast-forward the branch into main as one
  * commit. A failing batch never touches main — readers see either
  * the old table or the fully-audited new one, never a half-loaded
  * state. The reference pipeline writes straight to the live table
  * and emails whatever landed (template.py:319-467); WAP is the same
  * write path wrapped so bad data is quarantined BEFORE a report can
  * read it.
  *
  * Scale shape: staging is exactly an upsert (one keyed shuffle of
  * batch ∪ touched files); every audit check is one aggregate over
  * the staged snapshot (QualityChecks' contract); publish is the
  * three-way merge's single hash Exchange. The audit result rows are
  * one-per-check — the only driver-side collect, bounded by the
  * check list, never by data.
  */
object Wap {

  /** Outcome: whether the batch published, the version it landed as
    * (None when rejected), and the per-check audit rows
    * (check, n_violations, passed) for the run's report/notify path.
    */
  final case class WapResult(published: Boolean, version: Option[Int],
      audit: Seq[(String, Long, Boolean)])

  /** Stage `batch` on branch `stage`, audit with `checks` (built
    * against the staged snapshot), publish on all-green. The staging
    * branch is always cleaned up, pass or fail. `onConflict` guards
    * the publish when main moved during the audit: the default
    * "fail" refuses to publish over a concurrent conflicting write
    * (the audited snapshot would no longer be what lands).
    */
  def writeAuditPublish(batch: DataFrame, tablePath: String,
      recordKeys: Seq[String], precombine: String,
      checks: DataFrame => Seq[DataFrame],
      stage: String = "wap_stage", onConflict: String = "fail",
      partitionBy: Seq[String] = Nil, keepVersions: Int = 2): WapResult = {
    val spark = batch.sparkSession
    Branching.create(spark, tablePath, stage)
    try {
      Branching.upsertBranch(batch, tablePath, stage, recordKeys, precombine,
        keepVersions = keepVersions)
      val staged = Branching.readBranch(spark, tablePath, stage)
      val audit = QualityChecks.run(checks(staged))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
        .toSeq
      if (audit.forall(_._3)) {
        val v = Branching.mergeBranch(spark, tablePath, stage, recordKeys,
          precombine, onConflict = onConflict, partitionBy = partitionBy,
          keepVersions = keepVersions)
        WapResult(published = true, version = Some(v), audit = audit)
      } else WapResult(published = false, version = None, audit = audit)
    } finally Branching.deleteBranch(spark, tablePath, stage)
  }
}
