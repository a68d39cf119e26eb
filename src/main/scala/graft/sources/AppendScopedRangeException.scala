package graft.sources

/** An append-scoped incremental pull met a range containing
  * ROW-CHANGING commits (an overwrite / delete / DV attach) that an
  * append contract cannot represent. Every adapter whose
  * `incrementalSince` hits one throws THIS type so format-agnostic
  * consumers ([[TableLoader.pullIncremental]]) can auto-follow the
  * refusal's pointer to the CDC-grade `changeFeedSince` instead of
  * dying — a checkpointed consumer survives the mid-range overwrite
  * every production table eventually commits, and the feed's explicit
  * `_change_type` images keep it CORRECT where a silent append-shaped
  * pull would not be. Direct adapter callers still get the loud
  * refusal (it IS an IllegalStateException) unless they opt into the
  * fallback themselves.
  */
final class AppendScopedRangeException(msg: String) extends IllegalStateException(msg)
