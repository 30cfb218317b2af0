package graft.operators

import graft.api.ParamSpec
import graft.functions.JsonKeySubset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a [[graft.api.ParamSpec]] to Catalyst `Column`s over the
  * canonical event envelope (FIXTURES.md §A1: id, event, created_utc,
  * author, subreddit, domain, over_18, is_self, json).
  *
  * This is the heart of reference parity: every per-row operator of
  * /root/reference/sse.py re-expressed declaratively so Catalyst gets
  * predicate pushdown / column pruning / constant folding for free
  * (SURVEY.md §2, §4). All functions are pure `ParamSpec => Column`.
  */
object RedditOps {

  /** F1 — event-type gate (sse.py:180, 223). Absent `type` → both kinds;
    * unrecognized → neither. Plan-level improvement over the reference:
    * callers can also prune the scan itself (SURVEY.md §4 "missed
    * early type-pruning").
    */
  def typePred(spec: ParamSpec): Column =
    if (spec.types.isEmpty) lit(false)
    else if (spec.types == Set("rc", "rs")) lit(true)
    else col("event").isin(spec.types.toSeq.sorted: _*)

  /** F2–F5 — the whitelist disjunction (sse.py:156-159, 169-177, 187-190,
    * 208-220). No whitelist params → pass-all; otherwise pass iff ANY of
    * author/subreddit/domain matches. The reference's `?domain=x`-drops-
    * comments quirk falls out naturally: comments have NULL domain, and the
    * NULL-safe match treats missing domain as non-matching (this also fixes
    * the reference's unbound/stale `domain` variable bug — sse.py:198 vs
    * 213; SURVEY.md §2 "Known reference bug").
    */
  def whitelistPred(spec: ParamSpec): Column =
    if (!spec.hasWhitelist) lit(true)
    else {
      val preds = Seq(
        Option.when(spec.authors.nonEmpty)(col("author").isin(spec.authors: _*)),
        Option.when(spec.subreddits.nonEmpty)(col("subreddit").isin(spec.subreddits: _*)),
        Option.when(spec.domains.nonEmpty)(lower(col("domain")).isin(spec.domains: _*))
      ).flatten
      coalesce(preds.reduce(_ || _), lit(false))
    }

  /** F6/F7 — over_18 / is_self equality, submissions only, case-insensitive
    * string compare, AND-ed (applied before the whitelist in the reference;
    * conjunction is order-independent so we AND them — sse.py:202-206).
    * Comments are unaffected by these params (the reference only checks them
    * on the submission path).
    */
  def attrPred(spec: ParamSpec): Column = {
    val checks = Seq(
      spec.over18.map(v => lower(col("over_18")) === lit(v.toLowerCase)),
      spec.isSelf.map(v => lower(col("is_self")) === lit(v.toLowerCase))
    ).flatten
    if (checks.isEmpty) lit(true)
    else col("event") =!= lit("rs") || coalesce(checks.reduce(_ && _), lit(false))
  }

  /** R1/R2 — resume semantics as batch predicates over the id column:
    * backfill = last N ids per type (sse.py:60-69, 93-98), start_id = ids ≥
    * start per type (sse.py:71-78, 125-129). `maxIds` are the per-type
    * high-watermarks (S1), supplied by the caller (in streaming, the
    * source's latestOffset; in batch, a max() aggregate).
    */
  def resumePred(spec: ParamSpec, rcMax: Column, rsMax: Column,
      rrMax: Column = lit(-1L)): Column = {
    def per(ev: String, backfill: Option[Long], startId: Option[Long], maxId: Column) = {
      val bound: Column = (backfill, startId) match {
        case (_, Some(s)) => lit(s)                  // R2 wins (V1 forbids both)
        case (Some(n), _) => maxId - lit(n) + lit(1) // R1: last n ids
        case _            => maxId + lit(1)          // live tail: nothing historical
      }
      col("event") === lit(ev) && col("id") >= bound
    }
    val base = per("rc", spec.commentBackfill, spec.commentStartId, rcMax) ||
      per("rs", spec.submissionBackfill, spec.submissionStartId, rsMax)
    // the rr superset arm only exists for an rr-typed spec, so the
    // default rrMax sentinel can never admit rows for rc/rs callers
    if (spec.wantsSubreddits)
      base || per("rr", spec.subredditBackfill, spec.subredditStartId, rrMax)
    else base
  }

  /** The full row predicate: F1 ∧ (F6∧F7) ∧ (F2∨F3∨F4). */
  def pred(spec: ParamSpec): Column =
    typePred(spec) && attrPred(spec) && whitelistPred(spec)

  /** P1 — JSON key-subset projection of the payload (sse.py:233-237);
    * identity when no `filter` param.
    */
  def projectPayload(spec: ParamSpec, json: Column): Column =
    if (spec.filterKeys.isEmpty) json else JsonKeySubset(json, spec.filterKeys)

  /** O1 — emit order (sse.py:228-229): event-time ascending; ties keep
    * comments before submissions ('rc' < 'rs'), then id for full
    * determinism. The reference sorts the *string* epoch lexicographically —
    * identical order for equal-width epochs; we sort the numeric column
    * (SURVEY.md §7.4). The rr superset feed slots between on ties
    * ('rc' < 'rr' < 'rs') — vacuous in practice, since rr is a
    * standalone mask and never shares a batch with rc/rs.
    */
  val emitOrder: Seq[Column] =
    Seq(col("created_utc").asc, col("event").asc, col("id").asc)

  /** E1 — SSE frame encode (sse.py:140, 239). Pure `concat`, fully
    * codegen'd; no custom expression needed (SURVEY.md §2 E1).
    */
  def sseFrame(id: Column, event: Column, data: Column): Column =
    concat(lit("id: "), id.cast("string"), lit("\nevent: "), event,
      lit("\ndata: "), data, lit("\n\n"))

  /** Apply the whole per-connection pipeline (filter → project → sort) to an
    * envelope DataFrame — the batch twin of one SSE connection's dataflow.
    */
  def apply(spec: ParamSpec, df: DataFrame): DataFrame =
    df.filter(pred(spec))
      .withColumn("json", projectPayload(spec, col("json")))
      .orderBy(emitOrder: _*)
}
