package graft.api

/** Validation failure → HTTP 400 in the API layer.
  * Mirrors the reference's `{"error": ...}` responses
  * (/root/reference/sse.py:50,53,67,78).
  */
final case class ApiError(status: Int, message: String)

/** Parsed + validated query-parameter surface of the engine.
  *
  * The reference's "query language" is the HTTP query string
  * (/root/reference/sse.py:46-78, README.md:15-27). This is its typed
  * equivalent; [[graft.operators.RedditOps]] compiles it to Catalyst
  * `Column`s.
  *
  * Semantics preserved from the reference:
  *  - `types`: only first `type` value considered; `comment*`/`rc` →
  *    comments, `submission*`/`rs` → submissions; absent → both; an
  *    unrecognized value matches neither (sse.py:56-57, 180, 223).
  *    Documented superset deviation: `subreddit*`/`rr` selects the
  *    subreddit-creation feed — an event type the reference DOCUMENTS
  *    but never implemented (README.md:42-46, "rr … Currently
  *    Implemented: No"; `type=subreddits` matched neither branch there
  *    and emitted nothing). rr joins neither default (`type` absent
  *    still means rc+rs, as in the reference);
  *    `subreddit_backfill`/`subreddit_start_id` complete the resume
  *    symmetry for it (round 8, after the live-only feed shipped) under
  *    the same V1 exclusion / V2 parse+clamp rules as the rc/rs pairs.
  *  - author/subreddit whitelists are exact, case-sensitive membership
  *    (sse.py:169-175). Documented deviation: we additionally split on
  *    commas (README.md:18,20 promises it; the reference code does not —
  *    sse.py:170,174; SURVEY.md §7.4).
  *  - `domains`: first occurrence only, comma-split, lowercased
  *    (sse.py:213).
  *  - `over18`/`isSelf`: first occurrence, compared case-insensitively
  *    as strings (sse.py:203,206).
  *  - `filterKeys`: first occurrence, comma-split JSON key projection
  *    (sse.py:235).
  *  - backfills: int-parsed (else 400) and clamped to [[ParamSpec.MaxBackfill]]
  *    (sse.py:60-69); start ids int-parsed, not clamped (sse.py:71-78).
  *  - Mutual exclusion of `*_backfill` with `*_start_id` per type → 400
  *    (sse.py:49-53).
  */
final case class ParamSpec(
    types: Set[String] = Set("rc", "rs"),
    authors: Seq[String] = Nil,
    subreddits: Seq[String] = Nil,
    domains: Seq[String] = Nil,
    over18: Option[String] = None,
    isSelf: Option[String] = None,
    filterKeys: Seq[String] = Nil,
    commentBackfill: Option[Long] = None,
    submissionBackfill: Option[Long] = None,
    commentStartId: Option[Long] = None,
    submissionStartId: Option[Long] = None,
    subredditBackfill: Option[Long] = None,
    subredditStartId: Option[Long] = None) {
  def wantsComments: Boolean = types.contains("rc")
  def wantsSubmissions: Boolean = types.contains("rs")
  def wantsSubreddits: Boolean = types.contains("rr")
  def hasWhitelist: Boolean =
    authors.nonEmpty || subreddits.nonEmpty || domains.nonEmpty
}

object ParamSpec {
  /** Backfill clamp (sse.py:65). */
  val MaxBackfill = 100000L

  /** Parse a decoded query-string multimap (every value a Seq, matching the
    * reference's werkzeug MultiDict semantics — SURVEY.md §3 EP1).
    */
  def parse(params: Map[String, Seq[String]]): Either[ApiError, ParamSpec] = {
    def first(k: String): Option[String] = params.get(k).flatMap(_.headOption)
    def err(m: String) = Left(ApiError(400, m))

    // V1: mutual exclusion per type (sse.py:49-53)
    if (params.contains("comment_backfill") && params.contains("comment_start_id"))
      return err("comment_backfill and comment_start_id are mutually exclusive")
    if (params.contains("submission_backfill") && params.contains("submission_start_id"))
      return err("submission_backfill and submission_start_id are mutually exclusive")
    if (params.contains("subreddit_backfill") && params.contains("subreddit_start_id"))
      return err("subreddit_backfill and subreddit_start_id are mutually exclusive")

    // V2: integer parse + clamp (sse.py:11-15, 60-78)
    def parseLong(k: String, clamp: Boolean): Either[ApiError, Option[Long]] =
      first(k) match {
        case None => Right(None)
        case Some(v) =>
          v.trim.toLongOption match {
            case Some(n) => Right(Some(if (clamp) math.min(n, MaxBackfill) else n))
            case None    => Left(ApiError(400, s"$k must be an integer"))
          }
      }

    val types: Set[String] = first("type") match {
      case None => Set("rc", "rs")
      case Some(t) =>
        val rc = if (t.startsWith("comment") || t == "rc") Set("rc") else Set.empty[String]
        val rs = if (t.startsWith("submission") || t == "rs") Set("rs") else Set.empty[String]
        // superset: the reference documents rr but never implemented it
        // (class scaladoc); the prefix match mirrors the rc/rs branches
        val rr = if (t.startsWith("subreddit") || t == "rr") Set("rr") else Set.empty[String]
        rc ++ rs ++ rr
    }

    def multi(k: String): Seq[String] =
      params.getOrElse(k, Nil).flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

    for {
      cb <- parseLong("comment_backfill", clamp = true)
      sb <- parseLong("submission_backfill", clamp = true)
      cs <- parseLong("comment_start_id", clamp = false)
      ss <- parseLong("submission_start_id", clamp = false)
      rb <- parseLong("subreddit_backfill", clamp = true)
      rs <- parseLong("subreddit_start_id", clamp = false)
    } yield ParamSpec(
      types = types,
      authors = multi("author"),
      subreddits = multi("subreddit"),
      // first occurrence only, comma-split, lowercased (sse.py:213)
      domains = first("domain").toSeq
        .flatMap(_.split(',')).map(_.trim.toLowerCase).filter(_.nonEmpty),
      over18 = first("over_18"),
      isSelf = first("is_self"),
      filterKeys = first("filter").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
      commentBackfill = cb,
      submissionBackfill = sb,
      commentStartId = cs,
      submissionStartId = ss,
      subredditBackfill = rb,
      subredditStartId = rs)
  }
}
