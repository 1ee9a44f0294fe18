package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization as column ops — the crawl-intake form shared
  * by the q84 oracle face, the q145 frontier composition, and the
  * production [[graft.sources.WarcSource.frontierPlan]] face (which
  * is why it lives here, with the other reusable functions, rather
  * than inside the query registry). The reference's surface has no
  * URL handling (it validates CSV uploads); this is LLM-pipeline
  * intake plumbing: URL-level dedup and domain blocklists run BEFORE
  * any text-level stage because they are nearly free.
  */
object UrlOps {

  /** Tracking-parameter prefix (the `utm_*` family) — matched by plain
    * substring arithmetic, not LIKE: `_` is a LIKE wildcard and escape
    * syntax differs across engines, while `substr(p,1,4)` is portable.
    */
  private[graft] val TrackPrefix = "utm_"

  /** URL normalization chain over a raw URL string column — the
    * canonical form used for URL-level dedup and domain blocklists:
    * scheme and host lowercase, a leading `www.` stripped, the
    * scheme's default port (:80 http / :443 https) dropped while real
    * ports survive, `utm_*` tracking parameters removed with the
    * remaining query-string order preserved, and the fragment cut.
    * Everything is anchored-regex + substring arithmetic; one
    * codegen'd projection, no join, no shuffle.
    *
    * Returns struct(url_norm, host, domain, n_tracking) — domain is
    * the last two host labels (the registrable-domain convention for
    * domain-level policy; a production run would consult the public
    * suffix list, which is a data file, not different plumbing).
    */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    // an empty path canonicalizes to "/": 'https://a.example' and
    // 'https://a.example/' are the same resource, and without this
    // the root URL escapes URL-level dedup (robots handling is
    // unaffected — allowed() already maps "" to "/")
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    // the query must be found BEFORE any '#': an unanchored "\\?"
    // would match a '?' inside the fragment and fabricate a query
    // from fragment text (wrong dedup key, wrong robots path)
    val qs = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val host = regexp_replace(
      regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val params = filter(split(qs, "&"), p => p =!= "")
    val kept = filter(params, p => substring(p, 1, 4) =!= TrackPrefix)
    val keptQs = array_join(kept, "&")
    val urlNorm = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(keptQs =!= "", concat(lit("?"), keptQs)).otherwise(lit("")))
    struct(
      urlNorm.as("url_norm"),
      host.as("host"),
      array_join(slice(split(host, "\\."), -2, 2), ".").as("domain"),
      (size(params) - size(kept)).cast("bigint").as("n_tracking"))
  }
}
