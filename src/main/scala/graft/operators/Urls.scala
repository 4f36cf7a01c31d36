package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-frontier
  * primitive that runs BEFORE any text dedup: the same page fetched as
  * `HTTP://WWW.Site.COM:80/a/?utm_source=x&id=1#top` and
  * `http://www.site.com/a?id=1` must collapse to one canonical key.
  *
  * Rules (RFC 3986 normalization + standard crawl practice, cf. the
  * C4/RefinedWeb pipelines): lowercase scheme and host; strip the
  * scheme-default port (:80 http, :443 https); drop the fragment; drop
  * tracking parameters (utm_*, fbclid, gclid); sort the surviving
  * query parameters; strip the trailing slash of a non-root path
  * (empty path → "/").
  *
  * Scale shape: [[canonicalize]] is a pure `Column` expression —
  * regexp field extraction + array filter/sort — so it stays inside
  * whole-stage codegen, a map-only pass at any corpus size.
  * [[dedupByCanonical]] then shuffles only (canonical-key, id) pairs
  * into a keep-min groupBy, exactly the d1 exact-dedup shape: the raw
  * URL strings move once, nothing is quadratic. */
object Urls {

  // scheme :// host [:port] [path] [?query] [#fragment] — RE2-safe,
  // identical in Spark (Java regex) and the DuckDB oracle.
  private val urlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"

  private def grp(url: Column, i: Int): Column = regexp_extract(url, urlRe, i)

  /** Canonical form of one URL column (empty string for non-URLs). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(grp(url, 1))
    val host = lower(grp(url, 2))
    val rawPort = grp(url, 3)
    val port = when(
      (scheme === "http" && rawPort === ":80") ||
        (scheme === "https" && rawPort === ":443"), "").otherwise(rawPort)
    val strippedPath = regexp_replace(grp(url, 4), "/+$", "")
    val path = when(strippedPath === "", "/").otherwise(strippedPath)
    val params = filter(
      split(substring(grp(url, 5), 2, 1 << 24), "&"),
      p => !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p === ""))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    when(scheme === "", "")
      .otherwise(concat(scheme, lit("://"), host, port, path, query))
  }

  /** Canonical-URL dedup: one row per canonical key with the kept
    * (minimum) id, the number of raw URLs that collapsed onto it, and
    * the distinct raw spellings seen. */
  def dedupByCanonical(df: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(urlCol).as("url"))
      .withColumn("canonical_url", canonicalize(col("url")))
      .groupBy("canonical_url")
      .agg(min(col("id")).as("keep_id"),
        count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_spellings"))
}
