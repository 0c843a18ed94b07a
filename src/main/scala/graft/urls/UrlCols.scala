package graft.urls

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level twins of the pure [[Urls]] functions — the single place
  * every pipeline stage derives URL keys from, so the frontier, the robots
  * rule table, the politeness scheduler and the offsite filter can never
  * disagree on what "the host of this URL" means.
  */
object UrlCols {

  val canonicalUdf = udf((u: String) => Urls.canonicalize(u))

  val hostOfUdf = udf((u: String) => Urls.hostOf(u))

  /** Host column — built-in `parse_url` (codegen-friendly) with a
    * [[Urls.hostOf]] UDF fallback: `parse_url` follows java.net.URI and
    * returns NULL for hosts URI rejects (e.g. underscores, common in the
    * wild), which would collapse those rows into one NULL politeness bucket,
    * break the offsite filter, and make robots rules silently fail open for
    * exactly those hosts. Coalesce evaluates the UDF only on the rare NULL
    * rows, so the hot path stays codegen. The trailing-dot strip mirrors
    * [[Urls.hostOf]]/[[Urls.canonicalize]] — a dotted FQDN must land in the
    * same politeness bucket and match the same robots rules as its
    * undotted twin.
    */
  def hostCol(url: Column): Column =
    coalesce(
      regexp_replace(lower(parse_url(url, lit("HOST"))), "\\.$", ""),
      hostOfUdf(url))
}
