package graft.urls

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** URL construction, canonicalization and keying (SURVEY.md §2 #24,35,36).
  *
  * All functions here are pure and deterministic — they run inside Spark as
  * column expressions / UDFs but are plain Scala so unit tests can assert
  * byte-exactness against the reference's observed behavior:
  *   - Mastercard matrix-param URL builder (reference MCSpider.py:45-46,59-67)
  *   - Visa urlencoded URL builder including the `exchangedate=None` dangling
  *     param quirk (reference VisaSpider.py:32-34,45-51)
  *   - Scrapy/w3lib-style canonicalization: lowercase scheme+host, strip
  *     fragment and default port, sort query params, percent-normalize
  *     (Scrapy 1.8 RFPDupeFilter semantics; north_rule canonicalization list)
  */
object Urls {

  // ---------------------------------------------------------------- encode

  /** Python `urllib.parse.quote_plus` semantics: unreserved = ALNUM + `-_.~`,
    * space → `+`, everything else percent-encoded UTF-8 uppercase-hex.
    */
  def quotePlus(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** `urllib.parse.urlencode(params)` over an *ordered* param list (Python
    * dicts preserve insertion order; param order is part of the byte-exact
    * URL contract).
    */
  def urlencode(params: Seq[(String, String)]): String =
    params.map { case (k, v) => s"${quotePlus(k)}=${quotePlus(v)}" }.mkString("&")

  // ------------------------------------------------------------- builders

  val McDateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  val VisaDateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("MM/dd/yyyy")
  val StdDateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("dd/MM/yyyy")

  val McRateUrlTemplate = "https://www.mastercard.co.uk/settlement/currencyrate/%s/conversion-rate"
  val McCurrUrl = "https://www.mastercard.co.uk/settlement/currencyrate/settlement-currencies"
  val McSupportUrl = "https://www.mastercard.co.uk/en-gb/consumers/get-support/convert-currency.html"
  val VisaCalcUrl = "https://www.visa.co.uk/support/consumer/travel-support/exchange-rate-calculator.html"

  /** Mastercard conversion-rate URL: matrix params `k=v;k=v` spliced into the
    * path. Param order is the reference dict's insertion order
    * (fxDate, transCurr, crdhldBillCurr, bankFee, transAmt) — byte-exact
    * (MCSpider.py:45-46,59-67).
    */
  def mcUrl(cardC: String, transC: String, date: LocalDate): String = {
    val paramString =
      s"fxDate=${McDateFmt.format(date)};transCurr=$transC;crdhldBillCurr=$cardC;bankFee=0.0;transAmt=1"
    McRateUrlTemplate.format(paramString)
  }

  /** Visa calculator URL. Reproduces the reference bug-for-bug
    * (VisaSpider.py:32-34,45-51): the params dict declares `exchangedate`
    * but code assigns `params['date']`, so `exchangedate=None` is emitted
    * literally and `date=...` lands at the END of the param list.
    */
  def visaUrl(cardC: String, transC: String, date: LocalDate): String = {
    val params = Seq(
      "amount" -> "1",
      "fee" -> "0.0",
      "exchangedate" -> "None",
      "fromCurr" -> cardC,
      "toCurr" -> transC,
      "submitButton" -> "Calculate exchange rate",
      "date" -> VisaDateFmt.format(date))
    s"$VisaCalcUrl?${urlencode(params)}"
  }

  // -------------------------------------------------------- canonicalize

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** Characters never percent-encoded in a canonical path. */
  private def isPathSafe(c: Char): Boolean =
    (c.isLetterOrDigit && c < 128) || "-_.~!$&'()*+,;=:@/%".indexOf(c) >= 0

  /** Percent-normalization (w3lib-style unquote-then-requote, idempotent):
    * escapes of UNRESERVED bytes (RFC 3986 §2.3: ALNUM + `-._~`) decode to
    * the bare character — `%7E` and `~` are byte-identical resources and
    * must share one dedup key; every other escape keeps uppercase hex; raw
    * non-safe bytes are encoded.
    */
  private def normalizeEscapes(s: String, safe: Char => Boolean): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val b = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        val ch = b.toChar
        if (b < 128 && (ch.isLetterOrDigit || ch == '-' || ch == '_' || ch == '.' || ch == '~'))
          sb.append(ch)
        else
          sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else if (safe(c)) { sb.append(c); i += 1 }
      else {
        c.toString.getBytes("UTF-8").foreach(b => sb.append(f"%%${b & 0xff}%02X"))
        i += 1
      }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isQuerySafe(c: Char): Boolean =
    (c.isLetterOrDigit && c < 128) || "-_.~!$&'()*+,;:@/?%".indexOf(c) >= 0

  /** Canonicalize a URL for dedup keying (north_rule):
    * lowercase scheme + host, strip fragment, strip default port, sort query
    * params by (key, value) stable, percent-normalize path and query,
    * empty path → "/".
    */
  def canonicalize(url: String): String = {
    if (url == null) return null // null-safe: UDFs receive nulls as-is
    val (beforeFrag, _) = splitOnce(url, '#')
    val (schemeRest, scheme) = {
      val i = beforeFrag.indexOf("://")
      if (i < 0) (beforeFrag, "http") else (beforeFrag.substring(i + 3), beforeFrag.substring(0, i).toLowerCase)
    }
    val (authorityPath, query) = splitOnce(schemeRest, '?')
    val slash = authorityPath.indexOf('/')
    val (authority, rawPath) =
      if (slash < 0) (authorityPath, "") else (authorityPath.substring(0, slash), authorityPath.substring(slash))
    // userinfo (rare) kept verbatim; host lowercased; default port stripped
    val (userinfo, hostport) = {
      val at = authority.lastIndexOf('@')
      if (at < 0) ("", authority) else (authority.substring(0, at + 1), authority.substring(at + 1))
    }
    val (host, port) = splitOnce(hostport, ':')
    val canonPort = port match {
      case Some(p) if p.nonEmpty && DefaultPorts.get(scheme).exists(_.toString == p) => ""
      case Some(p) => s":$p"
      case None => ""
    }
    val canonHost = host.toLowerCase.stripSuffix(".")
    val canonPath = {
      val p = normalizeEscapes(rawPath, isPathSafe)
      if (p.isEmpty) "/" else p
    }
    val canonQuery = query match {
      case Some(q) =>
        val pairs = q.split("&", -1).filter(_.nonEmpty).toSeq.map { kv =>
          val (k, v) = splitOnce(kv, '=')
          (normalizeEscapes(k, isQuerySafe), v.map(normalizeEscapes(_, isQuerySafe)))
        }
        val sorted = pairs.sortBy { case (k, v) => (k, v.getOrElse("")) }
        if (sorted.isEmpty) ""
        else "?" + sorted.map { case (k, v) => v.fold(k)(vv => s"$k=$vv") }.mkString("&")
      case None => ""
    }
    s"$scheme://$userinfo$canonHost$canonPort$canonPath$canonQuery"
  }

  /** Scrapy 1.8 `request_fingerprint`, bit-for-bit (scrapy/utils/request.py
    * in the 1.8 line, the dupefilter key the reference runs under —
    * Pipfile.lock:271): `sha1(method ++ canonicalize_url(url) ++ body)`
    * hex digest, with no headers in the default hash. [[canonicalize]] is
    * this engine's w3lib-parity canonicalization (separately unit-tested),
    * so for the reference's GET-only, body-less requests the fingerprint is
    * `sha1("GET" + canonical_url)`.
    *
    * This is the BIT-PARITY dupefilter mode: the engine's default key is
    * xxhash64(canonical_url) — semantically equivalent for a GET-only crawl
    * (both are injective in the canonical URL) and 8 bytes instead of a
    * 40-char hex string. Pass `DedupKey.ScrapySha1` to
    * [[graft.crawl.CrawlJob.expandSeeds]] to key the seen set by this
    * fingerprint instead.
    */
  def scrapyFingerprint(
      url: String,
      method: String = "GET",
      body: Array[Byte] = Array.emptyByteArray): String = {
    if (url == null) return null // null-safe: UDFs receive nulls as-is
    scrapyFingerprintOfCanonical(canonicalize(url), method, body)
  }

  /** [[scrapyFingerprint]] over an ALREADY-canonicalized URL. The frontier
    * computes `canonUrl` once and carries it as data; the dedup-key path
    * must hash that column, not re-run the regex-heavy canonicalization
    * per row inside the fingerprint.
    */
  def scrapyFingerprintOfCanonical(
      canonUrl: String,
      method: String = "GET",
      body: Array[Byte] = Array.emptyByteArray): String = {
    if (canonUrl == null) return null
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(method.getBytes("UTF-8"))
    md.update(canonUrl.getBytes("UTF-8"))
    md.update(body)
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Host of a URL (lowercased, no port, trailing dot stripped — the SAME
    * normalization [[canonicalize]] applies, so the dedup key and the
    * politeness/robots key can never disagree about a dotted-FQDN URL).
    */
  def hostOf(url: String): String = {
    if (url == null) return null // null-safe: UDFs receive nulls as-is
    val i = url.indexOf("://")
    val rest = if (i < 0) url else url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case e => e
    }
    val auth = rest.substring(0, end)
    val at = auth.lastIndexOf('@')
    val hostport = if (at < 0) auth else auth.substring(at + 1)
    splitOnce(hostport, ':')._1.toLowerCase.stripSuffix(".")
  }

  /** splitOnce("a#b", '#') = ("a", Some("b")); ("a#b", None) if sep absent. */
  private def splitOnce(s: String, sep: Char): (String, Option[String]) = {
    val i = s.indexOf(sep)
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }
}
