package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Column expressions (whole-stage-codegen friendly); the
  * rolling-hash fingerprint runs as a native Catalyst expression
  * ([[graft.expr.WinnowFingerprint]]) over the shared [[winnow]] kernel.
  */
object TextFns {

  /** Whitespace tokens (Python str.split() semantics: runs of whitespace,
    * no empty tokens).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Lowercased [[tokens]] — THE materialization-boundary recipe for the
    * lambda-heavy consumers ([[langScoresFromTokens]], the stopword band):
    * select this through a projection boundary once and pass the column,
    * instead of restating `transform(tokens(text), lower)` per call site.
    */
  def loweredTokens(text: Column): Column = transform(tokens(text), lower _)

  /** BPE-ish subword count: letter runs + digit runs + punctuation singles,
    * the standard cheap proxy for tokenizer load in data pipelines.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[\p{L}]+|[0-9]+|[^\p{L}0-9\s]"""), lit(0)))

  // ------------------------------------------------------------ language ID

  /** Tiny per-language stopword profiles (public common-word lists) — the
    * DEFAULT model. The classifier scores each language by the fraction of
    * tokens that are stopwords of that language and picks the argmax
    * (ties → first in profile order); with no profile scoring > 0 it
    * returns "und". Every scorer takes the profile seq as a parameter, so a
    * deployment plugs its own (larger) model without touching the engine;
    * honest label: 4 short public stopword lists, not a trained LID model.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "was", "on", "with", "as", "at"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu", "den", "nicht", "im", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "dans", "que", "pour", "pas", "sur"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "del", "en", "que", "por", "para", "con"))

  /** A WIDER 12-language public stopword model — [[LangProfiles]] plus
    * eight more common-word lists. Used by the gated q26 so the O(L)
    * plan-size contract runs under the DRIVER gate at a realistic profile
    * count, not only in the TextFnsSpec plan assertion (which goes to 20);
    * the 4-profile [[LangProfiles]] remains the engine default that
    * [[qualitySignalsFromTokens]] and the Corpus verdict chain key on.
    * Deliberately ASCII-only words so the Scala-embedded and SQL-embedded
    * literals can never diverge by encoding.
    */
  val LangProfilesWide: Seq[(String, Seq[String])] = LangProfiles ++ Seq(
    "it" -> Seq("il", "lo", "la", "le", "di", "che", "un", "una", "per", "non", "sono", "con", "del", "si", "come"),
    "pt" -> Seq("o", "os", "as", "de", "que", "um", "uma", "do", "da", "em", "para", "com", "por", "mais", "se"),
    "nl" -> Seq("de", "het", "een", "en", "van", "ik", "te", "dat", "die", "in", "je", "niet", "op", "aan", "met"),
    "sv" -> Seq("och", "att", "det", "som", "en", "av", "den", "till", "med", "var", "om", "inte", "han", "hon", "ett"),
    "da" -> Seq("og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "de", "med", "han", "af", "hun"),
    "no" -> Seq("og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som", "de", "med", "han", "av"),
    "pl" -> Seq("i", "w", "nie", "na", "to", "z", "do", "jest", "ze", "sie", "co", "tak", "jak", "po", "ma"),
    "tr" -> Seq("bir", "ve", "bu", "da", "de", "ne", "o", "icin", "gibi", "ama", "ben", "sen", "var", "yok", "cok"))

  def langScores(text: Column, profiles: Seq[(String, Seq[String])] = LangProfiles): Column =
    langScoresFromTokens(loweredTokens(text), profiles)

  /** [[langScores]] over an already-materialized LOWERED token array.
    *
    * Why the variant exists: the token array is referenced from one filter
    * lambda PER profile, and Catalyst CSE does not deduplicate expression
    * trees referenced from lambda bodies (this repo's documented trap —
    * see DocDedup.minhashSignature) — an inline `tokens(text)` here
    * re-splits the text once per profile per row. Callers scoring alongside
    * other token consumers should select the token array through a
    * projection boundary first and pass the column.
    */
  def langScoresFromTokens(
      loweredToks: Column,
      profiles: Seq[(String, Seq[String])] = LangProfiles): Column = {
    val n = greatest(size(loweredToks), lit(1)).cast("double")
    map_from_arrays(
      array(profiles.map(p => lit(p._1)): _*),
      array(profiles.map { case (_, words) =>
        size(filter(loweredToks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))) / n
      }: _*))
  }

  /** ONE profile's stopword ratio over an already-materialized lowered
    * token array — identical arithmetic to the matching entry of
    * [[langScoresFromTokens]] (size(filter)/greatest(n,1)). Callers that
    * consume a single language's score should use this instead of
    * building the full L-profile map and extracting one entry: the map
    * form evaluates every profile's filter per row, L× the work for the
    * same answer (Catalyst cannot prune map_from_arrays entries behind an
    * element_at).
    */
  def stopRatioFromTokens(loweredToks: Column, words: Seq[String]): Column =
    size(filter(loweredToks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))) /
      greatest(size(loweredToks), lit(1)).cast("double")

  /** Predicted language code, or "und" when no profile scores > 0. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = LangProfiles): Column =
    langIdFromTokens(loweredTokens(text), profiles)

  /** [[langId]] over an already-materialized lowered token array.
    *
    * Plan-size contract: the expression is O(L) in the profile count — one
    * score subtree per profile inside a single array_max over
    * (score, reverse-order, lang) structs, referenced exactly ONCE. Struct
    * comparison is lexicographic, so equal scores fall back to the higher
    * order value = the earlier profile (the documented tie rule), and the
    * "und" fallback rides the SAME array as a (0.0, L, "und") sentinel:
    * any profile scoring > 0 beats it, an all-zero row ties at 0.0 and the
    * sentinel's highest order wins — no second reference to the argmax
    * tree. That single-reference shape matters twice over: the previous
    * fold re-referenced the WHOLE scores map per profile (O(L²) expression
    * nodes, the source of the ~1.5 MiB serialized task binaries at L = 4),
    * and even an O(L) tree referenced from two `when` branches would
    * evaluate per reference at runtime, because Spark's subexpression
    * elimination skips any tree containing lambda variables
    * (SPARK-35410) — the filter lambdas here disqualify the whole argmax
    * from CSE.
    */
  def langIdFromTokens(
      loweredToks: Column,
      profiles: Seq[(String, Seq[String])] = LangProfiles): Column = {
    val n = greatest(size(loweredToks), lit(1)).cast("double")
    val L = profiles.size
    val entries = profiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        (size(filter(loweredToks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))) / n).as("s"),
        lit(L - 1 - i).as("o"),
        lit(lang).as("l"))
    } :+ struct(lit(0.0).as("s"), lit(L).as("o"), lit("und").as("l"))
    array_max(array(entries: _*)).getField("l")
  }

  // --------------------------------------------------------- quality score

  /** Heuristic quality signals used by pretraining filters (C4/Gopher-style
    * rules re-expressed as Columns): mean word length, stopword ratio,
    * punctuation-terminal ratio, alpha ratio, repetition ratio.
    */
  def qualitySignals(text: Column): Column = {
    val tk = tokens(text)
    qualitySignalsFromTokens(text, tk, transform(tk, lower _))
  }

  /** [[qualitySignals]] over an already-materialized (raw, unlowered)
    * token array — same lambda-vs-CSE reasoning as
    * [[langScoresFromTokens]]; `text` is still needed for the
    * character-level ratios.
    */
  def qualitySignalsFromTokens(text: Column, toks: Column, loweredToks: Column): Column = {
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val enStop = LangProfiles.head._2
    val meanWordLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok
    val stopRatio = size(filter(loweredToks, t => t.isin(enStop.map(_.asInstanceOf[Any]): _*))) / nTok
    val alphaRatio = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") /
      greatest(length(text), lit(1))
    val punctTerm = length(regexp_replace(text, "[^.!?]", "")).cast("double") / nTok
    val distinctRatio = size(array_distinct(toks)) / nTok
    struct(
      round(meanWordLen, 4).as("mean_word_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(punctTerm, 4).as("punct_per_token"),
      round(distinctRatio, 4).as("distinct_token_ratio"))
  }

  /** Scalar [0,1] quality score: the Gopher-ish band checks, averaged. */
  def qualityScore(text: Column): Column = {
    val tk = tokens(text)
    qualityScoreFromTokens(text, tk, transform(tk, lower _))
  }

  /** [[qualityScore]] over already-materialized raw + lowered token
    * arrays (callers sharing the arrays with other consumers pass both —
    * re-lowering internally would cost one array transform per row on the
    * hot verdict kernel).
    */
  def qualityScoreFromTokens(text: Column, toks: Column, loweredToks: Column): Column = {
    val s = qualitySignalsFromTokens(text, toks, loweredToks)
    val checks = Seq(
      s.getField("mean_word_len").between(3.0, 10.0),
      s.getField("stopword_ratio") >= 0.01,
      s.getField("alpha_ratio") >= 0.6,
      s.getField("distinct_token_ratio") >= 0.2)
    round(checks.map(c => when(c, 1.0).otherwise(0.0)).reduce(_ + _) / checks.size, 4)
  }

  // ------------------------------------------------------------ repetition

  /** Space-joined word n-grams over an already-materialized token array —
    * empty array when the doc has fewer than n tokens. Same
    * materialization-boundary contract as [[langScoresFromTokens]]: `toks`
    * is referenced from a lambda, so callers must pass a projected column,
    * not an inline `tokens(text)` tree (SPARK-35410 would re-split per
    * reference).
    */
  def ngrams(toks: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    when(size(toks) < n, typedLit(Array.empty[String]))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Gopher-style repetition/format signals (Rae et al. 2021 §A1.1, the
    * standard pretraining repetition filters), re-expressed as one pure
    * Column struct:
    *  - dup_line_frac / dup_line_char_frac — fraction of lines (and of
    *    line characters) that repeat an EARLIER line verbatim
    *  - bullet_line_frac / ellipsis_line_frac — lines starting with a
    *    bullet ("- ", "* ") / ending with "..." after trimming
    *  - symbol_word_ratio — '#' and "..." occurrences per token
    *  - top_bigram_char_frac — characters covered by the most frequent
    *    word bigram (count × bigram length / doc length); ties break to
    *    the lexicographically LARGER bigram (array_max struct order)
    *
    * All row-local, no shuffle. Per-row cost bounds (documented, Gopher
    * computes the same quantities hashmap-style): the dup-line scan is
    * O(lines²) via array_position and the top-bigram scan O(distinct ×
    * total) bigrams — fine for web documents (10²-10³ lines/tokens); a
    * corpus of pathological million-line docs should pre-truncate, the
    * same contract as the signature kernels. Callers pass MATERIALIZED
    * `toks` and `lines` columns through a projection boundary (the
    * [[loweredTokens]] rule — every signal references them from lambdas).
    */
  def repetitionSignals(text: Column, toks: Column, lines: Column): Column = {
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val nChars = greatest(length(text), lit(1)).cast("double")
    val nTok = greatest(size(toks), lit(1)).cast("double")
    // line i (0-based lambda index) repeats an earlier line iff its FIRST
    // occurrence (1-based array_position) sits strictly before i+1
    val dupLineCount = size(filter(lines, (l, i) => array_position(lines, l) < i + 1))
    val dupLineChars = aggregate(
      transform(lines, (l, i) =>
        when(array_position(lines, l) < i + 1, length(l)).otherwise(lit(0))),
      lit(0), _ + _)
    val bulletCount = size(filter(lines,
      l => ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ")))
    val ellipsisCount = size(filter(lines, l => rtrim(l).endsWith("...")))
    val hashCount = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisOcc = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    // argmax by (count, bigram) struct order, computed as ONE run-length
    // scan over the SORTED bigram array — O(n log n) per row, not the
    // O(distinct × total) of the naive distinct×filter count (measured
    // 44 s → sub-second over sf0.1 documents). Equal runs are adjacent
    // after the sort and arrive in ascending bigram order, so replacing
    // the best on `count >=` reproduces the (count, lexicographically
    // LARGER bigram) tie-break exactly. The winner leaves the aggregate as
    // a 2-field struct BOUND in the accumulator — reading `c`/`g` off it
    // never re-runs the scan (SPARK-35410: CSE skips lambda-bearing
    // trees, so a twice-referenced argmax tree would evaluate twice).
    val top = aggregate(
      array_sort(ngrams(toks, 2)),
      struct(lit(0).as("bc"), lit("").as("bg"), lit(0).as("cc"), lit("").as("cg")),
      (acc, g) => {
        val cc = when(g === acc.getField("cg"), acc.getField("cc") + 1).otherwise(lit(1))
        struct(
          when(cc >= acc.getField("bc"), cc).otherwise(acc.getField("bc")).as("bc"),
          when(cc >= acc.getField("bc"), g).otherwise(acc.getField("bg")).as("bg"),
          cc.as("cc"), g.as("cg"))
      },
      acc => when(acc.getField("bc") > 0,
        struct(acc.getField("bc").as("c"), acc.getField("bg").as("g"))))
    val topFrac = coalesce(
      aggregate(array(top), lit(0.0),
        (acc, w) => acc + w.getField("c") * length(w.getField("g")) / nChars),
      lit(0.0))
    struct(
      round(dupLineCount / nLines, 4).as("dup_line_frac"),
      round(dupLineChars / nChars, 4).as("dup_line_char_frac"),
      round(bulletCount / nLines, 4).as("bullet_line_frac"),
      round(ellipsisCount / nLines, 4).as("ellipsis_line_frac"),
      round((hashCount + ellipsisOcc) / nTok, 4).as("symbol_word_ratio"),
      round(least(topFrac, lit(1.0)), 4).as("top_bigram_char_frac"))
  }

  // ------------------------------------------------------------- redaction

  /** PII-style scrubbing patterns (the C4/RefinedWeb-grade cleanup a
    * pretraining pipeline runs before training): URLs, emails, IPv4
    * addresses, phone-shaped number runs — each replaced by a typed
    * placeholder token, applied IN ORDER (URL first, so an address inside
    * a URL is already gone when the email pass runs). Deliberately
    * restricted to the regex subset Java (Spark codegen'd regexp_replace)
    * and RE2 (the DuckDB oracle) interpret identically: character classes,
    * bounded repetition, \b, non-capturing groups — no lookarounds, no
    * backreferences. Order and patterns are DATA (a deployment swaps its
    * own), and the gated q47 recomputes the whole cascade cross-engine.
    */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    """https?://[^\s]+""" -> "<URL>",
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""" -> "<IP>",
    """\+?\d{1,3}[ -]\d{3}[ -]\d{3,4}(?:[ -]\d{3,4})?""" -> "<PHONE>")

  /** Apply the redaction cascade — one codegen'd `regexp_replace` per
    * pattern, all occurrences, in sequence. Pure Column expression: at
    * 100 TB this rides the same projection pass as the other row-local
    * verdict kernels, no shuffle, no UDF.
    */
  def redact(text: Column, patterns: Seq[(String, String)] = RedactionPatterns): Column =
    patterns.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  // ------------------------------------------------------ html extraction

  /** HTML-stripping cascade, applied IN ORDER (comments and script/style
    * BLOCKS go first — a `</div>` inside a script string must die with its
    * script, not terminate a tag scan; block-closing tags become newlines
    * so line structure survives for the line-based filters; then every
    * remaining tag-shaped run `<...>` is dropped — including a stray
    * `< b and c >` in prose, a DEFINED loss of this regex-grammar cascade,
    * stated rather than hidden). Patterns are DATA (a deployment swaps its
    * own) and deliberately in the Java∩RE2-identical subset — inline
    * `(?is)` flags, lazy quantifiers, `\b`, bounded repetition; no
    * lookarounds, no backreferences — so the gated q50 can re-run the
    * WHOLE cascade in DuckDB's RE2 and hash-compare.
    */
  val HtmlStripPatterns: Seq[(String, String)] = Seq(
    "(?is)<!--.*?-->" -> " ",
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/td|/table)\\b[^>]*>" -> "\n",
    "<[^>]*>" -> " ")

  /** Named-entity decodes, applied in order with `&amp;` LAST — the
    * standard rule that keeps double-encoded text single-encoded
    * (`&amp;lt;` → `&lt;`, never `<`). Literal replaces, not regex.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Whitespace normalization after stripping: collapse non-newline
    * whitespace runs, trim spaces hugging newlines, bound blank runs at
    * one empty line. `[^\S\n]` instead of `\s` keeps Java and RE2
    * identical on everything but the vertical tab (the q23 caveat).
    */
  val HtmlWhitespacePatterns: Seq[(String, String)] = Seq(
    "[^\\S\\n]+" -> " ",
    " ?\\n ?" -> "\n",
    "\\n{3,}" -> "\n\n")

  /** HTML → visible text — the WET-generation step of a Common-Crawl-style
    * pipeline, producing the `text` column of the pages table from its
    * `html`. One codegen'd `regexp_replace`/`replace` per cascade entry,
    * pure Column expression: at 100 TB this is a row-local projection
    * pass, no shuffle, no UDF. For an `html: binary` column (the
    * Common-Crawl page-table shape), pass `col("html").cast("string")` —
    * UTF-8 decode, the same bytes-to-text rule the WET step uses.
    */
  def htmlToText(html: Column): Column = {
    val stripped = HtmlStripPatterns.foldLeft(html) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val decoded = HtmlEntities.foldLeft(stripped) {
      case (c, (e, r)) => replace(c, lit(e), lit(r))
    }
    // trim BOTH spaces and newlines at the edges (one-arg trim is
    // spaces-only in Spark and DuckDB alike)
    trim(HtmlWhitespacePatterns.foldLeft(decoded) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }, " \n")
  }

  // ---------------------------------------------------------- fingerprint

  /** Winnowing document fingerprint: hash every character k-gram, slide a
    * `window` over the hash sequence one position at a time and select each
    * window's minimum — a compact near-dup signature with the winnowing
    * guarantee (k=9, window=16; Schleimer et al., SIGMOD'03: any shared
    * substring of length >= window+k-1 contributes a shared fingerprint).
    * Deterministic; returns a sorted distinct array of selected hashes.
    *
    * Two k-gram hash families, same selection semantics:
    *  - "poly" (default): polynomial rolling hash, O(1) per position — the
    *    production hot path.
    *  - "md5": top 60 bits of md5(gram), big-endian — O(k) per position but
    *    recomputable by any engine (the DuckDB oracle derives the identical
    *    value as `('0x'||substr(md5(g),1,15))::UBIGINT`), which puts the
    *    window-min selection logic under the cross-engine correctness gate.
    *    60 bits (not 64) so the values are non-negative and signed/unsigned
    *    MIN comparisons agree across engines.
    */
  val fingerprintUdf = udf(winnow _)

  /** UDF reference form of [[graft.expr.Native.nfcNormalize]] — the
    * ExprBench A/B counterpart and the native≡UDF parity baseline. Same
    * java.text.Normalizer kernel, wrapped in the converter layer the
    * native expression exists to avoid.
    */
  val nfcNormalizeUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** The pure winnowing kernel — shared by the UDF form above (the golden
    * reference) and the native Catalyst expression
    * ([[graft.expr.WinnowFingerprint]], the production column).
    */
  def winnow(text: String, k: Int, window: Int, hashKind: String): Array[Long] = {
    if (text == null || text.length < k) Array.empty[Long]
    else {
      val n = text.length - k + 1
      val hashes = new Array[Long](n)
      if (hashKind == "md5") {
        val md = java.security.MessageDigest.getInstance("MD5")
        var i = 0
        while (i < n) {
          val d = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
          var h = 0L
          var j = 0
          while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
          hashes(i) = h >>> 4 // top 60 bits = first 15 hex chars of md5
          i += 1
        }
      } else {
        val B = 1000000007L
        var h = 0L
        var pow = 1L
        var i = 0
        while (i < k) { h = h * B + text.charAt(i); if (i < k - 1) pow = pow * B; i += 1 }
        hashes(0) = h
        i = 1
        while (i < n) {
          h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
          hashes(i) = h
          i += 1
        }
      }
      // TRUE winnowing selection: the window SLIDES one position at a time
      // (Schleimer et al. §4 — any shared substring of length >= window+k-1
      // then shares a fingerprint). Stepping by `window` instead (the
      // tempting "block" reading) forfeits exactly that shift-robustness:
      // one inserted character moves every later block boundary. Sliding
      // minima via a monotonic deque — O(1) amortized per position, so the
      // poly path stays O(n) overall. A short doc (k-grams exist but fewer
      // than `window` of them) emits the minimum of what it has.
      val selected = scala.collection.mutable.SortedSet.empty[Long]
      val dq = new java.util.ArrayDeque[Int]()
      var p = 0
      while (p < n) {
        while (!dq.isEmpty && hashes(dq.peekLast()) >= hashes(p)) dq.pollLast()
        dq.addLast(p)
        while (dq.peekFirst() <= p - window) dq.pollFirst()
        if (p >= window - 1) selected += hashes(dq.peekFirst())
        p += 1
      }
      if (n < window) selected += hashes(dq.peekFirst()) // deque front = global min
      selected.toArray
    }
  }

  def fingerprint(text: Column, k: Int = 9, window: Int = 16, hashKind: String = "poly"): Column = {
    require(k > 0, "k must be positive")
    require(window > 0, "window must be positive") // window<=0 would loop forever
    // native expression (codegen, no converter layer); coalesce reproduces
    // the kernel's null → empty-array contract (nullSafeEval yields NULL)
    coalesce(
      graft.expr.Native.winnowFingerprint(text, k, window, hashKind),
      typedLit(Array.empty[Long]))
  }
}
