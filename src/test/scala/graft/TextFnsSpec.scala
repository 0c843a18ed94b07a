package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace runs, Python str.split() semantics") {
    val out = Seq("a b  c", "  leading and trailing  ", "one", "")
      .toDF("t").select(TextFns.tokenCount(col("t"))).as[Int].collect()
    assert(out.toSeq === Seq(3, 3, 1, 0))
  }

  test("langId picks the dominant stopword profile") {
    val rows = Seq(
      "the cat sat on the mat and it was happy" -> "en",
      "der hund und die katze sind nicht im haus" -> "de",
      "le chat est dans la maison et il est content pour le moment" -> "fr",
      "el perro y el gato en la casa es un animal" -> "es",
      "zzz qqq xxx www" -> "und")
    val out = rows.map(_._1).toDF("t")
      .select(TextFns.langId(col("t"))).as[String].collect()
    assert(out.toSeq === rows.map(_._2))
  }

  test("langId is pluggable: 16-profile model classifies and ties break to the earlier profile") {
    // 16 synthetic languages, each with a disjoint 5-word stopword list
    val profiles = (0 until 16).map(i =>
      s"l$i" -> (0 until 5).map(j => s"w${i}s$j"))
    val rows = Seq(
      "w3s0 w3s1 w3s2 other words here" -> "l3",   // dominant profile 3
      "w7s0 w7s1 w12s0 w12s1 filler xx" -> "l7",   // exact TIE l7 vs l12 -> earlier profile
      "nothing matches any model word" -> "und")
    val out = rows.map(_._1).toDF("t")
      .select(TextFns.langId(col("t"), profiles)).as[String].collect()
    assert(out.toSeq === rows.map(_._2))
    // default-profile behavior is unchanged by the parameter's existence
    val en = Seq("the cat and the hat it was").toDF("t")
      .select(TextFns.langId(col("t"))).as[String].head()
    assert(en === "en")
  }

  test("langId expression is O(L) in the profile count (plan-size contract)") {
    // one token-scan filter per profile — the O(L^2) shape this replaces
    // re-referenced every profile's score subtree once per profile and
    // showed up as ~1.5 MiB serialized task binaries at L = 4
    def filters(profiles: Seq[(String, Seq[String])]): Int =
      "size\\(filter\\(".r.findAllIn(
        // aliased: the auto-generated column NAME would otherwise embed the
        // whole expression text once more and double the count
        Seq("x").toDF("t")
          .select(TextFns.langIdFromTokens(TextFns.loweredTokens(col("t")), profiles).as("p"))
          .queryExecution.analyzed.toString).length
    val p20 = (0 until 20).map(i => s"l$i" -> (0 until 5).map(j => s"w${i}s$j"))
    assert(filters(p20) === 20, "one score subtree per profile, not L per profile")
    assert(filters(TextFns.LangProfiles) === 4)
  }

  test("quality signals: clean prose scores above keyboard mash") {
    val out = Seq(
      "The quick brown fox jumps over the lazy dog. It was a fine day and the fox was glad.",
      "zx zx zx zx zx zx zx zx zx zx zx zx")
      .toDF("t").select(TextFns.qualityScore(col("t"))).as[Double].collect()
    assert(out(0) > out(1))
    assert(out(0) >= 0.75)
  }

  test("fingerprint: deterministic, content-sensitive, shared-content overlap") {
    val a = "the quick brown fox jumps over the lazy dog again and again in the morning"
    val b = a // identical
    val c = a.replace("fox", "cat")
    val out = Seq(a, b, c).toDF("t")
      .select(TextFns.fingerprint(col("t"))).as[Array[Long]].collect()
    assert(out(0).toSeq === out(1).toSeq)
    assert(out(0).toSeq !== out(2).toSeq)
    // near-identical docs share most fingerprint hashes
    val shared = out(0).toSet.intersect(out(2).toSet).size.toDouble
    assert(shared / out(0).length > 0.3)
  }

  test("subwordCount splits letter/non-letter boundaries") {
    val out = Seq("hello world42 x-y").toDF("t")
      .select(TextFns.subwordCount(col("t"))).as[Int].collect()
    // hello | world | 42 | x | - | y
    assert(out(0) === 6)
  }

  test("repetitionSignals: hand-derived Gopher signals, degenerate docs zeroed") {
    // "a b\na b\n- x\nend..." — 4 lines, line 1 repeats line 0 (3 chars of
    // 18), one bullet, one ellipsis line; 7 tokens; one "..." occurrence;
    // bigrams: [a b, b a, a b, b -, - x, x end...] -> top ("a b", 2),
    // coverage 2*3/18
    val rows = Seq(
      (1, "a b\na b\n- x\nend..."),
      (2, "solo"), // 1 token -> no bigrams -> coalesce(0.0); nothing repeats
      (3, "# #")) // 2 '#' over 2 tokens; top bigram "# #" covers 3/3 -> least(...) caps at 1.0
      .toDF("id", "t")
    val out = rows
      .select(col("id"), col("t"),
        TextFns.tokens(col("t")).as("__tk"), split(col("t"), "\n").as("__ln"))
      .select(col("id"),
        TextFns.repetitionSignals(col("t"), col("__tk"), col("__ln")).as("r"))
      .select(col("id"), col("r.*"))
      .as[(Int, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(out(0) === ((1, 0.25, 0.1667, 0.25, 0.25, 0.1429, 0.3333)))
    assert(out(1) === ((2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(out(2) === ((3, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0)))
  }

  test("htmlToText: strip order, entity decode order, whitespace normalization") {
    val rows = Seq(
      // script body swallows the '</div>' inside its string; block closers
      // -> newlines; comment (with a tag inside) removed whole
      (1, "<html><head><script>if (a<b) { s='</div>'; }</script><style>p { color: red; }</style></head>" +
        "<body><!-- note <b>bold</b> --><h1>Title</h1><p>first para</p><p>second para</p></body></html>"),
      // entities: double-encoded stays single-encoded (&amp;lt; -> &lt;),
      // &nbsp; becomes a plain space and collapses with neighbors
      (2, "<p>fish &amp; chips &lt;now&gt; &amp;lt;still-encoded&amp;gt; a&nbsp; b</p>"),
      // a tag-shaped run in prose is removed — the documented cascade loss
      (3, "x < b and c > y<br>z"),
      (4, "plain text with no markup at all")).toDF("id", "t")
    val out = rows.select(col("id"), TextFns.htmlToText(col("t")).as("r"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2)
    assert(out(0) === "Title\nfirst para\nsecond para")
    assert(out(1) === "fish & chips <now> &lt;still-encoded&gt; a b")
    assert(out(2) === "x y\nz")
    assert(out(3) === "plain text with no markup at all")
  }

  test("redact: the PII cascade — ordering, tricky boundaries, clean text untouched") {
    val rows = Seq(
      (1, "contact john.doe+spam@example-mail.co.uk or visit https://example.com/a?b=1#f today"),
      (2, "server at 192.168.1.254 answered while 10.0.0.7 timed out call +1 415 555 0100 now"),
      (3, "plain words with no pii at all"),
      // leftmost-first: the leading 0 survives ("0800 123 4567" -> 0<PHONE>);
      // a 5-octet run redacts only its first four (1.2.3.4.5 -> <IP>.5)
      (4, "w123 w4567 call 0800 123 4567 or 1.2.3.4.5 ok")).toDF("id", "t")
    val out = rows.select(col("id"), TextFns.redact(col("t")).as("r"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2)
    assert(out(0) === "contact <EMAIL> or visit <URL> today")
    assert(out(1) === "server at <IP> answered while <IP> timed out call <PHONE> now")
    assert(out(2) === "plain words with no pii at all")
    assert(out(3) === "w123 w4567 call 0<PHONE> or <IP>.5 ok")
  }
}
