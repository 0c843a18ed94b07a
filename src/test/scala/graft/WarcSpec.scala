package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc

/** WARC container parsing — build/parse round trips, structural-record
  * skipping, malformed-record resync, hostile bytes.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def resp(url: String, date: String, payload: String): Array[Byte] =
    Warc.buildRecord("response", url, date, payload.getBytes(UTF_8))

  test("round trip: responses kept in order, request skipped, multibyte byte-exact") {
    val bytes =
      resp("https://a.com/1", "2026-01-01T00:00:00Z", "hello") ++
        Warc.buildRecord("request", "https://a.com/1", "2026-01-01T00:00:00Z",
          "GET / HTTP/1.1".getBytes(UTF_8)) ++
        resp("https://a.com/2", "2026-01-02T00:00:00Z", "café")
    val recs = Warc.parse(bytes)
    assert(recs.map(_._1) === Vector("https://a.com/1", "https://a.com/2"))
    assert(recs(1)._3 === 5L, "Content-Length counts BYTES: café = 5 in UTF-8")
    assert(recs(1)._4 === "café")
  }

  test("payload containing the WARC magic does not split the record") {
    val decoy = "WARC/1.0\r\nWARC-Type: response\r\nfake"
    val bytes = resp("https://a.com/d", "2026-01-01T00:00:00Z", decoy) ++
      resp("https://a.com/next", "2026-01-01T00:00:00Z", "ok")
    val recs = Warc.parse(bytes)
    assert(recs.map(_._1) === Vector("https://a.com/d", "https://a.com/next"))
    assert(recs(0)._4 === decoy)
  }

  test("malformed Content-Length drops only that record; scan resyncs") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://bad.com\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: nonsense\r\n\r\npayload\r\n\r\n").getBytes(UTF_8)
    val bytes = resp("https://a.com/1", "2026-01-01T00:00:00Z", "one") ++ bad ++
      resp("https://a.com/2", "2026-01-02T00:00:00Z", "two")
    assert(Warc.parse(bytes).map(_._1) === Vector("https://a.com/1", "https://a.com/2"))
  }

  test("truncated tail record is dropped; earlier records survive") {
    val whole = resp("https://a.com/1", "2026-01-01T00:00:00Z", "one")
    val truncated = resp("https://a.com/2", "2026-01-02T00:00:00Z", "a long payload here")
      .dropRight(12)
    assert(Warc.parse(whole ++ truncated).map(_._1) === Vector("https://a.com/1"))
  }

  test("header names are case-insensitive; WARC/1.1 accepted; 1.5 resyncs away") {
    val mixed = ("WARC/1.1\r\nwarc-type: Response\r\nWaRc-TaRgEt-UrI: https://mix.com\r\n" +
      "warc-date: 2026-05-05T00:00:00Z\r\ncontent-length: 2\r\n\r\nhi\r\n\r\n").getBytes(UTF_8)
    val future = ("WARC/1.5\r\nWARC-Type: response\r\nWARC-Target-URI: https://future.com\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nno\r\n\r\n").getBytes(UTF_8)
    val recs = Warc.parse(mixed ++ future)
    assert(recs.map(_._1) === Vector("https://mix.com"))
    assert(recs(0)._2 === "2026-05-05T00:00:00Z")
  }

  test("hostile bytes never throw") {
    assert(Warc.parse(null) === Vector.empty)
    assert(Warc.parse(Array.empty[Byte]) === Vector.empty)
    assert(Warc.parse("WARC/1.0".getBytes(UTF_8)) === Vector.empty)
    assert(Warc.parse(Array.fill(4096)(0x57.toByte)) === Vector.empty)
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: d\r\nContent-Length: 99999999999999\r\n\r\nx").getBytes(UTF_8)
    assert(Warc.parse(huge) === Vector.empty)
  }

  test("records() distributes parse: Dataset output equals local parse") {
    val f1 = resp("https://a.com/1", "2026-01-01T00:00:00Z", "one") ++
      resp("https://a.com/2", "2026-01-02T00:00:00Z", "two")
    val f2 = resp("https://b.com/1", "2026-02-01T00:00:00Z", "three")
    val files = Seq(Warc.WarcFile(1L, f1), Warc.WarcFile(2L, f2)).toDS().repartition(2)
    val got = Warc.records(files).collect().map(r => (r.warc_id, r.rec_pos, r.url, r.text)).toSet
    assert(got === Set(
      (1L, 0L, "https://a.com/1", "one"),
      (1L, 1L, "https://a.com/2", "two"),
      (2L, 0L, "https://b.com/1", "three")))
  }
}
