package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8

/** WARC (ISO 28500) container parsing — the format Common Crawl actually
  * ships pages in, and therefore the real ingest boundary of the
  * north-star's "Iceberg table of Common-Crawl-style web pages": raw
  * `*.warc` bytes → (url, warc_date, payload) rows that feed the page
  * table the rest of the engine operates on.
  *
  * Pure-JVM parser in the Netpbm-decoder mold
  * (multimodal/Multimodal.scala): hostile-bytes-safe, never throws on
  * malformed input — a record that cannot be parsed (bad/absent
  * Content-Length, missing mandatory headers, block running past the
  * buffer) is DROPPED and the scan resynchronizes at the next
  * `WARC/1.0\r\n` magic, so one corrupt record never poisons the rest of
  * its file (at 10^5 files per crawl some WILL be truncated mid-write).
  *
  * Format per ISO 28500 / the WARC 1.1 spec (public): each record is a
  * version line `WARC/1.0\r\n` (1.1 accepted), header lines
  * `Name: value\r\n` with case-INsensitive names, a blank `\r\n`, exactly
  * `Content-Length` bytes of block, then `\r\n\r\n`. Only
  * `WARC-Type: response` records carry page payloads; request/metadata/
  * warcinfo records are structural and skipped (counted, not errored).
  *
  * Scale shape: one input row = one WARC file (Common Crawl's are ~1 GiB;
  * pass them through `Multimodal.repartitionByBytes` for byte-balanced
  * placement before parsing). Parsing is mapPartitions — per-partition
  * sequential byte scans, no shuffle; the output explodes one file row
  * into its record rows, which is a flatMap, not a join.
  */
object Warc {

  final case class WarcFile(warc_id: Long, data: Array[Byte])

  /** One parsed response record. `rec_pos` is the record's 0-based order
    * among the EMITTED (response, well-formed) records of its file — the
    * stable identity downstream lineage wants ("file 17, response 3").
    */
  final case class WarcRecord(
      warc_id: Long, rec_pos: Long, url: String, warc_date: String,
      n_bytes: Long, text: String)

  private val Magic = "WARC/1.".getBytes(UTF_8)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse one WARC file's bytes. Never throws; malformed records are
    * skipped with resync (see object doc). Non-response records are
    * parsed (their Content-Length advances the cursor — that is what
    * makes resync O(file) instead of O(file²)) but not emitted.
    */
  def parse(bytes: Array[Byte]): Vector[(String, String, Long, String)] = {
    if (bytes == null) return Vector.empty
    val out = Vector.newBuilder[(String, String, Long, String)]
    var pos = indexOf(bytes, Magic, 0)
    while (pos >= 0 && pos < bytes.length) {
      parseOne(bytes, pos) match {
        case Some((rec, next)) =>
          rec.foreach(out += _)
          pos = if (next > pos) indexOf(bytes, Magic, next) else -1
        case None =>
          // malformed: resync at the next magic AFTER this one
          pos = indexOf(bytes, Magic, pos + Magic.length)
      }
    }
    out.result()
  }

  /** One record at `start` (which points at the magic). Returns
    * Some((emitted-record-if-response, position-after-record)) or None if
    * the record is malformed.
    */
  private def parseOne(
      bytes: Array[Byte],
      start: Int): Option[(Option[(String, String, Long, String)], Int)] = {
    // version line ends at \r\n
    val verEnd = indexOf(bytes, "\r\n".getBytes(UTF_8), start)
    if (verEnd < 0) return None
    val version = new String(bytes, start, verEnd - start, UTF_8)
    if (version != "WARC/1.0" && version != "WARC/1.1") return None
    // header block ends at the first \r\n\r\n
    val hdrEnd = indexOf(bytes, "\r\n\r\n".getBytes(UTF_8), verEnd)
    if (hdrEnd < 0) return None
    val headers: Map[String, String] =
      new String(bytes, verEnd + 2, hdrEnd - verEnd - 2, UTF_8)
        .split("\r\n").iterator
        .flatMap { line =>
          val c = line.indexOf(':')
          if (c <= 0) None
          else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
        }
        .toMap
    val len = headers.get("content-length").flatMap(v => v.toLongOption)
    len match {
      case Some(n) if n >= 0 =>
        val blockStart = hdrEnd + 4
        if (blockStart + n > bytes.length) return None // truncated file tail
        val after = blockStart + n.toInt
        val emitted =
          if (headers.get("warc-type").exists(_.equalsIgnoreCase("response"))) {
            (headers.get("warc-target-uri"), headers.get("warc-date")) match {
              case (Some(u), Some(d)) =>
                Some((u, d, n, new String(bytes, blockStart, n.toInt, UTF_8)))
              case _ => return None // response without identity is malformed
            }
          } else None // structural record: consumed, not emitted
        Some((emitted, after))
      case _ => None
    }
  }

  /** Serialize one record — the synthesis dual of [[parse]], used by the
    * gate fixtures and specs (Content-Length is computed from the actual
    * payload BYTES, so multibyte text is correct by construction).
    */
  def buildRecord(
      warcType: String,
      url: String,
      date: String,
      payload: Array[Byte]): Array[Byte] = {
    val header =
      s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: $date\r\nContent-Length: ${payload.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** WARC files → response records, distributed: one sequential scan per
    * file, flatMapped inside the partition. Output columns: (warc_id,
    * rec_pos, url, warc_date, n_bytes, text).
    */
  def records(files: Dataset[WarcFile]): Dataset[WarcRecord] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      rows.flatMap { f =>
        parse(f.data).zipWithIndex.map { case ((u, d, n, t), i) =>
          WarcRecord(f.warc_id, i.toLong, u, d, n, t)
        }
      }
    }
  }

  /** DataFrame adapter: (idCol: long, dataCol: binary) → record rows. */
  def recordsDf(files: DataFrame, idCol: String = "warc_id", dataCol: String = "data"): DataFrame = {
    import files.sparkSession.implicits._
    records(files.select(col(idCol).cast("long").as("warc_id"),
      col(dataCol).as("data")).as[WarcFile]).toDF()
  }
}
