package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello binary world"),
    (2L, "another longer document body with more bytes in it"),
    (3L, "x")).toDF("doc_id", "text")

  test("media plumbing: schema, deterministic stub features, batch shape") {
    val media = Multimodal.syntheticMedia(docs)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 3)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    // n_bytes = utf-8 length of source text
    assert(feats(0).n_bytes === "hello binary world".getBytes("UTF-8").length)
    // deterministic: re-run yields identical features
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // stub decode invariants
    val (luma, frames) = Multimodal.stubDecode("ab".getBytes)
    assert(luma === ('a'.toInt + 'b'.toInt) / 2.0)
    assert(frames === 1)
    assert(Multimodal.stubDecode(Array.empty) === ((0.0, 0)))
  }

  test("repartitionByBytes keeps every row") {
    val media = Multimodal.syntheticMedia(docs).toDF
    val out = Multimodal.repartitionByBytes(media, targetBytesPerPartition = 16)
    assert(out.count() === 3)
    assert(out.columns.toSet === media.columns.toSet)
  }
}
