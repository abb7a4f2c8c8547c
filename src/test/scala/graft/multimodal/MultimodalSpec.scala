package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    Multimodal.MediaRecord(1L, "payload-one".getBytes("UTF-8"), "image"),
    Multimodal.MediaRecord(2L, "payload-two".getBytes("UTF-8"), "image")
  ).toDS()

  test("batched decode is deterministic with plausible dimensions") {
    val a = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    a.foreach { d =>
      assert(d.byte_len == 11L)
      assert(d.width >= 320 && d.width < 1920)
      assert(d.height >= 240 && d.height < 1080)
      assert(d.channels >= 1 && d.channels <= 3)
      assert(Set("rgb", "yuv").contains(d.format))
    }
  }

  test("frame sampling emits n deterministic frames per record") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length == 8)
    assert(frames.map(f => (f.media_id, f.frame_no)).distinct.length == 8)
    assert(frames.forall(_.frame_digest.length == 8))
  }
}
