package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal plumbing: batch decode path over typed binary rows. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures runs per-partition and derives stable features") {
    val rows = Seq(
      MediaRow(1L, Array[Byte](1, 2, 3, 4, 9, 9), "image"),
      MediaRow(2L, Array[Byte](-1, -1, 0, 0), "audio"))
    val out = Multimodal.decodeFeatures(rows.toDS().repartition(2))
      .collect().sortBy(_.doc_id)
    assert(out(0) === MediaFeatures(1L, "image", 6, 0x01020304L,
      0x01020304L.toDouble / (1L << 32).toDouble))
    assert(out(1).magic === 0xFFFF0000L)
    assert(out(1).n_bytes === 4)
  }

  test("decodeStub is deterministic") {
    val p = Array[Byte](10, 20, 30, 40, 50)
    assert(Multimodal.decodeStub(p) === Multimodal.decodeStub(p))
  }

  test("frameSample emits strided fixed-size chunks; resize pads/truncates") {
    val media = Seq(MediaRow(7L, Array.tabulate[Byte](10)(_.toByte), "video")).toDS()
    val frames = Multimodal.frameSample(media, frameBytes = 2, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4)) // 5 chunks, every 2nd
    assert(frames(1).frame.toSeq === Seq[Byte](4, 5))
    val resized = Multimodal.resizeStub(Multimodal.frameSample(media, 2, 2), 3)
      .collect().sortBy(_.frame_idx)
    assert(resized.forall(_.frame.length === 3))
  }
}
