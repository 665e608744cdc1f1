package graft

import graft.multimodal.{MediaRecord, Multimodal}
import java.nio.file.{Files, Paths}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary dir ingest → deterministic stub features → join back") {
    val dir = Files.createTempDirectory("media").toString
    Files.write(Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(Paths.get(dir, "b.bin"), Array[Byte](9, 8, 7))

    val media = Multimodal.readMediaDir(spark, dir, "image")
    val recs = media.collect().sortBy(_.uri)
    assert(recs.length == 2 && recs.forall(r => r.width > 0 && r.height > 0))

    val feats = Multimodal.extractFeatures(media, dim = 8)
    val f = feats.collect()
    assert(f.forall(_.features.length == 8))
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(f.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })

    val joined = Multimodal.withFeatures(
      media.toDF().select("media_id", "kind", "width", "height"), feats)
    assert(joined.count() == 2 && joined.columns.contains("features"))
  }

  test("frame sampling explodes k frames per record at even offsets") {
    val ds = Seq(MediaRecord(1L, "video", "v.bin", Array[Byte](1, 2, 3), 640, 480, 10000L)).toDS()
    val frames = Multimodal.sampleFrames(ds, k = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 2500L, 5000L, 7500L))
  }

  test("resize fits the bounding box, preserves aspect, passes small images through") {
    val ds = Seq(
      MediaRecord(1L, "image", "big.bin", Array.tabulate(64)(_.toByte), 1920, 1080, 0L),
      MediaRecord(2L, "image", "small.bin", Array[Byte](9, 9), 100, 50, 0L)
    ).toDS()
    val out = Multimodal.resizeToFit(ds, 640, 640).collect().sortBy(_.media_id)
    assert(out(0).width == 640 && out(0).height == 360) // 16:9 preserved
    assert(out(1).width == 100 && out(1).height == 50 && out(1).bytes.toSeq == Seq(9, 9))
  }
}
