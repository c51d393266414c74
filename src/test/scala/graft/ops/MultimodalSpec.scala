package graft.ops

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private lazy val media =
    mediaFromDocuments(Graft.documents(spark, "/root/testdata/sf0.001"))
      .as[MediaRecord]

  test("binary media table carries payload + typed metadata") {
    val m = media.head()
    assert(m.bytes.nonEmpty && Set("image", "audio", "video")(m.kind))
    assert(m.meta.width >= 64 && m.meta.channels == 3)
  }

  test("batched feature extraction is deterministic and total") {
    val feats = extractFeatures(media, batchSize = 32).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.feature.length == FEATURE_DIM))
    val again = extractFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f.feature).toMap
    feats.foreach(f => assert(again(f.media_id) == f.feature)) // batch-size invariant
  }

  test("resize stub scales payload with target area and updates metadata") {
    val m = media.head()
    val small = resizeStub(m, m.meta.width / 2, m.meta.height / 2)
    assert(small.meta.width == m.meta.width / 2)
    assert(small.bytes.length < m.bytes.length)
    val big = resizeStub(m, m.meta.width * 2, m.meta.height * 2)
    assert(big.bytes.length > m.bytes.length)
  }

  test("frame sampling explodes one media row into n frame rows") {
    val frames = sampleFrames(media.limit(10), n = 4)
    assert(frames.count() == 40)
    val counts = frames.groupBy("media_id").count()
      .select("count").distinct().as[Long].collect().toSeq
    assert(counts == Seq(4L))
    assert(frames.filter(col("frame_bytes") <= 0).isEmpty)
  }
}
