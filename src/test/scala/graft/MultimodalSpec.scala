package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.util.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaTable(
    Tables.documents(spark, sfDir), "doc_id", "text").cache()

  test("media table carries binary payloads with typed metadata") {
    val n = Tables.documents(spark, sfDir).count()
    assert(media.count() == n)
    val row = media.filter(_.mediaId == 0L).head()
    assert(row.payload.nonEmpty)
    assert(row.meta.width > 0 && row.meta.height > 0)
    val kinds = media.map(_.kind).distinct().collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, batched, fixed-dimension") {
    val f1 = Multimodal.extractFeatures(media).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.size == Multimodal.featureDim))
  }

  test("resize rewrites metadata and bounds payloads") {
    val r = Multimodal.resize(media, 8, 8).collect()
    assert(r.forall(m => m.meta.width == 8 && m.meta.height == 8))
    assert(r.forall(_.payload.nonEmpty))
  }

  test("frame sampling explodes video rows into per-frame rows") {
    val frames = Multimodal.sampleFrames(media, 4)
    val nVideo = media.filter(_.kind == "video").count()
    assert(frames.count() == nVideo * 4)
    assert(frames.map(_.frameIdx).distinct().collect().toSet == Set(0, 1, 2, 3))
  }

  test("partition sizing bounds per-partition payload bytes") {
    val sized = Multimodal.sizePartitions(media, targetBytes = 4096)
    assert(sized.rdd.getNumPartitions > 1)
    assert(sized.count() == media.count())
  }
}
