package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, ResizeParams}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** I-group specs: binary-column plumbing with the stubbed codec. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def records = Multimodal.toMediaRecords(
    Tables.documents(spark, sf).withColumn("payload", encode(col("text"), "UTF-8")),
    "doc_id", "payload").as[MediaRecord]

  test("extractFeatures runs batched per partition with stable schema (I2)") {
    val feats = Multimodal.extractFeatures(spark, records)
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(f => f.width >= 1 && f.width <= 1920))
    assert(rows.forall(f => f.n_bytes > 0))
    // deterministic stub: same payload → same features
    val again = Multimodal.extractFeatures(spark, records).collect()
    assert(rows.sortBy(_.doc_id).map(_.width).toSeq == again.sortBy(_.doc_id).map(_.width).toSeq)
  }

  test("planResize preserves aspect ratio within bounds (I3)") {
    val feats = Multimodal.extractFeatures(spark, records)
    val planned = Multimodal.planResize(feats, ResizeParams(256, 256))
    val bad = planned.filter(col("target_width") > 256 || col("target_height") > 256)
    assert(bad.count() == 0)
    // no upscale beyond original
    assert(planned.filter(col("target_width") > col("width")).count() == 0)
  }

  test("sampleFrames emits bounded per-record frames (I3)") {
    val frames = Multimodal.sampleFrames(spark, records.limit(10), 64, 3)
    val perDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    assert(perDoc.values.forall(_ <= 3))
    assert(frames.collect().forall(_.frame_bytes.length <= 64))
  }
}
