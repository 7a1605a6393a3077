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

  test("cross-modal agreement counts exactly the planted twin populations (I11)") {
    import graft.operators.{Dedup, MediaCodec}
    // 20 base docs of id-salted word salad (no natural text pairs),
    // 20 distinct synth images; ids 0..2 get the three twin kinds
    def salad(id: Long) =
      (0 until 12).map(j => s"w${id}_$j").mkString(" ")
    val base = (0L until 20L).map(id => (id, salad(id)))
    val twins = (0L until 3L).flatMap { id =>
      Seq((id + 100000L, salad(id)),          // both: same caption (+ re-encode below)
        (id + 200000L, salad(id)),            // text-only: same caption, fresh image
        (id + 300000L, (0 until 12).map(j => s"fresh${id}_$j").mkString(" ")))
    }
    val corpus = (base ++ twins).toDF("doc_id", "text")
    val textPairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 4)
      .select("a", "b")
    val recs = spark.createDataset((0L until 20L).flatMap { id =>
      val png = MediaCodec.synthImagePng(id, 96, 96)
      val orig = Multimodal.MediaRecord(id, png, "image", "png")
      if (id < 3) {
        val re = MediaCodec.reencodeJpeg(png).get
        Seq(orig,
          Multimodal.MediaRecord(id + 100000L, re, "image", "jpeg"),
          Multimodal.MediaRecord(id + 200000L,
            MediaCodec.synthImagePng(id + 200000L, 96, 96), "image", "png"),
          Multimodal.MediaRecord(id + 300000L, re, "image", "jpeg"))
      } else Seq(orig)
    })
    val mediaPairs = Multimodal.mediaNearDupPairsReal(spark, recs, 7)
      .select("a", "b")
    val row = Multimodal.crossModalAgreement(textPairs, mediaPairs).head()
    // text: {i, i+100k, i+200k} pairwise = 3 per planted id
    assert(row.getAs[Long]("n_text") == 9L, row.toString)
    // media: {i, i+100k, i+300k} pairwise (two re-encodes of one PNG
    // sit within radius 7 of the original and each other) = 3 per id
    assert(row.getAs[Long]("n_media") == 9L, row.toString)
    // both: exactly the (i, i+100k) cross-modal twins
    assert(row.getAs[Long]("n_both") == 3L, row.toString)
    assert(math.abs(row.getAs[Double]("pair_jaccard") - 0.2) < 1e-12)

    // I12 over the SAME pair lists: the union graph fuses each
    // planted id's text triangle {i, i+100k, i+200k} and media
    // triangle {i, i+100k, i+300k} into ONE 4-member component
    // labeled i; the 17 unpaired base docs keep themselves. Exactly
    // one canonical per joint cluster: quality = id % 7 makes the
    // argmax scriptable per component.
    val docsQ = (base ++ twins).map { case (id, _) => (id, (id % 7).toDouble) }
      .toDF("doc_id", "quality")
    val canon = Multimodal.crossModalCanonical(textPairs, mediaPairs,
      docsQ, "doc_id", "quality").collect()
    assert(canon.length == 20, s"3 joint clusters + 17 singletons, got ${canon.length}")
    val joint = canon.filter(_.getAs[Long]("n_members") == 4L)
    assert(joint.map(_.getAs[Long]("component")).sorted.toSeq == Seq(0L, 1L, 2L))
    // per planted id, members {i, i+100000, i+200000, i+300000} have
    // qualities (i%7, (i+100000)%7, (i+200000)%7, (i+300000)%7);
    // the expected keeper recomputes the same argmax directly
    joint.foreach { r =>
      val i = r.getAs[Long]("component")
      val members = Seq(i, i + 100000L, i + 200000L, i + 300000L)
      val bq = members.map(_ % 7).max.toDouble
      val keep = members.filter(m => (m % 7).toDouble == bq).min
      assert(r.getAs[Double]("best_quality") == bq, r.toString)
      assert(r.getAs[Long]("keep_id") == keep, r.toString)
    }
    // singletons are their own canonical at their own quality
    canon.filter(_.getAs[Long]("n_members") == 1L).foreach { r =>
      assert(r.getAs[Long]("keep_id") == r.getAs[Long]("component"))
      assert(r.getAs[Double]("best_quality") ==
        (r.getAs[Long]("component") % 7).toDouble)
    }
  }
}
