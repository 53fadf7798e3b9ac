package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: batch-shaped decode equals row-at-a-time decode for
  * every batch size, and the resize stub is deterministic with aspect-box
  * clamping. The decode itself is an explicit stub (no codec libs in this
  * container); these tests pin the Spark-side contract a real codec slots
  * into. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("media_id").collect().map(_.toString).toSeq

  test("batched decode is row-identical to per-row decode for any batch size") {
    val media = Multimodal.synthMedia(spark, 97, 42L)
    val base = fingerprint(Multimodal.extractFeatures(media).toDF())
    for (bs <- Seq(1, 7, 64, 1000))
      assert(fingerprint(Multimodal.extractFeaturesBatched(media, bs).toDF()) == base, s"batchSize=$bs")
  }

  test("resize stub clamps to the aspect box and is deterministic") {
    val features = Multimodal.extractFeatures(Multimodal.synthMedia(spark, 50, 42L))
    val resized = Multimodal.resizeStub(features, 256, 256)
    val rows = resized.select("media_id", "width", "height", "resized_w", "resized_h", "resized_hash").collect()
    rows.foreach { r =>
      val (w, h, rw, rh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(rw <= 256 && rh <= 256 && rw >= 1 && rh >= 1, r.toString)
      // aspect preserved within integer floor
      assert(math.abs(rw.toDouble / w - rh.toDouble / h) < 0.05, r.toString)
    }
    assert(fingerprint(resized) == fingerprint(Multimodal.resizeStub(features, 256, 256)))
  }
}
