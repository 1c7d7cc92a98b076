package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("metadata extracts size, magic bytes and digest from the blob") {
    val d = Seq((1L, "ABCD")).toDF("doc_id", "text")
    val r = Multimodal.metadata(d).collect().head
    assert(r.getAs[Long]("size_bytes") === 4L)
    assert(r.getAs[String]("magic_hex") === "41424344")
    assert(r.getAs[String]("content_md5") ===
      "cb08ca4a7bb5f9683c19133a84872ca7") // md5("ABCD")
  }

  test("frame sample emits in-range strided indices starting at frame 0") {
    val d = Tables.documents(spark, sfDir).limit(50)
    val frames = Multimodal.frameSample(spark, d)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nFrames = Multimodal.features(spark, d)
      .select(col("doc_id"), col("n_frames").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(frames.keySet === nFrames.keySet)
    frames.foreach { case (id, idxs) =>
      assert(idxs.head === 0L)
      assert(idxs.forall(_ < nFrames(id)))
      // constant stride spacing
      if (idxs.length > 1) {
        val diffs = idxs.sliding(2).map(p => p(1) - p(0)).toSeq
        assert(diffs.distinct.length === 1)
      }
    }
  }

  test("resize plan scales the long side to maxDim with aspect preserved") {
    val d = Tables.documents(spark, sfDir).limit(50)
    val r = Multimodal.resizePlan(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.length === 50)
    r.foreach { case (_, w, h, ow, oh) =>
      assert(math.max(ow, oh) === 224L)
      assert(ow <= 224 && oh <= 224 && ow > 0 && oh > 0)
      // aspect preserved within integer-floor tolerance
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.05)
    }
  }

  test("feature pipeline produces a fixed typed schema with deterministic stub values") {
    val d = Tables.documents(spark, sfDir).limit(50)
    val f = Multimodal.features(spark, d).cache()
    assert(f.columns.toSeq === Seq("doc_id", "size_bytes", "width", "height",
      "channels", "n_frames", "mean_byte", "aspect_ratio", "sample_stride"))
    assert(f.count() === 50)
    assert(f.filter(col("width") < 64 || col("width") >= 128).count() === 0)
    // determinism: rerun equals first run
    val a = f.collect().map(_.toSeq)
    val b = Multimodal.features(spark, d).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    f.unpersist()
  }
}
