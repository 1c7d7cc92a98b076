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
