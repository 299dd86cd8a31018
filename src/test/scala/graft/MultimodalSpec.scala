package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.withPayload(Tables.documents(spark, sfDir), "doc_id", "text")

  test("withPayload: binary payload + typed metadata schema") {
    val schema = media.schema
    assert(schema("payload").dataType == BinaryType)
    assert(schema("width").dataType == IntegerType)
    assert(schema("height").dataType == IntegerType)
    val r = media.select("width", "height", "format", "nFrames").head()
    assert(r.getInt(0) >= 128 && r.getInt(0) < 640)
    assert(Set("jpeg", "png", "webm").contains(r.getString(2)))
    assert(r.getInt(3) >= 1)
  }

  test("decode runs per-partition and derives features from payload bytes") {
    val decoded = Multimodal.decode(spark, media)
    assert(decoded.count() == media.count())
    val f = decoded.head().feature
    assert(f.length == 8 && f.exists(_ != 0.0))
  }

  test("resize caps the max dimension, preserving aspect ratio direction") {
    val resized = Multimodal.resize(media, maxDim = 100)
    val bad = resized.filter(col("width") > 100 || col("height") > 100).count()
    assert(bad == 0)
  }

  test("sampleFrames picks every stride-th index") {
    val s = Multimodal.sampleFrames(media, stride = 4)
      .select(col("nFrames"), col("sampled_frames")).head()
    val n = s.getInt(0)
    val idx = s.getSeq[Long](1)
    assert(idx == (0 until n by 4).map(_.toLong))
  }

  test("byteStats matches a direct aggregation") {
    val got = Multimodal.byteStats(media, "source")
    val expect = media.groupBy("source").agg(
      count(lit(1)).as("n_rows"),
      sum(octet_length(col("payload"))).as("total_bytes"))
    val g = got.select("source", "n_rows", "total_bytes")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e = expect.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g == e)
  }
}
