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

  test("PPM encode/decode round-trip: parsed dims and channel sums exact") {
    val ids = Seq(0L, 1L, 7L, 63L, 1000L)
    ids.foreach { id =>
      val stats = Multimodal.decodePpm(id, Multimodal.encodePpm(id))
      assert(stats.width == (8 + id % 9).toInt && stats.height == (8 + id % 7).toInt)
      assert(stats.maxval == 255)
      // channel sums vs a direct recomputation of the pixel recurrence
      val n = 3 * stats.width * stats.height
      def px(i: Int) = ((id * 1103515245L + i * 12345L + 42L) % 2147483647L) % 256L
      assert(stats.sum_r == (0 until n by 3).map(px).sum)
      assert(stats.sum_g == (1 until n by 3).map(px).sum)
      assert(stats.sum_b == (2 until n by 3).map(px).sum)
      assert(stats.px_bytes == n.toLong)
    }
  }

  test("PPM parser handles comments/whitespace per spec, rejects malformed") {
    // hand-built 1x2 image with a header comment and mixed whitespace
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val withComment =
      "P6\n# a comment line\n 1\t2 \n255\n".getBytes("US-ASCII") ++ px
    val s = Multimodal.decodePpm(9L, withComment)
    assert(s.width == 1 && s.height == 2 && s.maxval == 255)
    assert(s.sum_r == 10 + 40 && s.sum_g == 20 + 50 && s.sum_b == 30 + 60)
    // wrong magic and truncated pixel data both fail loudly
    assertThrows[IllegalArgumentException] {
      Multimodal.decodePpm(1L, "P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1))
    }
    assertThrows[IllegalArgumentException] {
      Multimodal.decodePpm(1L, "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    }
  }

  test("PPM stages run per-partition over the documents corpus") {
    val docs = Tables.documents(spark, sfDir)
    val payloads = Multimodal.ppmPayloads(spark, docs, "doc_id")
    val decoded = Multimodal.decodePpmStage(spark, payloads)
    assert(decoded.count() == docs.count())
    // every row's dims follow the id formula; no row was silently dropped
    val bad = decoded.filter(r =>
      r.width != (8 + r.id % 9).toInt || r.height != (8 + r.id % 7).toInt)
    assert(bad.count() == 0)
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

  test("resizePpm: full-size thumbnail samples every pixel exactly once") {
    // tw = w, th = h makes the nearest-neighbor map the identity, so the
    // thumbnail sums must equal the decode sums over the whole plane
    for (id <- Seq(0L, 7L, 63L)) {
      val p = Multimodal.encodePpm(id)
      val d = Multimodal.decodePpm(id, p)
      val t = Multimodal.resizePpm(id, p, d.width, d.height)
      assert((t.t_sum_r, t.t_sum_g, t.t_sum_b) == ((d.sum_r, d.sum_g, d.sum_b)))
    }
  }

  test("resizePpm: 1x1 thumbnail is exactly the top-left pixel") {
    val id = 5L
    val p = Multimodal.encodePpm(id)
    val t = Multimodal.resizePpm(id, p, 1, 1)
    def px(i: Int) = ((id * 1103515245L + i * 12345L + 42L) % 2147483647L) % 256L
    assert((t.t_sum_r, t.t_sum_g, t.t_sum_b) == ((px(0), px(1), px(2))))
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
