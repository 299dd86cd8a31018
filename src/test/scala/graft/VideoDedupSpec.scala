package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.{GraftExtensions, ImageDHash, VideoDHash}
import graft.multimodal.{Multimodal, Video, VideoDedup}

/** Video perceptual signature + near-dup (q98): the native `video_dhash`
  * majority-vote expression and the Hamming-bucket near-dup join over it —
  * the video twin of ImageDedupSpec/AudioDedupSpec. */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Byte offsets of each frame's (w, h, pixelOffset) in a payload —
    * replayed with the same walk the decoder uses. */
  private def frameSlices(b: Array[Byte]): Seq[(Int, Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int, Int)]
    var pos = 0
    while (pos < b.length) {
      val header = new String(b, pos, math.min(32, b.length - pos), "US-ASCII")
      // headers are "P6\nw h\n255\n" here — parse dims to step the walk
      val m = """P6\s+(\d+)\s+(\d+)\s+255\s""".r.findPrefixMatchOf(header).get
      val w = m.group(1).toInt; val h = m.group(2).toInt
      val px = pos + m.end
      out += ((w, h, px))
      pos = px + 3 * w * h
    }
    out.result()
  }

  /** Re-encode `b` with the same pixels but different BYTES: each frame
    * header rewritten with an injected PPM comment. The perceptual
    * signature contract is exactly that these hash identically. */
  private def reencoded(b: Array[Byte]): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    frameSlices(b).foreach { case (w, h, px) =>
      out ++= s"P6\n# re-muxed by a different writer\n$w $h\n255\n"
        .getBytes("US-ASCII")
      out ++= b.slice(px, px + 3 * w * h)
    }
    out.result()
  }

  test("video_dhash: codegen matches interpreted matches local compute") {
    val ids = (0L until 64L).toSeq
    val df = ids.map(id => (id, Video.encodeVideo(id))).toDF("id", "payload")
    val viaCodegen = VideoDedup.signatures(df, stride = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val local = VideoDHash.compute(Video.encodeVideo(id), 2)
      assert(viaCodegen(id) == local, s"codegen != local for id=$id")
      val interp = VideoDHash(
        Literal.create(Video.encodeVideo(id), BinaryType), 2)
        .eval(null).asInstanceOf[Long]
      assert(interp == local, s"interpreted != local for id=$id")
    }
    assert(viaCodegen.values.toSet.size > 48, "video_dhash degenerate")
  }

  test("signature IS the majority-bit fold of per-frame image dHashes") {
    (0L until 32L).foreach { id =>
      val b = Video.encodeVideo(id)
      val frames = frameSlices(b)
      val sampled = frames.indices.filter(_ % 2 == 0)
        .map { f => val (w, h, px) = frames(f); ImageDHash.hashPlane(b, w, h, px) }
      var expected = 0L
      (0 until 64).foreach { bit =>
        val ones = sampled.count(fh => ((fh >>> bit) & 1L) == 1L)
        if (2 * ones > sampled.size) expected |= 1L << bit
      }
      assert(VideoDHash.compute(b, 2) == expected, s"fold mismatch for id=$id")
    }
  }

  test("signature is a function of pixels, not container bytes") {
    (0L until 16L).foreach { id =>
      val orig = Video.encodeVideo(id)
      assert(VideoDHash.compute(reencoded(orig), 2) ==
        VideoDHash.compute(orig, 2),
        s"re-muxed payload hashed differently for id=$id")
    }
  }

  test("video_dhash is registered as a SQL function; null in, null out") {
    GraftExtensions.register(spark)
    Seq((1L, Video.encodeVideo(1L))).toDF("id", "payload")
      .createOrReplaceTempView("video_payloads")
    val viaSql = spark.sql("SELECT video_dhash(payload, 2) FROM video_payloads")
      .head().getLong(0)
    assert(viaSql == VideoDHash.compute(Video.encodeVideo(1L), 2))
    assert(Seq(1).toDF("x").select(
      VideoDHash(spark, lit(null).cast("binary"), 2)).head().isNullAt(0))
  }

  test("video_dhash fails loudly on malformed payloads and bad stride") {
    intercept[Exception] {
      VideoDHash.compute("not a video".getBytes("US-ASCII"), 2)
    }
    intercept[Exception] { // truncated final plane
      VideoDHash.compute(Video.encodeVideo(3L).dropRight(5), 2)
    }
    intercept[Exception] { VideoDHash.compute(Video.encodeVideo(3L), 0) }
  }

  test("video_frame_dhashes: per-frame stream matches sliced image dHash, " +
    "stride honored") {
    import graft.functions.VideoFrameDHashes
    (0L until 16L).foreach { id =>
      val b = Video.encodeVideo(id)
      val frames = frameSlices(b)
      val all = frames.map { case (w, h, px) => ImageDHash.hashPlane(b, w, h, px) }
      assert(VideoDHash.computeFrames(b, 1).toSeq == all, s"stride-1 id=$id")
      assert(VideoDHash.computeFrames(b, 2).toSeq ==
        all.indices.filter(_ % 2 == 0).map(all), s"stride-2 id=$id")
    }
    // plan-path equals local compute (codegen) and interpreted
    val viaPlan = Seq((7L, Video.encodeVideo(7L))).toDF("id", "payload")
      .select(VideoFrameDHashes(spark, col("payload"), 2).as("h"))
      .head().getSeq[Long](0)
    assert(viaPlan == VideoDHash.computeFrames(Video.encodeVideo(7L), 2).toSeq)
    val interp = VideoFrameDHashes(
      Literal.create(Video.encodeVideo(7L), BinaryType), 2)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == viaPlan)
  }

  test("framesMatchingImages: planted stills located in clips, image side " +
    "broadcast, no cartesian") {
    // clips 100..119 each embed still image (clipId - 100) as frame 1
    val clips = (100L until 120L).map { cid =>
      val still = Multimodal.encodePpm(cid - 100L)
      val filler1 = Multimodal.encodePpm(cid + 5000L)
      val filler2 = Multimodal.encodePpm(cid + 9000L)
      (cid, filler1 ++ still ++ filler2)
    }.toDF("id", "payload")
    val images = (0L until 20L).map(id => (id, Multimodal.encodePpm(id)))
      .toDF("id", "payload")
    val out = VideoDedup.framesMatchingImages(clips,
      graft.multimodal.ImageDedup.dHashes(images), stride = 1, maxHamming = 3)
    assertNoCartesian(out)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"image side not broadcast:\n$plan")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    (100L until 120L).foreach { cid =>
      assert(got.contains((cid, 1, cid - 100L)), s"planted still in $cid missed")
    }
  }

  test("nearDupVideos: planted re-muxed dups all recovered, no cartesian") {
    val originals = (0L until 40L).map(id => (id, Video.encodeVideo(id)))
    val planted = originals.map { case (id, b) => (id + 1000L, reencoded(b)) }
    val media = (originals ++ planted).toDF("id", "payload")
    val out = VideoDedup.nearDupVideos(media, stride = 2, maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is at Hamming 0 → must be found (radius-3 join
    // is complete by pigeonhole); extra pairs are legitimate near-hashes
    (0L until 40L).foreach { id =>
      assert(got.contains((id, id + 1000L)), s"planted pair $id missed")
    }
    val h = out.filter(col("id_b") === col("id_a") + 1000L)
      .select("hamming").collect().map(_.getInt(0))
    assert(h.nonEmpty && h.forall(_ == 0))
  }

  test("incrementalNearDupVideos: cross-batch AND within-batch pairs vs " +
    "a persisted signature index") {
    val corpus = (0L until 25L).map(id => (id, Video.encodeVideo(id)))
      .toDF("id", "payload")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_vhash_idx_spec").toString
    VideoDedup.signatures(corpus, stride = 2)
      .write.mode("overwrite").parquet(idxDir)
    // today's batch: re-muxed copies of corpus clips 0..9 under fresh ids,
    // fresh clips, and one within-batch duplicate pair (both clip 500)
    val probe = ((0L until 10L).map(id =>
        (id + 1000L, reencoded(Video.encodeVideo(id)))) ++
      (2000L until 2005L).map(id => (id, Video.encodeVideo(id))) ++
      Seq((3000L, Video.encodeVideo(500L)),
        (3001L, reencoded(Video.encodeVideo(500L)))))
      .toDF("id", "payload")
    val out = VideoDedup.incrementalNearDupVideos(probe,
      spark.read.parquet(idxDir), stride = 2, maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { id =>
      assert(got.contains((id + 1000L, id)), s"cross-batch pair $id missed")
    }
    assert(got.contains((3001L, 3000L)), "within-batch pair missed")
  }
}
