package graft

import graft.multimodal.{Audio, Video}
import graft.sources.Tables

class AudioVideoSpec extends SparkSpec {

  // ---------------------------------------------------------------- audio

  test("WAV encode/decode round-trip: format fields and sample stats exact") {
    for (id <- Seq(0L, 1L, 5L, 511L, 1000L)) {
      val stats = Audio.decodeWav(id, Audio.encodeWav(id))
      val n = Audio.nSamples(id)
      val samples = (0 until n).map(Audio.sampleAt(id, _))
      assert(stats.sample_rate == 16000)
      assert(stats.n_samples == n.toLong)
      assert(stats.sum_amp == samples.map(_.toLong).sum)
      assert(stats.sum_abs == samples.map(s => math.abs(s).toLong).sum)
      assert(stats.peak == samples.map(math.abs).max)
    }
  }

  test("WAV decoder walks chunks: data is found past the id-sized LIST pad") {
    // two ids with different LIST pads — data sits at different offsets,
    // so a fixed-offset "parser" would mis-read at least one of them
    val a = Audio.encodeWav(0L) // pad 4
    val b = Audio.encodeWav(5L) // pad 14
    def dataOffset(buf: Array[Byte]): Int =
      buf.indexOfSlice("data".getBytes("US-ASCII"))
    assert(dataOffset(a) != dataOffset(b))
    assert(Audio.decodeWav(0L, a).n_samples == Audio.nSamples(0L).toLong)
    assert(Audio.decodeWav(5L, b).n_samples == Audio.nSamples(5L).toLong)
  }

  test("WAV decoder rejects malformed payloads loudly") {
    val good = Audio.encodeWav(3L)
    assertThrows[IllegalArgumentException] { // not RIFF
      Audio.decodeWav(3L, "JUNK".getBytes("US-ASCII") ++ good.drop(4))
    }
    assertThrows[IllegalArgumentException] { // truncated mid-data
      Audio.decodeWav(3L, good.dropRight(32))
    }
    // stereo fmt must be refused, not mis-summed
    val stereo = good.clone()
    stereo(22) = 2 // channels field inside fmt
    assertThrows[IllegalArgumentException] { Audio.decodeWav(3L, stereo) }
  }

  test("WAV stages run per-partition over the documents corpus") {
    val docs = Tables.documents(spark, sfDir)
    val payloads = Audio.wavPayloads(spark, docs, "doc_id")
    val decoded = Audio.decodeWavStage(spark, payloads)
    assert(decoded.count() == docs.count())
    val bad = decoded.filter(r =>
      r.n_samples != Audio.nSamples(r.id).toLong || r.sample_rate != 16000)
    assert(bad.count() == 0)
  }

  // ---------------------------------------------------------------- video

  test("video encode/sample round-trip: stride-1 covers every frame exactly") {
    for (id <- Seq(0L, 1L, 7L, 1000L)) {
      val frames = Video.sampleVideo(id, Video.encodeVideo(id), 1)
      val (w, h) = Video.dims(id)
      assert(frames.map(_.frame) == (0 until Video.nFrames(id)))
      frames.foreach { fr =>
        assert(fr.width == w && fr.height == h)
        val plane = 3 * w * h
        def px(i: Int) = Video.pixelAt(id, fr.frame, i).toLong
        assert(fr.sum_r == (0 until plane by 3).map(px).sum)
        assert(fr.sum_g == (1 until plane by 3).map(px).sum)
        assert(fr.sum_b == (2 until plane by 3).map(px).sum)
      }
    }
  }

  test("video stride sampling keeps exactly the frame % stride == 0 frames") {
    val id = 1000L // 2 + 1000 % 6 = 6 frames
    val nf = Video.nFrames(id)
    for (stride <- Seq(2, 3, 100)) {
      val got = Video.sampleVideo(id, Video.encodeVideo(id), stride).map(_.frame)
      assert(got == (0 until nf by stride))
    }
  }

  test("video walker rejects a corrupt mid-stream frame loudly") {
    val id = 7L
    val buf = Video.encodeVideo(id)
    // corrupt the SECOND frame's magic: first frame must not mask it
    val (w, h) = Video.dims(id)
    val frameLen = s"P6\n$w $h\n255\n".getBytes("US-ASCII").length + 3 * w * h
    buf(frameLen) = 'X'
    assertThrows[IllegalArgumentException] { Video.sampleVideo(id, buf, 1) }
    assertThrows[IllegalArgumentException] { Video.sampleVideo(id, buf, 2) }
  }

  test("video stage emits one row per sampled frame over the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val sampled = Video.sampleVideoStage(spark,
      Video.videoPayloads(spark, docs, "doc_id"), stride = 2)
    // expected row count: sum over docs of ceil(nFrames/2)
    val expect = docs.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      (Video.nFrames(id) + 1) / 2
    }.sum
    assert(sampled.count() == expect.toLong)
  }
}
