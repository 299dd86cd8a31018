package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.{AudioFingerprint, GraftExtensions}
import graft.multimodal.{Audio, AudioDedup}

/** Audio perceptual fingerprint + near-dup (q97): the native `audio_fp`
  * expression and the Hamming-bucket near-dup join over it — the audio
  * twin of ImageDedupSpec. */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  test("audio_fp: codegen matches interpreted matches local compute") {
    val ids = (0L until 64L).toSeq
    val df = ids.map(id => (id, Audio.encodeWav(id))).toDF("id", "payload")
    val viaCodegen = AudioDedup.fingerprints(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val local = AudioFingerprint.compute(Audio.encodeWav(id))
      assert(viaCodegen(id) == local, s"codegen != local for id=$id")
      val interp = AudioFingerprint(
        Literal.create(Audio.encodeWav(id), BinaryType))
        .eval(null).asInstanceOf[Long]
      assert(interp == local, s"interpreted != local for id=$id")
    }
    // 64 synthetic clips should not collapse to a few fingerprints
    assert(viaCodegen.values.toSet.size > 48, "audio_fp degenerate")
  }

  test("audio_fp is registered as a SQL function; null in, null out") {
    GraftExtensions.register(spark)
    Seq((1L, Audio.encodeWav(1L))).toDF("id", "payload")
      .createOrReplaceTempView("wav_payloads")
    val viaSql = spark.sql("SELECT audio_fp(payload) FROM wav_payloads")
      .head().getLong(0)
    assert(viaSql == AudioFingerprint.compute(Audio.encodeWav(1L)))
    assert(Seq(1).toDF("x").select(
      AudioFingerprint(spark, lit(null).cast("binary"))).head().isNullAt(0))
  }

  test("audio_fp fails loudly on malformed payloads") {
    intercept[Exception] {
      AudioFingerprint.compute("not a wav".getBytes("US-ASCII"))
    }
    intercept[Exception] { // truncated data chunk
      AudioFingerprint.compute(Audio.encodeWav(3L).dropRight(5))
    }
  }

  test("fingerprint is a function of samples, not container bytes") {
    // same samples behind a different LIST pad → different payload bytes,
    // identical fingerprint (ids congruent mod 512 with different pads
    // would differ in samples, so rebuild the container by hand: append
    // trailing junk AFTER the RIFF extent — the walker honors riffSize)
    (0L until 16L).foreach { id =>
      val orig = Audio.encodeWav(id)
      val junk = orig ++ Array.fill[Byte](13)(0x5a)
      assert(AudioFingerprint.compute(junk) == AudioFingerprint.compute(orig),
        s"trailing junk changed fingerprint for id=$id")
    }
  }

  test("noise robustness: re-recorded copies land within Hamming 3, " +
    "unrelated clips far apart") {
    val ids = (0L until 200L).toSeq
    val near = ids.count { id =>
      val a = AudioFingerprint.compute(Audio.encodeWav(id))
      val b = AudioFingerprint.compute(Audio.encodeWavNoisy(id, maxDelta = 3))
      java.lang.Long.bitCount(a ^ b) <= 3
    }
    assert(near >= 180, s"only $near/200 noisy copies within radius 3")
    // unrelated clips: no pair of distinct ids anywhere near the join radius
    val fps = (0L until 80L).map(id => AudioFingerprint.compute(Audio.encodeWav(id)))
    val minDist = (for {
      a <- fps.indices; b <- (a + 1) until fps.size
    } yield java.lang.Long.bitCount(fps(a) ^ fps(b))).min
    assert(minDist > 3, s"unrelated clips at Hamming $minDist")
  }

  test("incremental audio dedup vs a persisted fingerprint index") {
    // nearDuplicatesAgainstIndex is signature-agnostic: the same parquet-
    // index probe that serves images (q99) serves audio fingerprints —
    // the ingest shape is closed for every modality
    import graft.dedup.SimHash
    val corpus = (0L until 40L).map(id => (id, Audio.encodeWav(id)))
      .toDF("id", "payload")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_afp_idx_spec").toString
    AudioDedup.fingerprints(corpus).write.mode("overwrite").parquet(idxDir)
    val probe = (0L until 40L).map(id =>
      (id + 1000L, Audio.encodeWavNoisy(id, maxDelta = 1)))
      .toDF("id", "payload")
    val out = SimHash.nearDuplicatesAgainstIndex(
      spark.read.parquet(idxDir).withColumnRenamed("afp", "simhash"),
      AudioDedup.fingerprints(probe).withColumnRenamed("afp", "simhash"),
      maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // maxDelta=1 noisy copies fingerprint identically (see robustness
    // test), so every cross-batch pair must surface
    (0L until 40L).foreach { id =>
      assert(got.contains((id + 1000L, id)), s"cross-batch pair $id missed")
    }
  }

  test("incrementalNearDupAudio: cross-batch AND within-batch pairs, " +
    "one operator call") {
    val corpus = (0L until 30L).map(id => (id, Audio.encodeWav(id)))
      .toDF("id", "payload")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_afp_inc_spec").toString
    AudioDedup.fingerprints(corpus).write.mode("overwrite").parquet(idxDir)
    // today's batch: noisy re-uploads of corpus clips 0..9 under fresh ids,
    // fresh clips, and one within-batch duplicate pair (both from clip 500)
    val probe = ((0L until 10L).map(id =>
        (id + 1000L, Audio.encodeWavNoisy(id, maxDelta = 1))) ++
      (2000L until 2005L).map(id => (id, Audio.encodeWav(id))) ++
      Seq((3000L, Audio.encodeWav(500L)),
        (3001L, Audio.encodeWavNoisy(500L, maxDelta = 1))))
      .toDF("id", "payload")
    val out = AudioDedup.incrementalNearDupAudio(probe,
      spark.read.parquet(idxDir), maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { id =>
      assert(got.contains((id + 1000L, id)), s"cross-batch pair $id missed")
    }
    assert(got.contains((3001L, 3000L)), "within-batch pair missed")
  }

  test("nearDupAudio: planted noisy near-dups recovered, no cartesian") {
    val originals = (0L until 60L).map(id => (id, Audio.encodeWav(id)))
    val planted = (0L until 60L).map(id =>
      (id + 1000L, Audio.encodeWavNoisy(id, maxDelta = 3)))
    val media = (originals ++ planted).toDF("id", "payload")
    val out = AudioDedup.nearDupAudio(media, maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair within radius 3 MUST be found (chunk join is
    // complete by pigeonhole); ~3% of noisy copies legitimately exceed it
    val expected = (0L until 60L).filter { id =>
      java.lang.Long.bitCount(
        AudioFingerprint.compute(Audio.encodeWav(id)) ^
          AudioFingerprint.compute(Audio.encodeWavNoisy(id, maxDelta = 3))) <= 3
    }
    assert(expected.size >= 54, s"ground truth thinner than expected: ${expected.size}")
    expected.foreach { id =>
      assert(got.contains((id, id + 1000L)), s"planted pair $id missed")
    }
    // hamming column is the exact distance
    val h = out.filter(col("id_b") === col("id_a") + 1000L)
      .select("hamming").collect().map(_.getInt(0))
    assert(h.nonEmpty && h.forall(_ <= 3))
  }
}
