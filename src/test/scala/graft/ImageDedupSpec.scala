package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.{GraftExtensions, ImageDHash}
import graft.multimodal.{ImageDedup, Multimodal}

/** Image perceptual-hash dedup (§2 row 101 / q75): the native `image_dhash`
  * expression and the Hamming-bucket near-dup join over it. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Re-encode `b` with the same pixels but different BYTES: a PPM comment
    * injected into the header plus trailing junk after the plane — the
    * image content is identical, the payload is not. The perceptual-hash
    * contract is exactly that these hash identically. */
  private def reencoded(b: Array[Byte]): Array[Byte] = {
    val s = new String(b.take(2), "US-ASCII")
    require(s == "P6")
    val comment = "\n# re-encoded by a different writer\n".getBytes("US-ASCII")
    val junk = Array.fill[Byte](17)(0x5a)
    b.take(2) ++ comment ++ b.drop(2) ++ junk
  }

  test("image_dhash: codegen matches interpreted matches local compute") {
    val ids = (0L until 64L).toSeq
    val df = ids.map(id => (id, Multimodal.encodePpm(id))).toDF("id", "payload")
    val viaCodegen = ImageDedup.dHashes(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val local = ImageDHash.compute(Multimodal.encodePpm(id))
      assert(viaCodegen(id) == local, s"codegen != local for id=$id")
      val interp = ImageDHash(Literal.create(Multimodal.encodePpm(id), BinaryType))
        .eval(null).asInstanceOf[Long]
      assert(interp == local, s"interpreted != local for id=$id")
    }
    // 64 synthetic images should not collapse to a few hash values
    assert(viaCodegen.values.toSet.size > 48, "dhash degenerate")
  }

  test("image_dhash is registered as a SQL function; null in, null out") {
    GraftExtensions.register(spark)
    Seq((1L, Multimodal.encodePpm(1L))).toDF("id", "payload")
      .createOrReplaceTempView("img_payloads")
    val viaSql = spark.sql("SELECT image_dhash(payload) FROM img_payloads")
      .head().getLong(0)
    assert(viaSql == ImageDHash.compute(Multimodal.encodePpm(1L)))
    assert(Seq(1).toDF("x").select(
      ImageDHash(spark, lit(null).cast("binary"))).head().isNullAt(0))
  }

  test("image_dhash fails loudly on malformed payloads") {
    intercept[Exception] {
      ImageDHash.compute("not a ppm".getBytes("US-ASCII"))
    }
    intercept[Exception] { // truncated plane
      ImageDHash.compute(Multimodal.encodePpm(3L).dropRight(5))
    }
  }

  test("dHash is a function of pixels, not payload bytes (re-encode invariance)") {
    (0L until 16L).foreach { id =>
      val orig = Multimodal.encodePpm(id)
      assert(ImageDHash.compute(reencoded(orig)) == ImageDHash.compute(orig),
        s"re-encoded payload hashed differently for id=$id")
    }
  }

  test("nearDupImages: planted re-encoded dups all recovered, no cartesian") {
    val originals = (0L until 40L).map(id => (id, Multimodal.encodePpm(id)))
    val planted = originals.map { case (id, b) => (id + 1000L, reencoded(b)) }
    val media = (originals ++ planted).toDF("id", "payload")
    val out = ImageDedup.nearDupImages(media, maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is at Hamming 0 → must be found (radius-3 join is
    // complete by pigeonhole); extra pairs are legitimate near-hashes
    (0L until 40L).foreach { id =>
      assert(got.contains((id, id + 1000L)), s"planted pair $id missed")
    }
    // hamming column is the exact distance (0 for the planted copies)
    val h = out.filter(col("id_b") === col("id_a") + 1000L)
      .select("hamming").collect().map(_.getInt(0))
    assert(h.nonEmpty && h.forall(_ == 0))
  }

  test("incremental dedup vs persisted dhash index: cross-batch recall, " +
    "corpus payloads never re-read") {
    val corpus = (0L until 40L).map(id => (id, Multimodal.encodePpm(id)))
      .toDF("id", "payload")
    // the persisted index shape: signatures written to parquet and read
    // back — the only corpus artifact the probe may touch
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_dhash_idx_spec").toString
    ImageDedup.dHashes(corpus).write.mode("overwrite").parquet(idxDir)
    val indexSigs = spark.read.parquet(idxDir)
    // today's batch: re-encoded copies of corpus images 0..19 under fresh
    // ids, plus genuinely new images (1000..1009) and one within-batch
    // duplicate pair (2000, 2001 share pixels of image 500)
    val probe = ((0L until 20L).map(id =>
        (id + 100L, reencoded(Multimodal.encodePpm(id)))) ++
      (1000L until 1010L).map(id => (id, Multimodal.encodePpm(id))) ++
      Seq((2000L, Multimodal.encodePpm(500L)),
        (2001L, reencoded(Multimodal.encodePpm(500L)))))
      .toDF("id", "payload")
    val out = ImageDedup.incrementalNearDupImages(probe, indexSigs,
      maxHamming = 3)
    assertNoCartesian(out)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { id =>
      assert(got.contains((id + 100L, id)), s"cross-batch pair $id missed")
    }
    assert(got.contains((2001L, 2000L)), "within-batch pair missed")
    // an unrelated fresh image must not match everything (sanity bound:
    // dup partners of 1000..1009 can only be near-hash coincidences)
    assert(got.count(p => p._1 >= 1000L && p._1 < 1010L) <= 3)
  }

  test("only O(grid) pixels are read: hash cost independent of image size") {
    // a large image whose plane is only partially materialized would throw;
    // the expression must touch just the sampled grid — build a 512×512
    // image and verify the hash equals one computed from a plane where all
    // NON-sampled pixels are zeroed (proof no other pixel is read)
    val w = 512; val h = 512
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    def px(i: Int): Byte = ((i * 31 + 7) % 251).toByte
    val full = header ++ Array.tabulate[Byte](n)(px)
    val sampled = Array.fill[Byte](n)(0)
    for (ty <- 0 until 8; tx <- 0 until 9) {
      val sy = ty * h / 8; val sx = tx * w / 9
      val base = 3 * (sy * w + sx)
      (0 until 3).foreach(c => sampled(base + c) = px(base + c))
    }
    val masked = header ++ sampled
    assert(ImageDHash.compute(full) == ImageDHash.compute(masked))
  }
}
