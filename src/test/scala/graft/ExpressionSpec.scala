package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, GraftExtensions, MinHashSignature, MinWindowHash, ShingleHashes, SimHash64, VectorFunctions}

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val arrays = Seq(
    (1L, Seq(3L, 17L, -4L, 99L)),
    (2L, Seq(Long.MaxValue, Long.MinValue, 0L)),
    (3L, Seq(42L)))

  test("minhash_sig matches a local XXH64 computation (codegen + interpreted)") {
    val df = arrays.toDF("id", "sh")
      .select(col("id"), MinHashSignature(spark, col("sh"), 8).as("sig"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    arrays.foreach { case (id, sh) =>
      val expect = (0 until 8).map(j => sh.map(s => XXH64.hashLong(s, j.toLong)).min)
      assert(got(id) == expect, s"id=$id")
    }
  }

  test("minhash_sig is registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    arrays.toDF("id", "sh").createOrReplaceTempView("shingle_sets")
    val viaSql = spark.sql(
      "SELECT id, minhash_sig(sh, 8) AS sig FROM shingle_sets")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaColumn = arrays.toDF("id", "sh")
      .select(col("id"), MinHashSignature(spark, col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaColumn)
  }

  test("vec_dot matches the HOF formulation incl. null/mismatch semantics") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(-1.0f, 0.5f, 2.0f)), // 6.0
      (2L, Seq(0.0f, 0.0f), Seq(0.0f, 0.0f)),              // 0.0
      (3L, Seq(1.5f), Seq(2.0f)))                          // 3.0
    val both = vecs.toDF("id", "u", "v")
      .select(col("id"),
        DotProduct(spark, col("u"), col("v")).as("native"),
        VectorFunctions.dot(col("u"), col("v")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12, r.toString)
    }
    // length mismatch -> null (zip_with pads with null -> null sum)
    val mm = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("u", "v")
      .select(DotProduct(spark, col("u"), col("v")).as("native"),
        VectorFunctions.dot(col("u"), col("v")).as("hof")).head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    // null element -> null, matching the HOF
    val ne = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("u", "v")
      .select(DotProduct(spark, col("u"), col("v")).as("native"),
        VectorFunctions.dot(col("u"), col("v")).as("hof")).head()
    assert(ne.isNullAt(0) && ne.isNullAt(1))
    // double x float mixed types work
    val mixed = Seq((Seq(0.5, 2.0), Seq(4.0f, 0.25f))).toDF("u", "v")
      .select(DotProduct(spark, col("u"), col("v"))).head().getDouble(0)
    assert(math.abs(mixed - 2.5) < 1e-12)
  }

  test("vec_dot interpreted eval (no codegen) matches for every element type") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, FloatType, IntegerType, ShortType}
    def lit(v: Any, t: org.apache.spark.sql.types.DataType) =
      Literal.create(v, ArrayType(t, containsNull = false))
    // eval() runs nullSafeEval directly — the path codegen fallback takes
    val cases = Seq(
      (lit(Seq(-3.toByte, 7.toByte), ByteType),
        lit(Seq(5.toByte, -2.toByte), ByteType), -29.0),
      (lit(Seq(2.toShort, 3.toShort), ShortType),
        lit(Seq(4.toShort, 5.toShort), ShortType), 23.0),
      (lit(Seq(100000, 3), IntegerType), lit(Seq(2, -1), IntegerType), 199997.0),
      (lit(Seq(0.5f, 2.0f), FloatType), lit(Seq(4.0f, 0.25f), FloatType), 2.5),
      (lit(Seq(0.5, 2.0), DoubleType), lit(Seq(2.toByte, 1.toByte), ByteType), 3.0))
    cases.foreach { case (u, v, want) =>
      assert(DotProduct(u, v).eval(null) == want, s"$u · $v")
    }
    // length mismatch -> null on the interpreted path too
    assert(DotProduct(lit(Seq(1.0), DoubleType),
      lit(Seq(1.0, 2.0), DoubleType)).eval(null) == null)
  }

  test("vec_dot reads integral arrays directly (int8 ANN hot loop)") {
    // tinyint x tinyint: exact int math in double (-3*5 + 7*-2 = -29)
    val bytes = Seq((Seq(-3.toByte, 7.toByte), Seq(5.toByte, -2.toByte)))
      .toDF("u", "v")
    val b = bytes.select(DotProduct(spark, col("u"), col("v"))).head().getDouble(0)
    assert(b == -29.0)
    // identical to the cast-to-double formulation the hot path replaced
    val viaCast = bytes.select(DotProduct(spark,
      col("u").cast("array<double>"), col("v").cast("array<double>")))
      .head().getDouble(0)
    assert(b == viaCast)
    // tinyint x double mixed
    val m = Seq((Seq(2.toByte, 3.toByte), Seq(0.5, 1.0))).toDF("u", "v")
      .select(DotProduct(spark, col("u"), col("v"))).head().getDouble(0)
    assert(m == 4.0)
    // int x int
    val ii = Seq((Seq(100000, 3), Seq(2, -1))).toDF("u", "v")
      .select(DotProduct(spark, col("u"), col("v"))).head().getDouble(0)
    assert(ii == 199997.0)
  }

  test("vec_dot is registered as a SQL function") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("u", "v")
      .createOrReplaceTempView("vec_pairs")
    val got = spark.sql("SELECT vec_dot(u, v) FROM vec_pairs").head().getDouble(0)
    assert(math.abs(got - 11.0) < 1e-12)
  }

  test("simhash64 native expression matches the interpreted HOF reference") {
    val ths = Seq(
      (1L, Seq(3L, 17L, -4L, 99L, 3L)), // duplicate tokens vote twice
      (2L, Seq(Long.MaxValue, Long.MinValue, 0L)),
      (3L, Seq(42L)),                   // single token -> its own bits
      (4L, Seq.empty[Long]))            // no votes -> 0L
    val out = ths.toDF("id", "th")
      .select(col("id"),
        SimHash64(spark, col("th")).as("native"),
        graft.dedup.SimHash.simhash64(col("th")).as("hof"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ths.foreach { case (id, _) =>
      assert(out(id)._1 == out(id)._2, s"id=$id native/hof diverge: ${out(id)}")
    }
    assert(out(3L)._1 == 42L) // majority of one token = the token's bits
    assert(out(4L)._1 == 0L)
  }

  test("shingle_hashes: window structure, short-array collapse, determinism") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),            // 3 trigram windows
      (2L, Seq("a", "b")),                           // short -> 1 whole hash
      (3L, Seq("a", "b", "c", "a", "b", "c", "d")),  // repeated trigram
      (4L, Seq("a", "b", "c", "d", "e")))            // same as doc 1
    val out = docs.toDF("id", "tokens")
      .select(col("id"), ShingleHashes(spark, col("tokens"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).length == 3 && out(1L).distinct.length == 3)
    assert(out(2L).length == 1)
    // identical windows hash identically ((a b c) at positions 0 and 3),
    // different windows differ
    assert(out(3L)(0) == out(3L)(3) && out(3L)(1) != out(3L)(2))
    // identical docs -> identical shingle hashes (determinism across rows)
    assert(out(1L) == out(4L))
    // window hashes are order-sensitive: (a b c) != (b c d)
    assert(out(1L)(0) != out(1L)(1))
  }

  test("min_window_hash matches a per-window reference (codegen + interpreted)") {
    val M = 1000000007L
    def poly(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % M)
    def reference(s: String, k: Int): Long =
      if (s.codePointCount(0, s.length) < k) poly(s)
      else {
        // per-window recompute — the O(len·k) formulation the rolling
        // expression must agree with exactly
        val cps = s.codePoints().toArray
        cps.sliding(k).map(w => w.foldLeft(0L)((a, c) => (a * 31 + c) % M)).min
      }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa",        // all windows identical
      "short",               // len < k -> whole-string hash
      "exactly8",            // len == k -> single window
      "",                    // empty -> fold seed 0
      "café au lait über alles", // non-ASCII codepoints
      "x" * 1000)
    val got = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"), MinWindowHash(spark, col("text"), 8).as("mw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == reference(s, 8), s"sample $i: '${s.take(20)}'")
    }
    // interpreted path (eval without codegen) agrees too
    import org.apache.spark.sql.catalyst.expressions.Literal
    samples.foreach { s =>
      assert(MinWindowHash(Literal(s), 8).eval(null) == reference(s, 8))
    }
    // null text -> null
    assert(MinWindowHash(Literal.create(null,
      org.apache.spark.sql.types.StringType), 8).eval(null) == null)
  }

  test("char_window_polyhashes matches per-window recompute " +
    "(codegen + interpreted); short/empty collapse") {
    import graft.functions.CharWindowPolyHashes
    val M = 1000000007L
    def poly(cps: Array[Int]): Long =
      cps.foldLeft(0L)((a, c) => (a * 31 + c) % M)
    def reference(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) Seq(poly(cps))
      else cps.sliding(k).map(poly).toSeq
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa", "short", "exactly8", "",
      "café au lait über alles", "y" * 300)
    val got = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"),
        CharWindowPolyHashes(spark, col("text"), 8).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == reference(s, 8), s"sample $i: '${s.take(20)}'")
    }
    import org.apache.spark.sql.catalyst.expressions.Literal
    samples.foreach { s =>
      val e = graft.functions.CharWindowPolyHashes(Literal(s), 8)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(e.toLongArray.toSeq == reference(s, 8))
    }
    // and the min over the array equals min_window_hash (sibling contract)
    val s = "the quick brown fox jumps over the lazy dog"
    assert(reference(s, 8).min ==
      MinWindowHash(Literal(s), 8).eval(null).asInstanceOf[Long])
  }

  test("poly_hash: codegen == interpreted == the SQL aggregate fold it " +
    "replaces; empty→0, null→null") {
    import graft.functions.PolyHash
    val M = 1000000007L
    def reference(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % M)
    val samples = Seq(
      "the quick brown fox", "", "a", "café au lait", "y" * 500,
      "mixed 123 Punct!?")
    def reference37(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 37 + c) % M)
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    // codegen path, the interpreted SQL fold, and the local reference
    // must agree value-for-value at both fingerprint bases (the fold is
    // what the DuckDB oracles replay via list_reduce)
    val got = df.select(col("id"), PolyHash(spark, col("text")).as("h"),
        PolyHash(spark, col("text"), 37).as("h37"),
        expr("aggregate(split(text, ''), CAST(0 AS BIGINT), " +
          "(a, c) -> (a * 31 + CAST(coalesce(ascii(c), 0) AS BIGINT)) " +
          "% 1000000007)").as("f"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong)._1 == reference(s), s"codegen drift on '$s'")
      assert(got(i.toLong)._2 == reference37(s), s"base-37 drift on '$s'")
      assert(got(i.toLong)._3 == reference(s), s"SQL-fold drift on '$s'")
    }
    import org.apache.spark.sql.catalyst.expressions.Literal
    samples.foreach { s =>
      assert(PolyHash(Literal(s), 31).eval(null) == reference(s),
        s"interpreted drift on '$s'")
    }
    // null in, null out — and the whole-string collapse of the window
    // sibling equals this scalar (k ≥ len contract)
    assert(Seq(Tuple1(null: String)).toDF("text")
      .select(PolyHash(spark, col("text"))).head().isNullAt(0))
    val s = "short str"
    assert(graft.functions.CharWindowPolyHashes(Literal(s), 1024)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq == Seq(reference(s)))
  }

  test("poly_hash beyond the BMP: codepoint iteration, pinned value — " +
    "the deliberate divergence from the old surrogate-half SQL fold") {
    import graft.functions.PolyHash
    import org.apache.spark.sql.catalyst.expressions.Literal
    val M = 1000000007L
    // "a🙂b" = codepoints [97, 0x1F642 = 128578, 98]; the old
    // `aggregate(split(text,''), …)` fold saw FOUR elements (the emoji as
    // two UTF-16 surrogate halves 0xD83D/0xDE42), so its value differed.
    // Codepoint semantics are the intended contract (they match DuckDB's
    // per-character ascii() on true characters); any fingerprint persisted
    // from a pre-codepoint build must be recomputed for non-BMP text.
    val s = "a🙂b"
    val want = Seq(97L, 128578L, 98L).foldLeft(0L)((a, c) => (a * 31 + c) % M)
    // frozen ((97·31 + 128578)·31 + 98) mod (10⁹+7): a build that shifts
    // this breaks any persisted fingerprint of non-BMP text
    assert(want == 4079233L)
    assert(PolyHash(Literal(s), 31).eval(null) == want)
    val surrogateFold = Seq(97L, 0xD83DL, 0xDE42L, 98L)
      .foldLeft(0L)((a, c) => (a * 31 + c) % M)
    assert(surrogateFold != want) // the divergence is real, not vacuous
    // session-free columnOf (the fingerprintBase path) and the registered
    // function agree on the same non-BMP value
    val got = Seq(Tuple1(s)).toDF("text")
      .select(PolyHash.columnOf(col("text")).as("a"),
        PolyHash(spark, col("text")).as("b")).head()
    assert(got.getLong(0) == want && got.getLong(1) == want)
    // and the window sibling's whole-string collapse matches (shared loop)
    assert(graft.functions.CharWindowPolyHashes(Literal(s), 1024)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq == Seq(want))
  }

  test("srp_buckets == the per-plane when-tree it fused: local seeded " +
    "plane replay, degenerate inputs to all-zero buckets, codegen == " +
    "interpreted") {
    import graft.functions.SrpBuckets
    val (nTables, bits, dim, seed) = (3, 5, 8, 42L)
    def localBuckets(v: Seq[Float]): Seq[Int] =
      (0 until nTables).map { t =>
        val rnd = new scala.util.Random(seed + t)
        val planes = Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
        planes.zipWithIndex.map { case (p, i) =>
          // the old tree: s += v(d)·plane(d) ascending, bit on s ≥ 0
          var s = 0.0; var d = 0
          while (d < dim) { s += v(d).toDouble * p(d); d += 1 }
          if (s >= 0) 1 << i else 0
        }.sum
      }
    val rnd = new scala.util.Random(7L)
    val vecs = Seq.fill(12)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)) :+
      Seq.fill(dim)(0f)
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"),
        SrpBuckets.columnOf(col("v"), nTables, bits, dim, seed).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == localBuckets(v), s"vector $i drifted")
    }
    // degenerate inputs: null vector and wrong length — all-zero buckets
    // (the old when-tree's null→otherwise(0) path), never null
    val degenerate = Seq((0L, null: Seq[Float]), (1L, Seq(1f, 2f)))
      .toDF("id", "v")
      .select(SrpBuckets.columnOf(col("v"), nTables, bits, dim, seed).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(degenerate.forall(_ == Seq(0, 0, 0)), degenerate.toSeq.toString)
    // interpreted eval agrees with the codegen path above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val e = SrpBuckets(Literal.create(vecs.head,
      ArrayType(FloatType, containsNull = true)), nTables, bits, dim, seed)
    assert(e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray.toSeq == localBuckets(vecs.head))
    // and the public single-table srpBucket rides the same expression
    val single = vecs.take(3).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"),
        graft.similarity.Ann.srpBucket(spark, col("v"), bits, dim, seed + 1).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.take(3).zipWithIndex.foreach { case (v, i) =>
      val rnd2 = new scala.util.Random(seed + 1)
      val planes = Seq.fill(bits)(Array.fill(dim)(rnd2.nextGaussian()))
      val want = planes.zipWithIndex.map { case (p, j) =>
        var s = 0.0; var d = 0
        while (d < dim) { s += v(d).toDouble * p(d); d += 1 }
        if (s >= 0) 1 << j else 0
      }.sum
      assert(single(i.toLong) == want, s"single-table vector $i drifted")
    }
  }

  test("min_window_hash is registered as a SQL function") {
    GraftExtensions.register(spark)
    Seq("rolling hash windows here").toDF("text")
      .createOrReplaceTempView("mwh_docs")
    val viaSql = spark.sql(
      "SELECT min_window_hash(text, 8) FROM mwh_docs").head().getLong(0)
    val viaCol = Seq("rolling hash windows here").toDF("text")
      .select(MinWindowHash(spark, col("text"), 8)).head().getLong(0)
    assert(viaSql == viaCol)
    // default k = 8 single-arg form
    assert(spark.sql("SELECT min_window_hash(text) FROM mwh_docs")
      .head().getLong(0) == viaSql)
  }

  test("deflate_len: deterministic, codegen == interpreted, separates text") {
    import graft.functions.DeflateLen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val repetitive = "spam " * 400                            // 2000 bytes
    val varied = new scala.util.Random(7).alphanumeric.take(2000).mkString
    val df = Seq((1L, repetitive), (2L, varied)).toDF("id", "text")
    // codegen path (whole-stage) vs interpreted eval() on the same inputs
    val viaCodegen = df.select(col("id"), DeflateLen(spark, col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def interp(s: String): Int =
      DeflateLen(Literal.create(s,
        org.apache.spark.sql.types.StringType)).eval(null).asInstanceOf[Int]
    assert(viaCodegen(1L) == interp(repetitive))
    assert(viaCodegen(2L) == interp(varied))
    // repeated runs are bit-stable (thread-reused deflater resets cleanly)
    assert(interp(varied) == interp(varied))
    // the signal: same raw length, wildly different compressed length
    assert(viaCodegen(1L) * 10 < viaCodegen(2L),
      s"repetitive ${viaCodegen(1L)} not << varied ${viaCodegen(2L)}")
    // empty input: small nonzero terminator, never a crash or a zero-div
    assert(interp("") > 0 && interp("") < 8)
    // null in, null out
    assert(df.select(DeflateLen(spark, lit(null).cast("string")))
      .head().isNullAt(0))
  }

  test("deflate_len is registered as a SQL function") {
    GraftExtensions.register(spark)
    Seq("compress me " * 50).toDF("text").createOrReplaceTempView("dl_docs")
    val viaSql = spark.sql("SELECT deflate_len(text) FROM dl_docs")
      .head().getInt(0)
    val viaCol = Seq("compress me " * 50).toDF("text")
      .select(graft.functions.DeflateLen(spark, col("text"))).head().getInt(0)
    assert(viaSql == viaCol && viaSql > 0)
  }

  test("minhash_sig survives inside the full banded pipeline") {
    import graft.dedup.MinHashDedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "unrelated words entirely different from those")).toDF("id", "text")
    val pairs = MinHashDedup.nearDuplicates(docs, "id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("normalize_text: NFC composes, NFKC folds compatibility forms") {
    import graft.functions.NormalizeText
    val decomposed = "café"        // e + combining acute
    val composed = "café"           // precomposed é
    val rows = Seq(
      (1L, decomposed), (2L, composed), (3L, "ﬁnal"),
      (4L, "ｆｕｌｌ"), (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = rows.select(col("id"),
      NormalizeText(spark, col("t"), "NFC").as("nfc"),
      NormalizeText(spark, col("t"), "NFKC").as("nfkc")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // NFC: both spellings converge on the composed form -> hashes now agree
    assert(out(1L)._1 == composed && out(2L)._1 == composed)
    // NFC leaves the ligature; NFKC folds it (and fullwidth letters)
    assert(out(3L)._1 == "ﬁnal" && out(3L)._2 == "final")
    assert(out(4L)._2 == "full")
    assert(out(5L) == ((null, null)))    // null propagates
    // interpreted eval == plan result
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NormalizeText(Literal.create(decomposed,
      org.apache.spark.sql.types.StringType), "NFC")
    assert(e.eval(null).toString == composed)
  }

  test("normalize_text: dedup that unnormalized text evades") {
    import graft.functions.NormalizeText
    val docs = Seq(
      (1L, "le café du coin est ouvert"),
      (2L, "le café du coin est ouvert")).toDF("id", "text")
    // raw: different strings -> exact dedup keeps both
    assert(graft.dedup.ExactDedup.keepFirst(docs, Seq("text"), "id")
      .count() == 2)
    // normalized first -> recognized as the same document
    val normed = docs.select(col("id"),
      NormalizeText(spark, col("text"), "NFC").as("text"))
    assert(graft.dedup.ExactDedup.keepFirst(normed, Seq("text"), "id")
      .count() == 1)
  }

  test("sorted_intersect_count == size(array_intersect) on sorted distinct " +
    "arrays (codegen + interpreted + SQL)") {
    import graft.functions.SortedIntersectCount
    val rnd = new scala.util.Random(421)
    // adversarial sizes: empty, singleton, disjoint, identical, long
    val cases: Seq[(Long, Seq[Long], Seq[Long])] =
      Seq(
        (1L, Seq.empty[Long], Seq.empty[Long]),
        (2L, Seq(5L), Seq(5L)),
        (3L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
        (4L, Seq(Long.MinValue, -7L, 0L, Long.MaxValue),
          Seq(Long.MinValue, -7L, 0L, Long.MaxValue))) ++
        (5L to 40L).map { id =>
          def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
            .distinct.sorted
          (id, arr(), arr())
        }
    val df = cases.toDF("id", "a", "b")
      .select(col("id"),
        SortedIntersectCount.columnOf(col("a"), col("b")).as("walk"),
        size(array_intersect(col("a"), col("b"))).as("generic"),
        (size(col("a")) + size(col("b")) -
          SortedIntersectCount.columnOf(col("a"), col("b"))).as("union_ie"),
        size(array_union(col("a"), col("b"))).as("union_generic"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"intersect mismatch: $r")
      assert(r.getInt(3) == r.getInt(4), s"union mismatch: $r")
    }
    // interpreted eval (the non-codegen path) on the same cases
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    cases.foreach { case (id, a, b) =>
      val e = SortedIntersectCount(
        Literal.create(a, ArrayType(LongType, containsNull = false)),
        Literal.create(b, ArrayType(LongType, containsNull = false)))
      assert(e.eval(null) == a.toSet.intersect(b.toSet).size, s"id=$id")
    }
    // SQL registration
    GraftExtensions.register(spark)
    cases.take(4).toDF("id", "a", "b").createOrReplaceTempView("sic_t")
    val viaSql = spark.sql(
      "SELECT id, sorted_intersect_count(a, b) AS c FROM sic_t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.take(4).foreach { case (id, a, b) =>
      assert(viaSql(id) == a.toSet.intersect(b.toSet).size)
    }
  }

  test("sorted_intersect_count null semantics: null input or null element " +
    "-> null") {
    import graft.functions.SortedIntersectCount
    val rows = Seq(
      (1L, Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L), Some(3L)))),
      (2L, None, Some(Seq(Some(1L)))),
      (3L, Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))))
      .toDF("id", "a", "b")
      .select(col("id"),
        SortedIntersectCount.columnOf(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows(1L) == Some(1))
    assert(rows(2L) == None)
    assert(rows(3L) == None)
  }

  test("verifyJaccard sorted path is bit-identical to the generic path") {
    // the q18/q140 contract: same ints -> the SAME correctly-rounded
    // division -> identical doubles, so oracle hashes can't move
    val docs = (1L to 60L).map { i =>
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog " +
        s"${i % 5} again and again token${i % 11}"
      (i, if (i % 3 == 0) base else base + s" tail$i")
    }.toDF("id", "text")
    val generic = graft.dedup.NGramJaccard
      .shingleSets(docs, "id", "text", 3)
      .select(col("id"), array_sort(col("sh")).as("sh"))
    val pairs = generic.as("l").join(generic.as("r"),
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val viaSorted = collectMap(graft.dedup.MinHashDedup
      .verifyJaccard(pairs, generic, 0.0, sorted = true))
    val viaGeneric = collectMap(graft.dedup.MinHashDedup
      .verifyJaccard(pairs, generic, 0.0))
    assert(viaSorted.nonEmpty && viaSorted == viaGeneric)
  }
}
