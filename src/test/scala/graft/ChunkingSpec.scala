package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile the document: starts on the stride grid, tail kept") {
    // len 10, chunk 4, stride 3 -> starts 0,3,6,9; last chunk is "j"
    val docs = Seq((1L, "abcdefghij")).toDF("id", "text")
    val out = Chunking.chunkDocs(docs, "id", "text", 4, 3)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 0, "abcd", 4),
      (1L, 1, 3, "defg", 4),
      (1L, 2, 6, "ghij", 4),
      (1L, 3, 9, "j", 1)))
  }

  test("overlap: every character appears in at least one chunk; no span lost") {
    val text = ('a' to 'z').mkString
    val docs = Seq((1L, text)).toDF("id", "text")
    val chunks = Chunking.chunkDocs(docs, "id", "text", 7, 5)
      .select("chunk_start", "chunk_text").as[(Int, String)].collect()
    val covered = chunks.flatMap { case (s, t) => s until (s + t.length) }.toSet
    assert(covered == text.indices.toSet)
    // reconstructing from stride-aligned prefixes gives back the document
    val rebuilt = new Array[Char](text.length)
    chunks.foreach { case (s, t) =>
      t.zipWithIndex.foreach { case (c, i) => rebuilt(s + i) = c } }
    assert(rebuilt.mkString == text)
  }

  test("exact-multiple length emits no empty tail chunk") {
    // len 6, chunk 3, stride 3 -> starts 0,3 only (not 6)
    val docs = Seq((1L, "abcdef")).toDF("id", "text")
    val out = Chunking.chunkDocs(docs, "id", "text", 3, 3)
    assert(out.count() == 2)
  }

  test("empty and short docs keep their doc_id with one chunk") {
    val docs = Seq((1L, ""), (2L, "ab")).toDF("id", "text")
    val out = Chunking.chunkDocs(docs, "id", "text", 200, 150)
      .as[(Long, Int, Int, String, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 0, 0, "", 0), (2L, 0, 0, "ab", 2)))
  }

  test("multibyte text chunks on characters, not bytes") {
    val docs = Seq((1L, "日本語のテキスト")).toDF("id", "text") // 8 chars
    val out = Chunking.chunkDocs(docs, "id", "text", 5, 5)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect().toSeq
    assert(out == Seq("日本語のテ", "キスト"))
  }

  test("no shuffle: chunking runs entirely at the scan") {
    val docs = Seq((1L, "x" * 500)).toDF("id", "text")
    val plan = Chunking.chunkDocs(docs, "id", "text", 200, 150)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // -------------------------------------------------------------------
  // cdcChunks — content-defined boundaries
  // -------------------------------------------------------------------

  /** Deterministic letter soup (LCG over a-z) so boundary positions are
    * content-driven but reproducible. */
  private def soup(seed: Long, n: Int): String = {
    var x = seed
    val sb = new StringBuilder
    (1 to n).foreach { _ =>
      x = (x * 48271) % 2147483647L
      sb.append(('a' + (x % 26)).toChar)
    }
    sb.toString
  }

  test("cdc chunks tile the document exactly: contiguous, full coverage, " +
    "hashes match the chunk text") {
    val text = soup(7L, 800)
    val rows = Chunking.cdcChunks(Seq((1L, text)).toDF("id", "text"),
      "id", "text", w = 16, maskBits = 4)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("start"),
        r.getAs[Int]("chunk_len"), r.getAs[Long]("chunk_hash")))
    assert(rows.length > 3, s"mask 2^4 over 800 chars must cut: ${rows.length}")
    // contiguity + coverage
    assert(rows.head._2 == 1)
    rows.sliding(2).foreach {
      case Array((_, s1, l1, _), (_, s2, _, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    assert(rows.map(_._3).sum == text.length)
    // each chunk_hash is the q25 polynomial of its substring
    val M = 1000000007L
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % M)
    rows.foreach { case (_, s, l, h) =>
      assert(h == poly(text.substring(s - 1, s - 1 + l)))
    }
  }

  test("cdc boundaries re-synchronize after a prefix edit: suffix chunks " +
    "keep their hashes (the fixed-window failure mode)") {
    val shared = soup(11L, 600)
    val a = soup(21L, 90) + shared
    val b = soup(31L, 47) + shared
    val docs = Seq((1L, a), (2L, b)).toDF("id", "text")
    val hs = Chunking.cdcChunks(docs, "id", "text", w = 16, maskBits = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_hash"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val common = hs(1L) intersect hs(2L)
    assert(common.size >= 5,
      s"CDC must realign on the shared suffix: only ${common.size} shared " +
        s"chunks of ${hs(1L).size}/${hs(2L).size}")
    // fixed-window chunking at the same granularity shares (almost) none
    val fixedShared = {
      val f = Chunking.chunkDocs(docs, "id", "text", 16, 16)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("chunk_text"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (f(1L) intersect f(2L)).size
    }
    assert(common.size > fixedShared,
      s"CDC ($common) must beat fixed windows ($fixedShared) on shifted text")
  }

  test("cdc: short docs are one whole-doc chunk; empty text survives; " +
    "no shuffle") {
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("id", "text")
    val rows = Chunking.cdcChunks(docs, "id", "text", w = 16, maskBits = 6)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("start"), r.getAs[Int]("chunk_len")))
    assert(rows.toSet == Set((1L, 1, 1, 4), (2L, 1, 1, 0)), rows.mkString(","))
    val plan = Chunking.cdcChunks(docs, "id", "text", 16, 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
