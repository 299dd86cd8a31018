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
}
