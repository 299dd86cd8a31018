package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap: split each document into
  * `chunkChars`-character windows advancing `strideChars` per chunk — the
  * standard context-window preparation for embedding models and retrieval
  * corpora (stride < chunk ⇒ consecutive chunks overlap by
  * `chunkChars - strideChars` characters so no span is lost at a boundary).
  *
  * Chunk starts are `0, stride, 2·stride, …` up to the LAST start that
  * still begins new content (`start < len`, and a final short window is
  * emitted rather than dropped — training corpora must not silently lose
  * document tails). Empty documents emit one empty chunk, keeping the
  * doc_id set stable through the operator (the same shape contract as the
  * shingle expressions).
  *
  * Scale shape: pure per-row codegen — `posexplode(sequence(...))` over
  * start offsets, then one `substr` per chunk. No shuffle at all: chunk
  * rows inherit the scan's partitioning, and downstream tokenize/embed
  * stages consume them in place. Work per document is
  * O(len · chunk/stride) characters copied — a fixed small multiple of the
  * input for any sane overlap (stride ≥ chunk/2 ⇒ ≤ 2× inflation), NOT
  * quadratic: chunk length is a constant, only the number of windows grows
  * with the document.
  */
object Chunking {

  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars >= 1, s"chunkChars must be >= 1, got $chunkChars")
    require(strideChars >= 1 && strideChars <= chunkChars,
      s"need 1 <= strideChars <= chunkChars, got $strideChars/$chunkChars")
    // last start strictly below len (0 for the empty doc), in stride steps;
    // integer arithmetic throughout: (len-1) div stride · stride
    val lastStart = greatest(lit(0),
      expr(s"(length($textCol) - 1) div $strideChars").cast("int")
        * strideChars)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        posexplode(sequence(lit(0), lastStart, lit(strideChars)))
          .as(Seq("chunk_idx", "chunk_start")))
      .withColumn("chunk_text", // substr is 1-based; clamps at the tail
        col("__t").substr(col("chunk_start") + 1, lit(chunkChars)))
      .withColumn("n_chunk_chars", length(col("chunk_text")))
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text",
        "n_chunk_chars")
  }
}
