package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native-Catalyst text cleaning.
  *
  * Re-expresses the reference's per-row Python UDFs
  * (/root/reference/Yelp_Data_PreProcessing.py:116-126 `remove_punct` /
  * `convert_rating`, :143 `ltrim`) as codegen'd Catalyst expressions —
  * `regexp_replace` / `when` / `trim` — so whole-stage codegen stays intact
  * and filters referencing cleaned columns remain pushdown-friendly. No UDFs.
  */
object TextFunctions {

  /** Python `string.punctuation` + digits + CR/TAB/LF as one character class.
    * The class is written with explicit ASCII characters (no `\p{Punct}`) so
    * the identical pattern is valid in both Java regex (Spark) and RE2
    * (DuckDB oracle).
    */
  val punctDigitsClass: String =
    """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~0-9\r\t\n]"""

  /** One-or-more whitespace run (squeeze target). */
  val wsRun: String = """\s+"""

  /** Same class escaped for embedding in a single-quoted SQL literal. */
  def punctDigitsClassSql: String = punctDigitsClass.replace("'", "''")

  /** `remove_punct` step 1: punctuation/digits/control → single space
    * (ref Yelp_Data_PreProcessing.py:117-118). */
  def stripPunct(c: Column): Column = regexp_replace(c, punctDigitsClass, " ")

  /** `remove_punct` step 2: squeeze whitespace runs to one space
    * (ref Yelp_Data_PreProcessing.py:119). */
  def squeezeWs(c: Column): Column = regexp_replace(c, wsRun, " ")

  /** Full clean: strip + squeeze + trim (ref Yelp_Data_PreProcessing.py:116-120
    * plus the `ltrim` at :143; `trim` subsumes both ends). */
  def cleanText(c: Column): Column = trim(squeezeWs(stripPunct(c)))

  /** `convert_rating`: value ≥ threshold → 1 else 0
    * (ref Yelp_Data_PreProcessing.py:123-126) as a `when` expression. */
  def binarize(c: Column, threshold: Double): Column =
    when(c >= threshold, lit(1)).otherwise(lit(0))

  /** Whitespace tokens of lower-cased cleaned text — the Catalyst-native
    * equivalent of spark.ml `Tokenizer` (ref Scalable_EDA_Final.py:61-62). */
  def tokens(c: Column): Column = split(lower(cleanText(c)), " ")

  /** Word count via `size()` of the token array
    * (ref Scalable_EDA_Final.py:121). */
  def wordCount(c: Column): Column = size(tokens(c))
}
