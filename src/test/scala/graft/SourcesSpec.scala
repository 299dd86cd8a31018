package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.Tables

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("header CSV sink/source round-trip, with and without explicit schema") {
    val df = Seq((1L, "alpha", "x,y"), (2L, "beta", "z")).toDF("id", "name", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/t"
    Tables.writeCsv(df, dir)

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("payload", StringType)))
    val explicit = Tables.readCsv(spark, dir, Some(schema))
    assert(explicit.schema == schema)
    assert(explicit.orderBy("id").collect().map(_.getString(2)).toSeq ==
      Seq("x,y", "z")) // quoted comma survives the round-trip

    val inferred = Tables.readCsv(spark, dir)
    assert(inferred.columns.toSeq == Seq("id", "name", "payload"))
    assert(inferred.count() == 2)
  }

  test("JSONL sink/source round-trip with explicit schema, no inference") {
    val df = Seq((1L, "alpha \"quoted\"", 10), (2L, "line\nbreak", 20),
      (3L, null.asInstanceOf[String], 30)).toDF("id", "text", "n")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/t"
    Tables.writeJsonl(df, dir)
    val back = Tables.readJsonl(spark, dir, df.schema)
    // names and types come from the EXPLICIT schema (not inferred/widened);
    // nullability is uniformly true on JSON reads — any row may omit a field
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSeq
    // escapes, embedded newlines, and nulls all survive the round-trip
    assert(rows == Seq((1L, Some("alpha \"quoted\""), 10),
      (2L, Some("line\nbreak"), 20), (3L, None, 30)))
  }

  test("parquet sink overwrites and reads back identically") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/t"
    Tables.writeParquet(df, dir)
    Tables.writeParquet(df, dir) // overwrite mode: second write must succeed
    val back = spark.read.parquet(dir)
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("range layout: file key ranges are disjoint and rows key-sorted") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString + "/t"
    Tables.writeRangeLayout(docs, dir, "doc_id", nFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size > 1, "range write produced a single file")
    // each file must cover a tight range: min/max windows pairwise disjoint
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select("doc_id").as[Long].collect()
      assert(ids.toSeq == ids.toSeq.sorted, s"rows not key-sorted in $f")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // nothing lost in the layout pass
    assert(spark.read.parquet(dir).count() == docs.count())
  }
}
