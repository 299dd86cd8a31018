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

  test("ORC sink/source round-trip; filters and pruning reach the ORC " +
    "scan like parquet") {
    val df = Seq((1L, "alpha", 10L), (2L, "beta", 20L), (3L, null, 30L))
      .toDF("id", "name", "n")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
      .toString + "/t"
    Tables.writeOrc(df, dir)
    val back = Tables.readOrc(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
      .toSeq == Seq((1L, Some("alpha"), 10L), (2L, Some("beta"), 20L),
        (3L, None, 30L)))
    // the drop-in-layout claim: pushdown + pruning work on the ORC scan
    val p = back.filter(back("n") > 15L).select("id")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n), GreaterThan(n"), p)
    assert(!p.split("ReadSchema")(1).takeWhile(_ != '\n').contains("name"),
      s"name column not pruned from ORC scan:\n$p")
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

  test("partitioned write: directory layout, planning-time pruning, guard") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    Tables.writePartitioned(docs, dir, Seq("lang"))
    // values became directory names
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langDirs.contains("lang=en"), s"no lang=en dir in $langDirs")
    // a filtered scan prunes partitions at planning time
    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"no partition filter in scan:\n$plan")
    assert(scan.count() == docs.filter(col("lang") === "en").count())
    // nothing lost across all partitions
    assert(spark.read.parquet(dir).count() == docs.count())
    // the small-files guard: a high-cardinality key fails fast
    assertThrows[IllegalArgumentException] {
      Tables.writePartitioned(docs, dir + "2", Seq("doc_id"), maxPartitions = 10)
    }
  }

  test("z-order layout: per-file rectangles are tight on BOTH keys") {
    import org.apache.spark.sql.functions._
    // a 64x64 grid: every (x, y) cell occupied once
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/t"
    Tables.writeZOrdered(grid, zdir, "x", "y", nFiles = 16, bits = 6)
    def fileSpans(dir: String, c: String): Seq[Long] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
        .map { f =>
          val v = spark.read.parquet(f).select(c).as[Long].collect()
          v.max - v.min
        }
    val xs = fileSpans(zdir, "x"); val ys = fileSpans(zdir, "y")
    assert(xs.size > 1, "z-order write produced a single file")
    // each file covers a tight rectangle: both dims well under the full
    // 0..63 domain (ideal for 16 files is a 16x16 tile, span 15)
    assert(xs.sum.toDouble / xs.size <= 32, s"x spans too wide: $xs")
    assert(ys.sum.toDouble / ys.size <= 32, s"y spans too wide: $ys")
    // contrast: a single-key range layout leaves the OTHER key unpruned —
    // every file spans the whole y domain
    val rdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/r"
    Tables.writeRangeLayout(grid, rdir, "x", nFiles = 16)
    val ry = fileSpans(rdir, "y")
    assert(ry.sum.toDouble / ry.size >= 60, s"unexpected y pruning: $ry")
    // lossless
    assert(spark.read.parquet(zdir).select("id").as[Long].collect().toSet ==
      (0L until 4096L).toSet)
  }

  test("schema-evolution read: mergeSchema unions generations, old rows " +
    "surface late columns as NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"
    Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "fr", 120L)).toDF("id", "lang", "n_chars")
      .write.mode("append").parquet(dir)
    val merged = graft.sources.Tables.readParquetMerged(spark, dir)
    assert(merged.columns.toSet == Set("id", "lang", "n_chars"),
      merged.columns.mkString(","))
    val rows = merged.select("id", "n_chars")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(120L)), rows)
  }

  test("JSONL quarantine: broken lines land in _corrupt_record, clean " +
    "rows parse; neither side is dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_quar").toString + "/t"
    val src = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    graft.sources.Tables.writeJsonl(src, dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.json"),
      "{broken\nnot json".getBytes("UTF-8"))
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.readJsonlQuarantine(spark, dir,
      src.schema).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    // quarantined lines carry the raw evidence
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSet
    assert(quarantined == Set("{broken", "not json"), quarantined)
  }

  test("dynamic partition pruning: a filtered dim join plants the DPP " +
    "subquery in the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/t"
    Tables.writePartitioned(docs, dir, Seq("lang"))
    val dim = docs.select("lang").distinct()
      .withColumn("tier", when(col("lang").isin("en", "de"), lit("keep"))
        .otherwise(lit("drop")))
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("tier") === "keep"), Seq("lang"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n${plan.take(3000)}")
    assert(joined.count() ==
      docs.filter(col("lang").isin("en", "de")).count())
  }

  test("compaction: file count collapses to the byte target, content " +
    "is identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cpt").toString
    val df = (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(32).write.mode("overwrite").parquet(s"$tmp/frag")
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(s"$tmp/frag") == 32)
    graft.sources.Tables.compact(spark, s"$tmp/frag", s"$tmp/opt")
    assert(parts(s"$tmp/opt") == 1, s"got ${parts(s"$tmp/opt")} files")
    assert(spark.read.parquet(s"$tmp/opt").as[(Long, String)].collect().toSet
      == df.as[(Long, String)].collect().toSet)
  }
}
