package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curriculum, EpochShuffle}
import graft.sources.Tables

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("pos is a permutation of [0, n), stage-major: every stage-s pos " +
    "precedes every stage-(s+1) pos") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("st"))
    val out = Curriculum.curriculumOrder(docs, "doc_id", "st", epoch = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("stage"),
        r.getAs[Long]("pos")))
    val n = out.length
    assert(out.map(_._3).sorted.sameElements(0L until n))
    val maxByStage = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByStage = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    (0 to 2).foreach { s =>
      assert(maxByStage(s) < minByStage(s + 1),
        s"stage $s must fully precede stage ${s + 1}")
    }
  }

  test("equals the naive global (stage, key, id) row_number formulation") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("n_chars") % 7).cast("int").as("st"))
    val got = Curriculum.curriculumOrder(docs, "doc_id", "st", epoch = 7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
      .toMap
    val naive = docs
      .select(col("doc_id"), col("st"),
        EpochShuffle.epochKey(col("doc_id"), 7).as("k"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("st"), col("k"), col("doc_id"))).cast("long") - 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
      .toMap
    assert(got == naive)
  }

  test("reproducible across partitionings; within-stage order changes " +
    "across epochs while stage blocks hold") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % 3).cast("int").as("st"))
    def run(df: org.apache.spark.sql.DataFrame, e: Int) =
      Curriculum.curriculumOrder(df, "doc_id", "st", e)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
        .toMap
    val a = run(docs, 5)
    assert(a == run(docs.repartition(13), 5))
    val c = run(docs, 6)
    assert(a != c, "epochs must reshuffle within stages")
    // stage blocks are epoch-invariant: same docs in the same pos ranges
    def blocks(m: Map[Long, Long]) = {
      val byStage = docs.collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      m.groupBy { case (id, _) => byStage(id) }
        .view.mapValues(v => (v.values.min, v.values.max)).toMap
    }
    assert(blocks(a) == blocks(c))
  }

  test("null ids and stages drop; the data-sized window is cell-partitioned") {
    val df = Seq((Some(1L), Some(0)), (Some(2L), None),
      (None, Some(1)), (Some(3L), Some(1))).toDF("id", "st")
    val out = Curriculum.curriculumOrder(df, "id", "st", epoch = 1)
    assert(out.count() == 2)
    val plan = Curriculum.curriculumOrder(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("st")),
      "doc_id", "st", epoch = 1)
      .queryExecution.executedPlan.toString
    assert("""windowspecdefinition\(stage#\d+, __bucket""".r
      .findFirstIn(plan).isDefined,
      s"data window not partitioned by (stage, bucket):\n$plan")
  }
}
