package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Third adversarial batch: temporal joins, funnels, interval algebra,
  * and exact quantiles — randomized inputs with heavy timestamp ties,
  * nulls, and boundary hits, checked in full against local oracles. */
class AdversarialPropertySpec3 extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("asOfJoin == local latest-at-or-before scan with ties, nulls, " +
    "and unmatched-left passthrough") {
    val rnd = new Random(21)
    val left = (0 until 800).map { i =>
      (i.toLong,
        if (rnd.nextInt(20) == 0) null else s"k${rnd.nextInt(15)}",
        if (rnd.nextInt(25) == 0) null else ts(rnd.nextInt(1000) * 1000L))
    }
    val right = (0 until 400).map { _ =>
      (s"k${rnd.nextInt(15)}", ts(rnd.nextInt(1000) * 1000L),
        rnd.nextInt(10000).toLong)
    }.distinctBy(r => (r._1, r._2))  // (key, ts) unique per contract
    val rmap = right.groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(r => (r._2.getTime, r._3))
        .sortBy(_._1) }
    val expect = left.map { case (id, k, t) =>
      val v = for {
        kk <- Option(k); tt <- Option(t)
        rows <- rmap.get(kk)
        hit <- rows.reverseIterator.find(_._1 <= tt.getTime)
      } yield hit._2
      (id, v)
    }.toSet
    val got = graft.operators.AsOfJoin.asOfJoin(
      left.toDF("id", "k", "t"), right.toDF("rk", "rt", "v"),
      "k", "rk", "t", "rt", Seq("v"))
      .select(col("id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got == expect, s"asof drift: ${got.diff(expect).take(5)} / " +
      s"${expect.diff(got).take(5)}")
  }

  test("rangeJoin == local containment scan incl. boundary-exact points " +
    "and bucket-straddling intervals") {
    val rnd = new Random(8)
    val W = 60000000L // 60 s bucket, µs
    val points = (0 until 600).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", ts(rnd.nextInt(600) * 1000L)))
    val intervals = (0 until 200).map { j =>
      val s = rnd.nextInt(600) * 1000L
      // lengths up to exactly the bucket width, some zero-length
      val len = rnd.nextInt(4) match {
        case 0 => 0L case 1 => 60000L case _ => rnd.nextInt(60000).toLong
      }
      (j.toLong, s"k${rnd.nextInt(8)}", ts(s), ts(s + len))
    }
    val expect = (for {
      (pid, pk, pt) <- points; (iid, ik, s, e) <- intervals
      if pk == ik && pt.getTime >= s.getTime && pt.getTime <= e.getTime
    } yield (pid, iid)).toSet
    assert(expect.size > 100, s"too few planted matches: ${expect.size}")
    val got = graft.operators.RangeJoin.rangeJoin(
      points.toDF("pid", "k", "pt"),
      intervals.toDF("iid", "ik", "s", "e"),
      "k", "ik", "pt", "s", "e", W, Seq("iid"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"range drift: ${got.diff(expect).take(5)} / " +
      s"${expect.diff(got).take(5)}")
  }

  test("funnel == local earliest-next-after walk with duplicate " +
    "timestamps and out-of-order steps") {
    val rnd = new Random(64)
    val types = Seq("A", "B", "C")
    val events = (0 until 3000).map { _ =>
      (rnd.nextInt(120).toLong, types(rnd.nextInt(3)),
        ts(rnd.nextInt(50) * 1000L)) // only 50 instants: heavy ties
    }
    val byUser = events.groupBy(_._1)
    val expect = byUser.flatMap { case (u, evs) =>
      def minAfter(step: String, after: Long): Option[Long] = {
        val c = evs.filter(e => e._2 == step && e._3.getTime * 1000 > after)
        if (c.isEmpty) None else Some(c.map(_._3.getTime * 1000).min)
      }
      val t1 = {
        val a = evs.filter(_._2 == "A")
        if (a.isEmpty) None else Some(a.map(_._3.getTime * 1000).min)
      }
      t1.map { t1v =>
        val t2 = minAfter("B", t1v)
        val t3 = t2.flatMap(minAfter("C", _))
        (u, Option(t1v), t2, t3,
          1 + t2.map(_ => 1).getOrElse(0) + t3.map(_ => 1).getOrElse(0))
      }
    }.toSet
    val got = graft.operators.Funnel.funnel(
      events.toDF("u", "et", "t"), "u", "et", "t", Seq("A", "B", "C"))
      .collect().map { r =>
        def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), g(1), g(2), g(3), r.getInt(4))
      }.toSet
    assert(got == expect, s"funnel drift: ${got.diff(expect).take(5)} / " +
      s"${expect.diff(got).take(5)}")
  }

  test("Intervals.coverage == local merge with touching, nested, and " +
    "duplicate intervals") {
    val rnd = new Random(2)
    val width = 50L
    val rows = (0 until 1200).map(_ =>
      (s"g${rnd.nextInt(6)}", rnd.nextInt(500).toLong))
    val expect = rows.groupBy(_._1).map { case (g, evs) =>
      val iv = evs.map(e => (e._2, e._2 + width)).distinct.sortBy(_._1)
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }
      g -> ((merged.size.toLong, merged.map(m => m._2 - m._1).sum))
    }
    val got = graft.operators.Intervals.coverage(
      rows.toDF("g", "t"), Seq("g"), "t", width)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expect, s"coverage drift: got $got expect $expect")
  }

  test("groupQuantiles and cumeDistBp == local lower-nearest-rank math " +
    "under heavy ties") {
    val rnd = new Random(46)
    val rows = (0 until 2000).map(_ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(25).toLong)) // 25 values: ties
    val qBps = Seq(1, 2500, 5000, 7500, 9999, 10000)
    val byG = rows.groupBy(_._1).map { case (g, r) => g -> r.map(_._2).sorted }
    val expectQ = (for {
      (g, vs) <- byG; q <- qBps
      // min v with cum*10000 >= q*tot over the distinct-value cum frame
      v = vs.distinct.find(v0 =>
        vs.count(_ <= v0).toLong * 10000L >= q.toLong * vs.size).get
    } yield (g, q.toLong, v)).toSet
    val gotQ = graft.operators.Robust.groupQuantiles(
      rows.toDF("g", "v"), "g", "v", qBps)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotQ == expectQ, s"quantile drift: ${gotQ.diff(expectQ)} / " +
      s"${expectQ.diff(gotQ)}")
    val expectC = rows.map { case (g, v) =>
      val vs = byG(g)
      (g, v, 10000L * vs.count(_ <= v) / vs.size)
    }.toSet
    val gotC = graft.operators.Robust.cumeDistBp(
      rows.toDF("g", "v"), "g", "v")
      .select(col("g"), col("v"), col("pct_bp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotC == expectC, s"cume drift: ${gotC.diff(expectC).take(5)} / " +
      s"${expectC.diff(gotC).take(5)}")
  }
}
