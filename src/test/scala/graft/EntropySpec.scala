package graft

import graft.textstats.Entropy

class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Entropy.charEntropy(rows.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-computed entropies: uniform alphabet high, single char " +
    "zero, skewed in between") {
    val got = run(
      (1L, "abcd"),      // uniform over 4 chars: H = ln 4
      (2L, "aaaa"),      // single char: H = 0
      (3L, "aab"),       // 2/3, 1/3 mix
      (4L, ""))          // empty: len 0, ent 0
    def flog(x: Double) = math.floor(math.log(x) * 1e6).toLong
    assert(got(1L) == ((4L, (flog(4) * 4 - 4 * flog(1)) / 4)))
    assert(got(2L) == ((4L, 0L)), got.toString)
    assert(got(3L) == ((3L, (flog(3) * 3 - (2 * flog(2) + flog(1))) / 3)))
    assert(got(4L) == ((0L, 0L)))
    // ordering sanity: uniform > skewed > constant
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("entropy separates mash from loops on realistic text") {
    val got = run(
      (1L, "the cat sat on the mat and looked about the room"),
      (2L, "xq9zjw2kv8mp4ydh7bn3tcfg6rlsu1aoei5"), // base64-ish mash
      (3L, "ha " * 40))                            // looping generation
    assert(got(2L)._2 > got(1L)._2, s"mash must out-entropy prose: $got")
    assert(got(1L)._2 > got(3L)._2, s"prose must out-entropy loops: $got")
  }

  test("every input id survives; only (id, char, count) shuffles") {
    val df = Entropy.charEntropy(
      (1L to 40L).map(i => (i, if (i % 7 == 0) "" else s"text$i body"))
        .toDF("id", "text"), "id", "text")
    assert(df.count() == 40)
    assertNoCartesian(df)
  }
}
