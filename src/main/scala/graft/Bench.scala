package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"queries":{…}}. Queries run in sorted
  * name order after a small untimed warmup pass (one scan per input table)
  * so JVM/JIT/codegen startup is not billed to whichever query runs first.
  *
  * Timing forces each query through a `noop`-format write, NOT `count()`:
  * count() wraps the plan in an aggregate referencing no columns, and
  * column pruning then deletes the very expressions being measured (a
  * map-only query like fingerprinting would be timed as a bare scan). The
  * noop sink materializes every output row with all columns.
  *
  * Every run self-certifies its noise: a control set of stable
  * sub-second queries (SPARK_GRAFT_BENCH_CONTROLS) is re-timed at ~8
  * points through the run and once at the end; the output JSON carries
  * the control samples and `noise_floor` (worst max/min control
  * dispersion), so a contention burst is visible in the artifact itself
  * instead of needing re-run archaeology against other rounds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "events", "orders", "lineitem", "customer", "part",
      "supplier", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // warm the regex/codegen path the text queries share (JIT + janino);
    // noop write so pruning can't delete the warmed expressions
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(graft.functions.TextFunctions.wordCount(col("text")).as("wc"))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    // median of 3 runs per query: single-run numbers swung ~2x round-over-
    // round under sandbox contention (q27/q36/q44 in r4 regressed with
    // byte-identical code); the median is stable to one outlier run
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runsPer >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runsPer")
    // optional comma list of name prefixes — dev subset runs (the driver
    // sets neither env, so it always benches everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    // control-query protocol: a fixed set of stable sub-second queries is
    // re-timed at intervals THROUGH the run, so every artifact carries its
    // own noise certificate — when the host takes an external contention
    // burst mid-run, the burst shows up as control dispersion instead of
    // masquerading as a regression in whichever alphabetical neighborhood
    // it landed on. Override with SPARK_GRAFT_BENCH_CONTROLS (comma list;
    // empty string disables).
    val controlNames = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROLS",
        "q01_read_project,q21_multimodal_meta,q220_k_anonymity")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .filter(SparkEntry.queries.contains)
    // stored quiet-window reference medians (sf0.1, the round-11 artifact's
    // warmup-dropped control medians — the quietest committed window): the
    // emitted control_ratio = median over controls of (this run's control
    // median / its reference) makes round-over-round per-query diffs
    // AMBIENT-NORMALIZED in the artifact itself — round 12 burned real
    // effort proving two ≥2x movers were a 1.3x-slower host, which this
    // field states directly. Override per environment with
    // SPARK_GRAFT_BENCH_CONTROL_REFS ("name=sec,name=sec"); controls
    // without a reference (or a non-sf0.1 run) simply contribute nothing.
    // tolerant parse: a malformed entry (empty or non-numeric value)
    // contributes nothing — an optional normalization hint must never be
    // able to kill a multi-hour bench run at startup — but each drop is
    // WARNED on stderr (one line), so an operator typo is
    // distinguishable from "refs intentionally unset" (the same
    // unmeasured-vs-measured principle as the null noise floor). Keys
    // and values are trimmed individually: spaces around '=' must not
    // silently produce a key no control name matches.
    val controlRefs: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_BENCH_CONTROL_REFS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty)
          .flatMap { kv =>
            // '='-less AND empty-key entries go through the SAME warn
            // path as non-numeric values: a colon/space typo dropping
            // every entry pre-warning would make a typo'd env var emit a
            // null control_ratio indistinguishable from refs
            // intentionally unset — and an empty key ('=0.5', or a
            // leading-comma artifact) parses "successfully" to a key no
            // control name can ever match, the same silent-drop
            // ambiguity wearing a different typo
            val parsed =
              if (!kv.contains("=") || kv.takeWhile(_ != '=').trim.isEmpty)
                None
              else {
                val Array(k, v) = kv.split("=", 2).map(_.trim)
                v.toDoubleOption.map(k -> _)
              }
            if (parsed.isEmpty) System.err.println(
              s"Bench: ignoring malformed SPARK_GRAFT_BENCH_CONTROL_REFS entry '$kv'")
            parsed
          }.toMap)
        // built-in references are keyed by the dataset directory's FINAL
        // path component (File.getName — which also strips a trailing
        // slash, so '/data/sf0.1/' still matches): a bare endsWith gate
        // matched any directory whose name merely ENDED in the literal
        // ('/data/notsf0.1') and silently applied the wrong scale's
        // references, emitting a misleading control_ratio. Two scales
        // carry built-ins: sf0.1 (the round-11 quiet-window warmup-
        // dropped control medians, the per-round profile's anchor) and
        // sf1u (the make_sf1.py 10x layout at its conventional
        // directory name — round-14 quiet-window isolated medians,
        // floor ≤2 — so the sf1 scaling map self-certifies its ambient
        // window instead of needing manual control archaeology, the
        // round-13 verdict's ask #4).
        .getOrElse(new java.io.File(sfDir).getName match {
          case "sf0.1" => Map(
            "q01_read_project" -> 0.0891,
            "q21_multimodal_meta" -> 0.1956,
            "q220_k_anonymity" -> 0.3728)
          // round-14 quiet-window (floor 1.28) isolated 5-rep medians.
          // Convention note: q220's IN-MAP samples run ~2x its isolated
          // value under a full map's cache pressure, so the per-control
          // ratios are combined by MEDIAN below — one map-inflated
          // control cannot move the reported ambient (r13's sf1 map
          // reads 1.04 against these refs by that median).
          case "sf1u" => Map(
            "q01_read_project" -> 0.1564,
            "q21_multimodal_meta" -> 0.2455,
            "q220_k_anonymity" -> 0.2942)
          case _ => Map.empty[String, Double]
        })
    val controlTimes =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    // failed control runs are counted and emitted (controls_failed): a
    // systematically dying control otherwise yields a null/partial floor
    // indistinguishable from a merely-disabled one, silently weakening
    // the self-certification. NonFatal only — an OutOfMemoryError or a
    // linkage error must kill the run, not be swallowed as a data point.
    // Only TIMED failures count: the two untimed warmup passes feed no
    // floor sample, so a control failing only on first touch (cold-cache
    // staging, say) must not report >0 when every timed sample is intact.
    var controlsFailed = 0
    def runControls(timed: Boolean): Unit = controlNames.foreach { cn =>
      val t0 = System.nanoTime()
      val failed =
        try { SparkEntry.queries(cn)(spark, sfDir)
          .write.format("noop").mode("overwrite").save(); false }
        catch { case scala.util.control.NonFatal(_) => true }
      // sample captured BEFORE clearCache (the main loop's rule), and a
      // FAILED control is never recorded as a TIME — a fast failure would
      // explode max/min and falsely certify a contention burst
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (timed && failed) controlsFailed += 1
      if (timed && !failed) controlTimes(cn) =
        controlTimes.getOrElse(cn, Vector.empty) :+ dt
    }
    // two untimed control passes first: the controls' own JIT/codegen
    // warmup must not be billed to the first interleave points as
    // "dispersion" (one pass measurably wasn't enough on a short run)
    runControls(timed = false); runControls(timed = false)
    // ONE median and ONE warmup-drop definition for everything this run
    // emits (per-query medians, the noise floor's control dispersion, the
    // control_ratio) — three inline copies of the same statistical
    // conventions would drift independently and silently break exactly
    // the cross-round comparability the artifact exists to provide.
    // Strict median: odd counts take the middle run; even counts average
    // the two middles (the lower-middle alternative degenerates to the
    // MINIMUM at 2 reps — an optimistic bias still labeled "median").
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // each control's first timed sample is warmup (kept in the JSON,
    // excluded from floor and ratio): residual JIT drifts it high on
    // short runs, and both fields certify CONTENTION, not warmup
    def dropWarmup(ts: Seq[Double]): Seq[Double] =
      if (ts.size >= 3) ts.drop(1) else ts
    val benchSet = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    // ~8 interleave points across the run (plus one final pass below)
    val ctrlEvery = math.max(1, benchSet.size / 8)
    val results = benchSet.zipWithIndex.map { case ((name, fn), qi) =>
      if (controlNames.nonEmpty && qi % ctrlEvery == 0) runControls(timed = true)
      val runs = (1 to runsPer).map { _ =>
        val t0 = System.nanoTime()
        // a failed query must NOT be billed as an ordinary (short) timing —
        // that would make a regression read as a speedup; it is recorded as
        // err and excluded from the timing map
        val err: Option[String] =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // operator-internal persists (dedup diamond plans) must not leak into
        // the next run's timing or accumulate over 70+ queries
        spark.catalog.clearCache()
        (dt, err)
      }
      val err = runs.collectFirst { case (_, Some(m)) => m }
      val times = runs.map(_._1)
      (name, med(times), times, err)
    }
    if (controlNames.nonEmpty) runControls(timed = true) // closing point
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val ok = results.filter(_._4.isEmpty)
    val qs = ok.map { case (k, v, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val runsJson = ok.map { case (k, _, ts, _) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(m)) =>
      jstr(k) + ":" + jstr(m.take(300))
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // the run's self-certified noise floor: worst max/min dispersion over
    // the interleaved control samples. ~1.0-1.5 = quiet window; >2 = a
    // contention burst hit the run and per-query diffs need isolated
    // re-measures before they mean anything (the splice protocol's bar)
    val controlsJson = controlTimes.map { case (k, ts) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // NO usable samples (controls disabled, names not in `queries`, or
    // every control run failing) → null, NOT 1.0: an unmeasured run must
    // be distinguishable from a measured-quiet one, or a typo'd control
    // list would falsely certify the whole artifact
    val floors = controlTimes.values.map(dropWarmup)
      .filter(_.size >= 2).map(ts => ts.max / ts.min)
    val noiseFloor = if (floors.isEmpty) "null" else floors.max.toString
    // ambient ratio vs the stored quiet-window references: ~1.0 = this run
    // is comparable to the reference window; 1.3 = host 30% slower — divide
    // per-query diffs by this before calling anything a regression. Median
    // across controls (each control's warmup-dropped median / its stored
    // reference) so one control's own drift cannot fake an ambient shift.
    val ratios = controlTimes.toSeq.flatMap { case (cn, ts) =>
      val kept = dropWarmup(ts)
      controlRefs.get(cn).filter(_ > 0).filter(_ => kept.nonEmpty)
        .map(ref => med(kept) / ref)
    }
    val controlRatio = if (ratios.isEmpty) "null" else med(ratios).toString
    // sfDir is operator-controlled (env var): escape it like every other
    // string, or a quote/backslash in the path makes a multi-hour run's
    // one output line unparseable
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"errors":$errs,"failed":${results.size - ok.size},"controls":$controlsJson,"controls_failed":$controlsFailed,"noise_floor":$noiseFloor,"control_ratio":$controlRatio,"sf":${jstr(sfDir)}}""")
    // clean JVM shutdown: any stateful streaming query leaves the shared
    // StateStore maintenance thread running, and a tick AFTER spark.stop()
    // throws "SparkEnv not active" onto stderr — harmless but it rode the
    // tail of every committed artifact. Stop active queries, then the
    // maintenance pool, BEFORE the session.
    spark.streams.active.foreach { q =>
      try q.stop() catch { case scala.util.control.NonFatal(_) => }
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
  }
}
