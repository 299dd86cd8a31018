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
  * instead of needing re-run archaeology against other rounds.
  *
  * Burst requeue: queries bracketed by a hot control pass (pass level
  * above SPARK_GRAFT_BENCH_REQUEUE_RATIO × the run's MEDIAN pass level,
  * default 1.5 — time-local outliers, so the systematic in-map control
  * inflation under cache pressure doesn't flag ordinary passes) are
  * re-run at the map tail inside a proven quiet window — fresh
  * under-quiet-bar control passes immediately before AND after each
  * re-run. The quiet bar is derived from the run's OWN median pass
  * level (× SPARK_GRAFT_BENCH_REQUEUE_QUIET_SLACK, default 1.2), NOT
  * from the hot-detection ratio: the raw min-anchored pass level runs
  * systematically above 1.0 under map cache pressure, so anchoring
  * quiet certification to the same 1.5 knob as hot detection meant one
  * threshold served two jobs — desensitizing detection would have
  * simultaneously loosened what "quiet" certifies.
  *
  * A certified re-run REPLACES the in-map median only when the two
  * medians genuinely disagree — max(in/quiet, quiet/in) above
  * SPARK_GRAFT_BENCH_REQUEUE_REPLACE_BAR (default 1.25) — in EITHER
  * direction (a burst-window read can be falsely fast, not just slow;
  * r15's q187 read 0.68 bracketed vs 1.31 quiet). When they agree
  * within the bar the bracket was benign for this query and the in-map
  * number stands (it shares the map's cache-pressure conventions with
  * every other query); the certified evidence is recorded either way.
  * Each `requeued` entry is a machine-readable object — in_map, quiet
  * (+runs), pre/post bracketing pass levels, replaced flag — not a
  * prose string, so the substitution decision is auditable from the
  * artifact alone.
  *
  * A "burst" bracketing more than a quarter of
  * the map is a run-wide condition, not time-local: requeue is skipped
  * (`requeue_runwide_skip`) and the floor/ratio certify it (floored at
  * 2 suspects so a small --only-filtered subset doesn't disable
  * requeue on its first suspect). The wait
  * for quiet is bounded (SPARK_GRAFT_BENCH_REQUEUE_WAIT seconds, default
  * 420); suspects the budget can't rescue keep their in-map numbers and
  * are counted in `requeue_gave_up` (re-runs that fail outright — not a
  * burst — keep their in-map numbers too, counted separately in
  * `requeue_errored`). This makes an ~18-minute map robust
  * to the host's ~10-minute external-burst cadence without post-hoc
  * splice campaigns. SPARK_GRAFT_BENCH_REQUEUE=0 disables.
  *
  * Control set: three stable sub-second SparkEntry queries PLUS a
  * synthetic multi-core shuffle probe (`ctl_shuffle_probe`, a fixed
  * repartition+agg over a generated frame — no data dependence, same
  * work at every sf). The probe closes the detector's measured blind
  * spot (r15): sustained external load in the 10–19 range slows
  * 32-thread shuffle queries 2–5× while barely moving single-threaded
  * 0.3 s controls, so r15 attempts 2/3 read floors 3.1/5.5 with NO
  * time-local pass outlier. The probe contends for the same cores the
  * real queries do, so that mode now shows up in the noise floor, the
  * emitted `probe_ratio` (its ambient vs its stored quiet reference —
  * kept OUT of `control_ratio`, whose cross-round meaning must not
  * change), AND detection: because the across-controls pass median is
  * deliberately robust to one mover (which would silence exactly this
  * one-control signal), the probe carries its own time-local outlier
  * channel — its sample vs its own run-median level — OR-ed into hot
  * detection (a missing probe sample in a pass flags hot only when
  * CORROBORATED — a second miss or an elevated neighbor pass — so one
  * transient hiccup can't requeue two interleave neighborhoods; a
  * missing sample still always FAILS quiet certification, where
  * conservatism costs only wait budget), and quiet certification
  * requires BOTH channels under their
  * bars plus an ABSOLUTE probe bar (stored reference ×
  * SPARK_GRAFT_BENCH_REQUEUE_ABS_SLACK, default 1.3) so a run whose
  * whole window is ambient-slow cannot certify a tail "rescue" at the
  * elevated level. NOTE: floors from r16 on
  * include the probe's (inherently wider) multi-core dispersion and
  * are not directly comparable to r15-and-earlier floors; from r17 the
  * window's headline quiet metric is `map_phase_dispersion` (warmup,
  * closing pass, and certified-caught hot passes excluded — the
  * dispersion of the window the map's QUOTED numbers were actually
  * measured in), gated by tools/audit_artifact.py at ≤2.0 (sf0.1) /
  * ≤2.2 (sf1u); noise_floor stays emitted for cross-round continuity
  * but is closing-dip-dominated by construction. */
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
    // synthetic multi-core shuffle probe (not a SparkEntry query; "ctl_"
    // prefix keeps it visibly non-correctness-bearing): ~0.7 s of
    // range→hash-exchange→hash-agg over a generated frame, 32 map tasks
    // and 32 reduce tasks, ~11M partial-agg records across the wire
    // (14M rows against ~1M groups leaves ~350k distinct groups per
    // map task, so the partial agg barely compresses) — enough parallel
    // work that external CPU load which leaves a single-threaded 0.3 s
    // control untouched still moves this sample. No sfDir dependence:
    // the built-in references below are per-JVM-config, not per-scale
    // (the sf1 map's -Xmx64g convention runs it ~15% faster than the
    // default heap — GC headroom; it never touches sfDir).
    val shuffleProbe: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame = (s, _) => {
      import org.apache.spark.sql.functions._
      // id*K % 2^20: a cheap integer mix so group ids aren't
      // range-clustered per task
      s.range(0L, 14000000L, 1L, 32)
        .select(((col("id") * 2654435761L) % 1048576L).as("k"), col("id"))
        .groupBy("k")
        .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
    }
    val probeName = "ctl_shuffle_probe"
    val syntheticControls = Map(probeName -> shuffleProbe)
    val controlNames = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROLS",
        s"q01_read_project,q21_multimodal_meta,q220_k_anonymity,$probeName")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .filter(n => SparkEntry.queries.contains(n) ||
        syntheticControls.contains(n))
    val controlFns: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
      syntheticControls ++
        controlNames.filter(SparkEntry.queries.contains)
          .map(n => n -> SparkEntry.queries(n)).toMap
    // stored quiet-window reference medians (sf0.1, the round-11 artifact's
    // warmup-dropped control medians — the quietest committed window): the
    // emitted control_ratio = median over controls of (this run's control
    // median / its reference) makes round-over-round per-query diffs
    // AMBIENT-NORMALIZED in the artifact itself — round 12 burned real
    // effort proving two ≥2x movers were a 1.3x-slower host, which this
    // field states directly. Override per environment with
    // SPARK_GRAFT_BENCH_CONTROL_REFS ("name=sec,name=sec"); controls
    // without a reference (or a non-sf0.1 run) simply contribute nothing.
    // HOST-SPECIFICITY: the built-in reference medians below (both the
    // sf0.1 and sf1u maps) are quiet-window measurements of THIS
    // machine's datasets — the gate is only the directory's basename, so
    // any directory named "sf0.1"/"sf1u" on a different host (or a
    // regenerated dataset) would silently get this host's medians and
    // emit a plausible but wrong control_ratio. The emitted
    // `refs_source` field states which table was applied so a foreign
    // reader can tell; on foreign hosts set
    // SPARK_GRAFT_BENCH_CONTROL_REFS instead of relying on built-ins.
    // tolerant parse: a malformed entry (empty or non-numeric value)
    // contributes nothing — an optional normalization hint must never be
    // able to kill a multi-hour bench run at startup — but each drop is
    // WARNED on stderr (one line), so an operator typo is
    // distinguishable from "refs intentionally unset" (the same
    // unmeasured-vs-measured principle as the null noise floor). Keys
    // and values are trimmed individually: spaces around '=' must not
    // silently produce a key no control name matches.
    var refsSource = "none"
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
        .map { m => refsSource = "env"; m }
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
          case "sf0.1" =>
            refsSource = "builtin-sf0.1-host-specific"
            Map(
            "q01_read_project" -> 0.0891,
            "q21_multimodal_meta" -> 0.1956,
            "q220_k_anonymity" -> 0.3728,
            // r16 quiet-window median (floors ≤1.35, default heap); the
            // probe is synthetic so the value is config-, not
            // data-scale-, dependent
            "ctl_shuffle_probe" -> 0.75)
          // round-14 quiet-window (floor 1.28) isolated 5-rep medians.
          // Convention note: q220's IN-MAP samples run ~2x its isolated
          // value under a full map's cache pressure, so the per-control
          // ratios are combined by MEDIAN below — one map-inflated
          // control cannot move the reported ambient (r13's sf1 map
          // reads 1.04 against these refs by that median).
          case "sf1u" =>
            refsSource = "builtin-sf1u-host-specific"
            Map(
            "q01_read_project" -> 0.1564,
            "q21_multimodal_meta" -> 0.2455,
            "q220_k_anonymity" -> 0.2942,
            // r16 quiet-window median under the sf1 map's -Xmx64g heap
            // (the probe runs ~15% faster there than at default heap —
            // GC headroom, not data: it never touches sfDir)
            "ctl_shuffle_probe" -> 0.65)
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
    // per-pass samples (one map per timed pass, in pass order) feed the
    // burst-requeue bracketing below: a query is attributable to a burst
    // only if the control pass before or after it reads hot, which needs
    // the pass structure, not just the per-control sample vectors
    val controlPasses =
      scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
    def runControls(timed: Boolean): Unit = {
      val pass = Map.newBuilder[String, Double]
      controlNames.foreach { cn =>
        val t0 = System.nanoTime()
        val failed =
          try { controlFns(cn)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); false }
          catch { case scala.util.control.NonFatal(_) => true }
        // sample captured BEFORE clearCache (the main loop's rule), and a
        // FAILED control is never recorded as a TIME — a fast failure would
        // explode max/min and falsely certify a contention burst
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Guards.releaseMaterialized(spark)
        if (timed && failed) controlsFailed += 1
        if (timed && !failed) {
          controlTimes(cn) = controlTimes.getOrElse(cn, Vector.empty) :+ dt
          pass += cn -> dt
        }
      }
      if (timed) controlPasses += pass.result()
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
    def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Seq[(Double, Option[String])] =
      (1 to runsPer).map { _ =>
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
        // the next run's timing or accumulate over 70+ queries. clearCache
        // alone stopped doing that job when the diamond sites moved from
        // lazy persist to eager localCheckpoint (round 17): checkpoint
        // blocks live as RDD storage the CacheManager cannot see, so the
        // blocks of all ~282 queries piled up until driver GC — measured as
        // a 2-6x inflation of the bench's own tail-query numbers vs the
        // same queries in a fresh JVM. Release them explicitly (untimed,
        // between runs — a measurement-honesty fix, not a query change).
        spark.catalog.clearCache()
        Guards.releaseMaterialized(spark)
        (dt, err)
      }
    val results = benchSet.zipWithIndex.map { case ((name, fn), qi) =>
      if (controlNames.nonEmpty && qi % ctrlEvery == 0) runControls(timed = true)
      // the index of the control pass that most recently ran BEFORE this
      // query — pass prevPass+1 (if it ever runs; the closing pass below
      // guarantees one) is the first to run AFTER it, so the two bracket
      // the query's wall-clock window for burst attribution
      val prevPass = controlPasses.size - 1
      val runs = timeQuery(fn)
      val err = runs.collectFirst { case (_, Some(m)) => m }
      val times = runs.map(_._1)
      (name, med(times), times, err, prevPass)
    }
    if (controlNames.nonEmpty) runControls(timed = true) // closing point
    // freeze the MAP-phase control record before the requeue phase below
    // appends its own passes: the emitted floor/ratio/samples certify the
    // map proper, and the requeue phase's deliberately-waited-through hot
    // passes must not make the headline floor unreadably worse than the
    // window the (replaced) medians were actually measured in
    // plain toMap is a safe snapshot: values are immutable Vectors that
    // runControls REPLACES (never mutates in place)
    val mapControlTimes: Map[String, Vector[Double]] = controlTimes.toMap
    val mapPassCount = controlPasses.size
    // frozen with the samples: a control failing during the requeue
    // phase's quiet-wait passes must not cast doubt on a floor computed
    // from intact map-phase samples
    val mapControlsFailed = controlsFailed

    // ---- burst requeue (in-run auto-splice; round-14 verdict ask #4) ----
    // The burst signature is known: an external load spike hits one
    // alphabetical neighborhood of the map and the adjacent control pass
    // reads hot. Instead of losing the whole 18-minute map to a 10-minute
    // burst cadence, queries bracketed by a hot control pass are re-run at
    // the tail of the map inside a PROVEN quiet window — a fresh control
    // pass under the threshold immediately before each re-run and another
    // immediately after (a burst starting mid-re-run discards it). Re-run
    // medians replace the in-map ones and the `requeued` key records the
    // substitution with both numbers and the bracketing ratios: the
    // artifact carries its own splice evidence, no post-hoc isolated
    // campaign needed. Bounded: the wait budget caps total sleeping so a
    // burst that never ends cannot hang the run (unrescued suspects are
    // counted in requeue_gave_up and keep their in-map numbers).
    // SPARK_GRAFT_BENCH_REQUEUE=0 disables.
    val requeueEnabled =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REQUEUE", "1") != "0"
    // tolerant parse with a warned fallback (the CONTROL_REFS rule): these
    // are read AFTER the full map has run, and a bare .toDouble on a typo
    // would throw away the whole run's measurements at the finish line
    // finite-only: toDoubleOption happily parses "NaN"/"Infinity", and a
    // non-finite knob would both break every quiet comparison (NaN
    // compares false) and ride raw into the output line as invalid JSON
    def envDouble(name: String, default: Double): Double =
      sys.env.get(name) match {
        case Some(v) => v.toDoubleOption.filter(_.isFinite).getOrElse {
          System.err.println(
            s"Bench: ignoring malformed $name='$v', using $default")
          default
        }
        case None => default
      }
    val requeueRatio = envDouble("SPARK_GRAFT_BENCH_REQUEUE_RATIO", 1.5)
    val requeueWaitSec = envDouble("SPARK_GRAFT_BENCH_REQUEUE_WAIT", 420.0)
    // quiet certification is a SEPARATE knob from hot detection: quiet =
    // pass level ≤ (run's median pass level) × slack. The raw min-anchored
    // level runs above 1.0 systematically under map cache pressure
    // (documented up to ~2x), so comparing it to the hot-detection ratio
    // meant a genuinely quiet host whose typical-vs-best spread exceeded
    // the ratio could burn the whole wait budget, and raising the ratio
    // to compensate would desensitize burst detection at the same time.
    // (The `quietSlack` val itself is read below, next to the probe-miss
    // corroboration that reuses it as the "elevated neighbor" bar.)
    // replacement bar (the splice protocol's house rule, symmetric): a
    // certified quiet re-run replaces the in-map median only when the two
    // disagree by more than this factor in either direction; agreement
    // within it means the bracket was benign for this query and the
    // in-map number (which shares the map's cache-pressure conventions
    // with every un-requeued query) stands, recorded but kept
    val replaceBar = envDouble("SPARK_GRAFT_BENCH_REQUEUE_REPLACE_BAR", 1.25)
    // each control's per-run scale anchor is its best warmup-dropped
    // MAP-phase sample (stored references would tie the detector to
    // another window's host state); pass levels are expressed against it
    val quietMin: Map[String, Double] = mapControlTimes.collect {
      case (cn, ts) if dropWarmup(ts).nonEmpty => cn -> dropWarmup(ts).min }
    def passRatio(samples: Map[String, Double]): Option[Double] = {
      val rs = samples.toSeq.flatMap { case (cn, dt) =>
        quietMin.get(cn).filter(_ > 0).map(dt / _) }
      if (rs.isEmpty) None else Some(med(rs))
    }
    // A burst is an OUTLIER IN TIME, so a pass flags hot relative to the
    // run's MEDIAN pass level, not its single best moment: in-map control
    // samples systematically run above their isolated levels under a full
    // map's cache pressure (q220 reads ~2x — the documented convention),
    // so a min-anchored absolute test flags nearly every pass of a
    // perfectly ordinary run (the first r15 profile attempt flagged
    // 280/282 queries exactly this way), while dividing by the median
    // pass level cancels the systematic inflation and leaves only the
    // time-local spike a burst actually is. Pass 0 carries residual
    // control warmup (the dropWarmup convention) and never flags.
    val mapPassLevels: Vector[Option[Double]] =
      controlPasses.take(mapPassCount).map(passRatio).toVector
    val medianPassLevel: Option[Double] = {
      val ls = mapPassLevels.drop(1).flatten
      if (ls.isEmpty) None else Some(med(ls))
    }
    // PROBE CHANNEL: the across-controls median above is deliberately
    // robust to one inflated control — which also means one hot
    // multi-core probe among three unmoved single-threaded controls is
    // silenced by construction (measured: a 14-core external burst read
    // probe level 1.79 while the pass median stayed ~1.2). The probe is
    // the only control sensitive to the sustained-load mode, so it gets
    // its OWN time-local outlier test (its sample level vs its own
    // run-median level), OR-ed into passHot. Runs without the probe in
    // the control set leave the channel inert.
    def probeLevel(pass: Map[String, Double]): Option[Double] =
      for { dt <- pass.get(probeName)
            qm <- quietMin.get(probeName) if qm > 0 } yield dt / qm
    val probeLevels: Vector[Option[Double]] =
      controlPasses.take(mapPassCount).map(probeLevel).toVector
    val medianProbeLevel: Option[Double] = {
      val ls = probeLevels.drop(1).flatten
      if (ls.isEmpty) None else Some(med(ls))
    }
    // quiet certification slack, read here because the probe-miss
    // corroboration below reuses it as its "elevated neighbor" bar;
    // full semantics documented at the quiet-bar derivation further down
    val quietSlack = envDouble("SPARK_GRAFT_BENCH_REQUEUE_QUIET_SLACK", 1.2)
    // an ACTIVE probe channel (the probe produced samples this run)
    // whose sample is MISSING in a pass is a burst signal — the
    // synthetic probe only fails under extreme resource pressure — but
    // a SINGLE transient miss in an otherwise-calm run is not: treating
    // every lone miss as hot sent up to two interleave neighborhoods
    // (~benchSet/4 queries x 3 attempts x runsPer) into tail requeue on
    // one hiccup. A miss therefore flags hot only when CORROBORATED:
    // a second miss anywhere in the map (systematic probe failure), or
    // an adjacent pass reading elevated (above the quiet-slack bar on
    // either channel — a burst wide enough to kill the probe shows on
    // its neighbors). Either way the miss is logged distinctly, so an
    // operator can tell probe-failure requeues from genuine catches.
    val probeMissingPasses: Seq[Int] =
      if (medianProbeLevel.isEmpty) Nil
      else (1 until mapPassCount).filter(p => probeLevels(p).isEmpty)
    def levelElevated(p: Int): Boolean = {
      val medEl = (for {
        l <- mapPassLevels(p); m <- medianPassLevel if m > 0
      } yield l / m > quietSlack).getOrElse(false)
      val prbEl = (for {
        l <- probeLevels(p); m <- medianProbeLevel if m > 0
      } yield l / m > quietSlack).getOrElse(false)
      medEl || prbEl
    }
    def missCorroborated(p: Int): Boolean =
      probeMissingPasses.size >= 2 ||
        Seq(p - 1, p + 1).filter(i => i >= 1 && i < mapPassCount)
          .exists(levelElevated)
    probeMissingPasses.foreach { p =>
      System.err.println(s"Bench: probe sample MISSING in control pass $p" +
        (if (missCorroborated(p)) " — corroborated (second miss or " +
          "elevated neighbor pass); flagging the pass hot"
         else " — uncorroborated lone miss; NOT flagging the pass hot " +
          "(neighbors read calm and no second miss)"))
    }
    val passHotVec: Vector[Boolean] =
      (0 until mapPassCount).map { p =>
        p >= 1 && {
          val medianHot = (for {
            l <- mapPassLevels(p); m <- medianPassLevel if m > 0
          } yield l / m > requeueRatio).getOrElse(false)
          val probeHot = medianProbeLevel match {
            case Some(m) if m > 0 =>
              probeLevels(p).map(_ / m > requeueRatio)
                .getOrElse(missCorroborated(p))
            case _ => false
          }
          medianHot || probeHot
        }
      }.toVector
    def passHot(p: Int): Boolean =
      p >= 1 && p < mapPassCount && passHotVec(p)
    // the quiet bar in raw (min-anchored) pass-level units; when the map
    // produced no median (single-pass --only runs) fall back to the hot
    // ratio — the old behavior, still bounded by the wait budget
    val quietBar: Double =
      medianPassLevel.map(_ * quietSlack).getOrElse(requeueRatio)
    // quiet certification must clear BOTH channels: a tail window can
    // read quiet by the across-controls median while cores are still
    // saturated (the same masking as detection). The probe channel has
    // TWO bars: relative (its own run-median level × slack — catches a
    // tail burst against this run's typical state) and ABSOLUTE (its
    // stored quiet reference × SPARK_GRAFT_BENCH_REQUEUE_ABS_SLACK,
    // applied only when a reference exists) — the absolute anchor is
    // what a run-relative bar cannot give: in a map whose WHOLE window
    // ran ambient-slow (r15: ratio 1.356), every relative test passes at
    // the elevated level and a tail "rescue" measured there replaces an
    // honest number with a slow-window one (measured: r15's q187 rescue
    // 1.313 vs its isolated truth 0.724). With the absolute bar, a tail
    // that can't reach the probe's known quiet level within slack
    // refuses to certify — suspects keep their in-map numbers and the
    // floor/ratio certify the window instead. A missing probe sample
    // fails certification when the channel is active (same reasoning as
    // detection). Returns (pass ratio, probe raw seconds) so the
    // bracketing probe evidence rides into the requeued records.
    val probeQuietBar: Option[Double] = medianProbeLevel.map(_ * quietSlack)
    val probeAbsSlack = envDouble("SPARK_GRAFT_BENCH_REQUEUE_ABS_SLACK", 1.3)
    val probeAbsBar: Option[Double] =
      controlRefs.get(probeName).filter(_ > 0).map(_ * probeAbsSlack)
    def tailQuiet(pass: Map[String, Double])
        : Option[(Double, Option[Double])] = {
      val channelActive = probeQuietBar.isDefined
      val raw = pass.get(probeName)
      val relOk =
        if (!channelActive) true
        else probeLevel(pass).exists(_ <= probeQuietBar.get)
      val absOk =
        if (!channelActive || probeAbsBar.isEmpty) true
        else raw.exists(_ <= probeAbsBar.get)
      passRatio(pass).filter(_ <= quietBar)
        .filter(_ => relOk && absOk).map(r => (r, raw))
    }
    val finalQ = scala.collection.mutable.LinkedHashMap[String, Double]()
    val finalRuns =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    results.foreach { case (k, v, ts, err, _) =>
      if (err.isEmpty) { finalQ(k) = v; finalRuns(k) = ts } }
    // machine-readable requeue records (one raw-JSON object per suspect
    // that earned a certified quiet re-run): in_map / quiet medians, the
    // quiet runs, pre/post bracketing pass levels, and whether the quiet
    // number replaced the in-map one under the replacement bar
    val requeued = scala.collection.mutable.LinkedHashMap[String, String]()
    var requeueGaveUp = 0
    // counted apart from gave-up: a nondeterministic re-run failure is
    // not "the host never quieted", and an artifact reader must be able
    // to tell the two apart
    var requeueErrored = 0
    var requeueRunwideSkip = false
    if (requeueEnabled && quietMin.nonEmpty) {
      val suspects0 = results.filter { case (_, _, _, err, p) =>
        err.isEmpty && (passHot(p) || passHot(p + 1)) }
      // run-wide guardrail: a "burst" bracketing more than a quarter of
      // the map is not a burst — it is either a run-long ambient shift
      // (nothing time-local to rescue from; the floor/ratio already
      // certify it) or a detector defect, and re-running most of an
      // 18-minute map in the tail would silently double the run.
      // Floored at 2: integer size/4 is 0–1 on a small --only-filtered
      // subset, where a single suspect would otherwise trip the skip and
      // silently disable requeue in exactly the filtered re-measure runs
      // that want it most
      val suspects =
        if (suspects0.size > math.max(2, benchSet.size / 4)) {
          requeueRunwideSkip = true
          System.err.println(s"Bench: ${suspects0.size}/${benchSet.size} " +
            "queries read burst-bracketed — run-wide condition, not a " +
            "time-local burst; requeue skipped (floor/ratio certify the " +
            "window)")
          Nil
        } else suspects0
      if (suspects.nonEmpty) {
        System.err.println(s"Bench: ${suspects.size} burst-bracketed " +
          s"queries requeued: ${suspects.map(_._1).mkString(", ")}")
        val deadline = System.nanoTime() + (requeueWaitSec * 1e9).toLong
        // bounded wait for a quiet window: fresh control passes until one
        // reads under the quiet bar, sleeping between attempts. None at
        // budget exhaustion.
        def awaitQuiet(): Option[(Double, Option[Double])] = {
          var out: Option[(Double, Option[Double])] = None
          var budget = true
          while (out.isEmpty && budget) {
            runControls(timed = true)
            val r = tailQuiet(controlPasses.last)
            if (r.isDefined) out = r
            else if (System.nanoTime() > deadline) budget = false
            else Thread.sleep(20000)
          }
          out
        }
        // the post-check of one rescued suspect doubles as the pre-check
        // of the next: consecutive suspects in one quiet stretch pay one
        // control pass each, not two
        var lastQuiet: Option[(Double, Option[Double])] = awaitQuiet()
        suspects.foreach { case (name, v0, _, _, _) =>
          var rescued = false
          var errored = false
          var attempts = 0
          while (!rescued && !errored && lastQuiet.isDefined && attempts < 3) {
            attempts += 1
            val pre = lastQuiet.get
            val runs = timeQuery(SparkEntry.queries(name))
            if (runs.exists(_._2.isDefined)) {
              // errored on re-run (it passed in-map): keep the in-map
              // number and stop retrying THIS query — a nondeterministic
              // failure is not a burst and retrying can't produce better
              // evidence. The quiet check is refreshed so the NEXT
              // suspect's pre-ratio isn't stale by this re-run's duration
              // (and the remaining suspects are still rescued).
              errored = true
              requeueErrored += 1
              lastQuiet = awaitQuiet()
            } else {
              runControls(timed = true)
              val post = tailQuiet(controlPasses.last)
              if (post.isDefined) {
                val ts = runs.map(_._1); val m = med(ts)
                // symmetric divergence test: replace only when the quiet
                // number genuinely disagrees with the in-map one (either
                // direction — burst windows produce falsely-fast reads
                // too); agreement within the bar keeps the in-map median
                val replaced = m > 0 && v0 > 0 &&
                  math.max(v0 / m, m / v0) > replaceBar
                if (replaced) { finalQ(name) = m; finalRuns(name) = ts }
                // pre/post are min-anchored pass levels: each control's
                // sample over its own best warmup-dropped map-phase
                // sample, median across controls — certified quiet means
                // ≤ the run's quiet bar (median pass level × slack).
                // pre_probe/post_probe are the bracketing passes' RAW
                // probe seconds (null if the probe isn't a control), so
                // the probe half of the certification — including the
                // absolute bar — replays from the artifact alone
                def jopt(o: Option[Double]): String =
                  o.map(_.toString).getOrElse("null")
                requeued(name) =
                  s"""{"in_map":$v0,"quiet":$m,""" +
                  s""""quiet_runs":${ts.mkString("[", ",", "]")},""" +
                  s""""pre":${pre._1},"post":${post.get._1},""" +
                  s""""pre_probe":${jopt(pre._2)},""" +
                  s""""post_probe":${jopt(post.get._2)},""" +
                  s""""replaced":$replaced}"""
                lastQuiet = post
                rescued = true
              } else {
                // a burst started mid-re-run: discard it and wait again
                lastQuiet = awaitQuiet()
              }
            }
          }
          if (!rescued && !errored) requeueGaveUp += 1
        }
      }
    }

    // ---- the honest quiet test (round-16 verdict ask #1) ----
    // The headline noise_floor stopped measuring the host once the probe
    // joined the controls: the probe's own in-map-vs-closing-dip gap sets
    // the floor by construction (structurally ~2.0-2.4 at sf0.1 in a
    // window whose single-threaded controls read ~1.0). The field that
    // DOES measure the window the map's medians were measured in is the
    // map-phase-only dispersion: worst per-control max/min over the
    // interleave passes proper — the warmup pass (residual JIT) and the
    // closing pass (idle-tail cache dip) excluded, and hot passes whose
    // every bracketed query earned a CERTIFIED requeue record excluded
    // too (those queries' numbers were re-measured or re-certified in a
    // proven quiet window, so the caught burst's control samples no
    // longer describe any number the map quotes; a pass whose suspects
    // gave up or errored keeps its samples in — their in-map numbers
    // stand uncertified). `map_phase_excluded_passes` lists the excluded
    // hot passes so the exclusion itself replays from the artifact
    // (tools/audit_artifact.py recomputes the field and verifies each
    // listed pass is detector-hot with certified coverage).
    val excludedHotPasses: Seq[Int] =
      if (!requeueEnabled || requeueRunwideSkip || quietMin.isEmpty) Nil
      else (1 until math.max(0, mapPassCount - 1)).filter { p =>
        passHot(p) && {
          val bracketed = results.filter { case (_, _, _, err, pp) =>
            err.isEmpty && (pp == p || pp + 1 == p) }
          bracketed.nonEmpty &&
            bracketed.forall { case (n, _, _, _, _) => requeued.contains(n) }
        }
      }
    val mapPhaseDispersion: Option[Double] = {
      val disps = controlNames.flatMap { cn =>
        val kept = (1 until math.max(0, mapPassCount - 1))
          .filterNot(excludedHotPasses.contains)
          .flatMap(p => controlPasses(p).get(cn))
        if (kept.size >= 2 && kept.min > 0) Some(kept.max / kept.min)
        else None
      }
      if (disps.isEmpty) None else Some(disps.max)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = finalQ.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val runsJson = finalRuns.map { case (k, ts) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(m), _) =>
      jstr(k) + ":" + jstr(m.take(300))
    }.mkString("{", ",", "}")
    val total = finalQ.values.sum
    // the run's self-certified noise floor: worst max/min dispersion over
    // the interleaved control samples. ~1.0-1.5 = quiet window; >2 = a
    // contention burst hit the run and per-query diffs need isolated
    // re-measures before they mean anything (the splice protocol's bar)
    // map-phase samples only (frozen above): the floor/ratio certify the
    // window the map's medians were measured in; the requeue phase's own
    // evidence lives in the `requeued` provenance strings
    val controlsJson = controlTimes.collect {
      case (k, _) if mapControlTimes.contains(k) =>
        jstr(k) + ":" + mapControlTimes(k).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // NO usable samples (controls disabled, names not in `queries`, or
    // every control run failing) → null, NOT 1.0: an unmeasured run must
    // be distinguishable from a measured-quiet one, or a typo'd control
    // list would falsely certify the whole artifact
    val floors = mapControlTimes.values.map(dropWarmup)
      .filter(_.size >= 2).map(ts => ts.max / ts.min)
    val noiseFloor = if (floors.isEmpty) "null" else floors.max.toString
    // ambient ratio vs the stored quiet-window references: ~1.0 = this run
    // is comparable to the reference window; 1.3 = host 30% slower — divide
    // per-query diffs by this before calling anything a regression. Median
    // across controls (each control's warmup-dropped median / its stored
    // reference) so one control's own drift cannot fake an ambient shift.
    // the probe is EXCLUDED from control_ratio: its reference is an
    // r16-window measurement while the three query-control references
    // are the r11/r14 quiet windows, and growing the median's input set
    // would silently change what the emitted value means round-over-
    // round — the whole point of the field is cross-round comparability.
    // The probe's own ambient story is emitted separately as
    // `probe_ratio` (multi-core ambient vs the single-threaded
    // control_ratio — the two diverge exactly under the sustained-load
    // mode the probe exists to see).
    val ratios = mapControlTimes.toSeq
      .filter { case (cn, _) => cn != probeName }
      .flatMap { case (cn, ts) =>
        val kept = dropWarmup(ts)
        controlRefs.get(cn).filter(_ > 0).filter(_ => kept.nonEmpty)
          .map(ref => med(kept) / ref)
      }
    val controlRatio = if (ratios.isEmpty) "null" else med(ratios).toString
    // READING probe_ratio: it divides the probe's IN-MAP median by its
    // stored quiet-window (isolated) reference, and the in-map convention
    // runs the multi-core probe ~1.5-1.9x its isolated level under a full
    // map's cache pressure (the documented q220 analogue) — so ~1.5-1.9
    // IS the quiet-window baseline for this field, not evidence of
    // sustained ambient load; sustained load reads well above 2. The
    // absolute requeue bar deliberately keeps the isolated-convention
    // reference (tail certification happens in idle windows, where the
    // isolated level is the right anchor).
    val probeRatio = (for {
      ref <- controlRefs.get(probeName).filter(_ > 0)
      ts <- mapControlTimes.get(probeName)
      kept = dropWarmup(ts) if kept.nonEmpty
    } yield (med(kept) / ref).toString).getOrElse("null")
    // values are already raw JSON objects (built at decision time above)
    val requeuedJson = requeued.map { case (k, v) =>
      jstr(k) + ":" + v }.mkString("{", ",", "}")
    // the bars the records were judged against — without them pre/post,
    // pre_probe/post_probe and the replaced flags aren't interpretable
    // from the artifact alone
    val quietBarJson =
      if (requeueEnabled && quietMin.nonEmpty) quietBar.toString else "null"
    val probeQuietBarJson =
      if (requeueEnabled) probeQuietBar.map(_.toString).getOrElse("null")
      else "null"
    val probeAbsBarJson =
      if (requeueEnabled && probeQuietBar.isDefined)
        probeAbsBar.map(_.toString).getOrElse("null")
      else "null"
    // the ACTIVE control references ride in the artifact itself (r16
    // verdict ask #2): the auditor replays ratios from here and
    // cross-checks its own mirror, so a re-anchor that updates only one
    // side fails loudly instead of silently invalidating either the
    // requeue absolute bar or the replay
    val controlRefsJson = controlRefs.toSeq.sortBy(_._1).map { case (k, v) =>
      jstr(k) + ":" + v }.mkString("{", ",", "}")
    // the probe's builtin quiet refs are per-JVM-config (default heap vs
    // -Xmx64g, a measured ~15% gap) while refs_source is keyed by the
    // dataset directory's basename — emit the actual max heap so an
    // artifact reader can detect a heap/refs mismatch the basename hides
    val maxHeapBytes = Runtime.getRuntime.maxMemory
    val mapPhaseDispJson =
      mapPhaseDispersion.map(_.toString).getOrElse("null")
    val excludedPassesJson =
      excludedHotPasses.mkString("[", ",", "]")
    // sfDir is operator-controlled (env var): escape it like every other
    // string, or a quote/backslash in the path makes a multi-hour run's
    // one output line unparseable
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"errors":$errs,"failed":${results.count(_._4.isDefined)},"controls":$controlsJson,"controls_failed":$mapControlsFailed,"noise_floor":$noiseFloor,"map_phase_dispersion":$mapPhaseDispJson,"map_phase_excluded_passes":$excludedPassesJson,"control_ratio":$controlRatio,"refs_source":${jstr(refsSource)},"control_refs":$controlRefsJson,"max_heap_bytes":$maxHeapBytes,"requeued":$requeuedJson,"requeue_gave_up":$requeueGaveUp,"requeue_errored":$requeueErrored,"requeue_runwide_skip":$requeueRunwideSkip,"requeue_ratio":$requeueRatio,"requeue_quiet_bar":$quietBarJson,"requeue_probe_quiet_bar":$probeQuietBarJson,"requeue_probe_abs_bar":$probeAbsBarJson,"requeue_replace_bar":$replaceBar,"probe_ratio":$probeRatio,"sf":${jstr(sfDir)}}""")
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
