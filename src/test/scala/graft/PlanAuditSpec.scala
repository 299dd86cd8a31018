package graft

/** Scale-honesty audits over the physical plans of the declared queries:
  * filters must reach the parquet scan, scans must prune to referenced
  * columns, dimension joins must broadcast, and no bucketed operator may
  * degenerate into an all-pairs join. These are the properties that decide
  * whether a plan survives a 100× scale-up, independent of row counts.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q08 filters are pushed down to the parquet scan") {
    val p = plan("q08_filter_isin")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), s"expected IsNotNull pushed:\n$p")
    assert(p.contains("In(event_type"), s"expected In filter pushed:\n$p")
  }

  test("q01 projection prunes the scan schema") {
    val p = plan("q01_read_project")
    // documents has 5 columns; text (the wide one) must not be read
    assert(p.contains("ReadSchema"), p)
    assert(!p.split("ReadSchema")(1).takeWhile(_ != '\n').contains("text"),
      s"text column not pruned from scan:\n$p")
  }

  test("q26 date filter reaches the lineitem scan") {
    val p = plan("q26_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
  }

  test("dimension joins broadcast (q04, q07, q27)") {
    Seq("q04_left_join", "q07_elite_fill", "q27_top_revenue").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q dim join not broadcast:\n$p")
    }
  }

  test("q26/q11 aggregations are partial (map-side) before the exchange") {
    Seq("q26_pricing_summary", "q11_group_count").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q no hash aggregate:\n$p")
      val firstAgg = p.indexOf("HashAggregate")
      assert(p.indexOf("HashAggregate", firstAgg + 1) > 0,
        s"$q aggregation not split partial/final:\n$p")
    }
  }

  test("q52/q53 report scans never read the text column") {
    Seq("q52_rollup_report", "q53_pivot_matrix").foreach { q =>
      val p = plan(q)
      assert(p.contains("ReadSchema"), p)
      assert(!p.split("ReadSchema")(1).takeWhile(_ != '\n').contains("text"),
        s"$q reads text for a metadata report:\n$p")
    }
  }

  test("q59 chunking plans zero exchanges (runs at the scan)") {
    val p = plan("q59_chunking")
    assert(!p.contains("Exchange"), s"chunking shuffled:\n$p")
  }

  test("q54/q60 histogram selections aggregate partially before exchanging") {
    Seq("q54_top_quality", "q60_token_budget").foreach { q =>
      val p = plan(q)
      val firstAgg = p.indexOf("HashAggregate")
      assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
        s"$q histogram aggregation not split partial/final:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q thresholds not broadcast back:\n$p")
    }
  }

  test("no declared query plans an all-pairs join (except brute-force ANN)") {
    val exempt = Set(
      "q20_ann_topk",      // exact baseline: broadcast NL join by design
      "q30_ann_topk_agg",  // same brute-force baseline, aggregator variant
      "q42_quantized_topk", // coarse phase is the same brute-force scan,
                            // just over int8 vectors; rescore join is hashed
      "q10_wordcount_hist", // single-row min/max broadcast cross join
      "q79_knn_label",     // neighbor stage IS bruteForceTopK (q20's plan);
                           // KnnLabelSpec pins the corpus-never-shuffled shape
      "q90_triangle_census", // the census row is three SINGLE-ROW scalar
                            // aggregates cross-joined; the wedge/triangle
                            // joins themselves are hash joins on src
      "q104_bm25",          // BNLJ nodes are the broadcast SINGLE-ROW
                            // corpus-stats attaches (N/avgdl); the postings
                            // probe itself is a broadcast hash join —
                            // SearchSpec bounds the BNLJ count at 2
      "q105_hybrid_rrf",    // dense half IS q20's exempt brute-force
                            // baseline (the lexical half probes the staged
                            // impact index — no stats attach in-plan)
      "q106_semantic_screen", // the exact decontamination screen IS the
                            // deliberate refs-broadcast nested loop (q20's
                            // shape); SemanticScreenSpec pins exactly one
                            // BNLJ with the refs as build side
      "q112_pmi_collocations", // single-row corpus-total broadcast
                            // crossJoin (the q10 histogram precedent)
      "q117_hard_negatives", // the mining stage IS q20's brute-force
                            // baseline with the label inequality folded
                            // into the broadcast NL predicate — anchors
                            // broadcast, corpus scanned once
      "q134_token_drift",   // BNLJ nodes are the two broadcast SINGLE-ROW
                            // per-side token totals crossJoined onto the
                            // 200-row vocab frame (the q104/q112 stats-
                            // attach precedent); the merge itself is a
                            // hash full-outer on the vocab-bounded frames
      "q135_idf_delta",     // same: each side's idf frame attaches its
                            // broadcast single-row (n_docs, avgdl) stats
                            // via the q104 crossJoin; the version merge is
                            // a hash full-outer on vocab-bounded frames
      "q139_dsir",          // the BNLJ is the broadcast SINGLE-ROW
                            // (r_tot, t_tot) totals crossJoined onto the
                            // ≤1024-row bucket delta table (the q112
                            // stats-attach precedent); the scoring join
                            // itself is a broadcast hash join on bucket
      "q173_lsh_plan",      // single-row broadcast min-cost attach onto
                            // the ≤ d(H)-row divisor frame (the q112
                            // stats-attach precedent); the whole frame is
                            // divisors × grid, corpus-independent
      "q178_class_tfidf",   // single-row broadcast (tot, nc) attach onto
                            // the vocab frame (the q104/q112 precedent);
                            // scoring join is a hash join on token, top-k
                            // rides the map-side-capped aggregator
      "q185_skew_report",   // two single-row broadcast attaches (median,
                            // total — the q112 precedent) onto the ≤ topK
                            // heavy-key frame from the capped aggregator
      "q222_bucketed_batching", // single-row broadcast id-span attach (the
                            // q197/q215 precedent); ranks come from the
                            // broadcast offsets hash join + cell-local
                            // windows, never a corpus sort
      "q214_vocab_growth",  // single-row broadcast id-span attach onto the
                            // vocabulary-bounded firsts frame (q112
                            // precedent); buckets/cumulative run over the
                            // ≤10-row checkpoint frame
      "q215_churn_labels",  // single-row broadcast day-span attach (the
                            // q197 "now" precedent); the label aggregate
                            // is one map-side-combined groupBy
      "q197_decay_score",   // single-row broadcast "now" (corpus max ts)
                            // attach (the q112 stats-attach precedent);
                            // the scoring itself is one map-side-combined
                            // groupBy on the key
      "q227_sample_index",  // single-row broadcast id-span attach (the
                            // q222 precedent); offsets come from the
                            // broadcast bucket-offsets hash join + bucket-
                            // local running sums, never a corpus window
      "q236_incremental_scd2", // single-row broadcast day-span attach
                            // (the q215 precedent) to place the history/
                            // increment cut; the apply itself is keyed
                            // semi/anti hash joins + per-key windows
      "q238_cooccurrence",  // single-row broadcast basket-total attach
                            // (the q112 stats-attach precedent); pair
                            // generation is the per-basket equi self-join
                            // under the cap, item counts hash-join back
      "q257_rfm",           // single-row broadcast corpus-max-day
                            // attach (the q197 "now" precedent); the
                            // quintile joins are hash joins on banded
                            // value frames
      "q258_ks_distance",   // the groups x distinct-values grid IS the
                            // declared crossJoin of two vocabulary-sized
                            // frames (distribution comparison needs the
                            // union grid); nothing corpus-sized crosses
      "q264_json_keys",     // single-row broadcast row-total attach
                            // (the q112 stats-attach precedent) onto the
                            // key-bounded count frame
      "q266_stickiness",    // single-row broadcast span-max attach (the
                            // q197 precedent) bounding the window days
      "q277_stickiness_monitor_stream", // same span attach via the
                            // shared stickinessFromActivity read half
      "q272_retrieval_agreement", // the dense list IS q20's exempt
                            // brute-force baseline (the q105 argument);
                            // the overlap itself is a hash join on
                            // (query, doc)
      "q273_ks_monitor_stream", // inherits q258's declared groups x
                            // distinct-values comparison grid
      "q180_margin_pairs"   // both mining directions ARE q20's exempt
                            // brute-force baseline (queries broadcast,
                            // corpus scanned once); the margin attach
                            // itself is a broadcast hash join
    )
    val heavy = Set("q13_tf_topterms", "q14_svm_predict", "q15_stream_agg")
    SparkEntry.queries.keys
      .filterNot(exempt).filterNot(heavy)
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q has CartesianProduct")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$q has BroadcastNestedLoopJoin")
      }
  }
}
