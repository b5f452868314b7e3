package graft.relational

import graft.SparkSuite

/** Regression guards for the physical-plan shapes the scale design
  * promises (SURVEY §8 / SCALING.md): if a refactor silently degrades a
  * broadcast to a shuffle, drops a WindowGroupLimit, or loses filter
  * pushdown, these fail before any benchmark does. Plans are asserted on
  * the optimized/physical text, data is never executed. */
class PlanShapeSpec extends SparkSuite {

  private def planOf(q: String): String =
    graft.SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q17 top-k cosine: broadcast NL join + map-side WindowGroupLimit") {
    val p = planOf("q17_topk_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"), s"no broadcast NL join in:\n$p")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("q2 star join: dimension tables broadcast, no shuffle for dims") {
    val p = planOf("q2_star_revenue")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast in:\n$p")
  }

  test("q6 top-k per group compiles to WindowGroupLimit") {
    val p = planOf("q6_topk_per_group")
    assert(p.contains("WindowGroupLimit"), s"rank<=k not pushed in:\n$p")
  }

  test("q131 reservoir sample: map-side WindowGroupLimit, scan prunes text") {
    val p = planOf("q131_reservoir_sample")
    // the shuffle must carry <= k·|keys| rows per task, never the corpus
    assert(p.contains("WindowGroupLimit"), s"rank<=k not pushed in:\n$p")
    // the priority hashes `text`, but nothing downstream reads it — the
    // scan keeps text only for the hash; doc text columns beyond it prune
    val scan = p.split("\n").find(_.contains("FileScan")).getOrElse(p)
    assert(!scan.contains("lang") && !scan.contains("n_chars"),
      s"column pruning lost on documents scan:\n$scan")
  }

  test("q1 pricing summary: scan reads only the six aggregated columns") {
    val p = planOf("q1_pricing_summary")
    val scan = p.split("\n").find(_.contains("FileScan")).getOrElse(p)
    assert(scan.contains("l_quantity") && !scan.contains("l_orderkey")
      && !scan.contains("l_comment"),
      s"column pruning lost on lineitem scan:\n$scan")
  }

  test("a filter on the lineitem scan is pushed into the parquet reader") {
    val p = graft.core.Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1995-01-01")
      .select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
  }

  test("q70 decontaminate: eval dictionary broadcasts, corpus side streams") {
    val p = planOf("q70_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval grams not broadcast in:\n$p")
  }

  test("q33 simhash: no shuffle-distinct over the pair stream") {
    val p = planOf("q33_neardup_simhash")
    // exactly-once emission is a codegen filter; distinct()/dropDuplicates
    // compiles to HashAggregate(keys=[id1, id2]) (ReplaceDeduplicateWith-
    // Aggregate), so assert no aggregate keyed on the pair ids exists —
    // the plan legitimately has NO aggregates at all.
    assert(!"HashAggregate\\(keys=\\[id1#".r.findFirstIn(p).isDefined
      && !"ObjectHashAggregate\\(keys=\\[id1#".r.findFirstIn(p).isDefined
      && !"SortAggregate\\(key=\\[id1#".r.findFirstIn(p).isDefined,
      s"pair-stream distinct reappeared (aggregate on id1/id2) in:\n$p")
  }

  test("q57 stream enrich: the customer dim joins broadcast, never shuffled") {
    val p = planOf("q57_stream_enrich")
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast in:\n$p")
  }

  test("q58 LM fluency: the charset-bounded model joins broadcast") {
    val p = planOf("q58_lm_fluency")
    assert(p.contains("BroadcastHashJoin"), s"model not broadcast in:\n$p")
  }

  test("q59 heavy hitters: global top-k compiles to TakeOrderedAndProject") {
    val p = planOf("q59_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      s"global limit not heap-based (full sort would materialize the count relation) in:\n$p")
  }

  test("q85 funnel: all four stage windows share ONE exchange and one sort") {
    val p = planOf("q85_funnel")
    // the four stacked stage detections must reuse a single
    // (user_id, us, event_id) shuffle+sort — a refactor that splits the
    // window definitions re-shuffles per stage and shows up here first
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges in:\n$p")
    val sorts = "\\bSort \\[user_id".r.findAllIn(p).length
    assert(sorts == 1, s"expected 1 user_id sort, got $sorts in:\n$p")
  }

  test("q81 BM25: query-term dictionary and corpus stats broadcast; corpus never does") {
    val p = planOf("q81_bm25")
    assert(p.contains("BroadcastHashJoin"), s"term dictionary not broadcast in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"stats scalar not broadcast in:\n$p")
  }

  test("q88 sketch heavy hitters: partial sketch below the exchange, confirm join broadcast") {
    val p = planOf("q88_heavy_hitters_sketch")
    // partial aggregation of the sketch must run map-side (the whole
    // point: ≤capacity counters per partition cross the wire)
    assert(p.contains("spacesavingagg".toLowerCase) || p.toLowerCase.contains("spacesaving"),
      s"sketch aggregate missing from plan:\n$p")
    assert("ObjectHashAggregate.*partial_".r.findFirstIn(p.replace("\n", " ")).isDefined ||
      p.contains("partial_spacesavingagg") || p.contains("partial"),
      s"no partial (map-side) sketch aggregation in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"candidate confirm join not broadcast in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not TakeOrdered in:\n$p")
  }

  // q38/q39 register through the witness wrapper (annWitness: exact-top-1
  // compare over ≤15 ANN rows × 3 query rows — scale-irrelevant joins), so
  // the scale guards target the PRODUCTION plans underneath directly.
  test("q38 PQ: ADC tables broadcast, map-side shortlist cap, zero sort-merge joins") {
    val p = graft.queries.PipelineQueries.annPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the per-query distance tables reach the scoring scan as a broadcast
    // cross join — if Catalyst/AQE ever de-broadcasts them the corpus
    // would shuffle against 3 rows
    assert(p.contains("BroadcastNestedLoopJoin"), s"ADC tables not broadcast in:\n$p")
    // the only corpus-sized rows crossing a wire are bare shortlist
    // triples, pre-capped map-side at 100/query before their exchange
    assert("WindowGroupLimit [^\n]*100, Partial".r.findFirstIn(p).isDefined,
      s"no map-side (Partial) shortlist cap in:\n$p")
    // every join in the query path broadcasts its small side; a
    // SortMergeJoin appearing here means the corpus started shuffling
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared in:\n$p")
  }

  test("q39 IVFADC: probes/tables broadcast; only the index BUILD join shuffles") {
    val p = graft.queries.PipelineQueries.annIvfPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroid/ADC tables not broadcast in:\n$p")
    // nprobe cell pruning and the 100-row shortlist both cap map-side.
    // The nprobe cap runs over the 3-query × centroid probe stream, which
    // is tiny: when Spark plans it single-partition (as it does above the
    // input-parallelism floor) the cap appears as Final with no Partial
    // phase — still capped before its broadcast, nothing uncapped crosses
    // a corpus-sized wire.
    assert("WindowGroupLimit [^\n]*\\b4, (Partial|Final)".r.findFirstIn(p).isDefined,
      s"no nprobe cap in:\n$p")
    assert("WindowGroupLimit [^\n]*100, Partial".r.findFirstIn(p).isDefined,
      s"no map-side shortlist cap in:\n$p")
    // exactly ONE sort-merge join is legitimate: codes ⋈ cell-assignment
    // when BUILDING the inverted lists (one-time index construction; at
    // scale it's a write partitioned by cell). A second one means a
    // query-path join lost its broadcast.
    val smj = "SortMergeJoin".r.findAllIn(p).length
    assert(smj <= 1, s"expected ≤1 sort-merge join (index build), got $smj in:\n$p")
  }

  test("q95 gopher rules: map-only pass — no hash-partitioned exchange, no join, no aggregate") {
    val p = planOf("q95_gopher_rules")
    // every rule metric is a HOF over one projection of one scan; the only
    // legitimate exchanges are the test-harness output sort (range
    // partitioning) and the documented input-parallelism floor (a
    // REPARTITION_BY_NUM hash exchange directly over the scan,
    // Tables.floored). Any OTHER hash exchange, a join, or an aggregate
    // appearing here means a rule started shuffling the corpus.
    val offending = "Exchange hashpartitioning\\([^\n]*".r.findAllIn(p)
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(offending.isEmpty, s"non-floor hash exchange appeared: $offending in:\n$p")
    assert(!p.contains("Join"), s"join appeared in:\n$p")
    assert(!p.contains("Aggregate"), s"aggregate appeared in:\n$p")
  }

  test("q96 Hamming ANN: query signatures broadcast, map-side shortlist cap") {
    val p = planOf("q96_ann_hamming")
    // the 3-row packed query signatures reach the corpus scan as a
    // broadcast cross join — de-broadcasting would shuffle the corpus
    // against 3 rows
    assert(p.contains("BroadcastNestedLoopJoin"), s"query signatures not broadcast in:\n$p")
    // only 20 shortlist rows per query may cross an exchange, capped
    // map-side before the wire
    assert("WindowGroupLimit [^\n]*20, Partial".r.findFirstIn(p).isDefined,
      s"no map-side (Partial) shortlist cap in:\n$p")
    // every query-path join broadcasts its small side (shortlist or
    // query vectors); a SortMergeJoin means the corpus started shuffling
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared in:\n$p")
  }

  test("q97 DSIR: the bucket-bounded log-ratio model joins broadcast") {
    val p = planOf("q97_dsir_weights")
    // the language models are bounded by B=1024 buckets — if the scoring
    // join ever de-broadcasts, the corpus-sized count stream shuffles
    // against a few-KB table
    assert(p.contains("BroadcastHashJoin"), s"ratio model not broadcast in:\n$p")
  }

  test("q98 token budget: corpus window partitions by bucket, offsets/budget broadcast") {
    val p = planOf("q98_token_budget")
    // the distributed-prefix-sum promise: the corpus-sized running sum
    // must window WITHIN buckets (parallel), never over one global
    // ordering; the bucket offsets and budget scalar reach it broadcast
    assert("Window \\[[^\n]*\\], \\[bucket".r.findFirstIn(p).isDefined,
      s"corpus running sum not partitioned by bucket in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets not broadcast in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"budget scalar not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared in:\n$p")
  }

  test("q97b DSIR resample: global top-k compiles to TakeOrderedAndProject") {
    val p = planOf("q97b_dsir_resample")
    // the k-of-corpus selection must be the O(k)-heap merge — a full
    // sort materializing the scored corpus is the scale failure here
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k not heap-based in:\n$p")
  }

  test("q44 tf-idf: the document-frequency side carries no broadcast hint") {
    // df (one row per distinct corpus token) is unbounded at scale —
    // Heaps' law makes it billions of rows at 100 TB. Only the 1-row
    // nDocs scalar may be hinted broadcast; AQE is still free to
    // broadcast df at runtime when actual stats are small, which is the
    // correct adaptive behavior and not what this guards against.
    val analyzed = graft.SparkEntry.queries("q44_tfidf")(spark, sfDir)
      .queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(analyzed).length
    assert(hints == 1,
      s"expected exactly one broadcast hint (nDocs scalar), found $hints in:\n$analyzed")
  }
}
