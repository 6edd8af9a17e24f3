package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (SURVEY.md §4). Correctness is the
  * oracle's job; this suite pins the PLANS — the properties that
  * decide whether a query survives a 100 TB scale-up: filters and
  * projections reaching the parquet scan, small dims broadcast,
  * aggregates split partial/final, top-k short-circuiting instead of
  * global sorts, and custom expressions staying inside whole-stage
  * codegen. A refactor that silently loses one of these still passes
  * the oracle at sf0.01 — this suite is what catches it.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  /** Build a key's plan against an EMPTY cache. The suites share one
    * SparkContext-wide CacheManager, and pins materialized by earlier
    * tests (e.g. OperatorSpec's every-key sweep) legally change
    * STATIC join picks in unhinted operators — DistributedRank's
    * internals deliberately leave small-side joins to AQE, so with
    * ambient cache stats the pre-execution plan can flip BHJ↔SMJ and
    * flake the shape gates (observed twice, round 17). Clearing first
    * makes every gate's plan a pure function of the query + parquet
    * stats; a key's OWN pins re-register during construction, so the
    * InMemoryTableScan gates (q115/q122/q143) still see them. */
  private def plan(name: String): String = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed into the parquet scan") {
    val p = plan("q02_scan_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"no pushed filters in:\n$p")
    // projection pruning: untouched wide columns must not be read
    assert(!p.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q01: scan reads only the projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("q15/q19: dimension joins are broadcast, not shuffled") {
    assert(plan("q15_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q19_join_multiway").contains("BroadcastHashJoin"))
  }

  test("q21: aggregate splits into partial + final") {
    val p = plan("q21_agg_group")
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"no map-side combine in:\n$p")
  }

  test("q41: global top-k short-circuits (no full sort)") {
    val p = plan("q41_topk")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  test("q84: brute-force cosine has no explode and broadcasts the query vector") {
    val p = plan("q84_vec_cosine_topk")
    assert(!p.contains("Generate"), "cosine top-k fans out via explode")
    assert(p.contains("Broadcast"), "query vector not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k does a full sort")
  }

  test("q192: the λ table broadcasts into the token stream; top-25 short-circuits") {
    // DSIR's whole point is the BOUNDED feature space: the scoring
    // join must be a broadcast of the 64-row λ table, never a
    // vocabulary-sized sort-merge (the q109/q111 shuffle is correct
    // THERE because the vocabulary is corpus-sized — here it must not
    // appear)
    val p = plan("q192_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), s"λ join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join appeared in the bounded-feature pipeline")
    assert(p.contains("TakeOrderedAndProject"), "top-25 does a full sort")
  }

  test("q194: each table's rules fold in ONE aggregate; FK scans read only the key") {
    val p = plan("q194_expectations_report")
    // one stack-generate per single-table pass — rule count never
    // multiplies table scans
    assert("stack\\(3,".r.findAllIn(p).length == 2,
      s"expected exactly two stack(3, ...) pivots:\n$p")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"),
      "orders FK scan reads more than the key column")
    assert(p.contains("LeftAnti"), "FK rules are not anti-joins")
  }

  test("q214: the whole correlation matrix folds in ONE scan, no joins") {
    // the anti-pattern is unpivot + self-join per pair (shuffles the
    // corpus against itself 6 times); the contract is one map-side
    // moment fold and a stack() over the 1-row frame
    val p = plan("q214_corr_matrix")
    assert("FileScan".r.findAllIn(p).length == 1,
      s"correlation matrix reads the table more than once:\n$p")
    assert(!p.contains("Join"), s"a join appeared in the one-scan fold:\n$p")
    assert(p.contains("stack("), s"rows not assembled via stack():\n$p")
  }

  test("q88: simhash64 expression stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q88_simhash")(spark, sf)
    // AQE only finalizes stages on execution; run it, then inspect the
    // final plan for the codegen span around the simhash projection.
    assert(df.collect().nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen marker in the final plan; the
    // simhash projection must carry it (a CodegenFallback would not).
    assert(p.contains("*(") , s"no codegen span in:\n$p")
    assert(p.linesIterator.exists(l => l.contains("simhash64") && l.contains("*(")),
      s"simhash64 projection outside the codegen span:\n$p")
  }

  test("q30/q34/q35: no full-table window keyed on the 3-value column alone") {
    // The scale contract of DistributedRank: a window over RAW table
    // rows partitioned by a bare low-cardinality key collapses the
    // table onto that many tasks (AQE cannot split window partitions).
    // A window is fine when its partition spec carries a second
    // high-cardinality key (bucket id), its input is already
    // aggregated to value granularity, or WindowGroupLimit pre-trims
    // each map task's input to the local top-k.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow, WindowGroupLimit}
    def offending(name: String): Seq[String] = {
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      lp.collect { case w: LWindow
          if w.partitionSpec.size < 2 &&
            w.child.collectFirst { case a: Aggregate => a }.isEmpty &&
            w.child.collectFirst { case g: WindowGroupLimit => g }.isEmpty =>
        w.windowExpressions.map(_.sql).mkString(", ")
      }
    }
    // q220/q221 carry the round-17 cumulative-CDF windows: legal only
    // because each runs over the (key, value)-grain AGGREGATE (q220)
    // or DistributedRank's bucket-keyed prefix machinery (q221) —
    // never raw rows on a bare key. Keep them in the sweep so a
    // refactor that drops the aggregate gets caught here.
    for (q <- Seq("q30_win_rank", "q34_win_frame_range",
        "q35_win_first_last", "q220_weighted_median", "q221_ks_drift"))
      assert(offending(q).isEmpty,
        s"$q windows raw table rows on a bare low-cardinality key: ${offending(q)}")
    // q30's table-scale shuffle must be keyed on (key, tie value) —
    // the join back of the per-value ranks doubles as the clustering
    // for the tie-group row_number window.
    val p30 = plan("q30_win_rank")
    assert(p30.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("__tie")),
      s"q30 table shuffle not keyed on (key, tie value):\n$p30")
    // q35 keeps the map-side pre-trim and broadcasts the edges back
    val p35 = plan("q35_win_first_last")
    assert(p35.contains("WindowGroupLimit"),
      s"q35 edge ranks lost the map-side top-k pre-trim:\n$p35")
    assert(p35.contains("BroadcastHashJoin"),
      s"q35 edges not broadcast back:\n$p35")
  }

  test("q29: exact percentiles carry no whole-multiset aggregation buffer") {
    // The builtin percentile()/median() buffers each group's ENTIRE
    // value multiset in one aggregation buffer — with a 3-value group
    // key that is the whole column in 3 tasks at any cluster size.
    // q29 must route through DistributedRank.quantiles instead: no
    // percentile aggregate anywhere in the plan, and the heavy
    // aggregate keyed on (group, value), not the group alone.
    val p = plan("q29_percentiles")
    assert(!p.toLowerCase.contains("percentile"),
      s"q29 still plans the whole-multiset percentile aggregate:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("l_extendedprice")),
      s"q29's value-count aggregate not keyed on (group, value):\n$p")
  }

  test("q145: day predicate prunes the lake scan to exactly one partition") {
    // The reference's day-glob (README.md:182) as a planner decision:
    // the ingest_date filter must land in the scan's PartitionFilters
    // and select ONE of the 30 day-directories — never a full-lake
    // scan filtered after the fact.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("q145_partition_prune")(spark, sf).queryExecution
    // sparkPlan, not executedPlan: the AQE wrapper hides its inner
    // plan from collect() until execution
    val scans = qe.sparkPlan.collect {
      case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    assert(scans.nonEmpty, s"no partition-filtered scan in:\n${qe.sparkPlan}")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"day filter selected ${scans.head.selectedPartitions.partitionCount} partitions, want 1")
  }

  test("skew: AQE splits a manufactured hot key; salted SkewJoin stays join-equivalent") {
    // Evidence for the two skew paths the library documents. (1) When
    // AQE's skew rule CAN fire (sort-merge join, runtime stats), it
    // splits the hot partition — the executed plan must carry the
    // skew=true marker. (2) SkewJoin.inner is the path for plans AQE
    // cannot help (hash-join stream side, AQE off); under the same hot
    // key it must still equal the plain join. Thresholds are lowered
    // because local[4] shuffles megabytes, not the 256 MB default.
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // An ISOLATED child session (own SQLConf, shared SparkContext):
    // these conf overrides must never be visible to a plan built
    // elsewhere — even with serial suites this test mutates nothing
    // another test could observe.
    val s = spark.newSession()
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    locally {
      import s.implicits._
      // one key holds ~90% of the fact side
      val fact = s.range(0, 220000).select(
        when(col("id") < 200000, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val dim = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      val plainAgg = joined.agg(count(lit(1)), sum("v"), sum("w")).head()
      // AQE finalizes THIS QueryExecution's plan only on ITS execution
      // (the agg above and a sink write both plan separately)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE skew rule did not split the hot partition:\n$p")
      // the salted operator's result is the plain join's result
      val saltedAgg = graft.operators.SkewJoin.inner(fact, dim, Seq("k"), salts = 8)
        .agg(count(lit(1)), sum("v"), sum("w")).head()
      assert(saltedAgg == plainAgg, s"salted $saltedAgg vs plain $plainAgg")
      // and the salted plan JOINS on (k, salt) — its exchanges (added
      // by EnsureRequirements, not visible in sparkPlan) inherit those
      // keys, so the hot key spreads over `salts` tasks
      val sp = graft.operators.SkewJoin.inner(fact, dim, Seq("k"), salts = 8)
        .queryExecution.sparkPlan.toString
      assert(sp.linesIterator.exists(l =>
          l.contains("Join") && l.contains("__salt")),
        s"salted join not keyed on (k, __salt):\n$sp")
    }
  }

  test("q01/q30: full-table dumps emit through a range sort, not one partition") {
    // O(input)-sized outputs must not funnel through a single writer
    // task (Det.emitWide = range-partitioned orderBy); the
    // single-partition Det.emit is reserved for small results.
    for (q <- Seq("q01_scan_project", "q30_win_rank", "q50_str_funcs",
        "q92_quality_score")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q dumps its full output through one partition:\n$p")
      assert(p.contains("rangepartitioning"),
        s"$q final sort is not range-partitioned:\n$p")
    }
  }

  test("no query plans a cartesian product or an interpreted UDF scan") {
    // Sweep every declared key: a CartesianProduct is always a missed
    // join key or a missed broadcast (the intentional 1-row cross
    // joins plan as BroadcastNestedLoopJoin, which is fine); an
    // (Arrow)EvalPython node would mean a non-codegen UDF crept into a
    // hot path.
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
      assert(!p.contains("EvalPython"), s"$name plans a Python UDF")
    }
  }

  test("q187/q188: source cap pre-trims map-side; PQ broadcasts codebook and short-circuits both top-Ks") {
    // q187: the rank<=5 filter must plan as Partial + Final
    // WindowGroupLimit — each map task pre-trims to its local top-5
    // per source BEFORE the source exchange, so a hot domain ships
    // 5·partitions rows, not its full population.
    val p187 = plan("q187_source_cap")
    assert(p187.contains("WindowGroupLimit") &&
      p187.linesIterator.exists(l => l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"q187 lost the map-side WindowGroupLimit pre-trim:\n$p187")
    // q188: the kc-row codebook and the kc×m query table broadcast
    // (never shuffle the corpus against them), and BOTH bounded
    // orders — the ADC shortlist and the final re-rank — plan as
    // TakeOrderedAndProject, never a global sort.
    val p188 = plan("q188_pq_topk")
    assert(p188.contains("BroadcastExchange"),
      s"q188 codebook/query table must broadcast:\n$p188")
    assert(p188.linesIterator.count(_.contains("TakeOrderedAndProject")) >= 2,
      s"q188 shortlist + re-rank must both short-circuit:\n$p188")
  }

  test("q105-q108: curation-operator scale shapes") {
    // q105: both windows (lag + running sum) key on user_id with the
    // same ordering — ONE hash exchange total, reused by both.
    val p105 = plan("q105_sessionize")
    assert(p105.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"q105 should shuffle exactly once on user_id:\n$p105")
    // q106: deterministic hash sampling is pure map-side — no hash
    // exchange anywhere, just the scan, the filter and the emit sort.
    val p106 = plan("q106_hash_sample")
    assert(!p106.contains("Exchange hashpartitioning"),
      s"q106 sampling must not shuffle:\n$p106")
    // q107: the benchmark trigram set broadcasts into the probe join;
    // the candidate corpus is never sort-merge-joined against it.
    val p107 = plan("q107_contamination")
    assert(p107.contains("BroadcastHashJoin"),
      s"q107 benchmark set not broadcast:\n$p107")
    // q108: the chunk-hash aggregation combines map-side before its
    // high-cardinality shuffle.
    val p108 = plan("q108_chunk_dedup")
    assert(p108.contains("partial"), s"q108 has no map-side combine:\n$p108")
    // No generator-derived filter may clone the shingle pipeline into
    // a scan predicate (InferFiltersFromGenerate is excluded in every
    // session builder — it double-evaluates expensive computed
    // generator inputs for zero pruning benefit; measured 5x on q107).
    for (q <- Seq("q107_contamination", "q86_minhash_sig")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val bad = lp.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("transform(sequence") => f
      }
      assert(bad.isEmpty,
        s"$q: a filter re-evaluates the shingle/minhash transform:\n${bad.mkString}")
    }
  }

  test("q111/q115/q119-q122: mining-key scale shapes") {
    // q111: exactly ONE broadcast hint — the 1-row N. The vocabulary
    // df table must join on the word key as a shuffle (a corpus-sized
    // vocabulary broadcast OOMs at 100 TB; ADVICE r4 regression gate).
    val lp111 = SparkEntry.queries("q111_tfidf")(spark, sf)
      .queryExecution.analyzed
    val hints111 = lp111.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints111.size == 1,
      s"q111 must hint-broadcast only the 1-row N, found ${hints111.size} hints")
    // q115: the iterated edge set is pinned (InMemoryRelation), not
    // recomputed from the orders⋈lineitem join every iteration.
    assert(plan("q115_pagerank").contains("InMemoryTableScan")
        || plan("q115_pagerank").contains("Scan ExistingRDD"),
      "q115 edges are recomputed instead of persisted/checkpointed")
    // q119: per-stratum ranking goes through the SALTED two-phase
    // top-k, not a bare per-lang window over the whole table.
    assert(plan("q119_stratified_sample").contains("__salt"),
      "q119 lost the salted two-phase rank")
    // q120: two-level aggregate (map-side combine), and the grand
    // total reaches the filter as a broadcast, never a sort-merge join.
    val p120 = plan("q120_heavy_hitters")
    assert(p120.contains("partial"), s"q120 has no map-side combine:\n$p120")
    assert(!p120.contains("SortMergeJoin"),
      s"q120 shuffles for the 1-row total:\n$p120")
    // q121: global top-20 short-circuits per partition.
    assert(plan("q121_bpe_pairs").contains("TakeOrderedAndProject"),
      "q121 does a full sort for the global top-k")
    // q122: the signature table feeding three differently-keyed joins
    // is pinned, not computed three times.
    assert(plan("q122_minhash_est").contains("InMemoryTableScan"),
      "q122 signature table is not persisted")
  }

  test("q127-q132: round-5 mining/series-key scale shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, ResolvedHint}
    def hints(name: String): Int =
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed
        .collect { case h: ResolvedHint => h }.size
    // q127: the gram-count table joins back on the gram key as a
    // SHUFFLE — the corpus's 8-gram set is corpus-sized, so no hint
    // may broadcast it (the q109/q111 vocabulary contract).
    assert(hints("q127_repeated_ngrams") == 0,
      "q127 must not hint-broadcast the gram-count table")
    // q128: exactly the two 1-row grand totals broadcast; both
    // unigram joins stay word-keyed shuffles.
    assert(hints("q128_pmi_collocations") == 2,
      "q128 must hint-broadcast only the two 1-row totals")
    // q130: two-pass contract — posting lists (collect_list) only
    // materialize ABOVE the df-filter join, so a stopword's
    // corpus-sized posting list never exists.
    val lp130 = SparkEntry.queries("q130_inverted_index")(spark, sf)
      .queryExecution.optimizedPlan
    val collectAggs = lp130.collect {
      case a: Aggregate
          if a.aggregateExpressions.mkString.contains("collect_list") => a
    }
    assert(collectAggs.nonEmpty, "q130 lost its posting-list aggregate")
    assert(collectAggs.forall(a => a.collect { case j: Join => j }.nonEmpty),
      "q130 collects posting lists BELOW the df-filter join (unbounded lists)")
    // q131: 5-row segment stats broadcast back; global top-20
    // short-circuits per partition.
    assert(hints("q131_outlier_zscore") == 1,
      "q131 must hint-broadcast the per-segment stats")
    assert(plan("q131_outlier_zscore").contains("TakeOrderedAndProject"),
      "q131 does a full sort for the top-20")
    // q132: the |types|-row per-source totals broadcast back.
    assert(hints("q132_markov_transitions") == 1,
      "q132 must hint-broadcast the per-source totals")
    // q129: the hour spine explodes from the 5-row min/max aggregate
    // (calendar-sized), not from the events table.
    val lp129 = SparkEntry.queries("q129_gapfill_ffill")(spark, sf)
      .queryExecution.optimizedPlan
    val gen129 = lp129.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen129.nonEmpty && gen129.forall(g =>
      g.collect { case a: Aggregate => a }.nonEmpty),
      "q129 spine must explode from the min/max aggregate")
  }

  test("q133/q142-q144: round-5c pins and broadcasts") {
    // q133: the global row number goes through prefixSum's bucket
    // machinery — the table-sized window must be PARTITIONED by the
    // quantile bucket (an unpartitioned spec ordering the raw key
    // would pin the whole sort on one task; the only unpartitioned
    // window allowed is the one over the numRanges-row offsets frame)
    val p133 = plan("q133_decile_stats")
    assert(p133.contains("windowspecdefinition(__b#"),
      s"q133 lost the bucket-partitioned prefix window:\n$p133")
    assert(!p133.contains("windowspecdefinition(__ord#"),
      s"q133 runs an unpartitioned window over the table:\n$p133")
    // q142/q143: the multiply-consumed intermediate tables are pinned
    assert(plan("q142_source_reputation").contains("Scan parquet")
      && plan("q143_minhash_calibration").contains("InMemoryTableScan"),
      "q143 lost its signature/shingle-table persists")
    // q144: per-type totals and the 1-row session count broadcast;
    // the only data-sized exchange is the session window's user shuffle
    val hints144 = SparkEntry.queries("q144_session_cooccurrence")(spark, sf)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hints144.size == 3,
      s"q144 must broadcast exactly tc x2 + ns, found ${hints144.size}")
    // q147: the per-node top-5 edge filter pre-trims map-side — a
    // plain window would funnel each node's whole partner list through
    // its task before filtering
    assert(plan("q147_knn_triangles").contains("WindowGroupLimit"),
      "q147 kNN edge selection lost the map-side top-k pre-trim")
  }

  test("q153: interval join plans as an equi join, not a nested loop") {
    // the whole point of the bucket rewrite: the pure non-equi band
    // predicate must ride as a residual on a bucket-keyed hash/merge
    // join — a BroadcastNestedLoopJoin would be the naive plan the
    // operator exists to avoid (fatal when neither side broadcasts)
    val p = plan("q153_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Cartesian"),
      s"q153 fell back to a nested-loop/cartesian join:\n$p")
    assert(p.contains("Join") && p.contains("__b"),
      s"q153 lost the bucket equi key:\n$p")
  }

  test("q155-q158: round-7 key scale shapes") {
    // q155/q156: the JSON expressions are native and codegen'd — the
    // whole extract/shred pipeline is one map-side pass before the
    // emit (no join, no aggregate); the shred's fan-out is Spark's own
    // Generate, not a UDF
    val p155 = plan("q155_json_query")
    assert(!p155.contains("Join") && !p155.contains("HashAggregate"),
      s"q155 should be pure map-side:\n$p155")
    assert(p155.contains("json_query"),
      "q155 lost the native expression")
    val p156 = plan("q156_openjson_shred")
    assert(p156.contains("Generate"),
      "q156 must fan out through Spark's Generate (posexplode)")
    assert(!p156.contains("Join"), s"q156 should not join:\n$p156")
    // q164 (round 10): the six chained json_modify edits are native
    // codegen'd expressions in ONE map-side pass — same contract as
    // the read-side family
    val p164 = plan("q164_json_modify")
    assert(!p164.contains("Join") && !p164.contains("HashAggregate"),
      s"q164 should be pure map-side:\n$p164")
    assert(p164.contains("json_modify"),
      "q164 lost the native expression")
    // q167 (round 10): the WITH-clause typed projection is a
    // composition of the family's expressions — still one map-side
    // pass, no generator
    val p167 = plan("q167_openjson_with")
    assert(!p167.contains("Join") && !p167.contains("HashAggregate") &&
      !p167.contains("Generate"), s"q167 should be pure map-side:\n$p167")
    // q168 (round 10): overlap chunking fans out through Spark's own
    // Generate with a closed-form chunk count — no shuffle before the
    // deterministic emit, no join, no UDF
    val p168 = plan("q168_chunk_overlap")
    assert(p168.contains("Generate"),
      "q168 must fan out through Spark's Generate (posexplode)")
    assert(!p168.contains("Join") && !p168.contains("HashAggregate"),
      s"q168 should not join or aggregate:\n$p168")
    // q157: the only exchanges are the (day,bin)/(month,bin) aggregate
    // shuffles and the bins-sized window — the partial aggregate must
    // combine map-side before any exchange
    val p157 = plan("q157_histogram_quantiles")
    assert(p157.contains("partial_count") || p157.contains("partial"),
      s"q157 lost map-side partial aggregation:\n$p157")
    assert(!p157.contains("SortMergeJoin") && !p157.contains("Join"),
      s"q157 should be join-free:\n$p157")
    // q158: exactly one data shuffle (the stream repartition); the
    // walk itself adds no exchange
    val p158 = plan("q158_sequence_packing")
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(p158).size
    assert(exchanges <= 2, // stream repartition + the emitWide sort
      s"q158 shuffles more than stream+emit:\n$p158")
  }

  test("q159/q160: round-9 key scale shapes") {
    // q159: the #langs-row cut table broadcasts back onto the corpus;
    // the keep decision is a map-side integer compare — the corpus is
    // never shuffled (the only exchanges serve the bounded lang
    // aggregate and the emit)
    val p159 = plan("q159_mixture_sample")
    assert(p159.contains("BroadcastHashJoin"),
      s"q159 cut table must broadcast, not shuffle the corpus:\n$p159")
    assert(!p159.contains("SortMergeJoin"),
      s"q159 shuffled the corpus for a bounded-side join:\n$p159")
    // q160: heavy state is the (lang, n_chars) count frame — partial
    // aggregation must combine map-side; the threshold table joins
    // back as a broadcast; the cumulative window runs over the counts
    // frame, never over raw rows
    val p160 = plan("q160_winsorized_stats")
    assert(p160.contains("partial_count") || p160.contains("partial"),
      s"q160 lost map-side partials:\n$p160")
    assert(p160.contains("BroadcastHashJoin") &&
      !p160.contains("SortMergeJoin"),
      s"q160 thresholds must broadcast back:\n$p160")
    // q162: the per-query top-N must short-circuit through
    // WindowGroupLimit (partial map-side rank limit before the
    // shuffle — bounded state at any corpus size); everything after
    // runs on #queries × topN rows
    val p162 = plan("q162_mmr_rerank")
    assert(p162.contains("WindowGroupLimit"),
      s"q162 lost the rank-limit pushdown:\n$p162")
  }

  test("q206-q208: round-16 key scale shapes") {
    // q206: both quantile results are #types-row frames that must
    // broadcast back onto the events scan — a SortMergeJoin here
    // would shuffle the corpus twice for two tiny tables. Assert on
    // the physical TREE, not the plan string: the string renders each
    // pinned frame's CAPTURED plan under its InMemoryRelation, and
    // that embedded text can legitimately show an SMJ that AQE
    // converts at runtime (DistributedRank leaves small-side joins
    // unhinted by contract) — a text match there flaked this gate
    // twice in suite context while every LIVE join was broadcast.
    // Tree collect stops at the InMemoryTableScan leaf.
    spark.catalog.clearCache()
    val qe206 = SparkEntry.queries("q206_mad_outliers")(spark, sf)
      .queryExecution
    val live206 = qe206.sparkPlan
    assert(live206.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.nonEmpty, s"q206 med/mad must broadcast back:\n$live206")
    assert(live206.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.isEmpty, s"q206 shuffled the corpus against a bounded frame:\n$live206")
    // q207: two stacked hash aggregates and a rollup — no join
    // anywhere, and the (doc, word) count must combine map-side
    val p207 = plan("q207_entropy_quality")
    assert(!p207.contains("Join"),
      s"q207 should be join-free:\n$p207")
    assert(p207.contains("partial"),
      s"q207 lost map-side partials:\n$p207")
    // q208: the 20-row checkpoint spine fans out as a broadcast
    // nested-loop (non-equi ≤), never a corpus shuffle; the corpus is
    // scanned, not self-joined
    val p208 = plan("q208_heaps_law")
    assert(p208.contains("BroadcastNestedLoopJoin"),
      s"q208 checkpoint fanout must broadcast:\n$p208")
    assert(!p208.contains("SortMergeJoin"),
      s"q208 shuffled the corpus against the 20-row spine:\n$p208")
  }

  test("q169/q170/q172: round-11 key scale shapes") {
    // q169: the emitted plan reads the SEGMENTED postings store — a
    // multi-path scan + grain-keyed sums with map-side partials; the
    // index read path has no join at all (merge-on-read is an
    // aggregate, not a reconciliation join)
    val p169 = plan("q169_incremental_index")
    assert(p169.contains("partial"),
      s"q169 postings merge-on-read lost map-side partials:\n$p169")
    assert(!p169.contains("SortMergeJoin") && !p169.contains("BroadcastHashJoin"),
      s"q169 read path should be join-free:\n$p169")
    // q170: the distinct derives from the (g, v)-grain view store as
    // ONE bounded aggregate — no join, no second store pass
    val p170 = plan("q170_distinct_view")
    assert(!p170.contains("Join"),
      s"q170 distinct read should be join-free:\n$p170")
    // q172: the epoch rank must not window raw table rows on the bare
    // 16-value shard key (one task per shard at any cluster size) —
    // the q30 contract applied to the shuffle pass
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow, WindowGroupLimit}
    val lp172 = SparkEntry.queries("q172_epoch_shuffle")(spark, sf)
      .queryExecution.optimizedPlan
    val offending = lp172.collect { case w: LWindow
        if w.partitionSpec.size < 2 &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty &&
          w.child.collectFirst { case g: WindowGroupLimit => g }.isEmpty =>
      w.windowExpressions.map(_.sql).mkString(", ")
    }
    assert(offending.isEmpty,
      s"q172 windows raw rows on the bare shard key: $offending")
  }

  test("q174-q178: round-12 key scale shapes") {
    // q174: both retrievers short-circuit their top-20 through
    // TakeOrderedAndProject; the only windows run over the 20-row
    // frames; nothing goes cartesian (the stats/query-vector
    // crossJoins are 1-row broadcasts)
    val p174 = plan("q174_rrf_fusion")
    assert(p174.contains("TakeOrderedAndProject"),
      s"q174 retriever top-k does a full sort:\n$p174")
    assert(!p174.contains("CartesianProduct"),
      s"q174 went cartesian:\n$p174")
    // q175: the pair join is label-KEYED (equi join — no nested-loop
    // fallback) and the centroid/norm frames broadcast back
    val p175 = plan("q175_semantic_dedup")
    assert(!p175.contains("BroadcastNestedLoopJoin") &&
      !p175.contains("CartesianProduct"),
      s"q175 pair join lost the cluster equi-key:\n$p175")
    assert(p175.contains("BroadcastHashJoin"),
      s"q175 centroid frame must broadcast:\n$p175")
    // q176: q159's shape — the cut table broadcasts onto the corpus,
    // the keep decision is map-side
    val p176 = plan("q176_temperature_mix")
    assert(p176.contains("BroadcastHashJoin") && !p176.contains("SortMergeJoin"),
      s"q176 cut table must broadcast, not shuffle the corpus:\n$p176")
    // q177: both the 1024-cell sketch build and the probe counts
    // combine map-side; the sketch joins back as a broadcast
    val p177 = plan("q177_cms_freq")
    assert(p177.contains("partial"),
      s"q177 sketch build lost map-side partials:\n$p177")
    assert(p177.contains("BroadcastHashJoin"),
      s"q177 sketch must broadcast onto the probes:\n$p177")
    // q178: candidates come from the (seed, sig) band equi-join —
    // never a nested loop across corpora
    val p178 = plan("q178_cross_corpus_dedup")
    assert(!p178.contains("BroadcastNestedLoopJoin") &&
      !p178.contains("CartesianProduct"),
      s"q178 cross-corpus join lost the band equi-key:\n$p178")
    // q181: the metadata predicate reaches the documents parquet scan
    // (pre-filter strategy) and the filtered top-k short-circuits
    val p181 = plan("q181_filtered_ann")
    assert(p181.contains("PushedFilters") && p181.contains("n_chars"),
      s"q181 metadata filter not pushed to the scan:\n$p181")
    assert(p181.contains("TakeOrderedAndProject"),
      s"q181 filtered top-k does a full sort:\n$p181")
  }

  test("q60: envelope pipeline is map-side until the group-by") {
    val p = plan("q60_cdc_envelope_roundtrip")
    // exactly the aggregation exchange + the spread/emit exchanges —
    // no extra shuffle introduced by the JSON round-trip itself
    assert(!p.contains("SortMergeJoin"),
      "customer dim failed to broadcast; fact table is being shuffled for the join\n" + p)
  }
}
