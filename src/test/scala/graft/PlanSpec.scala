package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** 100 TB plan-shape audits (SURVEY.md §7.7): filters reach the scan,
  * projections prune columns, small joins broadcast, bucketed SMB joins
  * elide shuffles, and no operator collects to the driver. */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    executedPlan(df).toString

  test("fanOut contract: identity at scale, round-robin exchange below parallelism") {
    import org.apache.spark.sql.functions.col
    // at-scale branch: a frame already planning >= half the session's
    // defaultParallelism must pass through UNTOUCHED (same reference —
    // a production scan plans thousands of splits and must gain no
    // exchange; the r21 verdict asked for this pin)
    val par = spark.sparkContext.defaultParallelism
    val wide = spark.range(0L, 1000L, 1L, par).toDF("doc_id")
    assert(graft.queries.fanOut(wide) eq wide,
      "fanOut must be an identity when the input already parallelizes")
    // below-parallelism branch: the single-split fixture scan gains one
    // keyless (round-robin) repartition to the session parallelism
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    assert(docs.queryExecution.toRdd.getNumPartitions * 2 < par,
      "fixture precondition: single-split scan")
    val fanned = graft.queries.fanOut(docs)
    assert(planString(fanned.select(col("doc_id")))
      .contains(s"RoundRobinPartitioning($par)"),
      "fanOut below parallelism must round-robin to defaultParallelism")
  }

  test("q1: filter is pushed into the parquet scan") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    val s = df.queryExecution.sparkPlan.toString
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$s")
  }

  test("q1: scan reads only the needed columns (pruning)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    val s = df.queryExecution.sparkPlan.toString
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan not pruned: $readSchema")
  }

  test("q1: aggregation is two-phase (partial + final HashAggregate)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    val s = planString(df)
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    val df = SparkEntry.queries("join_broadcast")(spark, sfDir)
    df.collect() // let AQE finalize
    assert(planString(df).contains("BroadcastHashJoin"))
  }

  test("join_multiway broadcasts the dimension tables under AQE") {
    val df = SparkEntry.queries("join_multiway")(spark, sfDir)
    df.collect()
    assert(planString(df).contains("BroadcastHashJoin"))
  }

  test("sort_topk plans TakeOrderedAndProject (no global sort)") {
    val df = SparkEntry.queries("sort_topk")(spark, sfDir)
    assert(planString(df).contains("TakeOrderedAndProject"))
  }

  test("q1 stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    // codegen'd stages print as "*(n) Operator" in the executed plan
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(planString(df)).nonEmpty,
      planString(df))
  }

  test("bucketed SMB join elides the shuffle exchange") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS or_bucketed")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/li_bucketed"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/or_bucketed"))
    val li = Tables.t(spark, sfDir, "lineitem")
    val or = Tables.t(spark, sfDir, "orders")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    or.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("or_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bucketed")
      .join(spark.table("or_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    val s = joined.queryExecution.executedPlan.toString
    // bucketed SMJ: the join inputs must not re-shuffle on the join key
    val exchanges = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(s).size +
      "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(s).size
    assert(exchanges == 0, s"join inputs re-shuffled:\n$s")
    assert(s.contains("SortMergeJoin"), s)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("minhash LSH plan contains no cartesian product") {
    val df = SparkEntry.queries("llm_minhash_lsh")(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("bloom_prefilter probes with the native expression, not a UDF") {
    val df = SparkEntry.queries("bloom_prefilter")(spark, sfDir)
    val s = planString(df)
    assert(s.contains("might_contain"), s.take(4000))
    // no per-row serialization wall: neither a Scala UDF invoke nor a
    // Python batch evaluator anywhere in the plan
    assert(!s.contains("UDF") && !s.contains("BatchEvalPython"), s.take(4000))
  }

  test("partitioned-table reads prune partitions (COW MERGE's rewrite read)") {
    // the property merge_upsert's touched-partition rewrite relies on: a
    // filter on the partition column must become a PartitionFilter (driver
    // lists only matching directories), never a row-level post-filter scan
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_check"
    Tables.t(spark, sfDir, "orders")
      .repartition(col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "O")
    val s = pruned.queryExecution.executedPlan.toString
    assert(s.contains("PartitionFilters: [isnotnull(o_orderstatus"), s.take(2000))
    // only the one matching directory is scanned (runtime scan metrics;
    // the unfiltered table has 3 partition dirs / 3 files)
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned == Seq(1L), s"numFiles per scan: $scanned")
  }

  test("AQE is enabled in the session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("join_smb joins bucketed tables without re-shuffling the join keys") {
    val df = SparkEntry.queries("join_smb")(spark, sfDir)
    val s = planString(df)
    assert(s.contains("SortMergeJoin"), s)
    val exchanges = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(s).size +
      "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(s).size
    assert(exchanges == 0, s"join inputs re-shuffled:\n$s")
  }

  test("AQE splits skewed join partitions (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 95% of the left side lands on one key → one fat shuffle partition;
      // payload kept poorly-compressible (skew detection reads COMPRESSED
      // map-output sizes — constant rows would vanish under lz4)
      val left = spark.range(200000)
        .select(when(col("id") < 190000, lit(7L)).otherwise(col("id")).as("k"),
          md5(col("id").cast("string")).as("v"))
      val right = spark.range(2000).select((col("id") % 50).as("k"), col("id").as("w"))
      // no key-aligned operator downstream: a groupBy(k) would require the
      // exact hash partitioning the skew split must break, so AQE would
      // (correctly) decline to split
      val j = left.join(right, "k").agg(count(col("v")).as("n"))
      j.collect()
      val s = j.queryExecution.executedPlan.toString
      assert(s.contains("skew=true"), s.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE statistics reach the optimizer (CBO input)") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    spark.sql("DROP TABLE IF EXISTS nation_stats")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/nation_stats"))
    Tables.t(spark, sfDir, "nation").write.mode("overwrite").saveAsTable("nation_stats")
    spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("nation_stats").queryExecution.optimizedPlan.stats
      assert(stats.sizeInBytes > 0)
      assert(stats.rowCount.exists(_ == 25), s"rowCount=${stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("ANALYZE column stats flip a join to broadcast without a hint") {
    // The CBO payoff beyond stats merely existing: with table + column
    // stats, the
    // optimizer's filter-selectivity estimate shrinks the filtered side
    // below the broadcast threshold and JoinSelection picks
    // BroadcastHashJoin with NO hint; without stats the filtered estimate
    // stays at full table size and the same query plans a SortMergeJoin.
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    spark.sql("DROP TABLE IF EXISTS orders_cbo")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/orders_cbo"))
    Tables.t(spark, sfDir, "orders").write.mode("overwrite").saveAsTable("orders_cbo")
    val li = Tables.t(spark, sfDir, "lineitem")
    // initial (pre-AQE) physical plan: isolates the stats-driven strategy
    // choice from AQE's runtime size-based rewrite
    def planStr(): String = {
      val filtered = spark.table("orders_cbo").filter(col("o_orderkey") < 8)
      li.join(filtered, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .queryExecution.sparkPlan.toString
    }
    val savedThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Threshold between the two estimates: WITHOUT stats the build side
      // still shrinks by column pruning (2 of 9 columns, ~25% of table
      // size — the Project ratio applies even with CBO off), so the
      // threshold must sit well below that; WITH column stats the ~0.1%
      // filter selectivity (o_orderkey < 8, keys spanning 1..6000) pushes
      // the estimate another ~200× lower. fullSize/20 splits the two with
      // ~5× margin each way.
      val fullSize = spark.table("orders_cbo").queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (fullSize / 20).toString)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(planStr().contains("SortMergeJoin"), planStr())
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      assert(planStr().contains("BroadcastHashJoin"), planStr())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
      spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }

  test("llm_contamination broadcasts the eval gram set") {
    val df = SparkEntry.queries("llm_contamination")(spark, sfDir)
    df.collect() // let AQE finalize
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"),
      "eval-gram overlap join must broadcast (eval suites are KBs, corpora TBs)")
    assert(!s.contains("SortMergeJoin"), "corpus side must not shuffle-sort")
  }

  test("llm_domain_mix orders within shards, not globally, before ranking") {
    val df = SparkEntry.queries("llm_domain_mix")(spark, sfDir)
    // the row_number window must be partitioned by shard: an empty
    // partition spec would funnel every row through one partition.
    // (sparkPlan, not executedPlan: AQE wraps the tree in
    // AdaptiveSparkPlanExec, which hides children from collect)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected a WindowExec operator")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "global (unpartitioned) window in llm_domain_mix"))
  }

  test("contamination and repetition keep their load-bearing cache barrier") {
    // Without the persist, InferFiltersFromGenerate's size(arr) > 0 filter
    // is pushed through the alias chain to the scan, inlining the md5
    // word-hash array inside the gram lambda — measured 174 s (vs 0.5 s)
    // at sf0.1. Guard both the barrier and the symptom: the optimized
    // plan must contain the InMemoryRelation and only a bounded number of
    // inlined md5 calls (the cached build plan itself contributes a few;
    // the pathological plan contained dozens).
    for (q <- Seq("llm_contamination", "llm_repetition")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"), s"$q lost its persist barrier")
      val md5s = "md5\\(".r.findAllIn(plan).size
      assert(md5s <= 6, s"$q inlines md5 $md5s times — pushdown blowup is back")
    }
  }

  test("llm_dedup_incremental keeps the signature chain out of scan filters") {
    // Third occurrence of the InferFiltersFromGenerate pushdown
    // pathology (r10: contamination/repetition via missing persist;
    // r11: exploding band structs above a not-null filter OVER A JOIN
    // let the inferred filters substitute the md5/shingle/minhash chain
    // into the scan — 46 s at sf0.1 vs 1.1 s). The healthy plan inlines
    // md5 exactly twice (batch word-hash + batch content-hash); the
    // pathological one fans it into filter trees. Bound it.
    val plan = SparkEntry.queries("llm_dedup_incremental")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val md5s = "md5\\(".r.findAllIn(plan).size
    assert(md5s <= 4, s"llm_dedup_incremental inlines md5 $md5s times — pushdown blowup is back")
  }

  test("llm_ann_ivf hot-cell guard is single-pass (window count, no anti-join)") {
    // r10's guard re-aggregated the assigned set and broadcast-anti-joined
    // — a full second pass over the assignment plan (scan + broadcast +
    // argmax agg + vec_id join), measured as the bulk of a 2.38× drift.
    // The r11 shape rides a window count over the frame it filters; if a
    // LeftAnti ever reappears here, the second pass is back.
    val df = SparkEntry.queries("llm_ann_ivf")(spark, sfDir)
    val sp = df.queryExecution.sparkPlan
    assert(!sp.toString.contains("LeftAnti"),
      "hot-cell guard regressed to the two-pass broadcast anti-join shape")
    val wins = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.exists(_.partitionSpec.exists(_.toString.contains("cell"))),
      "expected the cell-partitioned count window guard")
  }

  test("TopKPerKey rewrite fires on the registered grouped-top-k sites") {
    // Adoption audit for the custom ladder (VERDICT r11 item 8): every
    // registered `row_number() <= k`-over-window site should plan the
    // heap-based TopKPerKeyNode instead of sort-based WindowExec — the
    // oracle gate and the bench then run THROUGH the custom operator
    // (the Verify/Bench sessions inject GraftExtensions, same as here).
    val sites = Seq(
      "llm_cosine_topk",   // final top-5 ranking
      "llm_ann_ivf",       // probe ranking + final top-5 (2 sites)
      "llm_ann_ivf_int8",  // same body over dequantized vectors
      "llm_tfidf_top",     // per-doc top terms
      "llm_bm25_topk",     // per-query top docs
      "llm_dedup_rows",    // rn = 1 keeper selection
      "llm_source_cap")    // per-source doc cap (domain balancing)
    val counts = sites.map { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .optimizedPlan.collect { case t: graft.plans.TopKPerKeyNode => t }.size
      name -> n
    }
    info(counts.map { case (n, c) => s"$n=$c" }.mkString("TopKPerKeyNode: ", ", ", ""))
    counts.foreach { case (name, n) =>
      assert(n >= 1, s"TopKPerKey rewrite does not fire on $name")
    }
    // probe ranking + final top-5, plus the fixed-k quantizer's seed
    // dedup window (rn = 1 over the k-row seed set) — which appears
    // once per `cents` consumer (cell assignment + probes) = 4 sites
    assert(counts.toMap.apply("llm_ann_ivf") == 4)
  }

  test("lm_quality broadcasts the unigram table and keeps two-phase aggs") {
    val df = SparkEntry.queries("llm_lm_quality")(spark, sfDir)
    val s = df.queryExecution.sparkPlan.toString
    // the fixed 2^16-bucket frequency table joins back via broadcast,
    // never a corpus-side shuffle on the bucket for the scoring join
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
    // word count + per-doc mean both partial/final
    assert("partial_count".r.findAllIn(s).size >= 2, s.take(3000))
  }

  test("semdedup broadcasts centroids and joins pairs on the cell key") {
    val df = SparkEntry.queries("llm_semdedup")(spark, sfDir)
    val s = df.queryExecution.sparkPlan.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s.take(3000)) // centroid table rides a broadcast
    assert(!s.contains("CartesianProduct"), s.take(3000))
    // the within-cell pair join is an equi-join keyed on cell
    assert(s.contains("SortMergeJoin [cell") || s.contains("ShuffledHashJoin [cell")
      || s.contains("BroadcastHashJoin [cell"), s.take(3000))
  }

  test("r13b curation operators: no shuffle in winnow, bounded md5 inlining") {
    // winnow is a pure per-row projection chain — any Exchange means a
    // regression; and its size(hs) filter must not fan the md5 word-hash
    // array into per-element recomputes (the CollapseProject/pushdown
    // trap — hs/g are multi-referenced, so the isCheap gate protects
    // them; pin that). The pushed scan filter legitimately evaluates the
    // word-hash array once for size(), so the healthy bound is 2.
    // drive the CORE, not the registered query — the fixture query adds
    // the oracle's total-order orderBy, whose range Exchange is contract
    // noise, and AQE's AdaptiveSparkPlanExec would hide it from the
    // string assert anyway
    val win = graft.queries.Text.winnowOf(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"))
    assert(!win.queryExecution.sparkPlan.toString.contains("Exchange"),
      "winnowOf is no longer shuffle-free")
    val winMd5 = "md5\\(".r.findAllIn(win.queryExecution.optimizedPlan.toString).size
    assert(winMd5 <= 2, s"winnowOf inlines md5 $winMd5 times — per-element recompute is back")
    // fuzzy contamination rides the same persisted signature build as
    // the minhash family — the barrier is load-bearing (same
    // InferFiltersFromGenerate pathology class as llm_contamination).
    // Every md5 in the healthy plan is a PRINT artifact of a cache
    // consumer re-rendering the cached build (Project + Filter + scan
    // DataFilters = 3 per InMemoryRelation occurrence); a pushdown
    // blowup adds md5 sites BEYOND the cached prints, breaking the
    // structural bound.
    val fz = SparkEntry.queries("llm_contamination_fuzzy")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val fzCaches = "InMemoryRelation".r.findAllIn(fz).size
    assert(fzCaches >= 1, "llm_contamination_fuzzy lost its persist barrier")
    val fzMd5 = "md5\\(".r.findAllIn(fz).size
    assert(fzMd5 <= 3 * fzCaches,
      s"llm_contamination_fuzzy inlines md5 $fzMd5 times beyond its $fzCaches cached prints")
    // token budget: the only unpartitioned window runs over the
    // ≤ nBuckets+1 bucket aggregate, never over doc rows — every
    // doc-level window must be partitioned
    val tb = SparkEntry.queries("llm_token_budget")(spark, sfDir)
    val tbWins = tb.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(tbWins.nonEmpty)
    val unpart = tbWins.filter(_.partitionSpec.isEmpty)
    assert(unpart.forall(_.toString.contains("btok")),
      "unpartitioned doc-level window in llm_token_budget")
  }

  test("llm_bm25_topk: one corpus scan, shared postings exchange reused") {
    // The whole index (tf, dl, df, n, avgdl) derives from ONE
    // (doc_id, w) groupBy exchange; AQE stage reuse dedups it, so the
    // final plan reads the corpus once (plus the pushed-filter
    // query-side scan, which prunes to the handful of query docs).
    // Regression guard for the six-scan shape the r14 verdict flagged.
    val df = SparkEntry.queries("llm_bm25_topk")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val finalPlan = planString(df).split("== Initial Plan ==").head
    val corpusScans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("GreaterThanOrEqual(doc_id"))
    assert(corpusScans <= 1, s"corpus scanned $corpusScans times:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
  }

  test("llm_quality_classifier: postings exchange reused across epochs") {
    // Three epochs read the SAME (doc_id, f) postings groupBy; AQE
    // stage reuse must dedup it so the corpus text is scanned once
    // (the two remaining scans are 2-column label projections). A
    // plan that re-tokenizes per epoch would show epochs×scans here.
    // clearCache first: an earlier test's persisted frame can
    // plan-match one epoch's subtree and break canonical equality for
    // the others (suite-order-dependent; 12 scans observed). Bench and
    // Verify clear the cache between queries, so the clean-cache plan
    // is the one that ships.
    spark.catalog.clearCache()
    val df = SparkEntry.queries("llm_quality_classifier")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val finalPlan = planString(df).split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 3, s"classifier scanned the corpus $scans times:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
  }

  test("seq_sessionize: both windows and the session agg share one user_id shuffle") {
    // lag + running-sum windows share PARTITION BY user_id ORDER BY
    // (tsu, event_id), and the (user_id, session_idx) groupBy is
    // satisfied by the same hash partitioning (subset rule), so the
    // only exchanges are ONE hash shuffle on user_id plus the final
    // presentation range-sort. A plan that re-shuffles per window or
    // for the agg would be 100 TB-hostile.
    val df = SparkEntry.queries("seq_sessionize")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val finalPlan = planString(df).split("== Initial Plan ==").head
    val hashEx = finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$finalPlan")
    val windows = finalPlan.linesIterator.count(_.contains("Window ["))
    assert(windows == 2, s"expected 2 Window nodes:\n$finalPlan")
  }

  test("join_scd2: PIT join is an equi-join on user, not a nested loop") {
    // the range predicate must ride the user_id equi-join (SMJ/SHJ);
    // a BroadcastNestedLoopJoin here means the equi-key was lost and
    // the probe side would scan every version of every user at scale
    val df = SparkEntry.queries("join_scd2")(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"PIT join degenerated to a nested loop:\n$s")
    val rows = df.collect()
    // intervals partition the timeline per user: every probe matches
    // exactly one version
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(rows.length.toLong == nEvents, s"${rows.length} vs $nEvents")
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(4), "probe before valid_from")
    }
  }

  test("win_time_range: one user_id shuffle feeds the interval window") {
    val df = SparkEntry.queries("win_time_range")(spark, sfDir)
    df.collect()
    val finalPlan = planString(df).split("== Initial Plan ==").head
    val hashEx = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$finalPlan")
    val windows = finalPlan.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"expected 1 Window node:\n$finalPlan")
  }

  test("seq_dau_wau: trailing distinct is marker-based — no Window nodes") {
    // the operator's whole point: a COUNT(DISTINCT) OVER a 7-day frame
    // would hold per-frame dedup state; the marker derivation must plan
    // as pure two-phase aggregates
    val s = planString(SparkEntry.queries("seq_dau_wau")(spark, sfDir))
    assert(!s.contains("Window ["), s"unexpected window in dau/wau plan:\n$s")
  }

  test("llm_score_agreement: global ranks are bucket-decomposed") {
    // two row_number windows PARTITIONED by the score bucket (bk), two
    // bounded unpartitioned running totals over the bucket frames — a
    // plan whose row_number window lost its bk partitioning would
    // single-partition the whole corpus
    val df = SparkEntry.queries("llm_score_agreement")(spark, sfDir)
    val s = planString(df)
    val rnLines = s.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("Window [")).toSeq
    assert(rnLines.size == 2, s"expected 2 row_number windows:\n$s")
    rnLines.foreach(l => assert(l.contains("bk#"),
      s"row_number window not partitioned by score bucket: $l"))
  }

  test("join_fuzzy_block canonicalizes before it compares (agg below the join)") {
    // the scale contract: the levenshtein self-join runs over the
    // DISTINCT-name frame, so a HashAggregate must sit BELOW the join
    // on both sides — a plan comparing raw part rows would put the
    // (corpus x corpus-in-block) work back
    val df = SparkEntry.queries("join_fuzzy_block")(spark, sfDir)
    df.collect()
    val s = planString(df)
    val joinAt = s.linesIterator.indexWhere(l =>
      l.contains("Join") && !l.contains("BroadcastExchange"))
    val aggBelow = s.linesIterator.drop(joinAt + 1)
      .exists(_.contains("HashAggregate"))
    assert(joinAt >= 0 && aggBelow,
      s"no aggregate below the fuzzy join:\n$s")
  }

  test("llm_weighted_sample plans a bounded top-k, never a global sort") {
    val df = SparkEntry.queries("llm_weighted_sample")(spark, sfDir)
    assert(planString(df).contains("TakeOrderedAndProject"))
  }

  test("drift windows run over aggregated frames, not the corpus") {
    // llm_drift_ks's cumulative window and llm_zipf_fit's rank window
    // are single-partition BY DESIGN — legal only because their input
    // is the grouped distinct-value / top-V frame. A lost groupBy
    // (window directly over the scan) is the scale bug this pins.
    Seq("llm_drift_ks", "llm_zipf_fit", "llm_heaps_law",
        "llm_unimax", "llm_conformal").foreach { name =>
      val s = planString(SparkEntry.queries(name)(spark, sfDir))
      val lines = s.linesIterator.toSeq
      val winAt = lines.indexWhere(l => l.contains("Window ["))
      val aggBelow = lines.drop(winAt + 1).exists(_.contains("HashAggregate"))
      assert(winAt >= 0 && aggBelow,
        s"$name: window not over an aggregated frame:\n$s")
    }
  }

  /** True iff the physical plan contains a ranking window (rank /
    * dense_rank / percent_rank / row_number / ntile) whose partitioning
    * is SOLELY data-skewed keys (source / lang) over a non-aggregated
    * frame — the CCNet-sort anti-pattern: a real corpus has a dominant
    * source (web ≈ 80%), so such a window funnels ~the whole corpus
    * through ONE WindowExec partition. Legal shapes stay legal: a finer
    * partitioning like (source, qi) (the quality_calibrate within-tie
    * window) or (lang, bkt) (the stratified-sample bucket refinement),
    * or a window whose input STREAM is already grouped by
    * VALUE-DOMAIN-BOUNDED keys (an aggregate beneath bounds the frame
    * by its distinct group keys — but ONLY when those keys are
    * bounded: an agg grouping by a text-derived, data-sized column
    * (prefix / gram / hash / doc_id / …) has ~one group per document,
    * so it exonerates nothing — the r18 `llm_boilerplate` loophole.
    * And only on the streamed lineage: an aggregate inside a
    * broadcast-join BUILD side says nothing about the window's row
    * count, so BroadcastExchange subtrees don't count). Flags ranking
    * functions AND group-total aggregates over an unbounded frame —
    * the r18 boilerplate sum-window needed the same per-source Sort a
    * rank does. */
  private def skewedRankWindow(plan: SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, RankLike, RowNumberLike, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val skewed = Set("source", "lang", "language")
    // Data-sized (text-derived) key-name fragments: grouping by one of
    // these does NOT bound the frame's cardinality at corpus scale.
    val dataSized = Seq("doc_id", "prefix", "gram", "hash", "sig",
      "shingle", "token", "word", "url", "text", "fp", "chunk")
    def boundedAggBelow(p: SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.forall { g =>
          g.collect { case ar: AttributeReference => ar.name.toLowerCase }
            .forall(n => !dataSized.exists(n.contains))
        }
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => false
      case other => other.children.exists(boundedAggBelow)
    }
    plan.collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall {
            case a: AttributeReference => skewed(a.name)
            case _ => false
          } &&
          w.windowExpression.exists(_.collectFirst {
            case we: WindowExpression
              if we.windowFunction.isInstanceOf[RankLike] ||
                we.windowFunction.isInstanceOf[RowNumberLike] => we
            case we: WindowExpression
              if we.windowFunction.isInstanceOf[AggregateExpression] &&
                (we.windowSpec.frameSpecification match {
                  case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
                  case _ => false
                }) => we
          }.nonEmpty) &&
          !boundedAggBelow(w.child) => w
    }.nonEmpty
  }

  test("no registered query plans a cartesian product or a skewed-key row-rank window") {
    // join_cross IS a cartesian product by design (guarded dims-only).
    // One sweep builds each plan once and runs both suite-wide
    // plan-class assertions on it (r18, verdict items 2+4).
    val intentional = Set("join_cross")
    val cartOffenders = scala.collection.mutable.ListBuffer[String]()
    val rankOffenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      if (!intentional(name) && plan.toString.contains("CartesianProduct"))
        cartOffenders += name
      if (skewedRankWindow(plan)) rankOffenders += name
    }
    assert(cartOffenders.isEmpty, s"cartesian products in: $cartOffenders")
    assert(rankOffenders.isEmpty,
      s"row-rank window partitioned only on a skewed key (source/lang) " +
        s"over an ungrouped frame in: $rankOffenders")
  }

  test("skewedRankWindow flags the pre-r19 llm_boilerplate shape (aggregated-frame loophole)") {
    // The r18 verdict's one scale-shape defect: a source-partitioned
    // sum-window + row_number over the (source, prefix) counts frame.
    // The frame IS aggregated, but its group keys are data-sized
    // (distinct prefixes ≈ one per document), so the dominant source
    // still funnels ~the corpus through one Sort task. The old
    // streamHasAgg exemption exonerated it; the bounded-keys exemption
    // must not. Rebuild the exact pre-fix plan and assert it's flagged.
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(col("source"), array_join(slice(col("ws"), 1, 8), " ").as("prefix"))
    val counts = docs.groupBy("source", "prefix").agg(count(lit(1)).as("c"))
    val preFix = counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("prefix"))))
      .filter(col("rn") === 1)
    assert(skewedRankWindow(preFix.queryExecution.sparkPlan),
      "guard must flag a skewed-key window whose child agg groups by a data-sized key")
    // And the sum-window ALONE (no rank) is flagged too — the
    // unbounded-frame group-total needs the same per-source Sort.
    val sumOnly = counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
    assert(skewedRankWindow(sumOnly.queryExecution.sparkPlan),
      "guard must flag an unbounded-frame agg window over a data-sized frame")
    // The reshaped (post-fix) builder plans clean.
    assert(!skewedRankWindow(
      SparkEntry.queries("llm_boilerplate")(spark, sfDir).queryExecution.sparkPlan),
      "reshaped llm_boilerplate must not plan a skewed-key window")
  }

  test("SQL-surface texts obey the suite-wide plan-class guards too") {
    // The 222 surface texts are gated on ROW equality against their
    // builders, but a dialect-translation regression (a translatedPatched
    // regex dropping a join condition or fanning a signature chain into
    // scan filters) would keep rows identical while planning
    // catastrophically worse. Iterate the same plan-class bounds over
    // every text (r17 verdict item 4): no cartesian, no skewed-key
    // row-rank window, and the r10/r11 InferFilters pushdown pathology
    // detected at its actual SITE — md5 signature chains substituted
    // into scan DataFilters (re-evaluated against every RAW row during
    // the scan, the r10 174-s shape), NOT total plan md5 prints:
    // band-struct expansion legitimately prints one textual md5
    // hundreds of times, and Filter nodes above generators carry
    // signature terms at a bounded constant factor (the no-persist SQL
    // texts pass the row gate in seconds with those). Measured healthy
    // FileScan-line counts across all 222 texts: ≤ 4.
    spark.catalog.clearCache()
    graft.Tables.registerAll(spark, sfDir)
    graft.queries.SqlSurface.registerCompat(spark)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = SparkEntry.sqlQueries.toSeq.map { case (name, text) =>
        Future {
          val qe = spark.sql(text).queryExecution
          val phys = qe.sparkPlan
          val s = phys.toString
          val scanMd5 = s.linesIterator.filter(_.contains("FileScan"))
            .map(l => "md5\\(".r.findAllIn(l).size).sum
          val problems = Seq(
            if (name != "join_cross" && s.contains("CartesianProduct"))
              Some("cartesian product") else None,
            if (skewedRankWindow(phys)) Some("skewed-key row-rank window")
            else None,
            if (scanMd5 > 4)
              Some(s"md5 in scan DataFilters: $scanMd5 sites — " +
                "InferFilters pushdown blowup") else None).flatten
          if (problems.isEmpty) None else Some(s"$name: ${problems.mkString("; ")}")
        }.recover { case e: Throwable =>
          Some(s"$name threw during planning: " +
            String.valueOf(e.getMessage).linesIterator.nextOption()
              .getOrElse(e.getClass.getName).take(160))
        }
      }
      val failures = Await.result(Future.sequence(fs), 15.minutes).flatten
      assert(failures.isEmpty,
        s"${failures.size} SQL-surface plan-class violations:\n  " +
          failures.mkString("\n  "))
    } finally pool.shutdown()
  }
}
