package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.chaining._

/** SQL-string entry surface (SURVEY.md §3.1): the reference's primary
  * entry point is a HiveQL STRING handed to its Driver, not a builder
  * API — this module closes that lifecycle stage by exposing the core
  * query surface as runnable SQL text over the fixture tables, executed
  * through `spark.sql` with the standard view names registered by
  * [[graft.Tables.registerAll]].
  *
  * Two sources of text:
  *  - [[fromOracle]]: queries whose DuckDB oracle string is already
  *    engine-portable ANSI SQL — probed by running each oracle string
  *    through spark.sql and comparing to the builder result (the
  *    `SqlSurfaceSpec` round-trip keeps this true round over round). One
  *    text, three engines: the builder, Spark SQL, and DuckDB all agree.
  *  - [[custom]]: Spark/HiveQL spellings for queries whose oracle leans
  *    on DuckDB-only names (quantile_cont, string_agg, unnest, epoch_us)
  *    — including the reference's signature LATERAL VIEW / TRANSFORM
  *    syntax, window IGNORE NULLS / INTERVAL RANGE frames, and WITH
  *    RECURSIVE.
  *
  * Deliberately excluded: source/sink round-trips, MERGE and MV
  * lifecycle ops (their oracle reconstructs the EXPECTED OUTPUT rather
  * than expressing the operation — a SQL string that merely predicts a
  * sink's content is not that operator's SQL surface), and the
  * sketch/iterative/stateful operators whose semantics aren't
  * single-statement SQL.
  *
  * Scale note: these strings go through the same Catalyst planning as
  * the builder API — predicate pushdown, broadcast selection, AQE all
  * apply identically; there is no separate "SQL path" to keep fast.
  */
object SqlSurface {
  /** Queries whose oracle SQL runs verbatim under spark.sql with results
    * identical to the registered builder. */
  private val fromOracle: Seq[String] = Seq(
    "agg_basic", "agg_bits", "agg_boolean",
    "agg_covar_corr", "agg_cube", "agg_grouping_sets",
    "agg_mode", "agg_multi_distinct", "agg_pivot", "agg_regr",
    "agg_rollup", "agg_sum_empty_zero", "agg_variance",
    "bloom_prefilter", "cte_chain",
    "fn_conditional", "fn_json", "fn_sql_macro", "fn_virtual_cols",
    "fn_xpath",
    "gen_inline", "gen_stack",
    "join_anti", "join_asof_tol", "join_broadcast", "join_cross",
    "join_full", "join_left",
    "join_multiway", "join_range_bin", "join_right", "join_salted",
    "join_scd2", "join_semi", "join_smb", "join_theta",
    "llm_dedup_rows", "llm_dedup_weights", "local_values",
    "q1_pricing_summary", "q5_local_supplier",
    "seq_funnel", "seq_matchpath", "seq_sessionize", "seq_transitions",
    "seq_user_surprise",
    "setop_except", "setop_except_all", "setop_intersect",
    "setop_intersect_all", "setop_union_all", "setop_union_distinct",
    "sort_cluster_by", "sort_global", "sort_topk",
    "subq_exists", "subq_in", "subq_not_in", "subq_scalar",
    "win_agg_range", "win_agg_rows", "win_ranking")

  /** Spark-SQL/HiveQL spellings where the oracle is DuckDB-specific.
    * Each mirrors its builder expression-for-expression (same aliases,
    * same quantization) so the round-trip spec can require exact row
    * equality. */
  private val custom: Map[String, String] = Map(
    // r17 (ADVICE): these two previously rode their ORACLE strings, which
    // hardcode the gate values (TRUE AS andv_ok, CAST(5 AS BIGINT) AS
    // n_bins) — the surface never actually ran the sketch. These custom
    // spellings EXECUTE approx_count_distinct / histogram_numeric and
    // compute the gate booleans, mirroring the builders expression for
    // expression (the agg_percentile_approx precedent).
    "agg_approx_ndv" ->
      """SELECT l_returnflag,
        |CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_part,
        |abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
        |      - COUNT(DISTINCT l_partkey))
        |  / COUNT(DISTINCT l_partkey) <= 0.10 AS andv_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_histogram" ->
      """SELECT l_returnflag,
        |CAST(size(hist) AS BIGINT) AS n_bins,
        |CAST(round(aggregate(hist, CAST(0.0 AS DOUBLE), (a, b) -> a + b.y))
        |  AS BIGINT) AS total_y,
        |(transform(hist, b -> b.x) = array_sort(transform(hist, b -> b.x)))
        |  AS x_sorted,
        |forall(transform(hist, b -> b.x), x -> x >= qmin AND x <= qmax)
        |  AS x_in_range
        |FROM (SELECT l_returnflag,
        |        histogram_numeric(l_quantity, 5) AS hist,
        |        min(l_quantity) AS qmin, max(l_quantity) AS qmax
        |      FROM lineitem GROUP BY l_returnflag) t
        |ORDER BY l_returnflag""".stripMargin,
    // r17 (ADVICE): the oracle's raw SUM(rnk*cnt) long product is the
    // int64-overflow-at-~1e9-users hazard the builder fixed by
    // accumulating in decimal(38,0); this spelling carries the same
    // overflow-safe accumulation so the SQL surface matches the
    // builder's scale posture (ANSI-on Spark would throw on the raw
    // product; DuckDB sums in hugeint either way).
    "seq_gini" ->
      s"""WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
         |           FROM events GROUP BY user_id),
         |r AS (SELECT cnt,
         |        row_number() OVER (ORDER BY cnt, user_id) AS rnk FROM c)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(cnt) AS BIGINT) AS total_events,
         |  ${oRound("2.0*CAST(SUM(CAST(rnk AS DECIMAL(38,0))*cnt) AS DOUBLE)" +
            "/(CAST(COUNT(*) AS DOUBLE)*CAST(SUM(cnt) AS DOUBLE))" +
            " - CAST(COUNT(*)+1 AS DOUBLE)/COUNT(*)", 6)}
         |    AS gini
         |FROM r""".stripMargin,
    "agg_percentile" ->
      s"""SELECT l_returnflag,
         |${oRound("percentile(l_quantity, 0.25)", 6)} AS q25,
         |${oRound("percentile(l_quantity, 0.5)", 6)} AS q50,
         |${oRound("percentile(l_quantity, 0.75)", 6)} AS q75,
         |${oRound("median(l_discount)", 8)} AS med_disc
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile_approx" ->
      s"""SELECT l_returnflag,
         |${oRound("percentile(l_extendedprice, 0.5)", 6)} AS exact_med_price,
         |${oRound("percentile(l_quantity, 0.25)", 6)} AS exact_q25,
         |${oRound("percentile(l_quantity, 0.75)", 6)} AS exact_q75,
         |abs(percentile_approx(l_extendedprice, 0.5, 10000)
         |    - percentile(l_extendedprice, 0.5))
         |  / percentile(l_extendedprice, 0.5) <= 0.01 AS med_ok,
         |abs(element_at(percentile_approx(l_quantity, array(0.25, 0.75), 1000), 1)
         |    - percentile(l_quantity, 0.25)) <= 1.0 AS q25_ok,
         |abs(element_at(percentile_approx(l_quantity, array(0.25, 0.75), 1000), 2)
         |    - percentile(l_quantity, 0.75)) <= 1.0 AS q75_ok
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect" ->
      """SELECT n_name,
        |concat_ws(',', sort_array(collect_set(c_mktsegment))) AS segments,
        |COUNT(*) AS cust_cnt,
        |concat_ws(',', sort_array(collect_list(substring(c_mktsegment, 1, 1))))
        |  AS seg_initials
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_listagg" ->
      """SELECT o_orderpriority,
        |  listagg(DISTINCT o_orderstatus, ',')
        |    WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
        |  listagg(CAST(o_orderkey AS STRING), '|')
        |    WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey)
        |    FILTER (WHERE o_totalprice > 550000) AS top_keys
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "fn_hash" ->
      """SELECT c_custkey,
        |md5(c_name) AS md5_v,
        |sha2(c_name, 256) AS sha256_v,
        |length(sha2(c_name, 512)) AS sha512_len
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "fn_hash_b64fmt" ->
      """SELECT c_custkey,
        |base64(CAST(c_name AS BINARY)) AS b64_v,
        |base64(unbase64(base64(CAST(c_name AS BINARY)))) AS b64_rt,
        |format_number(c_acctbal, 2) AS fmtnum_v
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT c_custkey,
        |c_custkey & 37 AS band,
        |c_custkey | 37 AS bor,
        |c_custkey ^ 37 AS bxor,
        |~c_custkey AS bnot,
        |shiftleft(c_custkey, 3) AS shl,
        |shiftright(c_custkey, 2) AS shr,
        |bit_count(c_custkey) AS bcount
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "fn_math" ->
      s"""SELECT p_partkey,
         |abs(p_retailprice - 1000) AS abs_v,
         |${oRound("p_retailprice / 7", 2)} AS round_div7,
         |floor(p_retailprice) AS floor_v,
         |ceil(p_retailprice) AS ceil_v,
         |pmod(p_partkey - 150, 7) AS pmod_v,
         |conv(CAST(p_size AS STRING), 10, 2) AS bin_str,
         |hex(p_size) AS hex_str,
         |CAST(factorial(p_size % 10) AS BIGINT) AS fact_v,
         |greatest(p_size, 25) AS great_v,
         |least(p_size, 25) AS least_v,
         |signum(p_retailprice - 1000) AS sign_v,
         |${oRound("exp(p_size / 10.0)", 9)} AS exp_v,
         |${oRound("ln(p_retailprice)", 9)} AS ln_v,
         |${oRound("log10(p_retailprice)", 9)} AS log10_v,
         |${oRound("log2(p_size)", 9)} AS log2_v,
         |${oRound("sqrt(p_retailprice)", 9)} AS sqrt_v,
         |${oRound("cbrt(p_retailprice)", 9)} AS cbrt_v,
         |${oRound("sin(p_size)", 9)} AS sin_v,
         |${oRound("atan(p_size)", 9)} AS atan_v,
         |${oRound("degrees(p_size)", 6)} AS deg_v,
         |${oRound("pow(p_size, 2)", 4)} AS pow_v
         |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |length(p_name) AS len_v,
        |upper(p_name) AS upper_v,
        |lower(p_type) AS lower_v,
        |lpad(p_brand, 12, '*') AS lpad_v,
        |rpad(p_brand, 12, '-') AS rpad_v,
        |trim('  pad  ') AS trim_v,
        |reverse(p_name) AS rev_v,
        |repeat('*', p_size % 5) AS rep_v,
        |substring(p_name, 2, 4) AS substr_v,
        |instr(p_name, 'i') AS instr_v,
        |concat_ws('|', p_brand, p_type, p_name) AS cws_v,
        |translate(p_name, 'aeiou', 'AEIOU') AS trans_v,
        |ascii(p_name) AS ascii_v,
        |split_part(p_name, ' ', 1) AS sp1,
        |substring_index(p_name, ' ', 1) AS sidx_v,
        |levenshtein(p_brand, p_type) AS lev_v,
        |format_string('%s-%04d', p_type, p_size) AS fmt_v,
        |initcap(p_name) AS initcap_v,
        |find_in_set(p_type, 'ECONOMY,SMALL,LARGE') AS fis_v,
        |locate('e', p_name) AS loc_v
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,
    "fn_regex" ->
      """SELECT c_custkey,
        |c_name LIKE '%00001%' AS like_v,
        |c_mktsegment RLIKE '^B.*G$' AS rlike_v,
        |regexp_extract(c_name, '([0-9]+)', 1) AS rext_v,
        |regexp_replace(c_name, '0', '_') AS rrep_v,
        |CAST(regexp_count(c_name, '0') AS INT) AS rcnt_v,
        |split(c_name, '#')[1] AS split_v
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |year(o_orderdate) AS y_v,
        |quarter(o_orderdate) AS q_v,
        |month(o_orderdate) AS m_v,
        |dayofmonth(o_orderdate) AS dom_v,
        |dayofweek(o_orderdate) AS dow_v,
        |dayofyear(o_orderdate) AS doy_v,
        |weekofyear(o_orderdate) AS woy_v,
        |last_day(o_orderdate) AS lday_v,
        |next_day(o_orderdate, 'MO') AS nday_v,
        |date_add(o_orderdate, 30) AS dadd_v,
        |date_sub(o_orderdate, 15) AS dsub_v,
        |CAST(add_months(o_orderdate, 2) AS DATE) AS amon_v,
        |datediff(CAST('2000-01-01' AS DATE), o_orderdate) AS ddiff_v,
        |months_between(date_trunc('month', CAST('2000-01-01' AS DATE)),
        |  date_trunc('month', o_orderdate)) AS mbtw_v,
        |date_format(o_orderdate, 'yyyy-MM-dd HH:mm') AS dfmt_v,
        |unix_timestamp(o_orderdate) AS unix_v,
        |from_unixtime(unix_timestamp(o_orderdate)) AS funix_v,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NTZ) AS dtrunc_v,
        |to_date(o_orderdate) AS todate_v,
        |make_date(year(o_orderdate), month(o_orderdate), 1) AS mkdate_v
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
    "gen_explode" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT explode(split(text, ' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY cnt DESC, word""".stripMargin,
    "gen_explode_outer" ->
      """SELECT doc_id, long_word
        |FROM documents
        |LATERAL VIEW OUTER explode(filter(split(text, ' '), w -> length(w) > 6))
        |  t AS long_word
        |WHERE doc_id < 100
        |ORDER BY doc_id, long_word ASC NULLS FIRST""".stripMargin,
    "gen_posexplode" ->
      """SELECT doc_id, pos, word
        |FROM documents
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
        |WHERE doc_id < 30 ORDER BY doc_id, pos""".stripMargin,
    "gen_lateral_view" ->
      """SELECT doc_id, lang, w.word AS word
        |FROM documents
        |LATERAL VIEW explode(split(text, ' ')) w AS word
        |WHERE doc_id < 20
        |ORDER BY doc_id, word""".stripMargin,
    "gen_json_tuple" ->
      """SELECT event_id, jt.k AS k_val
        |FROM events LATERAL VIEW json_tuple(props, 'k') jt AS k
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,
    "gen_transform_script" ->
      """SELECT CAST(k AS BIGINT) AS okey, v AS prio FROM (
        |  SELECT TRANSFORM(o_orderkey, o_orderpriority)
        |  USING 'cat' AS (k STRING, v STRING)
        |  FROM orders WHERE o_orderkey < 2000
        |) t ORDER BY okey, prio""".stripMargin,
    "gen_transform_delimited" ->
      """SELECT CAST(k AS BIGINT) AS okey, v AS prio FROM (
        |  SELECT TRANSFORM(o_orderkey, o_orderstatus, o_orderpriority)
        |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '#'
        |    USING 'cut -d"#" -f1,3'
        |    AS (k STRING, v STRING)
        |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '#'
        |  FROM orders WHERE o_orderkey < 2000
        |) t ORDER BY okey, prio""".stripMargin,
    "win_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |lag(o_totalprice, 1) OVER w AS prev_price,
        |lead(o_totalprice, 2, -1.0) OVER w AS next2_price,
        |first_value(o_totalprice) OVER wf AS first_price,
        |last_value(o_totalprice) OVER wf AS last_price,
        |last_value(CASE WHEN o_orderstatus = 'P' THEN NULL
        |                ELSE o_totalprice END) IGNORE NULLS OVER wf
        |  AS last_nonp_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_time_range" ->
      """SELECT user_id, event_id, unix_micros(ts) AS tsu,
        |  CAST(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) OVER wh AS DOUBLE)/100
        |    AS roll_1h_sum,
        |  COUNT(*) OVER wh AS roll_1h_n
        |FROM events
        |WINDOW wh AS (PARTITION BY user_id ORDER BY ts
        |              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, tsu, event_id""".stripMargin,
    "cte_recursive" ->
      """WITH RECURSIVE chain(u, a, depth) AS (
        |  SELECT user_id, user_id, 0
        |  FROM (SELECT DISTINCT user_id FROM events) t
        |  UNION ALL
        |  SELECT u, a DIV 2, depth + 1 FROM chain WHERE a > 0),
        |d AS (SELECT u, MAX(depth) AS depth_to_root FROM chain GROUP BY u)
        |SELECT depth_to_root, COUNT(*) AS n_users
        |FROM d GROUP BY depth_to_root ORDER BY depth_to_root""".stripMargin,
    "llm_exact_dedup" ->
      """SELECT sha2(text, 256) AS content_hash,
        |MIN(doc_id) AS keeper, COUNT(*) AS copies
        |FROM documents GROUP BY sha2(text, 256) ORDER BY keeper""".stripMargin,
    "llm_token_count" ->
      """SELECT doc_id,
        |size(split(text, ' ')) AS ws_tokens,
        |CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS INT) AS bpe_tokens,
        |length(text) AS chars,
        |length(text) - length(regexp_replace(text, ' ', '')) AS spaces
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sort_hashsample" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS STRING)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin,
    // r17 (verdict item 3): the one inventory row with no hash-green
    // path gets a SQL-text twin — TABLESAMPLE ... REPEATABLE plans the
    // same Sample(0, 0.1, false, 42) node as the builder's
    // .sample(false, 0.1, 42), so exact-row equality under the fixed
    // seed holds single-engine even though DuckDB can't replay the RNG.
    // The engine's sample syntax is thereby self-consistent across both
    // entry points.
    "sort_tablesample" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        |ORDER BY o_orderkey""".stripMargin)

  /** Queries whose surface text is [[duckToSpark]] applied to the oracle
    * string — mechanically translated, gate-verified (every name here is
    * pinned to exact builder rows by `SqlSurfaceSpec`; candidates were
    * harvested by the `SqlProbe` sweep, and a name whose translation
    * diverges from its builder by even one row never enters this list). */
  private val translated: Seq[String] = Seq(
    "fn_cast", "fn_collection", "fn_context_ngrams", "fn_lambda",
    "fn_mask", "fn_math2", "fn_misc", "fn_ngrams", "fn_try",
    "fn_udf_registry", "fn_uniontype", "fn_url", "gen_parse_url_tuple",
    "graph_kcore", "graph_labelprop", "graph_linkpred", "graph_pagerank",
    "llm_ann_ivf", "llm_ann_ivf_int8",
    "llm_blocklist_filter", "llm_bm25_topk", "llm_bpe_merges",
    "llm_cosine_topk", "llm_embed_clip", "llm_embed_outliers",
    "llm_embed_quantize", "llm_hard_negatives", "llm_ivf_balance",
    "llm_knn_classify", "llm_knn_graph", "llm_pca_project",
    "llm_ccnet_buckets", "llm_cdc_chunks", "llm_char_entropy",
    "llm_charngram_langid", "llm_contamination", "llm_contamination_fuzzy",
    "llm_corpus_pipeline", "llm_corpus_select", "llm_dedup_incremental",
    "llm_dsir_select", "llm_html_extract", "llm_k_anon", "llm_lang_id",
    "llm_lexical_diversity", "llm_lm_bigram", "llm_lm_quality",
    "llm_lm_trigram", "llm_lsh_capped", "llm_minhash_lsh",
    "llm_mix_weights", "llm_ngram_jaccard", "llm_ngram_novelty",
    "llm_quality_classifier", "llm_quality_score", "llm_readability",
    "llm_repetition", "llm_rrf_fusion", "llm_score_agreement",
    "llm_shuffle_order", "llm_simhash", "llm_simhash_neardup",
    "llm_source_cap", "llm_source_stats", "llm_span_dedup",
    "llm_split_assign", "llm_split_leakage", "llm_stratified_sample",
    "llm_textrank", "llm_tfidf_top", "llm_token_budget", "llm_tokenize",
    "llm_tokenizer_fertility", "llm_vocab_coverage", "seq_anomaly",
    "seq_burstiness", "seq_changepoint", "seq_concurrency",
    "seq_periodicity", "seq_retention", "seq_rfm")

  /** name → runnable Spark SQL text. */
  lazy val sql: Map[String, String] = {
    val oracle = graft.SparkEntry.oracleSql
    fromOracle.map(n => n -> oracle(n)).toMap ++
      translated.map(n => n -> duckToSpark(oracle(n))).toMap ++ custom
  }

  /** Mechanical oracle-dialect → Spark SQL rewrite for the handful of
    * token-level differences a scalar macro can't bridge: `//` integer
    * division → `DIV`, sizeless `VARCHAR` casts → `STRING`, the
    * `AS MATERIALIZED` CTE hint (Spark CTEs materialize per plan, no
    * hint exists), lambda-taking `list_transform`/`list_filter` →
    * `transform`/`filter` (same lambda syntax, different name — macros
    * can't take lambda params), `list_has_any` → `arrays_overlap`,
    * `len(` → array/string-polymorphic has no Spark twin so it is NOT
    * rewritten, and SELECT-list `unnest(` → `explode(`. Applied ONLY to
    * the names in [[translated]], each of which the `SqlSurfaceSpec`
    * round-trip pins to exact builder rows — a rewrite that mangles a
    * string literal (e.g. `//` inside a URL) changes rows and fails the
    * gate, so membership is evidence the rewrite was semantics-
    * preserving for that text. */
  def duckToSpark(sql: String): String = {
    // Phase 1 — quote-USING idiom rewrites on the raw text (each regex
    // anchors on specific literals, so it can't misfire inside others):
    val idioms = sql
      .replaceAll("(?i)\\bAS MATERIALIZED\\b", "AS")
      // hex-string cast idiom: ('0x' || substr(md5(X), a, b))::BIGINT —
      // Spark won't cast '0x…' strings; conv(hex, 16, 10) is the same
      .replaceAll(
        "\\(\\s*'0x'\\s*\\|\\|\\s*(substr\\(md5\\((?:[^()]|\\([^()]*\\))*\\),\\s*\\d+,\\s*\\d+\\))\\s*\\)::(BIGINT|INT)",
        "CAST(conv($1, 16, 10) AS $2)")
      .replaceAll(
        "CAST\\(\\s*'0x'\\s*\\|\\|\\s*(substr\\(md5\\((?:[^()]|\\([^()]*\\))*\\),\\s*\\d+,\\s*\\d+\\))\\s+AS\\s+(BIGINT|INT)\\)",
        "CAST(conv($1, 16, 10) AS $2)")
      // DuckDB regexp_replace global flag: Spark's is always-global 3-arg
      .replaceAll(",\\s*'g'\\s*\\)", ")")
      // in-aggregate ORDER BY: string_agg(x, sep ORDER BY k) → the ANSI
      // listagg ... WITHIN GROUP spelling Spark 4 supports
      .replaceAll(
        "\\bstring_agg\\(([^(),]+),\\s*('[^']*')\\s+ORDER BY\\s+([^()]+)\\)",
        "listagg($1, $2) WITHIN GROUP (ORDER BY $3)")
    // Phase 2 — MASK string literals so the generic token rewrites below
    // can't touch their contents (a regex class '[a-z]' must survive the
    // bracket rewrite; a URL must survive `//` → DIV), then rewrite, then
    // unmask. Masking also hides in-literal parens/commas from the
    // depth-counting call rewriter.
    val literals = scala.collection.mutable.ArrayBuffer[String]()
    val masked = "'(?:[^']|'')*'".r.replaceAllIn(idioms, m => {
      literals += m.matched
      "" + (literals.size - 1) + ""
    })
    val rewritten = masked
      .replaceAll("//", " DIV ")
      // typed-list cast: x::DOUBLE[] → ARRAY<DOUBLE> (before the bracket
      // rules, whose patterns require non-empty bracket contents anyway)
      .replaceAll("((?:\\w+\\.)?\\w+)::DOUBLE\\[\\]", "CAST($1 AS ARRAY<DOUBLE>)")
      .replaceAll("(?i)\\bVARCHAR\\b", "STRING")
      .replaceAll("\\blist_transform\\s*\\(", "transform(")
      .replaceAll("\\blist_filter\\s*\\(", "filter(")
      .replaceAll("\\blist_has_any\\s*\\(", "arrays_overlap(")
      .replaceAll("\\bunnest\\s*\\(", "explode(")
      // len() is array/string-polymorphic in the dialect; the oracle
      // texts use it on lists (string length is spelled `length`)
      .replaceAll("\\blen\\s*\\(", "size(")
      // [a, b, c] list literal → array(a, b, c). The lookbehind excludes
      // indexing (`arr[i]` — preceded by a word char, ')' or ']');
      // innermost-first repetition handles one nesting level.
      .pipe { t =>
        var s = t
        val lit = "(?<![\\w)\\]])\\[([^\\[\\]]*)\\]".r
        var prev = ""
        while (prev != s) {
          prev = s
          s = lit.replaceAllIn(s, m =>
            "array(" + java.util.regex.Matcher.quoteReplacement(m.group(1)) + ")")
        }
        s
      }
      // [a:b] slice syntax (1-based, inclusive end) → slice(x, a, len)
      .replaceAll("((?:\\w+\\.)?\\w+)\\[(\\d+):(\\d+)\\]",
        "slice($1, $2, ($3) - ($2) + 1)")
      // remaining brackets are 1-based indexing — Spark's element_at is
      // 1-based too (bare `arr[i]` would be 0-based and silently
      // shifted); the qualifier keeps `t.col[i]` intact and the INT cast
      // satisfies element_at's index type when i is a BIGINT (range()
      // elements and sequence lambda vars are longs)
      .replaceAll("((?:\\w+\\.)?\\w+)\\[([^\\[\\]]+)\\]",
        "element_at($1, CAST(($2) AS INT))")
      // FROM-clause table-function range with a column-list alias:
      // `, range(N) t(m)` → a LATERAL VIEW over the same half-open span
      .replaceAll(",\\s*range\\((\\w+)\\)\\s+(\\w+)\\((\\w+)\\)",
        " LATERAL VIEW explode(sequence(0, ($1) - 1)) $2 AS $3")
      // dialect trunc(x) = numeric truncation toward zero (Spark's trunc
      // is date-only); double in, double out
      .pipe(t => rewriteCall(t, "trunc")(a =>
        if (splitTopLevel(a).size == 1) s"CAST(CAST($a AS BIGINT) AS DOUBLE)"
        else s"trunc($a)"))
      // bankers' rounding: rint is IEEE half-even on doubles
      .pipe(t => rewriteCall(t, "round_even") { a =>
        splitTopLevel(a) match {
          case Seq(x, n) => s"(rint(($x) * power(10, $n)) / power(10, $n))"
          case _ => s"round_even($a)"
        }
      })
      // list_sum(a): no Spark twin — left-fold with a double accumulator
      // (the dialect's list_sum returns DOUBLE on double lists; integer
      // uses render differently and fail the gate rather than mis-sum)
      .pipe(t => rewriteCall(t, "list_sum")(a =>
        s"aggregate($a, CAST(0 AS DOUBLE), (s, x) -> s + x)"))
      // list_slice(l, b, e) is 1-based INCLUSIVE-end; slice takes length
      .pipe(t => rewriteCall(t, "list_slice") { a =>
        splitTopLevel(a) match {
          case Seq(l, b, e) => s"slice($l, $b, ($e) - ($b) + 1)"
          case _ => s"list_slice($a)"
        }
      })
      // list_reduce(l, λ): fold with l[1] as the seed (no-init fold)
      .pipe(t => rewriteCall(t, "list_reduce") { a =>
        splitTopLevel(a) match {
          case Seq(l, lam) =>
            s"reduce(slice($l, 2, size($l) - 1), element_at($l, 1), $lam)"
          case _ => s"list_reduce($a)"
        }
      })
      // dialect regexp_extract_all defaults to group 0 (whole match);
      // Spark's defaults to group 1
      .pipe(t => rewriteCall(t, "regexp_extract_all") { a =>
        if (splitTopLevel(a).size == 2) s"regexp_extract_all($a, 0)"
        else s"regexp_extract_all($a)"
      })
      // 1-arg encode(s) = utf8 bytes; Spark's encode wants the charset
      .pipe(t => rewriteCall(t, "encode")(a =>
        if (splitTopLevel(a).size > 1) s"encode($a)" else s"encode($a, 'UTF-8')"))
    "(\\d+)".r.replaceAllIn(rewritten, m =>
      java.util.regex.Matcher.quoteReplacement(literals(m.group(1).toInt)))
  }

  /** Replace every boundary-anchored `name(args)` call in `sql` with
    * `f(args)`, matching the closing paren by depth (regexes can't).
    * Quoted parens inside args would miscount — none of the gated texts
    * have them, and a miscount fails the round-trip gate visibly. */
  private def rewriteCall(sql: String, name: String)(f: String => String): String = {
    val pat = name + "("
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val j = sql.indexOf(pat, i)
      if (j < 0) { sb.append(sql.substring(i)); i = sql.length }
      else {
        val boundary = j == 0 ||
          (!sql.charAt(j - 1).isLetterOrDigit && sql.charAt(j - 1) != '_')
        if (!boundary) { sb.append(sql.substring(i, j + pat.length)); i = j + pat.length }
        else {
          sb.append(sql.substring(i, j))
          var k = j + pat.length
          var depth = 1
          while (depth > 0 && k < sql.length) {
            val c = sql.charAt(k)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            k += 1
          }
          sb.append(f(sql.substring(j + pat.length, k - 1)))
          i = k
        }
      }
    }
    sb.toString
  }

  /** Split a call's argument text at top-level commas (paren-depth 0). */
  private def splitTopLevel(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    args.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == ',' && depth == 0) { out += cur.toString.trim; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString.trim
    out.toSeq
  }

  /** Library function registrations a SQL-only session needs before the
    * texts resolve: the [[graft.functions.DuckCompat]] native compat
    * pack (epoch_us, sha256, string_split, range, quantile_cont, … —
    * each delegating to Spark's builtin expression builders so codegen
    * and generator use survive), the custom codegen Expression behind
    * nfc_normalize, the scalar UDF pair behind fn_udf_registry, and the
    * ngrams/context_ngrams typed Aggregators as SQL-callable UDAFs —
    * the CREATE TEMPORARY FUNCTION half of the reference's UDF
    * lifecycle. Idempotent. */
  def registerCompat(spark: SparkSession): Unit = {
    graft.functions.UnicodeNormalize.register(spark)
    graft.functions.GapFunctions.registerAll(spark)
    graft.functions.DuckCompat.register(spark)
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    spark.udf.register("ngrams_topk",
      udaf(new graft.functions.NGramsAgg(2, 20), ExpressionEncoder[Seq[String]]()))
    spark.udf.register("context_ngrams_topk",
      udaf(new graft.functions.ContextNGramsAgg(Seq("data"), 10),
        ExpressionEncoder[Seq[String]]()))
  }

  /** Registered queries deliberately NOT in the SQL surface, each with
    * its one-line justification (SURVEY §3.4; `SqlSurfaceSpec` asserts
    * surface ∪ excluded = the full registry, so a new query must land in
    * one or the other). Reason shorthands: "reconstruction oracle" = the
    * oracle SQL predicts the operator's OUTPUT rather than expressing
    * the operation, so running it as a SQL entry would exercise nothing;
    * "gate-divergent" = a translated text runs but fails exact-row
    * equality with the builder (usually a 1e-6 quantizer boundary where
    * the oracle text's double path differs from the builder's), and a
    * surface entry that doesn't match its builder is worse than none. */
  val excluded: Map[String, String] = {
    val srcSink = Seq("src_avro_roundtrip", "src_csv_malformed",
      "src_csv_roundtrip", "src_json_roundtrip", "src_rcfile_roundtrip",
      "src_regex_text", "src_sequencefile", "src_xml_roundtrip",
      "sink_orc_roundtrip", "sink_partitioned_parquet",
      "sink_sharded_export")
      .map(_ -> ("the write/read round-trip IS the operator; " +
        "reconstruction oracle"))
    val streams = Seq("stream_dedup_first", "stream_enrich",
      "stream_interval_join", "stream_session", "stream_sliding",
      "stream_stateful_sessions", "stream_topk_types", "stream_tumbling",
      "stream_watermark_drop")
      .map(_ -> ("Structured Streaming lifecycle op — entry is " +
        "readStream/writeStream (twins in StreamingSpec), not a batch " +
        "SQL string"))
    val lifecycle = Seq(
      "merge_upsert" -> "MERGE table-lifecycle op; reconstruction oracle predicts the post-merge table",
      "mv_rebuild" -> "materialized-view build/use/rebuild lifecycle; reconstruction oracle")
    val iterative = Seq(
      "llm_bpe_train" -> "iterative merge-training loop; the unrolled oracle text blows Spark's analyzer iteration cap",
      "llm_bpe_encode" -> "applies the trained merge table iteratively; same unrolled-text analyzer cap",
      "llm_dedup_cc" -> "connected components — oracle uses WITH RECURSIVE … UNION (distinct), which Spark 4 recursive CTEs don't support (UNION ALL only)",
      "llm_semdedup_cc" -> "same recursive-CTE UNION limitation as llm_dedup_cc",
      "llm_cluster_sample" -> "same recursive-CTE UNION limitation as llm_dedup_cc")
    val vectorDialect = Seq(
      "llm_ann_lsh" -> "hyperplane-LSH oracle dots sign-bit INT arrays, outside dot_product's double-array signature",
      "llm_ann_ivf_trained" -> "Lloyd-refined IVF — oracle leans on in-aggregate ORDER BY list() DuckDB syntax",
      "llm_ann_pq" -> "PQ codebook training — in-aggregate ORDER BY list() plus packed-long arg_min dialect",
      "llm_ann_ivfpq" -> "IVF-PQ composition of the two above",
      "llm_random_proj" -> "projection matrix built with in-aggregate ORDER BY list()",
      "llm_embed_neardup" -> "LSH bucket pipeline over sign-bit INT arrays (as llm_ann_lsh)",
      "llm_semdedup" -> "within-cell pair pipeline whose oracle reuses the llm_ann_lsh sign-bit dialect",
      "llm_matryoshka_recall" -> "nested prefix-slice-of-slice syntax (v[1:16] inside lambdas) beyond the mechanical rewrite",
      "llm_mmr_rerank" -> "oracle uses QUALIFY, which Spark SQL does not support",
      "llm_minhash_calibration" -> "gate-divergent: double rendering of the probability curve differs at the last digit")
    val gateDivergent = Seq(
      "llm_collocations" -> "gate-divergent: PMI quantizer boundary (1e-6) flips on Spark's double path",
      "llm_lm_kn" -> "gate-divergent: Kneser-Ney backoff quantizer boundary flips on Spark's double path",
      "llm_gopher_rules" -> "gate-divergent: the dialect's ends_with over a list has no Spark twin; one rule column differs",
      "llm_corpus_pipeline_v2" -> "gate-divergent: multi-stage hex-cast variant filters every row under the rewrite",
      "llm_domain_mix" -> "hex-string cast buried in a nested expression the 0x-idiom rewrite doesn't reach",
      "llm_text_normalize" -> "gate-divergent: DuckDB's nfc_normalize disagrees with JDK Normalizer on the planted denormalized forms",
      "fn_string2" -> "gate-divergent: one split_part corner differs between the engines",
      "llm_pii_scrub" -> "oracle regex patterns are RE2 ('+[0-9]' literal plus); Java regex rejects them")
    val syntax = Seq(
      "join_asof" -> "ASOF JOIN syntax — not in Spark SQL; the builder expresses it as the window composition (join_asof_tol's oracle spelling IS in the surface)",
      "graph_triangles" -> "oracle relies on DuckDB lateral column-alias scoping Spark's analyzer rejects",
      "llm_fim" -> "DuckDB positional-join/ntile split syntax beyond the mechanical rewrite",
      "llm_chunk_split" -> "DuckDB table-function alias syntax beyond the mechanical rewrite",
      "llm_pack_sequences" -> "DuckDB table-function alias syntax beyond the mechanical rewrite",
      "llm_chunk_scrub" -> "rewritten text trips Spark's variant-access parse of the chunk map; builder is the surface",
      "llm_dup_chunks" -> "same variant-access parse issue as llm_chunk_scrub",
      "llm_winnow" -> "same variant-access parse issue as llm_chunk_scrub",
      "llm_fingerprint" -> "list_reduce applied to a lambda variable — the no-init fold rewrite can't type it",
      "llm_media_manifest" -> "oracle indexes STRINGS with [] (char extraction) — indistinguishable textually from list indexing",
      "llm_multimodal" -> "binary-payload op; oracle reconstructs via string indexing (as llm_media_manifest)",
      "llm_multimodal_decode" -> "binary-payload decode op; same string-indexing reconstruction",
      "seq_dau_wau" -> "generator nested inside an arithmetic expression (day + unnest(range)) — Spark requires generators at the top level",
      "seq_matchpath_counts" -> "in-aggregate ORDER BY inside list() with an expression head the listagg rewrite doesn't cover",
      "llm_span_corrupt" -> "correlated alias scoping inside the corruption CTE chain Spark's analyzer rejects",
      "fn_variant" -> "DuckDB json_extract returns quoted JSON fragments; Spark's get_json_object unquotes — same data, different rendering",
      "fn_hash_extra" -> "no oracle exists (sha1/crc32/murmur3/xxhash64/soundex absent from the oracle engine); exact values pinned in FunctionsSpec")
    (srcSink ++ streams ++ lifecycle ++ iterative ++ vectorDialect ++
      gateDivergent ++ syntax).toMap
  }

  /** Execute one surface query: register the fixture views and the
    * compat functions/macros, then run the text. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.Tables.registerAll(spark, sfDir)
    registerCompat(spark)
    spark.sql(sql(name))
  }
}
