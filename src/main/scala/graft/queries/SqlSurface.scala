package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    "agg_approx_ndv", "agg_basic", "agg_bits", "agg_boolean",
    "agg_covar_corr", "agg_cube", "agg_grouping_sets", "agg_histogram",
    "agg_mode", "agg_multi_distinct", "agg_pivot", "agg_regr",
    "agg_rollup", "agg_sum_empty_zero", "agg_variance",
    "bloom_prefilter", "cte_chain",
    "fn_conditional", "fn_sql_macro", "fn_virtual_cols", "fn_xpath",
    "gen_inline", "gen_stack",
    "join_anti", "join_broadcast", "join_cross", "join_full", "join_left",
    "join_multiway", "join_range_bin", "join_right", "join_salted",
    "join_semi", "join_smb", "join_theta",
    "llm_dedup_rows", "local_values",
    "q1_pricing_summary", "q5_local_supplier",
    "seq_gini", "seq_matchpath",
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
        |ORDER BY o_orderkey""".stripMargin)

  /** name → runnable Spark SQL text. */
  lazy val sql: Map[String, String] = {
    val oracle = graft.SparkEntry.oracleSql
    fromOracle.map(n => n -> oracle(n)).toMap ++ custom
  }

  /** Execute one surface query: register the fixture views, run the text. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.Tables.registerAll(spark, sfDir)
    spark.sql(sql(name))
  }
}
