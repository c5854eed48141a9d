package graft

/**
 * DuckDB oracle SQL for every SQL-expressible query in [[SparkEntry.queries]].
 * Each statement mirrors the Spark plan's semantics EXACTLY, including
 * float rounding, hash construction (md5-prefix → 60-bit int), regex flags
 * (DuckDB `regexp_replace` needs 'g'), null propagation and tie-breaks.
 * Integer aggregates are cast to BIGINT (DuckDB sums to HUGEINT otherwise).
 */
object OracleSql {

  // shared fragments -------------------------------------------------------
  /** 60-bit portable hash of a SQL string expression (matches Text.portableHash). */
  private def hx(e: String) = s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"
  /** normalized text (matches Text.normalize). */
  private def norm(e: String) = s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"
  /** whitespace tokens of trimmed text (matches Text.tokens). */
  private def toks(e: String) =
    s"list_filter(string_split_regex(trim($e), '\\s+'), x -> x <> '')"

  private val stopAll = graft.text.Text.Stopwords.values.flatten.toSeq.distinct
    .map(w => s"'$w'").mkString(", ")

  private def langCase: String = {
    val cnt = graft.text.Text.Langs.map { l =>
      val words = graft.text.Text.Stopwords(l).map(w => s"'$w'").mkString(", ")
      l -> s"len(list_filter(${toks("lower(text)")}, x -> x IN ($words)))"
    }
    val best = cnt.map(_._2).mkString("greatest(", ", ", ")")
    val whens = cnt.map { case (l, e) => s"WHEN $e = __best AND __best > 0 THEN '$l'" }
      .mkString(" ")
    s"(SELECT CASE $whens ELSE 'und' END FROM (SELECT $best AS __best))"
  }

  // quality score fragments (mirror Text.qualityScore exactly, incl. op order)
  private val qualitySql = {
    val n = s"CAST(len(${toks("text")}) AS DOUBLE)"
    val lenScore = s"least($n / 100.0, 1.0)"
    val punctRatio =
      s"(CASE WHEN length(text) = 0 OR text IS NULL THEN 0.0 ELSE " +
      s"CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END)"
    val wsRatio =
      s"(CASE WHEN length(text) = 0 OR text IS NULL THEN 0.0 ELSE " +
      s"CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / length(text) END)"
    val punctOk = s"(1.0 - least($punctRatio * 4.0, 1.0))"
    val avgWordLen = s"(CASE WHEN $n = 0 THEN 0.0 ELSE " +
      s"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / $n END)"
    val wordLenOk = s"(CASE WHEN $avgWordLen BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)"
    val wsOk = s"(1.0 - least($wsRatio * 2.0, 1.0))"
    s"round($lenScore * 0.4 + $punctOk * 0.2 + $wordLenOk * 0.2 + $wsOk * 0.2, 4)"
  }

  /** shingle list (k=3 word shingles of normalized text, matches Text.shingles). */
  private def shingles3(e: String) = {
    val tk = toks(norm(e))
    s"(CASE WHEN len($tk) <= 3 THEN [array_to_string($tk, ' ')] " +
    s"ELSE list_transform(generate_series(1, len($tk) - 2), i -> array_to_string(($tk)[i:i+2], ' ')) END)"
  }

  // Slot i hashes md5(shingle || '#' || i/2); even slots take hex chars 1-15,
  // odd slots chars 16-30 (two 60-bit hashes per digest — matches MinHashSig).
  private def minhashSlot(i: Int) = {
    val digest = s"md5(s || '#${i / 2}')"
    val sub = if (i % 2 == 0) s"substring($digest, 1, 15)" else s"substring($digest, 16, 15)"
    s"list_min(list_transform(${shingles3("text")}, s -> CAST(('0x' || $sub) AS BIGINT)))"
  }

  private val simhash16 = {
    val hashes = s"list_transform(${toks(norm("text"))}, t -> ${hx("t")})"
    val bits = (0 until 16).map { b =>
      s"(CASE WHEN 2 * len(list_filter(__h, h -> (h >> $b) & 1 = 1)) > len(__h) THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"(SELECT $bits FROM (SELECT $hashes AS __h))"
  }

  private val cosSql = {
    val dotQN = "list_sum(list_transform(generate_series(1, len(q_vec)), i -> CAST(q_vec[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
    val nQ = "sqrt(list_sum(list_transform(generate_series(1, len(q_vec)), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))"
    val nC = "sqrt(list_sum(list_transform(generate_series(1, len(embedding)), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
    s"(CASE WHEN $nQ * $nC = 0.0 THEN 0.0 ELSE $dotQN / ($nQ * $nC) END)"
  }

  // ------------------------------------------------------------------- map
  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_column_profile" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
        | CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
        | round(min(l_extendedprice), 2) AS min_price,
        | round(max(l_extendedprice), 2) AS max_price,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | CAST(sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_discounts
        |FROM lineitem""".stripMargin,

    "q03_topk_values" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt
        |FROM part GROUP BY 1 ORDER BY cnt DESC, p_brand ASC LIMIT 5""".stripMargin,

    "q04_unique_rule" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS dup_count
        |FROM orders GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    "q05_ref_integrity" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_size <= 25)
        |GROUP BY 1""".stripMargin,

    "q06_validation_status" ->
      """SELECT event_id,
        | CASE WHEN m1 OR m2 OR m3 OR m4 OR m5 THEN 'FAIL' ELSE 'PASS' END AS _val_status,
        | concat_ws(' | ',
        |   CASE WHEN m1 THEN 'event_type required' END,
        |   CASE WHEN m2 THEN 'unknown event_type' END,
        |   CASE WHEN m3 THEN 'value out of range' END,
        |   CASE WHEN m4 THEN 'props not json-ish' END,
        |   CASE WHEN m5 THEN 'view below min value' END) AS _val_reason
        |FROM (SELECT event_id,
        |  (event_type IS NULL OR trim(CAST(event_type AS VARCHAR)) = '') AS m1,
        |  (NOT coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE)) AS m2,
        |  (value IS NULL OR value < 0.01 OR value > 400.0) AS m3,
        |  (NOT coalesce(regexp_matches(props, '^\{.*\}$'), FALSE)) AS m4,
        |  (NOT coalesce(value >= 10 OR event_type <> 'view', FALSE)) AS m5
        | FROM events)""".stripMargin,

    "q06b_rule_summary" ->
      """SELECT 'required(event_type)' AS rule_id, CAST(sum(CASE WHEN event_type IS NULL OR trim(CAST(event_type AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS failed_count FROM events
        |UNION ALL SELECT 'allowed_values(event_type)', CAST(sum(CASE WHEN NOT coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |UNION ALL SELECT 'numeric_range(value)', CAST(sum(CASE WHEN value IS NULL OR value < 0.01 OR value > 400.0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |UNION ALL SELECT 'pattern_json(props)', CAST(sum(CASE WHEN NOT coalesce(regexp_matches(props, '^\{.*\}$'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |UNION ALL SELECT 'formula(value)', CAST(sum(CASE WHEN NOT coalesce(value >= 10 OR event_type <> 'view', FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM events""".stripMargin,

    "q07_dedup_keep_latest" ->
      """SELECT user_id, event_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "q08_running_window" ->
      """SELECT event_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events WHERE user_id < 5""".stripMargin,

    "q09_join_revenue" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,

    "q10_dup_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS distinct_keys,
        | CAST(sum(cnt - 1) AS BIGINT) AS duplicate_rows,
        | CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS keys_with_dups
        |FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey)""".stripMargin,

    "q11_impute_median" ->
      """SELECT event_id,
        | round(coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END,
        |   (SELECT quantile_cont(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 0.5) FROM events)), 2) AS value_imputed
        |FROM events""".stripMargin,

    "q12_outlier_clip" ->
      """SELECT l_returnflag,
        | round(sum(least(greatest(l_extendedprice, 1000.0), 50000.0)), 2) AS sum_clipped,
        | CAST(sum(CASE WHEN l_extendedprice < 1000.0 OR l_extendedprice > 50000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q12b_iqr_bounds" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 2) AS q1,
        | round(quantile_cont(l_extendedprice, 0.5), 2) AS median,
        | round(quantile_cont(l_extendedprice, 0.75), 2) AS q3
        |FROM lineitem""".stripMargin,

    "q13_text_stats" ->
      s"""SELECT doc_id,
         | CAST(len(${toks("text")}) AS INT) AS n_tokens,
         | CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe_tokens,
         | round(CASE WHEN length(text) = 0 OR text IS NULL THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS punct_ratio,
         | round(CASE WHEN len(${toks("text")}) = 0 THEN 0.0 ELSE CAST(len(list_filter(${toks("lower(text)")}, x -> x IN ($stopAll))) AS DOUBLE) / len(${toks("text")}) END, 4) AS stopword_ratio
         |FROM documents""".stripMargin,

    "q14_lang_quality" ->
      s"""SELECT doc_id, $langCase AS lang_guess, $qualitySql AS quality
         |FROM documents""".stripMargin,

    "q15_fingerprint" ->
      s"""SELECT doc_id, ${hx(norm("text"))} AS fingerprint FROM documents""",

    "q16_exact_dedup_prefix" ->
      s"""SELECT ${hx("prefix")} AS prefix_hash,
         | CAST(cnt AS BIGINT) AS dup_count, keep_id
         |FROM (SELECT substring(${norm("text")}, 1, 64) AS prefix,
         |        count(*) AS cnt, min(doc_id) AS keep_id
         |      FROM documents GROUP BY 1 HAVING count(*) > 1)""".stripMargin,

    "q17_minhash_sig" ->
      s"""SELECT doc_id, ${minhashSlot(0)} AS mh0, ${minhashSlot(1)} AS mh1,
         | ${minhashSlot(2)} AS mh2, ${minhashSlot(3)} AS mh3
         |FROM documents""".stripMargin,

    "q18_simhash" ->
      s"""SELECT doc_id, CAST($simhash16 AS BIGINT) AS simhash16 FROM documents""",

    "q19_cosine_top1" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10)
         |SELECT q_id AS query_id, vec_id AS neighbor_id, round(cos, 4) AS cos FROM (
         |  SELECT q.q_id, e.vec_id, $cosSql AS cos,
         |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, e.vec_id ASC) AS rn
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
         |WHERE rn = 1""".stripMargin,

    "q22_normalize_text" ->
      """SELECT event_id,
        | upper(substring(trim(event_type), 1, 1)) || lower(substring(trim(event_type), 2)) AS type_title,
        | CASE WHEN regexp_matches(trim(CAST(event_type AS VARCHAR)), '^(?i)(nan|none|null|n/a|na|unknown)?$')
        |      THEN NULL ELSE CAST(event_type AS VARCHAR) END AS type_std
        |FROM events""".stripMargin,

    "q23_numeric_coercion" ->
      """SELECT event_id,
        | round(TRY_CAST(regexp_replace(regexp_replace('$' || CAST(value AS VARCHAR), '[^0-9.\-+eE,]', '', 'g'), ',', '', 'g') AS DOUBLE), 2) AS value_coerced
        |FROM events""".stripMargin,

    "q35_cell_diff" ->
      """SELECT 'event_type' AS "column", CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS changed_cells FROM events
        |UNION ALL SELECT 'props', CAST(0 AS BIGINT) FROM (SELECT 1)
        |UNION ALL SELECT 'ts', CAST(0 AS BIGINT) FROM (SELECT 1)
        |UNION ALL SELECT 'user_id', CAST(0 AS BIGINT) FROM (SELECT 1)
        |UNION ALL SELECT 'value', CAST(0 AS BIGINT) FROM (SELECT 1)""".stripMargin,

    "q27_quality_score" ->
      """WITH t AS (SELECT CAST(count(*) AS DOUBLE) AS total,
        |  sum(CASE WHEN event_type IS NULL OR trim(CAST(event_type AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS c1,
        |  sum(CASE WHEN NOT coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) THEN 1 ELSE 0 END) AS c2,
        |  sum(CASE WHEN value IS NULL OR value < 0.01 OR value > 400.0 THEN 1 ELSE 0 END) AS c3,
        |  sum(CASE WHEN NOT coalesce(regexp_matches(props, '^\{.*\}$'), FALSE) THEN 1 ELSE 0 END) AS c4,
        |  sum(CASE WHEN NOT coalesce(value >= 10 OR event_type <> 'view', FALSE) THEN 1 ELSE 0 END) AS c5
        | FROM events),
        |p AS (SELECT round(least(c1/total*5.0*10.0, 15.0), 2) + round(least(c2/total*5.0*10.0, 15.0), 2)
        |           + round(least(c3/total*5.0*10.0, 15.0), 2) + round(least(c4/total*5.0*10.0, 15.0), 2)
        |           + round(least(c5/total*5.0*10.0, 15.0), 2) AS pen FROM t)
        |SELECT greatest(0.0, round(100.0 - pen, 2)) AS score, round(pen, 2) AS penalty_total FROM p""".stripMargin,

    "q24_boolean_coercion" ->
      """SELECT event_id,
        | CASE WHEN lower(trim(CASE WHEN value > 100 THEN 'yes' ELSE 'OFF' END)) IN ('true','yes','y','1','t','on','enabled') THEN TRUE
        |      WHEN lower(trim(CASE WHEN value > 100 THEN 'yes' ELSE 'OFF' END)) IN ('false','no','n','0','f','off','disabled') THEN FALSE
        |      ELSE NULL END AS flag
        |FROM events""".stripMargin
  )
}
