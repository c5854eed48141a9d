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

  /** shingle list (k word shingles of normalized text, matches Text.shingles). */
  private def shinglesK(e: String, k: Int) = {
    val tk = toks(norm(e))
    s"(CASE WHEN len($tk) <= $k THEN [array_to_string($tk, ' ')] " +
    s"ELSE list_transform(generate_series(1, len($tk) - ${k - 1}), i -> array_to_string(($tk)[i:i+${k - 1}], ' ')) END)"
  }
  private def shingles3(e: String) = shinglesK(e, 3)

  // Slot i hashes md5(shingle || '#' || i/2); even slots take hex chars 1-15,
  // odd slots chars 16-30 (two 60-bit hashes per digest — matches MinHashSig).
  private def minhashSlotOver(i: Int, shinglesExpr: String) = {
    val digest = s"md5(s || '#${i / 2}')"
    val sub = if (i % 2 == 0) s"substring($digest, 1, 15)" else s"substring($digest, 16, 15)"
    s"list_min(list_transform($shinglesExpr, s -> CAST(('0x' || $sub) AS BIGINT)))"
  }
  private def minhashSlot(i: Int) = minhashSlotOver(i, shingles3("text"))

  /** Sign-bit hyperplane LSH bucket of an embedding list column `e` — the
    * literal-plane math of Similarity.planeVector/planeBit re-derived in SQL. */
  private def bucketSql(e: String, planes: Int) = (0 until planes).map { p =>
    val comp = s"((CAST(('0x' || substring(md5('pl$p#' || CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 1000.0 - 0.5)"
    val proj = s"list_sum(list_transform(range(1, len($e) + 1), i -> CAST($e[i] AS DOUBLE) * $comp))"
    s"(CASE WHEN $proj >= 0 THEN ${1L << p} ELSE 0 END)"
  }.mkString("(", " + ", ")")

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

  // -------------------------------------------------------- fixture oracles
  /** Absolute read_parquet() path for a materialized fixture (written by the
    * query side via [[graft.fixtures.Fixtures.peoplePq]]/`docsPq` BEFORE the
    * driver runs the oracle, so DuckDB reads the identical rows). */
  private def fx(name: String) =
    s"read_parquet('${graft.fixtures.Fixtures.fixturePath(name)}/*.parquet')"

  /** coerceNumeric (Cleaners.coerceNumeric): strip non-numeric chars, drop
    * thousands commas, try-cast; empty → null. */
  private def coerceNum(e: String) =
    s"TRY_CAST(nullif(trim(regexp_replace(regexp_replace(CAST($e AS VARCHAR), '[^0-9.\\-+eE,]', '', 'g'), ',', '', 'g')), '') AS DOUBLE)"

  /** parseDateMulti (Cleaners.DateFormats order). */
  private def parseDate(e: String) = Seq(
    "%Y-%m-%d", "%d-%m-%Y", "%m/%d/%Y", "%d/%m/%Y", "%Y/%m/%d",
    "%Y-%m-%d %H:%M:%S", "%d-%m-%Y %H:%M:%S")
    .map(f => s"try_strptime(CAST($e AS VARCHAR), '$f')")
    .mkString("coalesce(", ", ", ")")

  /** parseDateOrSerial: Excel serial (epoch 1899-12-30, window 10000-100000)
    * takes precedence, then the multi-format parse. Returns a DATE expr. */
  private def parseDateOrSerial(e: String) =
    s"""(CASE WHEN TRY_CAST($e AS DOUBLE) BETWEEN 10000 AND 100000
       | THEN DATE '1899-12-30' + CAST(TRY_CAST($e AS DOUBLE) AS INT)
       | ELSE CAST(${parseDate(e)} AS DATE) END)""".stripMargin.replace("\n", " ")

  /** Spark initcap for the single-word values in the people fixture
    * (ucfirst; the fixture has no multi-word strings in cleaned columns). */
  private def ucfirst(e: String) =
    s"(upper(substring($e, 1, 1)) || lower(substring($e, 2)))"

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

    // MinHash LSH bands (k=16, 4 bands of 4 rows): band key = md5-60 of the
    // comma-joined band slots; candidates share ANY band key
    "q17b_minhash_pairs" -> {
      val slots = (0 until 16).map(i => s"${minhashSlotOver(i, "sh")} AS s${i}")
        .mkString(", ")
      val bandKeys = (0 until 4).map { b =>
        val joined = (0 until 4).map(r => s"CAST(s${b * 4 + r} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"${hx(s"($joined)")} AS k$b"
      }.mkString(", ")
      val anyBand = (0 until 4).map(b => s"a.k$b = b.k$b").mkString(" OR ")
      s"""WITH d AS (SELECT doc_id, ${shingles3("text")} AS sh FROM documents),
         |s AS (SELECT doc_id, $slots FROM d),
         |k AS (SELECT doc_id, $bandKeys FROM s)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM k a JOIN k b ON a.doc_id < b.doc_id AND ($anyBand)""".stripMargin
    },

    // exact all-pairs n-gram Jaccard ≥ 0.3 (the Spark side's prefix-filtered
    // join must find EVERY qualifying pair — recall 1.0 is part of the check)
    "q20_ngram_jaccard" ->
      s"""WITH s AS (SELECT doc_id, list_distinct(${shingles3("text")}) AS sh FROM documents)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) AS j
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |WHERE j >= 0.3""".stripMargin,

    // deterministic hash split: same md5-bucket formula as
    // Sampling.hashSplitColumn (portable hash % 10000; 80/10/10 boundaries
    // at 8000/9000)
    "q40_hash_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN doc_id IS NULL THEN NULL
         |       WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        ${hx("CAST(doc_id AS VARCHAR)")} % 10000 AS b
         |      FROM documents)""".stripMargin,

    // per-source quota: 10 smallest distinct doc_ids per source (the Spark
    // side computes this as one bounded-state aggregate)
    "q41_source_quota" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM (SELECT DISTINCT source, doc_id FROM documents
         |        WHERE doc_id IS NOT NULL))
         |WHERE rn <= 10""".stripMargin,

    // stratified deterministic mixture sample: per-lang keep thresholds over
    // the SALTED portable hash (the salt decouples the keep decision from
    // q40's split buckets — same md5 formula, '#strata'-suffixed input)
    "q42_stratified_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ${hx("CAST(doc_id AS VARCHAR) || '#strata'")} % 10000 AS b
         |  FROM documents WHERE doc_id IS NOT NULL)
         |WHERE b < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 10000
         |               WHEN 'es' THEN 2500 WHEN 'de' THEN 1000 ELSE 0 END""".stripMargin,

    // corpus token heavy hitters: the Spark side computes this with the
    // Misra–Gries summary in its exact regime (capacity > vocabulary), so
    // the exact GROUP BY is the right oracle; same (cnt desc, value asc)
    // deterministic tie-break on both sides
    "q43_token_heavy_hitters" ->
      s"""SELECT tok AS value, CAST(count(*) AS BIGINT) AS cnt
         |FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |      FROM documents WHERE text IS NOT NULL)
         |WHERE tok <> ''
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 15""".stripMargin,

    // intra-document repetition: duplicate-bigram fraction over the same
    // k=2 word shingles as the Spark side (1 - distinct/total)
    "q44_repetition" ->
      s"""SELECT doc_id,
         |  round(1.0 - CAST(len(list_distinct(${shinglesK("text", 2)})) AS DOUBLE)
         |              / len(${shinglesK("text", 2)}), 4) AS rep_2gram
         |FROM documents WHERE text IS NOT NULL""".stripMargin,

    // decontamination: winnowed fingerprints (min of each w-window of
    // portable k-gram hashes, distinct) joined corpus × eval-subset
    "q45_decontamination" -> {
      val h = s"list_transform(${shinglesK("text", 5)}, s -> ${hx("s")})"
      val winnow = s"list_distinct(CASE WHEN len($h) <= 4 THEN [list_min($h)] " +
        s"ELSE list_transform(generate_series(1, len($h) - 3), i -> list_min(($h)[i:i+3])) END)"
      s"""WITH f AS (SELECT doc_id, unnest($winnow) AS fp FROM documents
         |           WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         |e AS (SELECT doc_id AS eval_id, fp FROM f WHERE doc_id % 7 = 0)
         |SELECT DISTINCT f.doc_id, e.eval_id
         |FROM f JOIN e USING (fp) WHERE f.doc_id <> e.eval_id""".stripMargin
    },

    // transitive near-dup clusters: the q20 exact pair set closed under
    // connectivity (recursive CTE label reachability; cluster = min doc_id).
    // Mirrors Components.connectedComponents over ngramJaccardPairs.
    "q39_neardup_clusters" ->
      s"""WITH RECURSIVE
         |s AS (SELECT doc_id, list_distinct(${shingles3("text")}) AS sh FROM documents),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT DISTINCT u, u FROM edges
         |  UNION
         |  SELECT e.v, r.lbl FROM edges e JOIN reach r ON e.u = r.id)
         |SELECT id AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
         |FROM reach GROUP BY id""".stripMargin,

    // hyperplane-LSH ANN top-1 (4 planes): bucket-equality join + exact cosine
    "q19b_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM e WHERE vec_id < 10)
         |SELECT q_id AS query_id, vec_id AS neighbor_id, round(cos, 4) AS cos FROM (
         |  SELECT q.q_id, e.vec_id, $cosSql AS cos,
         |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, e.vec_id ASC) AS rn
         |  FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.q_id)
         |WHERE rn = 1""".stripMargin,

    // embedding near-dup pairs (2 planes, cos ≥ 0.4): bucket join + verify
    "q21_embedding_neardup" -> {
      val dotAB = "list_sum(list_transform(range(1, len(ea) + 1), i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))"
      val nrm = (e: String) => s"sqrt(list_sum(list_transform(range(1, len($e) + 1), i -> CAST($e[i] AS DOUBLE) * CAST($e[i] AS DOUBLE))))"
      s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", 2)} AS bucket,
         |  ${nrm("embedding")} AS nrm FROM embeddings)
         |SELECT id_a, id_b, round(cos, 4) AS cos FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
         |         ELSE (SELECT $dotAB FROM (SELECT a.embedding AS ea, b.embedding AS eb)) / (a.nrm * b.nrm) END AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.4""".stripMargin
    },

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
        |FROM events""".stripMargin,

    // A16-A21 over events (6 columns; string cols event_type/props are never
    // all-null in the testdata, so the conformance/len-std averages simplify
    // to a plain 2-col mean — matching Metrics.validityAndConsistency)
    "q34_quality_dimensions" ->
      """WITH s AS (SELECT
        |  CAST(count(*) AS DOUBLE) AS nrows,
        |  CAST(sum(CAST(event_id IS NULL AS INT) + CAST(ts IS NULL AS INT) + CAST(user_id IS NULL AS INT)
        |         + CAST(event_type IS NULL AS INT) + CAST(value IS NULL AS INT) + CAST(props IS NULL AS INT)) AS DOUBLE) AS missing,
        |  sum(CASE WHEN isinf(value) THEN 1 ELSE 0 END) AS inf,
        |  sum(CASE WHEN event_type = '' THEN 1 ELSE 0 END) + sum(CASE WHEN props = '' THEN 1 ELSE 0 END) AS empties,
        |  CAST(sum(CASE WHEN TRY_CAST(event_type AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS cast_et,
        |  CAST(sum(CASE WHEN event_type IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn_et,
        |  CAST(sum(CASE WHEN TRY_CAST(props AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS cast_pr,
        |  CAST(sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn_pr,
        |  stddev_samp(CAST(length(event_type) AS DOUBLE)) AS std_et,
        |  stddev_samp(CAST(length(props) AS DOUBLE)) AS std_pr
        | FROM events),
        |d AS (SELECT CAST(coalesce(sum(cnt - 1), 0) AS DOUBLE) AS dups
        |      FROM (SELECT count(*) AS cnt FROM events GROUP BY event_id, ts, user_id, event_type, value, props)),
        |m AS (SELECT
        |  (nrows * 6 - missing) * 100.0 / (nrows * 6) AS comp,
        |  (greatest(cast_et / nn_et, 1 - cast_et / nn_et) + greatest(cast_pr / nn_pr, 1 - cast_pr / nn_pr)) / 2 * 100.0 AS conf,
        |  (inf + empties) * 0.01 AS pen,
        |  (std_et + std_pr) / 2 AS lenstd,
        |  dups * 100.0 / nrows AS dup_pct
        | FROM s, d)
        |SELECT round(comp, 4) AS completeness_pct, round(conf, 4) AS conformance_pct,
        | round(dup_pct, 4) AS dup_row_pct,
        | round(round((comp * 0.30 + greatest(0, 100 - pen) * (conf / 100.0) * 0.25
        |   + greatest(0, 100 - lenstd) * 0.20 + greatest(0, 100 - dup_pct) * 0.15) * 100) / 100.0, 2) AS score
        |FROM m""".stripMargin
  ) ++ fixtureOracles ++ mediaOracles

  // ---------------------------------------------------- semantic / engine
  /** Oracles that re-derive fixture-query semantics in pure SQL over the
    * materialized fixture parquet (people / docs) — fully independent
    * re-implementations of the Spark plans, not golden pins. */
  private def fixtureOracles: Map[String, String] = {
    val people = fx("people")
    val docs = fx("docs_20000_8")

    // --- q28: per-rule issue counts (SemanticValidators.validate over people)
    val nameMask =
      "Name IS NOT NULL AND len(string_split_regex(trim(CAST(Name AS VARCHAR)), '\\s+')) < 2"
    val ageNum = coerceNum("Age")
    val ageMask = s"($ageNum < 0 OR $ageNum > 120)"
    val phoneMask =
      "Phone IS NOT NULL AND NOT regexp_matches(regexp_replace(CAST(Phone AS VARCHAR), '\\D', '', 'g'), '^\\d{10}$')"
    val emailMask =
      "Email IS NOT NULL AND NOT regexp_matches(lower(CAST(Email AS VARCHAR)), '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$')"
    val locTitle =
      s"(Location IS NOT NULL AND trim(CAST(Location AS VARCHAR)) = ${ucfirst("trim(CAST(Location AS VARCHAR))")})"
    val genderMask =
      "Gender IS NOT NULL AND lower(CAST(Gender AS VARCHAR)) NOT IN ('male','female','other','m','f','o','unknown')"
    val dobParsed = parseDate("DOB")
    val crossDobMask =
      s"($dobParsed IS NOT NULL AND $ageNum IS NOT NULL AND " +
      s"abs(date_diff('day', CAST($dobParsed AS DATE), DATE '2026-01-01') / 365.25 - $ageNum) > 2)"
    val dobFutureMask = s"($dobParsed > TIMESTAMP '2026-01-01 00:00:00')"

    val q28 =
      s"""SELECT * FROM (
         | SELECT 'Name' AS "column", 'NAME_format' AS rule_id, 'WARNING' AS severity,
         |   CAST(sum(CASE WHEN $nameMask THEN 1 ELSE 0 END) AS BIGINT) AS rows_affected FROM $people HAVING sum(CASE WHEN $nameMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'Phone', 'PHONE_format', 'ERROR',
         |   CAST(sum(CASE WHEN $phoneMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $phoneMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'Email', 'EMAIL_format', 'ERROR',
         |   CAST(sum(CASE WHEN $emailMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $emailMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'DOB', 'DOB_range', 'ERROR',
         |   CAST(sum(CASE WHEN $dobFutureMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $dobFutureMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'Age', 'AGE_range', 'ERROR',
         |   CAST(sum(CASE WHEN $ageMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $ageMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'Gender', 'GENDER_standard', 'WARNING',
         |   CAST(sum(CASE WHEN $genderMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $genderMask THEN 1 ELSE 0 END) > 0
         | UNION ALL SELECT 'Location', 'LOCATION_style', 'INFO',
         |   CAST(round(sum(CASE WHEN Location IS NOT NULL THEN 1 ELSE 0 END) * (1.0 - avg(CASE WHEN $locTitle THEN 1.0 ELSE 0.0 END))) AS BIGINT)
         |   FROM $people HAVING avg(CASE WHEN $locTitle THEN 1.0 ELSE 0.0 END) > 0.1 AND avg(CASE WHEN $locTitle THEN 1.0 ELSE 0.0 END) < 0.9
         | UNION ALL SELECT 'DOB <> Age', 'CROSS_DOB_AGE_MISMATCH', 'WARNING',
         |   CAST(sum(CASE WHEN $crossDobMask THEN 1 ELSE 0 END) AS BIGINT) FROM $people HAVING sum(CASE WHEN $crossDobMask THEN 1 ELSE 0 END) > 0
         |)""".stripMargin

    // --- q29: semantic cleaners (C27-C36) over people
    val dos = parseDateOrSerial("DOB")
    val cleanName =
      s"""(CASE WHEN Name IS NULL THEN NULL
         | ELSE nullif(regexp_replace(${ucfirst("trim(CAST(Name AS VARCHAR))")}, '[^\\w\\s\\-'']', '', 'g'), '') END)"""
        .stripMargin.replace("\n", " ")
    val q29 =
      s"""SELECT $cleanName AS "Name",
         | strftime($dos, '%Y-%m-%d') AS "DOB",
         | TRY_CAST(CAST(Age AS VARCHAR) AS DOUBLE) AS "Age",
         | (CASE WHEN Phone IS NULL THEN NULL
         |   WHEN length(regexp_replace(CAST(Phone AS VARCHAR), '\\D', '', 'g')) = 10
         |     THEN '+91-' || regexp_replace(CAST(Phone AS VARCHAR), '\\D', '', 'g')
         |   ELSE nullif(regexp_replace(CAST(Phone AS VARCHAR), '\\D', '', 'g'), '') END) AS "Phone",
         | (CASE WHEN Email IS NULL THEN NULL ELSE nullif(lower(trim(CAST(Email AS VARCHAR))), '') END) AS "Email",
         | ${ucfirst("trim(CAST(Location AS VARCHAR))")} AS "Location",
         | (CASE WHEN lower(trim(CAST(Gender AS VARCHAR))) IN ('m','male','man') THEN 'Male'
         |   WHEN lower(trim(CAST(Gender AS VARCHAR))) IN ('f','female','woman') THEN 'Female'
         |   WHEN lower(trim(CAST(Gender AS VARCHAR))) IN ('o','other') THEN 'Other'
         |   ELSE 'Unknown' END) AS "Gender"
         |FROM $people""".stripMargin

    // --- q30/q31: full engine semantics over the materialized docs fixture.
    // Violation flags mirror Rules.failureMask + UniquenessCheck + RI exactly.
    val docFlags =
      s"""SELECT part, doc_id,
         | coalesce(doc_id IS NULL OR trim(doc_id) = '', TRUE) AS v_req,
         | coalesce(spans IS NULL OR len(spans) = 0, TRUE) AS v_empty,
         | coalesce(len(list_filter(range(2, len(spans)+1), i -> coalesce(spans[i].offset, -2147483648) <= coalesce(spans[i-1].offset, -2147483648))) > 0, FALSE) AS v_mono,
         | coalesce(len(list_filter(spans, s -> CASE WHEN s.kind = 'text' THEN (s.text IS NULL OR s.media_ref IS NOT NULL) ELSE (s.media_ref IS NULL OR s.text IS NOT NULL) END)) > 0, FALSE) AS v_field,
         | coalesce(len(list_filter(spans, s -> s.media_ref IS NOT NULL AND TRY_CAST(substring(s.media_ref, 7) AS BIGINT) >= 1000)), 0) AS n_dangling
         |FROM $docs""".stripMargin
    val dupKeys =
      s"SELECT doc_id FROM $docs WHERE doc_id IS NOT NULL GROUP BY 1 HAVING count(*) > 1"

    val q30 =
      s"""WITH d AS ($docFlags), u AS ($dupKeys),
         |f AS (SELECT part, coalesce(doc_id, chr(1)) AS k,
         |  (v_req OR v_empty OR v_mono OR v_field OR n_dangling > 0
         |   OR (doc_id IS NOT NULL AND doc_id IN (SELECT doc_id FROM u))) AS anyv FROM d),
         |g AS (SELECT part, k, anyv, max(anyv) OVER (PARTITION BY part, k) AS gv FROM f)
         |SELECT CAST(part AS INT) AS part, CAST(count(*) AS BIGINT) AS total_rows,
         | CAST(count(*) - sum(CASE WHEN gv THEN 1 ELSE 0 END) AS BIGINT) AS passed,
         | CAST(sum(CASE WHEN gv THEN 1 ELSE 0 END) AS BIGINT) AS failed,
         | CASE WHEN sum(CASE WHEN gv THEN 1 ELSE 0 END) > 0 THEN 'FAIL' ELSE 'PASS' END AS status,
         | CAST(6 AS INT) AS rules_evaluated
         |FROM g GROUP BY part""".stripMargin

    val q31 =
      s"""WITH d AS ($docFlags), u AS ($dupKeys)
         |SELECT * FROM (
         | SELECT 'required(doc_id)' AS rule_id, CAST(sum(CASE WHEN v_req THEN 1 ELSE 0 END) AS BIGINT) AS n FROM d
         | UNION ALL SELECT 'spans_non_empty', CAST(sum(CASE WHEN v_empty THEN 1 ELSE 0 END) AS BIGINT) FROM d
         | UNION ALL SELECT 'span_offsets_monotonic', CAST(sum(CASE WHEN v_mono THEN 1 ELSE 0 END) AS BIGINT) FROM d
         | UNION ALL SELECT 'span_field_consistency', CAST(sum(CASE WHEN v_field THEN 1 ELSE 0 END) AS BIGINT) FROM d
         | UNION ALL SELECT 'referential_integrity(media_ref)', CAST(sum(n_dangling) AS BIGINT) FROM d
         | UNION ALL SELECT 'unique(doc_id)', CAST(count(*) AS BIGINT) FROM d WHERE doc_id IN (SELECT doc_id FROM u)
         |) WHERE n > 0""".stripMargin

    // --- q33: RuleGenerator bindings over people (keyword semantics + SQL
    // null counts; handle_missing re-derives the planner's decision ladder)
    def q33Line(c: String, semType: String, handleSem: String) = {
      val hm =
        if (handleSem.nonEmpty) "''"
        else s"(CASE WHEN sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) > 0 THEN 'fill_with_mode' ELSE 'do_nothing' END)"
      s"""SELECT '$c' AS "column", '$semType' AS semantic_type, '$handleSem' AS handle_semantic,
         | $hm AS handle_missing,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count FROM $people"""
        .stripMargin.replace("\n", " ")
    }
    val q33 = Seq(
      q33Line("Name", "GENERAL", ""),
      q33Line("DOB", "DOB", "normalize_date"),
      q33Line("Age", "AGE", "calculate_age_from_dob"),
      q33Line("Phone", "PHONE", "validate_phone"),
      q33Line("Email", "EMAIL", "validate_email"),
      q33Line("Location", "GENERAL", ""),
      q33Line("Gender", "GENERAL", "")).mkString(" UNION ALL ")

    // --- q36: Scorer.score penalty breakdown (scorer.py:10-45 weights
    // ERROR 5 / WARNING 2 / INFO 0.5, penalty = rows/total·w·10 cap 15)
    val crossNeMask = { // V9: no name token (len>2) in the email local part
      val user = "substring(lower(CAST(Email AS VARCHAR)), 1, CASE WHEN strpos(lower(CAST(Email AS VARCHAR)), '@') > 0 THEN strpos(lower(CAST(Email AS VARCHAR)), '@') - 1 ELSE length(Email) END)"
      val toks = s"list_filter(string_split_regex(lower(CAST(Name AS VARCHAR)), '\\s+'), t -> length(t) > 2)"
      s"""(Name IS NOT NULL AND Email IS NOT NULL AND contains(CAST(Email AS VARCHAR), '@')
         | AND len($toks) > 0
         | AND NOT coalesce(len(list_filter($toks, t -> contains($user, t))) > 0, FALSE)
         | AND NOT coalesce(len($toks) >= 2 AND contains($user, substring(($toks)[1], 1, 1) || ($toks)[-1]), FALSE))"""
        .stripMargin.replace("\n", " ")
    }
    val q36 =
      s"""WITH c AS (SELECT CAST(count(*) AS DOUBLE) AS total,
         |  sum(CASE WHEN $nameMask THEN 1 ELSE 0 END) AS n_name,
         |  sum(CASE WHEN $phoneMask THEN 1 ELSE 0 END) AS n_phone,
         |  sum(CASE WHEN $emailMask THEN 1 ELSE 0 END) AS n_email,
         |  sum(CASE WHEN $dobFutureMask THEN 1 ELSE 0 END) AS n_dob,
         |  sum(CASE WHEN $ageMask THEN 1 ELSE 0 END) AS n_age,
         |  sum(CASE WHEN $genderMask THEN 1 ELSE 0 END) AS n_gender,
         |  CAST(round(sum(CASE WHEN Location IS NOT NULL THEN 1 ELSE 0 END)
         |    * (1.0 - avg(CASE WHEN $locTitle THEN 1.0 ELSE 0.0 END))) AS BIGINT) AS n_loc,
         |  avg(CASE WHEN $locTitle THEN 1.0 ELSE 0.0 END) AS loc_ratio,
         |  sum(CASE WHEN $crossDobMask THEN 1 ELSE 0 END) AS n_cross,
         |  sum(CASE WHEN $crossNeMask THEN 1 ELSE 0 END) AS n_ne
         | FROM $people),
         |lines AS (
         |  SELECT 'NAME_format' AS rule, 'WARNING' AS severity, CAST(n_name AS BIGINT) AS "rows", round(least(n_name/total*2*10, 15.0), 2) AS penalty FROM c WHERE n_name > 0
         |  UNION ALL SELECT 'PHONE_format', 'ERROR', CAST(n_phone AS BIGINT), round(least(n_phone/total*5*10, 15.0), 2) FROM c WHERE n_phone > 0
         |  UNION ALL SELECT 'EMAIL_format', 'ERROR', CAST(n_email AS BIGINT), round(least(n_email/total*5*10, 15.0), 2) FROM c WHERE n_email > 0
         |  UNION ALL SELECT 'DOB_range', 'ERROR', CAST(n_dob AS BIGINT), round(least(n_dob/total*5*10, 15.0), 2) FROM c WHERE n_dob > 0
         |  UNION ALL SELECT 'AGE_range', 'ERROR', CAST(n_age AS BIGINT), round(least(n_age/total*5*10, 15.0), 2) FROM c WHERE n_age > 0
         |  UNION ALL SELECT 'GENDER_standard', 'WARNING', CAST(n_gender AS BIGINT), round(least(n_gender/total*2*10, 15.0), 2) FROM c WHERE n_gender > 0
         |  UNION ALL SELECT 'LOCATION_style', 'INFO', n_loc, round(least(n_loc/total*0.5*10, 15.0), 2) FROM c WHERE loc_ratio > 0.1 AND loc_ratio < 0.9
         |  UNION ALL SELECT 'CROSS_DOB_AGE_MISMATCH', 'WARNING', CAST(n_cross AS BIGINT), round(least(n_cross/total*2*10, 15.0), 2) FROM c WHERE n_cross > 0
         |  UNION ALL SELECT 'CROSS_NAME_EMAIL_MISMATCH', 'INFO', CAST(n_ne AS BIGINT), round(least(n_ne/total*0.5*10, 15.0), 2) FROM c WHERE n_ne > 0)
         |SELECT rule, severity, "rows", penalty FROM lines
         |UNION ALL SELECT 'TOTAL', '', 0, round((SELECT sum(penalty) FROM lines), 2)
         |UNION ALL SELECT 'SCORE', '', 0, greatest(0.0, round(100 - (SELECT sum(penalty) FROM lines), 2))""".stripMargin

    // --- q37: template-bound rules run through the validation engine
    // (Pattern semantics: null FAILS, pandas na=False)
    val emailFail = "NOT coalesce(regexp_matches(CAST(Email AS VARCHAR), '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$'), FALSE)"
    val phoneFail = "NOT coalesce(regexp_matches(CAST(Phone AS VARCHAR), '^\\+?1?\\d{9,15}$'), FALSE)"
    val ageNumRaw = "TRY_CAST(CAST(Age AS VARCHAR) AS DOUBLE)"
    val q37 =
      s"""SELECT 'pattern_Email(Email)' AS rule_id, CAST(sum(CASE WHEN $emailFail THEN 1 ELSE 0 END) AS BIGINT) AS failed_count FROM $people
         |UNION ALL SELECT 'pattern_Phone(Phone)', CAST(sum(CASE WHEN $phoneFail THEN 1 ELSE 0 END) AS BIGINT) FROM $people
         |UNION ALL SELECT 'whole_number(Age)', CAST(sum(CASE WHEN $ageNumRaw IS NULL OR $ageNumRaw % 1 <> 0 THEN 1 ELSE 0 END) AS BIGINT) FROM $people
         |UNION ALL SELECT 'numeric_range(Age)', CAST(sum(CASE WHEN $ageNumRaw IS NULL OR $ageNumRaw < 0 OR $ageNumRaw > 120 THEN 1 ELSE 0 END) AS BIGINT) FROM $people""".stripMargin

    // --- q38: A22 + A23 folds; completeness/missingness from the semantic
    // clean (q29's SQL as a CTE), importance from the initial frame, step
    // logs pinned to (verify: 2 issues/3 warnings, schema: 5 conv/1 err,
    // dedup: 0 removed)
    def impOf(c: String) =
      s"(0.5 + CAST(count(DISTINCT $c) AS DOUBLE) / count(*) * 0.3 - avg(CAST($c IS NULL AS INT)) * 0.4)"
    def wOf(e: String) = s"(CASE WHEN $e >= 0.7 THEN 2.0 WHEN $e >= 0.4 THEN 1.0 ELSE 0.5 END)"
    val pCols = Seq("Name", "DOB", "Age", "Phone", "Email", "Location", "Gender")
    val q38 =
      s"""WITH cleaned AS ($q29),
         |imp AS (SELECT ${pCols.map(c => s"${impOf(c)} AS i_$c").mkString(", ")} FROM $people),
         |cm AS (SELECT CAST(count(*) AS DOUBLE) AS nrows,
         |  CAST(sum(${pCols.map(c => s"""CAST("$c" IS NULL AS INT)""").mkString(" + ")}) AS DOUBLE) AS miss,
         |  ${pCols.map(c => s"""avg(CAST("$c" IS NULL AS INT)) * 100.0 AS mp_$c""").mkString(", ")}
         | FROM cleaned),
         |dup AS (SELECT CAST(coalesce(sum(cnt - 1), 0) AS DOUBLE) AS idups
         |  FROM (SELECT count(*) AS cnt FROM $people GROUP BY ${pCols.mkString(", ")})),
         |cdup AS (SELECT CAST(coalesce(sum(cnt - 1), 0) AS DOUBLE) AS cdups
         |  FROM (SELECT count(*) AS cnt FROM cleaned GROUP BY ${pCols.map(c => s""""$c"""").mkString(", ")})),
         |folds AS (SELECT
         |  least(40.0, (1 - miss / (nrows * 7)) * 100 * 0.4) AS comp,
         |  25.5 AS validity, 1.5 AS consistency,
         |  (CASE WHEN idups = 0 THEN 10.0 ELSE 5.0 END) AS uniq,
         |  greatest(0.0, least(100.0, round(100.0
         |    - (${pCols.map(c => s"mp_$c * 0.8 * ${wOf(s"i_$c")}").mkString(" + ")}) / 7
         |    - (cdups * 100.0 / nrows) * 2.0, 1))) AS a23
         | FROM cm, imp, dup, cdup)
         |SELECT round(comp, 4) AS a22_completeness, round(validity, 4) AS a22_validity,
         | round(consistency, 4) AS a22_consistency, round(uniq, 4) AS a22_uniqueness,
         | round(comp + validity + consistency + uniq, 2) AS a22_overall,
         | round(a23, 1) AS a23_score
         |FROM folds""".stripMargin

    Map("q28_semantic_issues" -> q28, "q29_semantic_clean" -> q29,
        "q30_engine_verdicts" -> q30, "q31_engine_violations" -> q31,
        "q33_rule_generation" -> q33, "q36_semantic_report" -> q36,
        "q37_rule_templates" -> q37, "q38_report_scores" -> q38)
  }

  // ------------------------------------------------------------- multimodal
  /** q32: the synthetic asset payload is md5-derived, so DuckDB can rebuild
    * the full payload hex and every portable metadata column from the id. */
  private def mediaOracles: Map[String, String] = {
    val fs = (0 until 8).map { i =>
      s"CAST(CAST(('0x' || substring(md5(substring(hx, ${i * 8 + 1}, 16)), 1, 15)) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS f$i"
    }.mkString(",\n | ")
    Map("q32_media_metadata" ->
      s"""WITH a AS (SELECT id,
         |  (CASE CAST(id % 3 AS INT) WHEN 0 THEN 'ffd8ff00' WHEN 1 THEN '89504e47' ELSE '49443303' END)
         |   || md5(CAST(id AS VARCHAR)) || md5(CAST(id + 1 AS VARCHAR)) AS hx
         | FROM range(0, 500) t(id))
         |SELECT 'asset-' || CAST(id AS VARCHAR) AS asset_id,
         | CASE WHEN upper(hx) LIKE 'FFD8FF%' THEN 'jpeg'
         |      WHEN upper(hx) LIKE '89504E47%' THEN 'png'
         |      WHEN upper(hx) LIKE '47494638%' THEN 'gif'
         |      WHEN upper(hx) LIKE '49443303%' OR upper(hx) LIKE 'FFFB%' THEN 'mp3'
         |      WHEN upper(hx) LIKE '00000018%' OR upper(hx) LIKE '00000020%' THEN 'mp4'
         |      ELSE 'unknown' END AS sniffed_format,
         | CAST(length(hx) / 2 AS BIGINT) AS n_bytes,
         | CAST(('0x' || substring(md5(hx), 1, 15)) AS BIGINT) AS checksum,
         | $fs
         |FROM a""".stripMargin)
  }
}
