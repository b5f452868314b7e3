package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caching._
import graft.core.Tables

/** Training-corpus hygiene operators a 100 TB pipeline runs before any
  * tokens reach a trainer: benchmark decontamination, PII redaction, and
  * deterministic domain-mixture sampling. All three are pure DataFrame
  * plans with DuckDB oracles; none exist in the reference (it is a RAG
  * chat app) — they extend the engine per the build mandate, reusing the
  * reference's corpus conventions (space tokenization as in app.py:284).
  */
object CurationQueries {

  /** Distinct 8-token shingles of a `toks` array column, guarded for short
    * docs (Spark's sequence(1, n) with n < 1 would count DOWN). */
  private def gramsExpr(toksCol: String) =
    expr(s"""CASE WHEN size($toksCol) >= 8 THEN
            |  array_distinct(transform(sequence(1, size($toksCol) - 7),
            |    i -> concat_ws(' ', slice($toksCol, i, 8))))
            |ELSE array() END""".stripMargin)

  private val gramsSql =
    // DuckDB list slice t[i:i+7] is 1-based inclusive = 8 elements
    """CASE WHEN len(t) >= 8 THEN
      |  list_distinct(list_transform(generate_series(1, len(t) - 7),
      |    i -> array_to_string(t[i:i+7], ' ')))
      |ELSE [] END""".stripMargin

  // --- q70: benchmark decontamination ---------------------------------------
  /** Decontamination: flag training docs that share any 8-token shingle
    * with a held-out eval set (the n-gram-overlap rule public LLM corpora
    * apply before training). Eval = every 19th doc; the training side is
    * the rest PLUS planted leaks (eval docs truncated to their first 90%
    * of tokens, id + 2,000,000) so the detector provably fires.
    *
    * Plan shape at 100 TB: the eval shingle dictionary is tiny relative
    * to the corpus — broadcast it; the training side streams through a
    * BroadcastHashJoin (no shuffle of corpus shingles) and the per-doc
    * overlap count is a partial-aggregable count by doc_id. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .select(col("doc_id"), col("toks"))
    val eval = d.filter(col("doc_id") % 19 === 0)
    // grams travel and join as xxhash64 longs — the broadcast dictionary
    // and the corpus-side stream shrink ~6× vs ~50-byte gram strings; the
    // oracle joins the strings themselves, so a hash collision (which
    // would inflate a count) fails the bit-exact comparison loudly
    val evalGrams = eval
      .select(explode(transform(gramsExpr("toks"), g => xxhash64(g))).as("gram")).distinct()
    val train = d.filter(col("doc_id") % 19 =!= 0)
      .unionByName(eval.select(
        (col("doc_id") + 2000000L).as("doc_id"),
        expr("slice(toks, 1, greatest(CAST(floor(size(toks) * 0.9) AS INT), 1))").as("toks")))
    train
      .select(col("doc_id"), explode(transform(gramsExpr("toks"), g => xxhash64(g))).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      // grams are distinct per doc AND distinct on the eval side, so a
      // plain count is the distinct-overlap count — no countDistinct shuffle
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .orderBy(col("doc_id"))
  }

  val decontaminateOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
       |  FROM documents),
       |  ev AS (SELECT doc_id, t FROM d WHERE doc_id % 19 = 0),
       |  evg AS (SELECT DISTINCT unnest($gramsSql) AS gram FROM ev),
       |  train AS (
       |    SELECT doc_id, t FROM d WHERE doc_id % 19 <> 0
       |    UNION ALL
       |    SELECT doc_id + 2000000 AS doc_id,
       |           t[1:greatest(CAST(floor(len(t) * 0.9) AS INT), 1)] AS t
       |    FROM ev),
       |  tg AS (SELECT doc_id, unnest($gramsSql) AS gram FROM train)
       |SELECT doc_id, count(*) AS n_shared_ngrams
       |FROM tg JOIN evg USING (gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- q71: PII detection + redaction ---------------------------------------
  /** PII scrub: detect and mask emails, phone numbers, and IPv4 addresses
    * with codegen'd regexp built-ins (no UDFs). The driver corpus is
    * synthetic lowercase prose with no real PII, so deterministic PII is
    * injected first (keyed by doc_id) and the redactor is measured against
    * it — same injection in the oracle. Patterns stay in the RE2-safe
    * subset (character classes, +, {m,n}; no backreferences/lookaround) so
    * Java regex and DuckDB RE2 agree byte-for-byte. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailPat = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val phonePat = "555-[0-9]{4}"
    val ipPat = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    Tables.documents(spark, dir)
      .withColumn("dirty",
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
          .when(col("doc_id") % 4 === 1,
            concat(col("text"), lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" server 10.0."), col("doc_id") % 256, lit(".7 up")))
          .otherwise(col("text")))
      .withColumn("n_emails", size(expr(s"regexp_extract_all(dirty, '$emailPat', 0)")).cast("bigint"))
      .withColumn("n_phones", size(expr(s"regexp_extract_all(dirty, '$phonePat', 0)")).cast("bigint"))
      .withColumn("n_ips", size(expr(s"regexp_extract_all(dirty, '$ipPat', 0)")).cast("bigint"))
      .withColumn("clean",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("dirty"), emailPat, "<EMAIL>"),
            ipPat, "<IP>"),
          phonePat, "<PHONE>"))
      // ship a digest of the cleaned text, not 1000-char strings, plus the
      // structural witness that no PII pattern survives
      .withColumn("clean_fp", sha2(col("clean"), 256))
      .withColumn("residual_pii",
        (size(expr(s"regexp_extract_all(clean, '$emailPat', 0)"))
          + size(expr(s"regexp_extract_all(clean, '$phonePat', 0)"))
          + size(expr(s"regexp_extract_all(clean, '$ipPat', 0)"))).cast("bigint"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        col("residual_pii"), col("clean_fp"))
      .orderBy(col("doc_id"))
  }

  val piiRedactOracle: String = {
    val emailPat = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val phonePat = "555-[0-9]{4}"
    val ipPat = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    s"""WITH dirty AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN doc_id % 4 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
       |      WHEN doc_id % 4 = 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
       |      WHEN doc_id % 4 = 2 THEN text || ' server 10.0.' || (doc_id % 256) || '.7 up'
       |      ELSE text END AS dirty
       |  FROM documents),
       |  cleaned AS (
       |  SELECT doc_id, dirty,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(dirty, '$emailPat', '<EMAIL>', 'g'),
       |        '$ipPat', '<IP>', 'g'),
       |      '$phonePat', '<PHONE>', 'g') AS clean
       |  FROM dirty)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(dirty, '$emailPat')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(dirty, '$phonePat')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(dirty, '$ipPat')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(clean, '$emailPat'))
       |     + len(regexp_extract_all(clean, '$phonePat'))
       |     + len(regexp_extract_all(clean, '$ipPat')) AS BIGINT) AS residual_pii,
       |  sha256(clean) AS clean_fp
       |FROM cleaned ORDER BY doc_id""".stripMargin
  }

  /** The 100 TB shape of q70 when the EVAL SUITE itself is huge: a
    * two-phase bloom-prefiltered decontamination. Phase 1 aggregates the
    * eval shingles into a Bloom filter (`bloom_filter_agg`, ~1 bit/gram
    * vs ~10 B/gram for the exact broadcast dictionary) and prefilters the
    * training gram stream with the codegen `might_contain`; phase 2 runs
    * the EXACT broadcast join only on the survivors. Bloom filters have
    * no false negatives, so the output is IDENTICAL to q70 — same DuckDB
    * oracle, bit-exact — while false positives cost only wasted phase-2
    * work (bounded by the configured bits/item), never wrong answers.
    * DecontaminateBloomSpec pins q70b ≡ q70 and the might_contain plan. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .select(col("doc_id"), col("toks"))
    val eval = d.filter(col("doc_id") % 19 === 0)
    val evalGrams = eval
      .select(explode(transform(gramsExpr("toks"), g => xxhash64(g))).as("gram")).distinct()
    // 1 M expected items / 8 M bits ≈ 2% false-positive rate — sized for
    // the sf1 rung with headroom; at 100 TB this is the knob that trades
    // bloom size against wasted exact-phase work. Spark 4.1 keeps
    // bloom_filter_agg/might_contain in the INTERNAL function registry
    // (not resolvable from SQL text), so both are constructed directly —
    // and BloomFilterMightContain requires its filter side to be foldable
    // or a scalar subquery (the shape Spark's own InjectRuntimeFilter
    // emits), hence Dataset.scalar() rather than a broadcast crossJoin.
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    val bloomScalar = evalGrams.agg(
      Bridge.column(new BloomFilterAggregate(
        Bridge.expression(col("gram")), CLit(1000000L), CLit(8000000L)
      ).toAggregateExpression()).as("bf")).scalar()
    val train = d.filter(col("doc_id") % 19 =!= 0)
      .unionByName(eval.select(
        (col("doc_id") + 2000000L).as("doc_id"),
        expr("slice(toks, 1, greatest(CAST(floor(size(toks) * 0.9) AS INT), 1))").as("toks")))
    train
      .select(col("doc_id"), explode(transform(gramsExpr("toks"), g => xxhash64(g))).as("gram"))
      .filter(Bridge.column(new BloomFilterMightContain(
        Bridge.expression(bloomScalar), Bridge.expression(col("gram")))))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .orderBy(col("doc_id"))
  }

  /** Shared content fingerprint for q72/q72b selection: the first 60 bits
    * of md5(text) as a non-negative BIGINT. Both engines emit identical
    * lowercase md5 hex, so the value is cross-engine exact, and md5 is a
    * single C-implemented pass over the bytes — no per-character array
    * materialization (the previous HOF char-fold cost ~2.4 s alone on the
    * 16×-docs rung). A production run can swap in `xxhash64(text)` (no
    * cryptographic cost); selection semantics are unchanged — any
    * deterministic uniform content hash works as the rank/threshold key. */
  private[queries] val fpExpr =
    "cast(conv(substring(md5(cast(text as binary)), 1, 15), 16, 10) as bigint)"

  private[queries] val fpSql =
    "CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)"

  // --- q72: deterministic domain-mixture sampling ---------------------------
  /** Domain mixing: down-sample each source to hit a target mixture
    * (src0-src4 15%, src5-src9 5% — basis points, so quota arithmetic is
    * pure integer division and cross-engine exact). The achievable total
    * T = min over sources of n_s·10000 ÷ w_s; each source keeps its
    * w_s·T ÷ 10000 lowest docs by content fingerprint — reproducible
    * (re-running selects the same docs), unlike rand()-based sample().
    *
    * Plan: one tiny counts agg (broadcast back), then rank-per-source —
    * the rank <= quota filter compiles to WindowGroupLimit so each
    * source's sort prunes map-side. At 100 TB the exact-quota rank sort is
    * the cost; the documented relaxation is hash-threshold selection
    * (fp % 10000 < rate), which is shuffle-free but only approximates the
    * quota. */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBp = expr("CASE WHEN CAST(substring(source, 4, 8) AS INT) <= 4 THEN 1500 ELSE 500 END")
    val docs = Tables.documents(spark, dir)
      .withColumn("w_bp", wBp)
      .withColumn("fp", expr(fpExpr))
    val counts = docs.groupBy(col("source"), col("w_bp"))
      .agg(count(lit(1)).as("n_avail"))
    // `div` (Spark's integral division) mirrors DuckDB's `//` exactly at
    // any magnitude; `/` on longs is double division + truncation, which
    // can disagree with integer division by half an ULP past ~2^40.
    val t = counts.agg(min(expr("n_avail * 10000 div w_bp")).cast("long").as("t"))
    val quotas = counts.crossJoin(broadcast(t))
      .withColumn("quota", expr("w_bp * t div 10000").cast("long"))
      .select(col("source"), col("n_avail"), col("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("fp"), col("doc_id"))
    docs.join(broadcast(quotas), Seq("source"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("quota"))
      .groupBy(col("source"), col("n_avail"), col("quota"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))
  }

  val domainMixOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN CAST(substring(source, 4, 8) AS INT) <= 4 THEN 1500 ELSE 500 END AS w_bp,
      |    $fpSql AS fp
      |  FROM documents),
      |  counts AS (
      |  SELECT source, w_bp, count(*) AS n_avail FROM d GROUP BY source, w_bp),
      |  t AS (SELECT min(n_avail * 10000 // w_bp) AS t FROM counts),
      |  quotas AS (
      |  SELECT source, n_avail, w_bp * t // 10000 AS quota FROM counts CROSS JOIN t),
      |  ranked AS (
      |  SELECT d.source, d.n_chars, quotas.n_avail, quotas.quota,
      |         row_number() OVER (PARTITION BY d.source ORDER BY d.fp, d.doc_id) AS rnk
      |  FROM d JOIN quotas USING (source))
      |SELECT source, n_avail, quota,
      |       count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
      |FROM ranked WHERE rnk <= quota
      |GROUP BY source, n_avail, quota ORDER BY source""".stripMargin

  /** The 100 TB relaxation of q72: instead of an exact per-source rank
    * (which needs a per-source sort), keep a doc iff its content
    * fingerprint falls under the source's keep-rate threshold — a pure
    * filter, shuffle-free until the final rollup, at the cost of hitting
    * the quota only in expectation. Rates are integer basis points of the
    * same quota arithmetic as q72, so both engines select identical docs. */
  def domainMixHash(spark: SparkSession, dir: String): DataFrame = {
    val wBp = expr("CASE WHEN CAST(substring(source, 4, 8) AS INT) <= 4 THEN 1500 ELSE 500 END")
    val docs = Tables.documents(spark, dir)
      .withColumn("w_bp", wBp)
      .withColumn("fp", expr(fpExpr))
    val counts = docs.groupBy(col("source"), col("w_bp"))
      .agg(count(lit(1)).as("n_avail"))
    val t = counts.agg(min(expr("n_avail * 10000 div w_bp")).cast("long").as("t"))
    val rates = counts.crossJoin(broadcast(t))
      .withColumn("quota", expr("w_bp * t div 10000").cast("long"))
      .withColumn("rate_bp", expr("quota * 10000 div n_avail").cast("long"))
      .select(col("source"), col("n_avail"), col("quota"), col("rate_bp"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(col("fp"), lit(10000L)) < col("rate_bp"))
      .groupBy(col("source"), col("n_avail"), col("quota"), col("rate_bp"))
      .agg(count(lit(1)).as("n_kept"))
      .withColumn("quota_err", col("n_kept") - col("quota"))
      .orderBy(col("source"))
  }

  val domainMixHashOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN CAST(substring(source, 4, 8) AS INT) <= 4 THEN 1500 ELSE 500 END AS w_bp,
      |    $fpSql AS fp
      |  FROM documents),
      |  counts AS (
      |  SELECT source, w_bp, count(*) AS n_avail FROM d GROUP BY source, w_bp),
      |  t AS (SELECT min(n_avail * 10000 // w_bp) AS t FROM counts),
      |  rates AS (
      |  SELECT source, n_avail, w_bp * t // 10000 AS quota,
      |         (w_bp * t // 10000) * 10000 // n_avail AS rate_bp
      |  FROM counts CROSS JOIN t)
      |SELECT source, n_avail, quota, rate_bp,
      |       count(*) AS n_kept, count(*) - quota AS quota_err
      |FROM d JOIN rates USING (source)
      |WHERE fp % 10000 < rate_bp
      |GROUP BY source, n_avail, quota, rate_bp ORDER BY source""".stripMargin

  // --- q76: deterministic train/val/test split ------------------------------
  /** Hash-bucket holdout split (80/10/10): a doc's split is a pure
    * function of its CONTENT fingerprint, so the assignment is (a)
    * reproducible run-to-run with no RNG state, (b) stable as the corpus
    * grows — appending docs never reassigns an existing one, unlike
    * position- or rand()-based splits where any reshuffle leaks val docs
    * into train — and (c) exact-dup-consistent: byte-identical docs land
    * in the same split, so a train/val leak needs a near-dup, not a copy.
    * Shuffle-free (a projection; the final ORDER BY is presentation),
    * embarrassingly parallel at 100 TB. Same md5-prefix fingerprint as
    * q72 — cross-engine exact. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("bucket", pmod(expr(fpExpr), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  val trainSplitOracle: String =
    s"""SELECT doc_id, $fpSql % 100 AS bucket,
       |  CASE WHEN $fpSql % 100 < 80 THEN 'train'
       |       WHEN $fpSql % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- q131: deterministic per-key reservoir sample --------------------------
  /** Fixed-size uniform sample per stratum (k=10 docs per source) with no
    * RNG state: priority = the md5 content fingerprint (q72/q76's hash
    * family), rank within each source by (priority, doc_id). A content
    * hash is uniform over the key space, so the k smallest priorities are
    * a uniform without-replacement draw per key — reproducible
    * run-to-run, stable under repartitioning, and append-monotone (a new
    * doc only enters the sample by displacing the current max priority),
    * none of which Spark's rand()/TABLESAMPLE gives. This is the
    * inspect-k-per-source / eval-subset op every curation pipeline runs.
    *
    * 100 TB shape: rank ≤ k compiles to WindowGroupLimit (plan-asserted
    * in PlanShapeSpec) — every map task keeps its local top-k per key
    * BEFORE the exchange, so the shuffle carries ≤ k·|keys| rows per
    * task, never the corpus, and no global sort exists anywhere. */
  def reservoirSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("pri", expr(fpExpr))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank"), col("doc_id"), col("pri"))
      .orderBy(col("source"), col("rank"))
  }

  val reservoirSampleOracle: String =
    s"""WITH f AS (SELECT source, doc_id, $fpSql AS pri FROM documents),
       |  r AS (SELECT source, doc_id, pri,
       |          CAST(row_number() OVER (PARTITION BY source
       |            ORDER BY pri, doc_id) AS INTEGER) AS rank
       |        FROM f)
       |SELECT source, rank, doc_id, pri FROM r WHERE rank <= 10
       |ORDER BY source, rank""".stripMargin

  // --- q78: deterministic global shuffle ------------------------------------
  /** Reproducible training-data shuffle: every epoch-0 data-loader needs
    * the corpus in a uniform pseudorandom order that is IDENTICAL across
    * re-runs, resumable mid-epoch, and shard-addressable (worker w reads
    * shard w). A content-hash sort delivers all three with no RNG state:
    * shard = fp mod N routes each doc by hash range (shuffle-free routing,
    * same fingerprint family as q72/q76), pos = rank of fp within the
    * shard. Re-shuffling per epoch = salt the hash with the epoch number.
    *
    * At 100 TB each shard sorts independently (repartition by shard, sort
    * within partitions — no global sort, no driver bottleneck); the
    * output (doc_id, shard, pos) is the manifest a data loader consumes. */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("fp"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("fp", expr(fpExpr))
      .withColumn("shard", pmod(col("fp"), lit(8L)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val globalShuffleOracle: String =
    s"""WITH f AS (SELECT doc_id, $fpSql AS fp FROM documents)
       |SELECT doc_id, CAST(fp % 8 AS INTEGER) AS shard,
       |       CAST(row_number() OVER (PARTITION BY fp % 8
       |              ORDER BY fp, doc_id) - 1 AS BIGINT) AS pos
       |FROM f ORDER BY shard, pos""".stripMargin

  // --- q97: DSIR importance weighting (Xie et al. 2023) ---------------------
  /** Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS —
    * public paper): score every raw document by how target-like its
    * hashed-bigram distribution is. Features are word bigrams hashed into
    * B=1024 buckets (the paper's hashed n-gram generative model); the
    * target domain here is `source = 'src0'`; both unigram-over-bucket
    * models are Laplace-smoothed, and a document's log importance weight
    * is sum over its buckets of count * (ln p_target - ln p_raw).
    *
    * Cross-engine exactness uses the q81/BM25 discipline: each bucket
    * probability is one IEEE division of exact integer counts, ln of
    * identical doubles agrees bit-for-bit, and per-bucket contributions
    * round into DECIMAL(28,12) before the per-doc sum so float addition
    * order cannot diverge. The bucket hash is the q32b portable md5 trick
    * so DuckDB computes identical buckets.
    *
    * 100 TB shape: both language models are bounded by B buckets — a few
    * KB — so they BROADCAST to the scoring scan regardless of corpus
    * size; the only corpus-sized shuffles carry (doc_id, bucket, count)
    * longs, never text. Raw + target models come from one pass over the
    * cached per-doc counts. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirScored(spark, dir)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("w").cast("double"), 6).as("dsir_logweight"),
        (col("w") > 0).as("keep"))
      .orderBy(col("doc_id"))

  /** Shared DSIR scoring core: (doc_id, n_bigrams, w DECIMAL(28,12)) —
    * q97 publishes the weights, q97b consumes them for resampling. */
  private def dsirScored(spark: SparkSession, dir: String): DataFrame = {
    val B = 1024
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      // bigrams via zip_with over two slices — positional element_at
      // inside a transform lambda evaluates interpreted per index and
      // measured 8× slower at sf0.1 (5.7 s vs 0.7 s for the explode);
      // greatest(…, 0) keeps slice legal for 0/1-token docs (empty result)
      .withColumn("bgs", expr(
        """zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),
          |         slice(toks, 2, greatest(size(toks)-1, 0)),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin))
      .select(col("doc_id"), col("source"), explode(col("bgs")).as("bg"))
      .withColumn("bucket", expr(
        s"cast(conv(substring(md5(cast(bg as binary)), 1, 15), 16, 10) as bigint) % $B"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      // session-lifetime contract: see graft.core.Caching
      .planCache()
    // one aggregation pass builds BOTH models (raw + target) — raw/tgt as
    // separate scans would re-read the cached counts three times and nest
    // broadcasts; here totals derive from the 1024-row model table
    val models = counts.groupBy(col("bucket")).agg(
      sum(col("c")).as("nr"),
      sum(when(col("source") === "src0", col("c")).otherwise(lit(0L))).as("nt"))
    val totals = models.agg(sum(col("nr")).as("n_raw"), sum(col("nt")).as("n_tgt"))
    val ratios = models.crossJoin(broadcast(totals))
      .withColumn("lr",
        log((col("nt") + lit(1L)).cast("double")
            / (col("n_tgt") + lit(B.toLong)).cast("double"))
          - log((col("nr") + lit(1L)).cast("double")
            / (col("n_raw") + lit(B.toLong)).cast("double")))
      .select(col("bucket"), col("lr"))
    counts.join(broadcast(ratios), Seq("bucket"))
      .withColumn("term", (col("c").cast("double") * col("lr")).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), sum(col("term")).as("w"))
  }

  // --- q97b: DSIR Gumbel-top-k resampling (the selection half) --------------
  /** The paper's second half: sample k documents ∝ importance weight
    * WITHOUT replacement via the Gumbel-top-k trick (Kool et al. 2019 —
    * public): key = log w + Gumbel(0,1) noise, take the k largest keys.
    * Randomness is a deterministic hash-uniform (q32b's portable md5
    * trick: 60-bit integer → u = (h + 0.5)/2⁶⁰, strictly inside (0,1)),
    * so the draw is reproducible run-to-run AND bit-identical in DuckDB:
    * every transcendental (ln of identical doubles) and the key sum
    * follow the q81 cross-engine discipline.
    *
    * 100 TB shape: scoring is q97's broadcast plan; the global top-k
    * compiles to TakeOrderedAndProject — the O(k)-memory heap merge, the
    * corpus is never sorted (the q59 guard discipline, asserted in
    * PlanShapeSpec). */
  def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 100
    // global top-k via orderBy+limit (TakeOrderedAndProject, O(k) heap);
    // the rank window runs AFTER the limit, over k rows only — a bare
    // global row_number here would single-partition the corpus
    val top = dsirScored(spark, dir)
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(concat('gumbel-', doc_id) as binary)), 1, 15), 16, 10) as bigint)"))
      .withColumn("u", (col("h").cast("double") + lit(0.5)) / lit(math.pow(2.0, 60)))
      .withColumn("key", col("w").cast("double") - log(-log(col("u"))))
      .orderBy(desc("key"), asc("doc_id")).limit(k)
    val w = Window.orderBy(desc("key"), asc("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("doc_id"), round(col("key"), 6).as("gumbel_key"), col("rank"))
      .orderBy(col("rank"))
  }

  val dsirResampleOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split(text, ' '), x -> x != '') AS toks
      |  FROM documents),
      |  bg AS (
      |  SELECT doc_id, source,
      |         unnest(CASE WHEN len(toks) >= 2
      |           THEN list_transform(generate_series(1, len(toks)-1),
      |                  i -> toks[i] || ' ' || toks[i+1])
      |           ELSE [] END) AS bg
      |  FROM d),
      |  counts AS (
      |  SELECT doc_id, source,
      |         CAST('0x' || substring(md5(bg), 1, 15) AS BIGINT) % 1024 AS bucket,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2, 3),
      |  raw AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS nr FROM counts GROUP BY 1),
      |  tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS nt
      |          FROM counts WHERE source = 'src0' GROUP BY 1),
      |  tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_raw,
      |                 CAST(sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS BIGINT) AS n_tgt
      |          FROM counts),
      |  lr AS (
      |  SELECT r.bucket,
      |         ln(CAST(coalesce(t.nt, 0) + 1 AS DOUBLE) / CAST(tot.n_tgt + 1024 AS DOUBLE))
      |         - ln(CAST(r.nr + 1 AS DOUBLE) / CAST(tot.n_raw + 1024 AS DOUBLE)) AS lr
      |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot),
      |  sc AS (
      |  SELECT c.doc_id,
      |         sum(CAST(CAST(c.c AS DOUBLE) * lr.lr AS DECIMAL(28,12))) AS w
      |  FROM counts c JOIN lr USING (bucket) GROUP BY 1),
      |  keyed AS (
      |  SELECT doc_id,
      |    CAST(w AS DOUBLE)
      |      - ln(-ln((CAST(CAST('0x' || substring(md5('gumbel-' || doc_id), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
      |              / 1152921504606846976.0)) AS key
      |  FROM sc),
      |  ranked AS (
      |  SELECT doc_id, key,
      |         row_number() OVER (ORDER BY key DESC, doc_id) AS rnk
      |  FROM keyed)
      |SELECT doc_id, round(key, 6) AS gumbel_key, CAST(rnk AS INTEGER) AS rank
      |FROM ranked WHERE rnk <= 100 ORDER BY rank""".stripMargin

  val dsirWeightsOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split(text, ' '), x -> x != '') AS toks
      |  FROM documents),
      |  bg AS (
      |  SELECT doc_id, source,
      |         unnest(CASE WHEN len(toks) >= 2
      |           THEN list_transform(generate_series(1, len(toks)-1),
      |                  i -> toks[i] || ' ' || toks[i+1])
      |           ELSE [] END) AS bg
      |  FROM d),
      |  counts AS (
      |  SELECT doc_id, source,
      |         CAST('0x' || substring(md5(bg), 1, 15) AS BIGINT) % 1024 AS bucket,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2, 3),
      |  raw AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS nr FROM counts GROUP BY 1),
      |  tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS nt
      |          FROM counts WHERE source = 'src0' GROUP BY 1),
      |  tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_raw,
      |                 CAST(sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS BIGINT) AS n_tgt
      |          FROM counts),
      |  lr AS (
      |  SELECT r.bucket,
      |         ln(CAST(coalesce(t.nt, 0) + 1 AS DOUBLE) / CAST(tot.n_tgt + 1024 AS DOUBLE))
      |         - ln(CAST(r.nr + 1 AS DOUBLE) / CAST(tot.n_raw + 1024 AS DOUBLE)) AS lr
      |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot),
      |  sc AS (
      |  SELECT c.doc_id,
      |         CAST(sum(c.c) AS BIGINT) AS n_bigrams,
      |         sum(CAST(CAST(c.c AS DOUBLE) * lr.lr AS DECIMAL(28,12))) AS w
      |  FROM counts c JOIN lr USING (bucket) GROUP BY 1)
      |SELECT doc_id, n_bigrams, round(CAST(w AS DOUBLE), 6) AS dsir_logweight,
      |       (w > 0) AS keep
      |FROM sc ORDER BY doc_id""".stripMargin

  // --- q99: temperature-weighted language mixture ---------------------------
  /** The multilingual pretraining sampler (mC4 / XLM-R, Conneau et al.
    * 2020 — public): resample languages with probability ∝ n_l^α so
    * low-resource languages are upsampled and the head is tamed. α = 0.5
    * deliberately: n^0.5 is `sqrt`, which IEEE guarantees correctly
    * rounded in every engine — `pow(x, 0.3)` is only 1-ulp-accurate and
    * can diverge cross-engine. Per-language boost r_l = p_l·N/n_l turns
    * into per-doc copy counts deterministically: floor(r_l) guaranteed
    * copies plus one more when the doc's portable hash-uniform falls
    * under frac(r_l) — a reproducible stochastic round, bit-identical in
    * DuckDB.
    *
    * 100 TB shape: the language table is ≤|langs| rows (broadcast); the
    * per-doc pass is map-only over one scan; the rollup shuffles one
    * (lang, count) pair per partition. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val langs = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("s", sqrt(col("n_docs").cast("double")).cast("decimal(28,12)"))
    val totals = langs.agg(
      sum(col("n_docs")).as("n_total"), sum(col("s")).as("s_total"))
    val rates = langs.crossJoin(broadcast(totals))
      .withColumn("p", col("s").cast("double") / col("s_total").cast("double"))
      .withColumn("r",
        col("p") * col("n_total").cast("double") / col("n_docs").cast("double"))
      .select(col("lang"), col("n_docs"), col("p"), col("r"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(rates), Seq("lang"))
      .withColumn("u", (expr(
        "cast(conv(substring(md5(cast(concat('tmix-', doc_id) as binary)), 1, 15), 16, 10) as bigint)")
        .cast("double") + lit(0.5)) / lit(math.pow(2.0, 60)))
      .withColumn("copies",
        floor(col("r")).cast("long")
          + when(col("u") < col("r") - floor(col("r")), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(first(col("p")), 6).as("sampling_prob"),
        round(first(col("r")), 6).as("boost"),
        sum(col("copies")).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val temperatureMixOracle: String =
    """WITH langs AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sqrt(CAST(count(*) AS DOUBLE)) AS DECIMAL(28,12)) AS s
      |  FROM documents GROUP BY lang),
      |  tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total, sum(s) AS s_total FROM langs),
      |  rates AS (
      |  SELECT lang, n_docs,
      |         CAST(s AS DOUBLE) / CAST(tot.s_total AS DOUBLE) AS p,
      |         (CAST(s AS DOUBLE) / CAST(tot.s_total AS DOUBLE))
      |           * CAST(tot.n_total AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r
      |  FROM langs CROSS JOIN tot),
      |  perdoc AS (
      |  SELECT d.lang, r.p, r.r,
      |    CAST(floor(r.r) AS BIGINT)
      |      + CASE WHEN (CAST(CAST('0x' || substring(md5('tmix-' || d.doc_id), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
      |                  / 1152921504606846976.0 < r.r - floor(r.r)
      |             THEN 1 ELSE 0 END AS copies
      |  FROM documents d JOIN rates r USING (lang))
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       round(any_value(p), 6) AS sampling_prob,
      |       round(any_value(r), 6) AS boost,
      |       CAST(sum(copies) AS BIGINT) AS n_sampled
      |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_quality_ensemble" -> ((s, d) => qualityEnsemble(s, d)),
    "q70_decontaminate" -> ((s, d) => decontaminate(s, d)),
    "q70b_decontaminate_bloom" -> ((s, d) => decontaminateBloom(s, d)),
    "q71_pii_redact" -> ((s, d) => piiRedact(s, d)),
    "q72_domain_mix" -> ((s, d) => domainMix(s, d)),
    "q72b_domain_mix_hash" -> ((s, d) => domainMixHash(s, d)),
    "q76_train_split" -> ((s, d) => trainSplit(s, d)),
    "q131_reservoir_sample" -> ((s, d) => reservoirSample(s, d)),
    "q78_global_shuffle" -> ((s, d) => globalShuffle(s, d)),
    "q97_dsir_weights" -> ((s, d) => dsirWeights(s, d)),
    "q97b_dsir_resample" -> ((s, d) => dsirResample(s, d)),
    "q99_temperature_mix" -> ((s, d) => temperatureMix(s, d))
  )

  // --- q154: rank-averaged quality ensemble -----------------------------------
  /** The filter a curation pipeline ends with: four independent quality
    * signals (word count, mean-word-length closeness to 5, lexical
    * diversity, symbol ratio) RANK-NORMALIZED globally and averaged —
    * rank averaging is the calibration-free way to combine signals on
    * incomparable scales (a z-score ensemble needs distributional
    * assumptions; ranks need none). Output: the 200 best docs by rank
    * sum with every per-signal rank attached, so a mix designer sees WHY
    * a doc won.
    *
    * 100 TB shape: each signal's global rank is the q120 distributed
    * form — repartitionByRange on the signal key, a P-row offset table,
    * partition-local row_number — so there are four range exchanges and
    * NO corpus-sized single-partition window; the ensemble join is four
    * (doc_id, long) hash joins and the final top-200 is a
    * TakeOrderedAndProject tree reduction. Signal keys are doubles
    * derived from exact integers (IEEE division — deterministic
    * cross-engine), ties broken by doc_id everywhere. */
  def qualityEnsemble(spark: SparkSession, dir: String): DataFrame = {
    def rankedBy(df: DataFrame, key: org.apache.spark.sql.Column,
                 rankName: String): DataFrame = {
      val d = df.repartitionByRange(key.asc, col("doc_id").asc)
        .withColumn("pid", spark_partition_id())
      val wOff = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = d.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("pid"), col("off"))
      val wIn = Window.partitionBy(col("pid")).orderBy(key.asc, col("doc_id").asc)
      d.join(broadcast(offsets), Seq("pid"))
        .withColumn(rankName, col("off") + row_number().over(wIn).cast("long"))
        .select(col("doc_id"), col(rankName))
    }
    val sig = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x != ''))").cast("long").as("words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("wchars"),
        expr("size(array_distinct(filter(split(text, ' '), x -> x != '')))")
          .cast("long").as("dwords"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("long").as("symbols"),
        length(col("text")).cast("long").as("n_chars"))
      .filter(col("words") > 0)
    // deliberately NOT cached, measured both ways (r19): five consumers
    // recompute this signal pass, but each recompute pipelines INTO its
    // leg's range exchange (5 parallel scans), while a planCache inserts
    // a materialization barrier the legs then wait on — cache 1.68 s vs
    // recompute 1.45 s at sf0.1, 8.52 vs 8.07 s at the 16×-docs rung.
    // The q106 lesson again: cache decisions are measured, not assumed.
    val r1 = rankedBy(sig, -col("words"), "r_words")
    val r2 = rankedBy(sig, abs(col("wchars") / col("words") - 5.0), "r_wordlen")
    val r3 = rankedBy(sig, -(col("dwords") / col("words")), "r_diversity")
    val r4 = rankedBy(sig, col("symbols") / col("n_chars"), "r_symbols")
    sig.select(col("doc_id"))
      .join(r1, Seq("doc_id")).join(r2, Seq("doc_id"))
      .join(r3, Seq("doc_id")).join(r4, Seq("doc_id"))
      .withColumn("rank_sum",
        col("r_words") + col("r_wordlen") + col("r_diversity") + col("r_symbols"))
      .orderBy(col("rank_sum"), col("doc_id")).limit(200)
      .select(col("doc_id"), col("r_words"), col("r_wordlen"),
        col("r_diversity"), col("r_symbols"), col("rank_sum"))
  }

  /** Four native global window ranks over the same keys and tie-breaks. */
  val qualityEnsembleOracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS words,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS wchars,
      |    CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS dwords,
      |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS symbols,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents WHERE length(text) > 0),
      |r AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY -words, doc_id) AS BIGINT) AS r_words,
      |    CAST(row_number() OVER (ORDER BY abs(wchars / words - 5.0), doc_id) AS BIGINT) AS r_wordlen,
      |    CAST(row_number() OVER (ORDER BY -(dwords / words), doc_id) AS BIGINT) AS r_diversity,
      |    CAST(row_number() OVER (ORDER BY symbols / n_chars, doc_id) AS BIGINT) AS r_symbols
      |  FROM s WHERE words > 0)
      |SELECT doc_id, r_words, r_wordlen, r_diversity, r_symbols,
      |  r_words + r_wordlen + r_diversity + r_symbols AS rank_sum
      |FROM r ORDER BY rank_sum, doc_id LIMIT 200""".stripMargin

  val oracles: Map[String, String] = Map(
    "q154_quality_ensemble" -> qualityEnsembleOracle,
    "q70_decontaminate" -> decontaminateOracle,
    "q70b_decontaminate_bloom" -> decontaminateOracle,
    "q71_pii_redact" -> piiRedactOracle,
    "q72_domain_mix" -> domainMixOracle,
    "q72b_domain_mix_hash" -> domainMixHashOracle,
    "q76_train_split" -> trainSplitOracle,
    "q131_reservoir_sample" -> reservoirSampleOracle,
    "q78_global_shuffle" -> globalShuffleOracle,
    "q97_dsir_weights" -> dsirWeightsOracle,
    "q97b_dsir_resample" -> dsirResampleOracle,
    "q99_temperature_mix" -> temperatureMixOracle
  )
}
