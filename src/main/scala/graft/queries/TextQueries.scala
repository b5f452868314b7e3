package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caching._
import graft.core.Tables

/** Text-analysis operators for a training-data pipeline (builder mandate):
  * quality scoring, token counting (whitespace + regex sub-tokens),
  * data-driven language-ID, document fingerprinting (rolling hash), and
  * tf-idf term extraction. All SQL-expressible → all oracle-checked.
  *
  * Everything stays in codegen'd higher-order functions / built-ins — no
  * UDFs in any of these paths, so they scale with whole-stage codegen and
  * the only shuffles are the final aggregations.
  */
object TextQueries {

  private val stopList = "('the','a','of','and','to','in')"

  // --- q40: quality scoring ------------------------------------------------
  /** Length / stopword-ratio / type-token-ratio quality score. The score
    * formula is computed from exact integer counts in double on both
    * engines, so it is bit-reproducible. */
  /** Adds token/quality columns to a documents-shaped df in one projection —
    * shared by q40 and q46 so composed pipelines stay single-scan. */
  private def withQuality(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .withColumn("n_tokens", expr("size(toks)").cast("bigint"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))").cast("bigint"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, x -> x IN $stopList))").cast("bigint"))
      .withColumn("sum_len", expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))"))
      // guard: a fully-empty document would make every ratio NaN — the
      // driver corpus has none, but 100 TB corpora will (mirrored in SQL)
      .filter(col("n_tokens") > 0)
      .withColumn("ttr", col("n_distinct") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens").cast("double"))
      .withColumn("avg_token_len", col("sum_len") / col("n_tokens").cast("double"))
      .withColumn("quality",
        round(lit(0.4) * col("ttr") + lit(0.3) * (lit(1.0) - col("stop_ratio"))
          + lit(0.3) * least(lit(1.0), col("avg_token_len") / lit(8.0)), 6))

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    withQuality(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
        round(col("ttr"), 6).as("ttr"), round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("avg_token_len"), 6).as("avg_token_len"), col("quality"))
      .orderBy(col("doc_id"))

  val qualityScoreOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents),
       |  c AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, x -> x IN $stopList)) AS BIGINT) AS n_stop,
       |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
       |  FROM d)
       |SELECT doc_id, n_tokens, n_distinct, n_stop,
       |  round(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       |  round(n_stop / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
       |  round(sum_len / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
       |  round(0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
       |      + 0.3 * (1.0 - n_stop / CAST(n_tokens AS DOUBLE))
       |      + 0.3 * least(1.0, (sum_len / CAST(n_tokens AS DOUBLE)) / 8.0), 6) AS quality
       |FROM c WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin

  // --- q41: token counting (whitespace + BPE-ish regex pieces) -------------
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("n_ws", expr("size(filter(split(text, ' '), x -> x != ''))").cast("bigint"))
      .withColumn("n_sub", size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).cast("bigint"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("total_ws_tokens"),
        sum(col("n_sub")).as("total_subtokens"),
        // nullif guard: a lang whose docs are all token-empty must yield
        // NULL, not an ANSI DIVIDE_BY_ZERO
        round(sum(col("n_sub")).cast("double") / nullif(sum(col("n_ws")), lit(0L)), 6)
          .as("subtokens_per_token"))
      .orderBy(col("lang"))
  }

  val tokenStatsOracle: String =
    """WITH d AS (
      |  SELECT lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_ws,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_sub
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_ws) AS BIGINT) AS total_ws_tokens,
      |  CAST(sum(n_sub) AS BIGINT) AS total_subtokens,
      |  round(CAST(sum(n_sub) AS DOUBLE) / nullif(sum(n_ws), 0), 6) AS subtokens_per_token
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // --- q42: data-driven language ID ---------------------------------------
  /** N-gram-profile language ID: build a top-20-token frequency profile per
    * lang from the corpus itself, score each doc by profile overlap,
    * predict the argmax lang. (On this synthetic corpus all langs share a
    * vocabulary, so accuracy ≈ chance — the operator shape is the point.)
    * Per-lang accuracy output. */
  /** The shared predictor chain: (doc_id, lang, predicted) — q42 reports
    * per-lang accuracy off it, q150 the full confusion matrix. */
  private def langPredictions(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tokens = docs.select(col("doc_id"), col("lang"),
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))
    val profile = tokens.groupBy(col("lang").as("plang"), col("token"))
      .agg(count(lit(1)).as("freq"))
    val wTop = Window.partitionBy("plang").orderBy(desc("freq"), asc("token"))
    val top20 = profile.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 20)
      .select(col("plang"), col("token"))
    val docTokens = tokens.select(col("doc_id"), col("lang"), col("token")).distinct()
    val scores = docTokens.join(broadcast(top20), Seq("token"))
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(count(lit(1)).as("overlap"))
    val wBest = Window.partitionBy("doc_id").orderBy(desc("overlap"), asc("plang"))
    scores.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"))
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val predicted = langPredictions(spark, dir)
    docs.select(col("doc_id"), col("lang"))
      .join(predicted.select(col("doc_id"), col("predicted")), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("predicted") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", round(col("n_correct") / col("n_docs").cast("double"), 6))
      .orderBy(col("lang"))
  }

  val langIdOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |  FROM documents),
      |  profile AS (
      |    SELECT lang AS plang, token, count(*) AS freq FROM tokens GROUP BY 1, 2),
      |  top20 AS (
      |    SELECT plang, token FROM (
      |      SELECT plang, token,
      |             row_number() OVER (PARTITION BY plang ORDER BY freq DESC, token) AS rn
      |      FROM profile) WHERE rn <= 20),
      |  doctok AS (SELECT DISTINCT doc_id, lang, token FROM tokens),
      |  scores AS (
      |    SELECT d.doc_id, d.lang, t.plang, count(*) AS overlap
      |    FROM doctok d JOIN top20 t ON d.token = t.token
      |    GROUP BY 1, 2, 3),
      |  predicted AS (
      |    SELECT doc_id, lang, plang AS predicted FROM (
      |      SELECT doc_id, lang, plang,
      |             row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, plang) AS rn
      |      FROM scores) WHERE rn = 1)
      |SELECT d.lang AS lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN p.predicted = d.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |  round(sum(CASE WHEN p.predicted = d.lang THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS accuracy
      |FROM documents d LEFT JOIN predicted p ON d.doc_id = p.doc_id
      |GROUP BY d.lang ORDER BY lang""".stripMargin

  // --- q150: language-ID confusion matrix ------------------------------------
  /** The eval companion to q42's accuracy scalar (the q90/q135 evaluation
    * family): the FULL confusion matrix — per (actual, predicted) cell,
    * the doc count and its share of the actual class in basis points
    * (integer division, bit-exact) — what a curation team reads to decide
    * WHICH languages the classifier confuses, not just how often. Docs
    * the classifier couldn't score (no profile-token overlap) land in an
    * explicit '(none)' column instead of vanishing.
    *
    * Shape: the predictor chain is q42's (profile broadcast, one
    * doc-keyed ranking window); the matrix itself is a |langs|² keyed
    * aggregate with the class totals broadcast back. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val m = docs.select(col("doc_id"), col("lang"))
      .join(langPredictions(spark, dir).select(col("doc_id"), col("predicted")),
        Seq("doc_id"), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit("(none)")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val classTotals = m.groupBy(col("lang")).agg(sum(col("n")).as("class_n"))
    m.join(broadcast(classTotals), Seq("lang"))
      .withColumn("row_bp", expr("n * 10000 div class_n"))
      .select(col("lang"), col("predicted"), col("n"), col("row_bp"))
      .orderBy(col("lang"), col("predicted"))
  }

  val langIdConfusionOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |  FROM documents),
      |  profile AS (
      |    SELECT lang AS plang, token, count(*) AS freq FROM tokens GROUP BY 1, 2),
      |  top20 AS (
      |    SELECT plang, token FROM (
      |      SELECT plang, token,
      |             row_number() OVER (PARTITION BY plang ORDER BY freq DESC, token) AS rn
      |      FROM profile) WHERE rn <= 20),
      |  doctok AS (SELECT DISTINCT doc_id, lang, token FROM tokens),
      |  scores AS (
      |    SELECT d.doc_id, d.lang, t.plang, count(*) AS overlap
      |    FROM doctok d JOIN top20 t ON d.token = t.token
      |    GROUP BY 1, 2, 3),
      |  predicted AS (
      |    SELECT doc_id, plang AS predicted FROM (
      |      SELECT doc_id, plang,
      |             row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, plang) AS rn
      |      FROM scores) WHERE rn = 1),
      |  m AS (
      |    SELECT d.lang, coalesce(p.predicted, '(none)') AS predicted, count(*) AS n
      |    FROM documents d LEFT JOIN predicted p ON d.doc_id = p.doc_id
      |    GROUP BY 1, 2),
      |  t AS (SELECT lang, sum(n) AS class_n FROM m GROUP BY 1)
      |SELECT m.lang, m.predicted, CAST(m.n AS BIGINT) AS n,
      |  CAST(m.n * 10000 // t.class_n AS BIGINT) AS row_bp
      |FROM m JOIN t USING (lang)
      |ORDER BY m.lang, m.predicted""".stripMargin

  // --- q43: document fingerprint (rolling polynomial hash) -----------------
  /** Rolling hash fp = fold(31·acc + ascii(ch)) mod (2^31−1) over every
    * character — a content-defined fingerprint computed entirely in
    * codegen'd HOFs (no UDF), mirrored with list_reduce in DuckDB. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("fp",
        expr("aggregate(filter(split(text, ''), x -> x != ''), 0L, " +
          "(acc, x) -> (acc * 31 + ascii(x)) % 2147483647)"))
      .select(col("doc_id"), col("fp"), length(col("text")).cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val fingerprintOracle: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_filter(string_split(text, ''), x -> x != ''),
      |                     x -> CAST(ord(x) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- q58: LM-fluency quality score ---------------------------------------
  /** CCNet-style LM quality filtering, engine-shaped: a corpus char-bigram
    * model scores every doc by its average next-char probability (fluent,
    * corpus-typical text scores high; noise scores low). All arithmetic is
    * INTEGER — conditional probabilities as micro-probs via integral
    * `div` — so the score is bit-exact cross-engine with no
    * transcendentals, and the model relation is bounded by charset²
    * (~9 k rows for ASCII) so its broadcast stays KB-sized at ANY corpus
    * scale — the crucial contrast with token-vocabulary relations like
    * q44's df, which must never be broadcast. The bigram explode runs once
    * per branch (model build, scoring) — pure codegen over the scan, no
    * extra shuffle. */
  def lmFluency(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 2)
    // bigrams as INTEGER codes (byte·256 + byte) via the native
    // BigramCodesExpr — one getBytes + a primitive loop per doc. See the
    // expression's Scaladoc for the measured SQL-only alternatives
    // (per-position substring is O(n²)/doc: 60.8 s at the 16×-docs rung;
    // char-split + zip_with allocates ~1 000 strings/doc: 19.5 s; this
    // form: 2.2 s). Byte ≡ char codes on the ASCII corpus (spec-guarded).
    val bigrams = docs.select(col("doc_id"),
      explode(graft.functions.BigramCodesExpr.bigramCodes(col("text"))).as("bg"))
    val bgCnt = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("n_bg"))
    // prefix totals ROLL UP from the bigram counts (sum over the ~9 k
    // model rows) instead of re-exploding the corpus a second time —
    // one fewer full scan + shuffle
    val pfxCnt = bgCnt.groupBy(expr("bg div 256").as("pfx"))
      .agg(sum(col("n_bg")).as("n_pfx"))
    val model = bgCnt.withColumn("pfx", expr("bg div 256"))
      .join(pfxCnt, Seq("pfx"))
      .select(col("bg"), expr("n_bg * 1000000 div n_pfx").as("p_micro"))
    bigrams.join(broadcast(model), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_micro) div count(1)").cast("long").as("avg_micro_p"))
      .orderBy(col("doc_id"))
  }

  val lmFluencyOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_transform(list_filter(string_split(text, ''), c -> c != ''),
      |                        c -> ord(c)) AS codes
      |  FROM documents WHERE length(text) >= 2),
      |bg AS (SELECT doc_id, codes[i] * 256 + codes[i + 1] AS bg
      |       FROM d, unnest(generate_series(1, len(codes) - 1)) AS t(i)),
      |bgc AS (SELECT bg, count(*) AS n_bg FROM bg GROUP BY bg),
      |pfx AS (SELECT bg // 256 AS pfx, sum(n_bg) AS n_pfx FROM bgc GROUP BY 1),
      |model AS (SELECT bg, n_bg * 1000000 // n_pfx AS p_micro
      |          FROM bgc JOIN pfx ON bgc.bg // 256 = pfx.pfx)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_micro_p
      |FROM bg JOIN model USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- q110: CCNet perplexity-bucket curation --------------------------------
  /** CCNet's signature move (Wenzek et al. 2020): split each language's
    * corpus into head/middle/tail thirds by LM quality and keep
    * head+middle — the filter that produced the CCNet/RedPajama-v1 web
    * corpora. Quality is q58's integer micro-prob fluency score (higher
    * = more corpus-typical; CCNet's lower-perplexity-is-better,
    * monotonically re-expressed).
    *
    * Scale shape — deliberately NOT `ntile(3) OVER (PARTITION BY
    * lang ORDER BY score)`: that window sorts each language's ENTIRE
    * corpus in one task chain. Instead the tercile THRESHOLDS come from
    * a cumulative count over per-(lang, score) groups — a relation
    * bounded by distinct score values (≤ 10⁶ by construction, integers
    * in [0, 1e6]), not by corpus rows — and bucket assignment is then a
    * map-only comparison against the broadcast 2-threshold row per
    * lang. Same trick as q98's distributed prefix sum. Threshold
    * semantics are CCNet's own: a score group that straddles a third
    * boundary lands wholly in the better bucket (ties never split), so
    * bucket sizes are ≥ n/3 exactly when ties cross the cut — all
    * integer arithmetic, bit-exact cross-engine. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    // cache: scored feeds per-score counts, per-lang totals AND the
    // final assignment join — uncached, the whole q58 bigram pipeline
    // would execute three times
    val scored = lmFluency(spark, dir)
      .select(col("doc_id"), col("avg_micro_p"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
      .planCache()
    val perScore = scored.groupBy(col("lang"), col("avg_micro_p"))
      .agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(desc("avg_micro_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.withColumn("cum", sum(col("c")).over(wTop))
    val nPerLang = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val thresholds = cum.join(nPerLang, Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        max(when(col("cum") >= expr("(n + 2) div 3"), col("avg_micro_p"))).as("t1"),
        max(when(col("cum") >= expr("(2 * n + 2) div 3"), col("avg_micro_p"))).as("t2"))
    scored.join(broadcast(thresholds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("avg_micro_p"),
        when(col("avg_micro_p") >= col("t1"), "head")
          .when(col("avg_micro_p") >= col("t2"), "middle")
          .otherwise("tail").as("ccnet_bucket"),
        (col("avg_micro_p") >= col("t2")).as("keep"))
      .orderBy(col("doc_id"))
  }

  val ccnetBucketsOracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |         list_transform(list_filter(string_split(text, ''), c -> c != ''),
      |                        c -> ord(c)) AS codes
      |  FROM documents WHERE length(text) >= 2),
      |bg AS (SELECT doc_id, lang, codes[i] * 256 + codes[i + 1] AS bg
      |       FROM d, unnest(generate_series(1, len(codes) - 1)) AS t(i)),
      |bgc AS (SELECT bg, count(*) AS n_bg FROM bg GROUP BY bg),
      |pfx AS (SELECT bg // 256 AS pfx, sum(n_bg) AS n_pfx FROM bgc GROUP BY 1),
      |model AS (SELECT bg, n_bg * 1000000 // n_pfx AS p_micro
      |          FROM bgc JOIN pfx ON bgc.bg // 256 = pfx.pfx),
      |scored AS (
      |  SELECT doc_id, any_value(lang) AS lang,
      |         CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_micro_p
      |  FROM bg JOIN model USING (bg) GROUP BY doc_id),
      |per_score AS (
      |  SELECT lang, avg_micro_p, count(*) AS c FROM scored GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, avg_micro_p,
      |         sum(c) OVER (PARTITION BY lang ORDER BY avg_micro_p DESC
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM per_score),
      |n AS (SELECT lang, count(*) AS n FROM scored GROUP BY lang),
      |th AS (
      |  SELECT cum.lang,
      |         max(CASE WHEN cum >= (n + 2) // 3 THEN avg_micro_p END) AS t1,
      |         max(CASE WHEN cum >= (2 * n + 2) // 3 THEN avg_micro_p END) AS t2
      |  FROM cum JOIN n ON cum.lang = n.lang GROUP BY cum.lang)
      |SELECT doc_id, scored.lang, avg_micro_p,
      |       CASE WHEN avg_micro_p >= t1 THEN 'head'
      |            WHEN avg_micro_p >= t2 THEN 'middle'
      |            ELSE 'tail' END AS ccnet_bucket,
      |       (avg_micro_p >= t2) AS keep
      |FROM scored JOIN th ON scored.lang = th.lang
      |ORDER BY doc_id""".stripMargin

  // --- q59: corpus-wide heavy hitters --------------------------------------
  /** Global top-k tokens — the classic whole-corpus reduce. The plan is
    * the other canonical top-k shape next to q6's per-group
    * WindowGroupLimit: partial counts map-side, one shuffle on token,
    * then `TakeOrderedAndProject` keeps a 20-row heap PER PARTITION and
    * merges heaps on the driver — the full sorted count relation is
    * never materialized, so the reduce is O(k) memory at any corpus
    * size. Tie-break on token for determinism. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(20)
  }

  val heavyHittersOracle: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // --- q44: tf-idf top terms per doc ---------------------------------------
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // corpus cardinality as a broadcast scalar — no driver-side .count()
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n"))
    val tokens = docs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // df derives from tf (already one row per (doc, token)) — no second
    // explode + distinct pass over the corpus. The tf > 0 filter is
    // semantically a no-op (every group has count ≥ 1) but Catalyst cannot
    // prove it, so the tf count survives column pruning in this branch and
    // its exchange canonicalizes identically to the join branch's —
    // letting (AQE) ReuseExchange run the explode+count stage ONCE. Without
    // it the corpus is exploded and aggregated twice (measured 2× on the
    // tf stage at sf0.1).
    val df = tf.filter(col("tf") > 0).groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("token"))
    // df is one row per distinct corpus token — UNBOUNDED (Heaps' law says
    // billions of rows at 100 TB), so it must never be broadcast. A shuffle
    // join on token is the scale-safe shape; on a skew-free token hash the
    // exchange is well balanced, and tf's exchange is still reused for the
    // df branch (see the tf > 0 note above).
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n") / col("df")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("token"), round(col("score"), 6).as("tfidf"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |  FROM documents),
      |  tf AS (SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2),
      |  df AS (SELECT token, count(*) AS df
      |         FROM (SELECT DISTINCT doc_id, token FROM tokens) GROUP BY token),
      |  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |  scored AS (
      |    SELECT tf.doc_id, tf.token, tf.tf * ln(n.n / df.df) AS score
      |    FROM tf JOIN df USING (token) CROSS JOIN n),
      |  ranked AS (
      |    SELECT doc_id, token, score,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
      |    FROM scored)
      |SELECT doc_id, token, round(score, 6) AS tfidf, CAST(rnk AS INTEGER) AS rank
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin

  // --- q45: repetition signals (C4/Gopher-style quality filters) -----------
  /** Repetitiousness metrics used by public corpus-curation pipelines:
    * fraction of tokens that are the single most frequent token, and the
    * distinct-bigram ratio (low = loopy/templated text). Pure HOF + agg. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    // Single scan, zero data shuffles (only the final presentation sort):
    // the per-doc top-token count is a longest-run fold over the SORTED
    // token array — O(n log n) per doc in executor CPU — instead of the
    // previous explode → groupBy(doc,token) → groupBy(doc) → join-back
    // shape, which shuffled every (doc_id, token) pair twice and scanned
    // the parquet twice. At 100 TB per-row CPU scales with executors;
    // token-pair shuffles are the bottleneck.
    Tables.documents(spark, dir)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .filter(expr("size(toks) > 0"))
      .withColumn("n_tokens", expr("size(toks)").cast("bigint"))
      .withColumn("max_f", expr(
        // fold sorted tokens with (prev token, current run, best run) state
        """aggregate(array_sort(toks),
          |  named_struct('prev', '', 'run', 0L, 'best', 0L),
          |  (s, x) -> named_struct(
          |    'prev', x,
          |    'run',  IF(x = s.prev, s.run + 1L, 1L),
          |    'best', greatest(s.best, IF(x = s.prev, s.run + 1L, 1L))),
          |  s -> s.best)""".stripMargin))
      .withColumn("top_token_ratio",
        round(col("max_f") / col("n_tokens").cast("double"), 6))
      .withColumn("n_bigrams",
        expr("greatest(size(toks) - 1, 0)").cast("bigint"))
      .withColumn("n_distinct_bigrams", expr(
        """size(array_distinct(zip_with(
          |  slice(toks, 1, greatest(size(toks) - 1, 0)),
          |  slice(toks, 2, greatest(size(toks) - 1, 0)),
          |  (a, b) -> concat(a, ' ', b))))""".stripMargin).cast("bigint"))
      .withColumn("distinct_bigram_ratio",
        when(col("n_bigrams") > 0,
          round(col("n_distinct_bigrams") / col("n_bigrams").cast("double"), 6)).otherwise(1.0))
      .select(col("doc_id"), col("n_tokens"), col("top_token_ratio"),
        col("n_bigrams"), col("n_distinct_bigrams"), col("distinct_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  val repetitionOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |  FROM documents),
      |  freq AS (SELECT doc_id, token, count(*) AS f FROM tokens GROUP BY 1, 2),
      |  agg AS (
      |    SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tokens, max(f) AS max_f
      |    FROM freq GROUP BY doc_id),
      |  bi AS (
      |    SELECT doc_id,
      |      CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams,
      |      CAST(len(list_distinct(list_transform(generate_series(1, len(t) - 1),
      |             i -> t[i] || ' ' || t[i+1]))) AS BIGINT) AS n_distinct_bigrams
      |    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
      |          FROM documents))
      |SELECT agg.doc_id AS doc_id, n_tokens,
      |  round(max_f / CAST(n_tokens AS DOUBLE), 6) AS top_token_ratio,
      |  n_bigrams, n_distinct_bigrams,
      |  CASE WHEN n_bigrams > 0
      |       THEN round(n_distinct_bigrams / CAST(n_bigrams AS DOUBLE), 6)
      |       ELSE 1.0 END AS distinct_bigram_ratio
      |FROM agg JOIN bi ON agg.doc_id = bi.doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q46: corpus curation composition ------------------------------------
  /** The training-data use-case end-to-end: exact-dedup to canonical docs,
    * quality-gate, then per-lang curated stats — the composition of q30 +
    * q40 a 100 TB curation pipeline runs nightly. */
  def curation(spark: SparkSession, dir: String): DataFrame = {
    // Single scan: quality is computed inline, dedup is an argmin hash agg
    // on sha2(text) — compact 64-hex keys shuffle instead of full texts,
    // min_by needs no sort/window/join-back, and the canonical row carries
    // its own lang/quality so nothing rejoins documents. (Previous shape —
    // groupBy(text) + two joins back — scanned the parquet three times and
    // shuffled whole documents.)
    withQuality(Tables.documents(spark, dir))
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("n_chars"),
          col("quality"), col("n_tokens")),
        col("doc_id")).as("c"))
      .select(col("c.*"))
      .filter(col("quality") >= 0.5 && col("n_tokens") >= 10)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        round(avg(col("quality")), 6).as("avg_quality"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  val curationOracle: String =
    s"""WITH canonical AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
       |  d AS (
       |  SELECT doc_id, lang, n_chars,
       |         list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents),
       |  q AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    round(0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
       |        + 0.3 * (1.0 - len(list_filter(toks, x -> x IN $stopList)) / CAST(len(toks) AS DOUBLE))
       |        + 0.3 * least(1.0, (list_sum(list_transform(toks, x -> length(x)))
       |                            / CAST(len(toks) AS DOUBLE)) / 8.0), 6) AS quality
       |  FROM d WHERE len(toks) > 0)
       |SELECT lang, count(*) AS n_kept,
       |  round(avg(quality), 6) AS avg_quality,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM d
       |JOIN canonical USING (doc_id)
       |JOIN q USING (doc_id)
       |WHERE quality >= 0.5 AND n_tokens >= 10
       |GROUP BY lang ORDER BY lang""".stripMargin

  // --- q47: deterministic stratified sampling -------------------------------
  /** Content-hash stratified sampling: per-lang quotas applied via the
    * rolling-hash fingerprint mod 100 — fully reproducible (re-running
    * selects the same docs, unlike rand()-based sample()), shuffle-free
    * (a filter), and cross-engine exact. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val fp = "aggregate(filter(split(text, ''), x -> x != ''), 0L, " +
      "(acc, x) -> (acc * 31 + ascii(x)) % 2147483647)"
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(s"$fp % 100"))
      .withColumn("quota",
        when(col("lang") === "en", 40).when(col("lang") === "zh", 30).otherwise(20))
      .withColumn("sampled", col("bucket") < col("quota"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("achieved_rate", round(col("n_sampled") / col("n_total").cast("double"), 6))
      .orderBy(col("lang"))
  }

  val stratifiedSampleOracle: String =
    """WITH d AS (
      |  SELECT lang,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(list_filter(string_split(text, ''), x -> x != ''),
      |                       x -> CAST(ord(x) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 2147483647) % 100 AS bucket
      |  FROM documents)
      |SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 40
      |                                    WHEN lang = 'zh' THEN 30
      |                                    ELSE 20 END)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  round(sum(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 40
      |                                     WHEN lang = 'zh' THEN 30
      |                                     ELSE 20 END)
      |            THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS achieved_rate
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // --- q88: sketch-first heavy hitters (Space-Saving + exact confirm) -------
  /** q59's global top-20 computed the way a 100 TB corpus forces: a
    * ONE-PASS Space-Saving sketch ([[graft.functions.SpaceSavingAgg]],
    * capacity 1024) reduces each partition to ≤1024 counters before the
    * shuffle — the exchange carries O(partitions × 1024) rows where
    * q59's exact groupBy shuffles the whole Heaps'-law vocabulary — then
    * a confirm pass recounts ONLY the ≤1024 candidate tokens (broadcast
    * semi-join; the second scan's aggregation state is candidate-bounded).
    * Any token with true frequency > n/1024 is guaranteed in the sketch,
    * and the sf corpora's top-20 clear that bound by orders of
    * magnitude, so the confirmed top-20 is bit-exact and
    * partitioning-independent: q59's oracle applies VERBATIM. The sketch
    * mechanics (bounds, merge, serialization) are SpaceSavingSpec's. */
  def heavyHittersSketch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))
    val cands = toks
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("token"), 1024).as("sketch"))
      .select(explode(col("sketch")).as("c"))
      .select(col("c.token").as("cand"))
    toks.join(broadcast(cands), col("token") === col("cand"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(20)
  }

  // --- q175: Count-Min point-frequency sketch --------------------------------
  /** The point-frequency member of the sketch ladder
    * ([[graft.functions.CountMinAgg]]): where q88's Space-Saving RANKS
    * the heavy keys, Count-Min answers "how often does THIS key occur"
    * from a fixed depth×width grid — the structure a 100 TB pipeline
    * keeps per shard to price tokens (dedup priors, stop-token
    * detection, DSIR-style importance hints) without a vocabulary-sized
    * state. One pass builds the sketch (map-side partials carry the
    * constant-size grid through the shuffle — never the vocabulary) and
    * the exact top-20 pass (q59's arithmetic verbatim) provides the
    * witness keys; each is probed against the sketch with the
    * metadata-scale estimate expression, and the output pins CM's
    * one-sided contract per key: `never_under` (est ≥ exact — the hard
    * guarantee) and `within_bound` (est ≤ exact + 3N/width — the ε·N
    * class bound, deterministic for this fixed corpus+geometry; q166's
    * fp-bound discipline). The estimates themselves stay out of the
    * output surface — they are hash-geometry artifacts; the ORACLE
    * checks the exact counts and the pinned booleans. */
  def countMinFreq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CountMinAgg, CountMinEstimateExpr}
    val toks = Tables.documents(spark, dir)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))
    val sketch = toks.agg(
      CountMinAgg.countMin(col("token"), 4, 2048).as("sk"),
      count(lit(1)).as("total"))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(20)
    top.crossJoin(broadcast(sketch))
      .withColumn("est", CountMinEstimateExpr.cmEstimate(col("sk"), col("token")))
      .select(col("token"), col("n"),
        (col("est") >= col("n")).as("never_under"),
        (col("est") <= col("n") + (lit(3) * col("total")) / lit(2048))
          .as("within_bound"))
      .orderBy(desc("n"), asc("token"))
  }

  /** q59's exact arithmetic for the keys and counts; the sketch's
    * contract booleans pinned TRUE — a CM row that undercounts (broken
    * hash alignment) or blows the ε·N class bound (broken merge) flips
    * a boolean and fails the gate. */
  val countMinFreqOracle: String =
    """SELECT token, count(*) AS n,
      |  TRUE AS never_under, TRUE AS within_bound
      |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // --- q83: BPE tokenizer training (Sennrich et al. 2016) -------------------
  /** The ordered merge table a subword tokenizer is built from, learned
    * distributed ([[graft.text.Bpe]]): one corpus scan to word
    * frequencies, then vocab-sized iterations (Heaps'-law bounded — the
    * 100 TB design is in Bpe's scaladoc). Rows-tier by design: 40
    * data-dependent argmax iterations are not expressible as one SQL
    * query in any engine; BpeSpec pins the result against an independent
    * single-node reference implementation, exact merge-by-merge, plus
    * partitioning invariance. Words are lowercased whitespace tokens
    * capped at 20 chars (runaway "words" — URLs, DNA strings — cost
    * O(len²) per merge scan and belong to the quality filter, not the
    * tokenizer). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .filter(length(col("word")) <= 20)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    graft.text.Bpe.train(spark, words, numMerges = 40)
      .orderBy(col("rank"))
  }

  // --- q83 registered form: BPE train with DuckDB-recomputable witnesses ---
  /** Oracle tier for the BPE learner (q83b/q66/ANN-witness precedent):
    * the 40 data-dependent argmax iterations are not one SQL query, but
    * the merge table's INVARIANTS are, and the FIRST merge is fully
    * recomputable from `documents` by any engine — it is simply the
    * max-frequency adjacent character pair of the word-frequency table,
    * before any merge exists to interact with. Per merge row we emit:
    *
    *   - `rank` 1..40 — row count pins merge count = requested;
    *   - `support_noninc` — the chosen pair's support never increases
    *     with rank (each occurrence of a later-created pair sits inside
    *     an occurrence of an earlier merged symbol, so the argmax
    *     sequence is non-increasing; a greedy-order regression flips
    *     this to FALSE);
    *   - `merged_ok` — merged = left||right with both sides non-empty;
    *   - `len_ok` — merged length respects the 20-char training cap;
    *   - `first_left`/`first_right`/`first_support` — the rank-1 merge
    *     repeated on every row, which DuckDB recomputes INDEPENDENTLY
    *     from raw text (split → adjacent char pairs → weighted argmax
    *     with the same (-n, l, r) tie-break).
    *
    * A learner regression in iteration order, tie-breaking, pair
    * counting, or the base symbolization now turns the DRIVER gate red
    * (hash mismatch), not only BpeSpec. Full merge table stays in
    * [[bpeTrain]] for BpeSpec's merge-by-merge reference comparison. */
  def bpeTrainChecked(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merges = bpeTrain(spark, dir) // (rank, left, right, merged, support)
    // ≤40-row frame: the unpartitioned lag window is bounded by numMerges
    val byRank = Window.orderBy(col("rank"))
    val firstRow = merges.orderBy(col("rank")).limit(1)
      .select(col("left").as("first_left"), col("right").as("first_right"),
        col("support").as("first_support"))
    merges
      .withColumn("support_noninc",
        coalesce(col("support") <= lag(col("support"), 1).over(byRank), lit(true)))
      .withColumn("merged_ok",
        col("merged") === concat(col("left"), col("right")) &&
          length(col("left")) > 0 && length(col("right")) > 0)
      .withColumn("len_ok", length(col("merged")) <= 20)
      .crossJoin(broadcast(firstRow))
      .select(col("rank"), col("support_noninc"), col("merged_ok"), col("len_ok"),
        col("first_left"), col("first_right"), col("first_support"))
      .orderBy(col("rank"))
  }

  /** DuckDB twin: regenerate ranks 1..40, literal TRUE for the learner
    * invariants, and an INDEPENDENT recompute of the first merge — the
    * weighted argmax adjacent character pair of the ≤20-char lowercased
    * word-frequency table, tie-broken (-n, l, r) exactly like the
    * learner. Corpus is ASCII, so DuckDB's code-point substr and the
    * JVM's char symbolization agree. */
  val bpeTrainCheckedOracle: String =
    """WITH words AS (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
      |    FROM documents)
      |  WHERE length(w) <= 20 GROUP BY 1),
      |idx AS (
      |  SELECT word, freq, unnest(range(1, length(word))) AS i FROM words),
      |top_pair AS (
      |  SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
      |         CAST(sum(freq) AS BIGINT) AS n
      |  FROM idx GROUP BY 1, 2
      |  ORDER BY n DESC, l ASC, r ASC LIMIT 1)
      |SELECT CAST(t.i AS INT) AS rank,
      |       TRUE AS support_noninc, TRUE AS merged_ok, TRUE AS len_ok,
      |       p.l AS first_left, p.r AS first_right, p.n AS first_support
      |FROM range(1, 41) AS t(i), top_pair AS p
      |ORDER BY rank""".stripMargin

  // --- q83b: BPE tokenizer APPLY (encode the corpus) -----------------------
  /** The step after q83's training: tokenize the whole corpus with the
    * learned merge table and report per-doc token statistics — the
    * "how many tokens is my dataset" pass every pretraining run starts
    * with (and the input q98's budget would consume in production).
    *
    * Scale shape — encode the VOCABULARY, not the corpus: merges apply
    * per distinct word, so the iterative merge loop runs once per vocab
    * entry (Heaps'-law bounded, corpus tokens ≫ vocab) in a typed map
    * with the ≤40-row merge table in the closure; the corpus then
    * equi-joins its exploded words to the (word, n_pieces) relation —
    * UNHINTED, the q44 discipline, since vocab is unbounded at 100 TB —
    * and sums per doc. Long words (>20 chars) are excluded from TRAINING
    * (q83's filter) but still encoded here, as a tokenizer must.
    *
    * Not SQL-expressible (iterative greedy merges) → rows-only tier;
    * BpeSpec pins the full distributed path against an independent
    * driver-local re-encode. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val trainWords = docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .filter(length(col("word")) <= 20)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val merges: Seq[(String, String)] =
      graft.text.Bpe.train(spark, trainWords, numMerges = 40)
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val corpusWords = docs
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
    val pieces = corpusWords.select(col("word")).distinct()
      .as[String]
      .map(w => (w, graft.text.Bpe.applyMerges(w, merges).length.toLong))
      .toDF("word", "n_pieces")
    corpusWords.join(pieces, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_tokens"))
      .withColumn("tokens_per_word",
        round(col("n_tokens").cast("double") / col("n_words").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  // --- q83b registered form: BPE encode with DuckDB-recomputable witnesses --
  /** The oracle tier for the BPE apply pass (q66/ANN-witness precedent):
    * per doc, emit what DuckDB CAN recompute from `documents` — the
    * split-based word count and the non-space character count — plus two
    * booleans holding the engine-internal encode to its invariants:
    * `pieces_ok` = n_words ≤ Σ n_pieces ≤ Σ word chars (each word
    * tokenizes to between 1 and len(word) pieces), and `roundtrip_ok` =
    * concatenating every word's pieces reproduces the word exactly (the
    * merge table can segment, never rewrite). The oracle emits the exact
    * counts and literal TRUEs, so a merge-table or encode regression is a
    * bit-exact hash mismatch at the driver gate, not only a spec failure.
    * Full token statistics stay in [[bpeEncode]] for BpeSpec. */
  def bpeEncodeChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val trainWords = docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .filter(length(col("word")) <= 20)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val merges: Seq[(String, String)] =
      graft.text.Bpe.train(spark, trainWords, numMerges = 40)
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // original-case words for the oracle-recomputable char count; the
    // encode itself runs on the lowercased form (the tokenizer's input)
    val corpusWords = docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("word"))
      .withColumn("wlow", lower(col("word")))
    val pieces = corpusWords.select(col("wlow")).distinct()
      .as[String]
      .map { w =>
        val ps = graft.text.Bpe.applyMerges(w, merges)
        (w, ps.length.toLong, ps.mkString == w)
      }
      .toDF("wlow", "n_pieces", "rt")
    corpusWords.join(pieces, Seq("wlow"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        sum(length(col("word"))).as("n_chars_words"),
        // lowercasing can change length for some Unicode (e.g. İ), so the
        // upper piece bound uses the encoder's OWN input length
        sum(length(col("wlow"))).as("n_chars_low"),
        min(col("rt").cast("int")).as("rt_min"))
      .select(col("doc_id"), col("n_words"), col("n_chars_words"),
        (col("n_words") <= col("n_tokens") &&
          col("n_tokens") <= col("n_chars_low")).as("pieces_ok"),
        (col("rt_min") === 1).as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  val bpeEncodeCheckedOracle: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_words,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_words,
      |  TRUE AS pieces_ok, TRUE AS roundtrip_ok
      |FROM documents
      |WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0
      |ORDER BY doc_id""".stripMargin

  // --- q95: Gopher rule-based quality filter (Rae et al. 2021, App. A) -----
  /** The Gopher quality-rule battery — the canonical rule set a web-scale
    * pretraining corpus is screened with before any model-based scoring:
    * word-count bounds [50, 100000], mean word length in [3, 10],
    * symbol-to-word ratio (# / ellipsis) <= 0.1, <=90% of lines starting
    * with a bullet, <=30% of lines ending with an ellipsis, >=80% of words
    * containing an alphabetic character, and at least 2 of 8 required
    * English stop words. Emits each rule's raw metric AND verdict plus
    * the conjunction `keep`, so a downstream mix can re-weight rules
    * instead of re-scanning text.
    *
    * 100 TB shape: one projection over one scan — every metric is a
    * codegen'd higher-order function over the same split; the only
    * shuffle is the output sort, and in production the sort drops and
    * this is a zero-shuffle map-only pass. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val reqStops = "array('the','be','to','of','and','that','have','with')"
    Tables.documents(spark, dir)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_words", expr("size(toks)").cast("bigint"))
      // empty docs carry no signal for any rule (guard mirrored in SQL)
      .filter(col("n_words") > 0)
      .withColumn("mean_word_len",
        expr("aggregate(toks, 0L, (a, x) -> a + length(x))") / col("n_words").cast("double"))
      .withColumn("n_sym",
        (length(col("text")) - length(expr("replace(text, '#', '')")))
          + (length(col("text")) - length(expr("replace(text, '...', '')"))) / lit(3)
          + (length(col("text")) - length(expr("replace(text, '…', '')"))))
      .withColumn("symbol_ratio", col("n_sym") / col("n_words").cast("double"))
      .withColumn("bullet_frac",
        expr("size(filter(lines, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%'))")
          / expr("size(lines)").cast("double"))
      .withColumn("ellipsis_frac",
        expr("size(filter(lines, x -> x LIKE '%...' OR x LIKE '%…'))")
          / expr("size(lines)").cast("double"))
      .withColumn("alpha_frac",
        expr("size(filter(toks, x -> x rlike '[A-Za-z]'))") / col("n_words").cast("double"))
      .withColumn("stop_hits",
        expr(s"size(filter($reqStops, w -> array_contains(toks, w)))"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          (col("symbol_ratio") <= 0.1) &&
          (col("bullet_frac") <= 0.9) && (col("ellipsis_frac") <= 0.3) &&
          (col("alpha_frac") >= 0.8) && (col("stop_hits") >= 2))
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        round(col("symbol_ratio"), 6).as("symbol_ratio"),
        round(col("bullet_frac"), 6).as("bullet_frac"),
        round(col("ellipsis_frac"), 6).as("ellipsis_frac"),
        round(col("alpha_frac"), 6).as("alpha_frac"),
        col("stop_hits"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val gopherRulesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(text, ' '), x -> x != '') AS toks,
      |    string_split(text, chr(10)) AS lines
      |  FROM documents),
      |  m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    list_sum(list_transform(toks, x -> length(x)))
      |      / CAST(len(toks) AS DOUBLE) AS mean_word_len,
      |    ((length(text) - length(replace(text, '#', '')))
      |      + (length(text) - length(replace(text, '...', ''))) // 3
      |      + (length(text) - length(replace(text, '…', ''))))
      |      / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
      |    len(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%'))
      |      / CAST(len(lines) AS DOUBLE) AS bullet_frac,
      |    len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…'))
      |      / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
      |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
      |      / CAST(len(toks) AS DOUBLE) AS alpha_frac,
      |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
      |      w -> list_contains(toks, w))) AS INTEGER) AS stop_hits
      |  FROM d WHERE len(toks) > 0)
      |SELECT doc_id, n_words,
      |  round(mean_word_len, 6) AS mean_word_len,
      |  round(symbol_ratio, 6) AS symbol_ratio,
      |  round(bullet_frac, 6) AS bullet_frac,
      |  round(ellipsis_frac, 6) AS ellipsis_frac,
      |  round(alpha_frac, 6) AS alpha_frac,
      |  stop_hits,
      |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
      |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
      |   AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
      |   AND stop_hits >= 2) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // --- q98: token-budget curation (distributed prefix sum) -----------------
  /** "Fill a token budget with the best documents": the greedy knapsack
    * every pretraining-mix builder runs — order docs by quality density
    * (q40's quality score per token), admit while the running token total
    * stays within budget (here: a quarter of the corpus's tokens, so the
    * query is scale-free).
    *
    * The naive formulation is a running sum over ONE global ordering — an
    * orderBy-only window collapses to a single partition, the classic
    * driver-shaped bottleneck. This implements the distributed prefix
    * sum instead: density quantizes into order-preserving buckets
    * (floor(density*1000) — monotone, so bucket-major order IS density
    * order), per-bucket token totals (≤1001 rows) compute each bucket's
    * global offset, and the per-doc running sum windows WITHIN buckets —
    * fully parallel. cum = bucket offset + in-bucket prefix, exactly
    * equal to the naive global scan, which is what the DuckDB oracle
    * runs. Integer token arithmetic end to end; the only corpus-sized
    * shuffle carries (doc_id, n_tokens, density). */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    // quality has exactly 6 decimals, so quality/n_tokens can land exactly
    // on a 6-dp half boundary where double rounding diverges cross-engine;
    // the OUTPUT density therefore rounds via exact integer arithmetic
    // (q6 = quality·1e6 is integer-valued: round-half-up of q6/n is
    // floor((2·q6 + n) / 2n)). Ordering/bucketing use the raw double —
    // one IEEE division, bit-identical everywhere, never rounded.
    val d = withQuality(Tables.documents(spark, dir))
      .withColumn("density", col("quality") / col("n_tokens").cast("double"))
      .withColumn("q6", round(col("quality") * lit(1e6)).cast("long"))
      .withColumn("density6",
        expr("(2*q6 + n_tokens) div (2*n_tokens)"))
      .withColumn("bucket", floor(col("density") * lit(1000.0)).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("density"), col("density6"), col("bucket"))
    val budgetDf = d.agg(expr("sum(n_tokens) div 4").as("budget"))
    val wOff = Window.orderBy(desc("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤1001 rows: the single-partition window here is over the bucket
    // TOTALS, not the corpus
    val offsets = d.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("boff", coalesce(sum(col("btoks")).over(wOff), lit(0L)))
      .select(col("bucket"), col("boff"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(desc("density"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens", col("boff") + sum(col("n_tokens")).over(wIn))
      .crossJoin(broadcast(budgetDf))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("n_tokens"),
        (col("density6").cast("double") / lit(1e6)).as("density"),
        col("cum_tokens"), col("budget"))
      .orderBy(col("cum_tokens"))
  }

  val tokenBudgetOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents),
       |  c AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(toks, x -> x IN $stopList)) AS BIGINT) AS n_stop,
       |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
       |  FROM d WHERE len(toks) > 0),
       |  q0 AS (
       |  SELECT doc_id, n_tokens,
       |    round(0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
       |        + 0.3 * (1.0 - n_stop / CAST(n_tokens AS DOUBLE))
       |        + 0.3 * least(1.0, (sum_len / CAST(n_tokens AS DOUBLE)) / 8.0), 6) AS quality
       |  FROM c),
       |  q AS (
       |  SELECT doc_id, n_tokens,
       |    quality / CAST(n_tokens AS DOUBLE) AS density_raw,
       |    CAST(round(quality * 1e6) AS BIGINT) AS q6
       |  FROM q0),
       |  b AS (SELECT CAST(sum(n_tokens) // 4 AS BIGINT) AS budget FROM q),
       |  cum AS (
       |  SELECT doc_id, n_tokens,
       |    CAST((2*q6 + n_tokens) // (2*n_tokens) AS DOUBLE) / 1e6 AS density,
       |    CAST(sum(n_tokens) OVER (ORDER BY density_raw DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM q)
       |SELECT doc_id, n_tokens, density, cum_tokens, b.budget
       |FROM cum, b WHERE cum_tokens <= b.budget ORDER BY cum_tokens""".stripMargin

  // --- q102: Unicode text normalization (NFC + control strip + ws collapse)
  /** The normalization pass a web corpus runs before any hashing or
    * dedup: NFC canonical composition (the same logical text arrives
    * composed from one site, decomposed from another — unnormalized,
    * every dedup family silently splits the group), control-character
    * strip, whitespace collapse, trim. NFC runs through the native
    * codegen [[graft.functions.NfcNormalizeExpr]] (Spark has no builtin;
    * a UDF would pay the encoder round trip per row), registered in SQL
    * as `graft_nfc` via GraftExtensions.
    *
    * The fixture corpus is ASCII, so each doc deterministically gains a
    * Unicode tail — combining-acute 'cafe'+U+0301 (must COMPOSE, 2 chars
    * → 1), precomposed café (already NFC), or tabs+BEL control — built
    * identically in both engines (chr() codes in DuckDB), and DuckDB's
    * `nfc_normalize` makes the whole pass bit-exact oracle-checkable.
    * One scan, zero shuffles beyond the harness sort. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("dirty", concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" cafe\u0301")) // decomposed: e + combining acute
          .when(col("doc_id") % 3 === 1, lit(" caf\u00e9")) // precomposed
          .otherwise(lit(" x\t\ty\u0007"))))
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(
          graft.functions.NfcNormalizeExpr.nfc(col("dirty")),
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""), "[ \\t]+", " ")))
      .select(col("doc_id"),
        length(col("dirty")).cast("bigint").as("n_dirty"),
        length(col("norm")).cast("bigint").as("n_norm"),
        col("norm").as("norm_text"))
      .orderBy(col("doc_id"))
  }

  val textNormalizeOracle: String =
    """WITH d AS (
      |  SELECT doc_id, text ||
      |    CASE doc_id % 3 WHEN 0 THEN ' cafe' || chr(769)
      |      WHEN 1 THEN ' caf' || chr(233)
      |      ELSE ' x' || chr(9) || chr(9) || 'y' || chr(7) END AS dirty
      |  FROM documents),
      |  n AS (
      |  SELECT doc_id, dirty,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(dirty),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'), '[ \t]+', ' ', 'g')) AS norm
      |  FROM d)
      |SELECT doc_id, CAST(length(dirty) AS BIGINT) AS n_dirty,
      |       CAST(length(norm) AS BIGINT) AS n_norm, norm AS norm_text
      |FROM n ORDER BY doc_id""".stripMargin

  // --- q107: mojibake (double-encoding) repair -------------------------------
  /** The ftfy-class fixup every web-corpus pipeline runs before
    * anything else (C4/CCNet): text that went UTF-8 → decoded-as-cp1252
    * somewhere upstream ("é" → "Ã©"), sometimes twice. The reference's
    * bare latin-1 fallback (`app.py:145-158`) SHIPS this corruption;
    * [[graft.text.Mojibake]] reverses it with a deterministic
    * round-trip rule (sloppy-cp1252 re-encode + strict-UTF-8 decode,
    * accept only strictly-shorter — no false positives on clean text).
    *
    * Fixture in-query (q102 precedent): clean = doc text + a suffix
    * covering 2-byte, 3-byte, sloppy-0x81 and € sequences; corruption
    * depth alternates 1/2 by doc_id. The repair runs executor-side over
    * the corrupted column (map-only, embarrassingly parallel — the
    * 100 TB shape is one scan, no shuffle); the oracle reconstructs the
    * EXPECTED CLEAN TEXT verbatim in DuckDB, so an off-by-one in any
    * byte table, the round counter, or the termination rule breaks the
    * bit-exact match loudly. */
  def mojibakeRepair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val suffix = " café → ☃ Łódź 10€"
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val clean = text + suffix
        val depth = 1 + (id % 2).toInt
        val bad = graft.text.Mojibake.corrupt(clean, depth)
        val (repaired, rounds) = graft.text.Mojibake.repair(bad)
        (id, rounds, repaired == clean, repaired.length.toLong, repaired)
      }
      .toDF("doc_id", "rounds_fixed", "repaired_ok", "n_chars", "repaired_text")
      .orderBy(col("doc_id"))
  }

  val mojibakeRepairOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    text || ' caf' || chr(233) || ' ' || chr(8594) || ' ' || chr(9731) ||
      |    ' ' || chr(321) || chr(243) || 'd' || chr(378) || ' 10' || chr(8364) AS clean
      |  FROM documents)
      |SELECT doc_id, CAST(1 + doc_id % 2 AS INTEGER) AS rounds_fixed,
      |       TRUE AS repaired_ok,
      |       CAST(length(clean) AS BIGINT) AS n_chars,
      |       clean AS repaired_text
      |FROM d ORDER BY doc_id""".stripMargin

  // --- q114: Gopher repetition filters (top/dup n-gram char fractions) -----
  /** The repetition-removal HALF of the Gopher filter (Rae 2021 §A1.1
    * Table A1) that q95's quality rules left out: per document, the
    * top-{2,3,4}-gram character fractions (chars inside the most
    * frequent word n-gram's occurrences) and the dup-{5..10}-gram
    * character fractions (chars covered by the UNION of spans of every
    * n-gram occurring twice or more — overlaps counted once). `keep`
    * applies the paper's thresholds (0.20/0.18/0.16 and 0.15 down to
    * 0.10). Every signal is document-local, so the operator is ONE
    * map pass over the corpus — zero shuffles before the presentation
    * sort, the only shape that survives 100 TB (the line/paragraph
    * Gopher signals are omitted by corpus construction: the fixture
    * text is single-line, so they are degenerate constants here).
    * The DuckDB oracle recomputes everything relationally: n-gram
    * explosion, (count, char-length, lexicographic) top tie-break,
    * and gaps-and-islands span union — bit-exact after round(,6). */
  def gopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      // ONE tokenization per doc: the emptiness filter lives inside the
      // flatMap (an SQL-side size(filter(split..)) pre-filter would split
      // every document a second time just to drop the empty ones)
      .flatMap { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        if (words.isEmpty) None
        else {
          val s = graft.text.Repetition.signalsOf(words, text.length)
          val keep = s.top(0) <= 0.20 && s.top(1) <= 0.18 && s.top(2) <= 0.16 &&
            s.dup(0) <= 0.15 && s.dup(1) <= 0.14 && s.dup(2) <= 0.13 &&
            s.dup(3) <= 0.12 && s.dup(4) <= 0.11 && s.dup(5) <= 0.10
          Some((id, s.top(0), s.top(1), s.top(2),
            s.dup(0), s.dup(1), s.dup(2), s.dup(3), s.dup(4), s.dup(5), keep))
        }
      }
      .toDF("doc_id", "top2", "top3", "top4",
        "dup5", "dup6", "dup7", "dup8", "dup9", "dup10", "keep")
    raw.select(col("doc_id") +:
        Seq("top2", "top3", "top4", "dup5", "dup6", "dup7", "dup8", "dup9", "dup10")
          .map(c => round(col(c), 6).as(c)) :+ col("keep"): _*)
      .orderBy(col("doc_id"))
  }

  /** Relational recomputation: grams = (doc, n, i) explosion with spans
    * in the word-offset coordinate system (the q02b oracle's aa/cc
    * trick); top = window argmax with the pinned (count desc, char-len
    * desc, gram asc) tie-break; dup coverage = gaps-and-islands union
    * over the duplicated grams' spans. */
  val gopherRepetitionOracle: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS nc,
      |         list_filter(string_split(text, ' '), x -> x != '') AS w
      |  FROM documents
      |  WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0),
      |words AS (
      |  SELECT doc_id, i, length(w[i]) AS a
      |  FROM d, unnest(generate_series(1, len(w))) AS t(i)),
      |offs AS (
      |  SELECT doc_id, i, a,
      |         sum(a + 1) OVER (PARTITION BY doc_id ORDER BY i
      |                          ROWS UNBOUNDED PRECEDING) - (a + 1) AS c
      |  FROM words),
      |arr AS (
      |  SELECT doc_id, list(a ORDER BY i) AS aa, list(c ORDER BY i) AS cc,
      |         count(*) AS nw
      |  FROM offs GROUP BY doc_id),
      |grams AS (
      |  SELECT d.doc_id, t.n, u.i,
      |         array_to_string(list_slice(d.w, u.i, u.i + t.n - 1), ' ') AS gram,
      |         a.cc[u.i] AS s,
      |         a.cc[u.i + t.n - 1] + a.aa[u.i + t.n - 1] AS e
      |  FROM d JOIN arr a USING (doc_id),
      |       unnest(generate_series(2, 10)) AS t(n),
      |       unnest(generate_series(1, len(d.w))) AS u(i)
      |  WHERE u.i + t.n - 1 <= a.nw),
      |counts AS (
      |  SELECT doc_id, n, gram, count(*) AS cnt
      |  FROM grams GROUP BY doc_id, n, gram),
      |top AS (
      |  SELECT doc_id, n,
      |         cnt * length(gram) AS top_chars,
      |         row_number() OVER (PARTITION BY doc_id, n
      |           ORDER BY cnt DESC, length(gram) DESC, gram ASC) AS rk
      |  FROM counts WHERE n <= 4),
      |dupspans AS (
      |  SELECT g.doc_id, g.n, g.s, g.e
      |  FROM grams g JOIN counts c USING (doc_id, n, gram)
      |  WHERE g.n >= 5 AND c.cnt >= 2),
      |marked AS (
      |  SELECT doc_id, n, s, e,
      |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id, n
      |      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -1) THEN 1 ELSE 0 END AS isl_start
      |  FROM dupspans),
      |islands AS (
      |  SELECT doc_id, n, s, e,
      |         sum(isl_start) OVER (PARTITION BY doc_id, n ORDER BY s, e
      |                              ROWS UNBOUNDED PRECEDING) AS isl
      |  FROM marked),
      |cov AS (
      |  SELECT doc_id, n, sum(mx - mn) AS covered
      |  FROM (SELECT doc_id, n, isl, max(e) AS mx, min(s) AS mn
      |        FROM islands GROUP BY doc_id, n, isl)
      |  GROUP BY doc_id, n),
      |sig AS (
      |  SELECT d.doc_id,
      |    coalesce(max(CASE WHEN t.n = 2 THEN t.top_chars END), 0) / CAST(d.nc AS DOUBLE) AS top2,
      |    coalesce(max(CASE WHEN t.n = 3 THEN t.top_chars END), 0) / CAST(d.nc AS DOUBLE) AS top3,
      |    coalesce(max(CASE WHEN t.n = 4 THEN t.top_chars END), 0) / CAST(d.nc AS DOUBLE) AS top4,
      |    coalesce(max(CASE WHEN v.n = 5 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup5,
      |    coalesce(max(CASE WHEN v.n = 6 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup6,
      |    coalesce(max(CASE WHEN v.n = 7 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup7,
      |    coalesce(max(CASE WHEN v.n = 8 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup8,
      |    coalesce(max(CASE WHEN v.n = 9 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup9,
      |    coalesce(max(CASE WHEN v.n = 10 THEN v.covered END), 0) / CAST(d.nc AS DOUBLE) AS dup10
      |  FROM d
      |  LEFT JOIN (SELECT * FROM top WHERE rk = 1) t ON d.doc_id = t.doc_id
      |  LEFT JOIN cov v ON d.doc_id = v.doc_id
      |  GROUP BY d.doc_id, d.nc)
      |SELECT doc_id,
      |  round(top2, 6) AS top2, round(top3, 6) AS top3, round(top4, 6) AS top4,
      |  round(dup5, 6) AS dup5, round(dup6, 6) AS dup6, round(dup7, 6) AS dup7,
      |  round(dup8, 6) AS dup8, round(dup9, 6) AS dup9, round(dup10, 6) AS dup10,
      |  (top2 <= 0.20 AND top3 <= 0.18 AND top4 <= 0.16 AND
      |   dup5 <= 0.15 AND dup6 <= 0.14 AND dup7 <= 0.13 AND
      |   dup8 <= 0.12 AND dup9 <= 0.11 AND dup10 <= 0.10) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin

  // --- q115: training-sequence packing (concat-and-chunk) -------------------
  /** The step between q98's token budgeting and an actual training
    * shard: GPT-style SEQUENCE PACKING — the corpus's token streams are
    * concatenated in doc_id order and cut into fixed-length training
    * sequences of L = 256 tokens (corpus-scaled; production uses
    * 2048-8192). Output: one row per (document × sequence) overlap —
    * (doc_id, seq_id, tok_start, tok_end) in document-local token
    * coordinates — i.e. exactly the index a sample loader needs to
    * materialize sequence k.
    *
    * Scale shape: token counting is map-only; the global offset is the
    * q98 two-level prefix sum — per-bucket token totals (doc_id div
    * 4096) take ONE tiny single-partition window over bucket totals
    * (rows = docs/4096, broadcast back), in-bucket prefixes window on
    * the bucket key. The shuffled payload is (doc_id, n) pairs — 16
    * bytes per document, never text. A trillion-doc corpus would add a
    * third level; the two-level form holds to ~10^10 docs. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val L = 256L
    val B = 4096L
    // d feeds BOTH the bucket-totals aggregate and the join. Instead of
    // cache() (which pins blocks for the life of the session unless the
    // caller unpersists), shuffle d by `bucket` ONCE: both consumers
    // need exactly hashpartitioning(bucket), so Catalyst plans the
    // second branch as a ReusedExchange over the same shuffle — the
    // tokenizing scan runs once, and the shuffle files age out with the
    // job instead of living in the block-manager cache.
    val d = Tables.documents(spark, dir)
      .withColumn("n", expr("size(filter(split(text, ' '), x -> x != ''))").cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"))
      .withColumn("bucket", expr(s"doc_id div $B"))
      // explicit, so the join-side InferFiltersFromConstraints doesn't
      // add it to only ONE consumer and break exchange-subtree equality
      .filter(col("bucket").isNotNull)
      .repartition(col("bucket"))
    // in-bucket running prefix AND bucket total in one windowed pass
    // over the shuffled rows — no second aggregate subtree, so both
    // consumers below share ONE canonical exchange
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = d
      .withColumn("inoff", coalesce(sum(col("n")).over(wIn), lit(0L)))
      .withColumn("btoks", sum(col("n")).over(Window.partitionBy(col("bucket"))))
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // docs/4096 rows: the single-partition window is over bucket TOTALS,
    // carried by each bucket's first row (the only row with inoff = 0)
    val boffs = marked.filter(col("inoff") === 0L)
      .select(col("bucket"), col("btoks"))
      .withColumn("boff", coalesce(sum(col("btoks")).over(wB), lit(0L)))
      .select(col("bucket"), col("boff"))
    marked.join(broadcast(boffs), Seq("bucket"))
      .withColumn("off", col("boff") + col("inoff"))
      .withColumn("seq_id",
        explode(expr(s"sequence(off div $L, (off + n - 1) div $L)")))
      .select(col("doc_id"), col("seq_id"),
        greatest(lit(0L), col("seq_id") * L - col("off")).as("tok_start"),
        least(col("n"), (col("seq_id") + 1) * L - col("off")).as("tok_end"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  /** Same packing arithmetic over DuckDB's native global window +
    * lateral series — all-integer, so the gate is exact. */
  val sequencePackingOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n
      |  FROM documents
      |  WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0),
      |offs AS (
      |  SELECT doc_id, n,
      |    coalesce(sum(n) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM d)
      |SELECT doc_id, s.seq_id,
      |  CAST(greatest(0, s.seq_id * 256 - off) AS BIGINT) AS tok_start,
      |  CAST(least(n, (s.seq_id + 1) * 256 - off) AS BIGINT) AS tok_end
      |FROM offs, LATERAL (
      |  SELECT unnest(generate_series(CAST(off // 256 AS BIGINT),
      |                                CAST((off + n - 1) // 256 AS BIGINT))) AS seq_id) s
      |ORDER BY seq_id, doc_id""".stripMargin

  // --- registry ------------------------------------------------------------
  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_repetition" -> ((s, d) => repetition(s, d)),
    "q46_curation" -> ((s, d) => curation(s, d)),
    "q47_stratified_sample" -> ((s, d) => stratifiedSample(s, d)),
    "q40_quality_score" -> ((s, d) => qualityScore(s, d)),
    "q41_token_stats" -> ((s, d) => tokenStats(s, d)),
    "q42_lang_id" -> ((s, d) => langId(s, d)),
    "q150_langid_confusion" -> ((s, d) => langIdConfusion(s, d)),
    "q43_fingerprint" -> ((s, d) => fingerprint(s, d)),
    "q44_tfidf" -> ((s, d) => tfidf(s, d)),
    "q58_lm_fluency" -> ((s, d) => lmFluency(s, d)),
    "q59_heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "q83_bpe_train" -> ((s, d) => bpeTrainChecked(s, d)),
    "q83b_bpe_encode" -> ((s, d) => bpeEncodeChecked(s, d)),
    "q88_heavy_hitters_sketch" -> ((s, d) => heavyHittersSketch(s, d)),
    "q175_countmin_freq" -> ((s, d) => countMinFreq(s, d)),
    "q95_gopher_rules" -> ((s, d) => gopherRules(s, d)),
    "q114_gopher_repetition" -> ((s, d) => gopherRepetition(s, d)),
    "q115_sequence_packing" -> ((s, d) => sequencePacking(s, d)),
    "q98_token_budget" -> ((s, d) => tokenBudget(s, d)),
    "q102_text_normalize" -> ((s, d) => textNormalize(s, d)),
    "q107_mojibake_repair" -> ((s, d) => mojibakeRepair(s, d)),
    "q110_ccnet_buckets" -> ((s, d) => ccnetBuckets(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q45_repetition" -> repetitionOracle,
    "q46_curation" -> curationOracle,
    "q47_stratified_sample" -> stratifiedSampleOracle,
    "q40_quality_score" -> qualityScoreOracle,
    "q41_token_stats" -> tokenStatsOracle,
    "q42_lang_id" -> langIdOracle,
    "q150_langid_confusion" -> langIdConfusionOracle,
    "q43_fingerprint" -> fingerprintOracle,
    "q44_tfidf" -> tfidfOracle,
    "q58_lm_fluency" -> lmFluencyOracle,
    "q59_heavy_hitters" -> heavyHittersOracle,
    // the sketch-first path confirms candidates with exact counts, so the
    // exact top-20 oracle applies verbatim — the sketch is the delta
    "q88_heavy_hitters_sketch" -> heavyHittersOracle,
    "q175_countmin_freq" -> countMinFreqOracle,
    // witness tier: split-based counts recomputed by DuckDB, encode
    // invariants as literal-TRUE booleans (q66 precedent)
    "q83b_bpe_encode" -> bpeEncodeCheckedOracle,
    // witness tier: merge-table invariants + DuckDB-recomputed first merge
    "q83_bpe_train" -> bpeTrainCheckedOracle,
    "q95_gopher_rules" -> gopherRulesOracle,
    "q114_gopher_repetition" -> gopherRepetitionOracle,
    "q115_sequence_packing" -> sequencePackingOracle,
    "q98_token_budget" -> tokenBudgetOracle,
    "q102_text_normalize" -> textNormalizeOracle,
    // q107: the oracle rebuilds the expected clean text verbatim — the
    // whole repair path is under the string-level bit-exact gate
    "q107_mojibake_repair" -> mojibakeRepairOracle,
    "q110_ccnet_buckets" -> ccnetBucketsOracle
  )
}
