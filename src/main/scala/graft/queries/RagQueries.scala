package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caching._
import graft.core.Tables
import graft.embed.HashEmbedder
import graft.text.Chunker
import graft.vector.TopK

/** The reference's RAG/ingestion query surface re-expressed Spark-first
  * (SURVEY §2.1-§2.3): chunking, embedding/index build, chat-memory
  * window, preview/truncation, relevance gate, containment theta-join,
  * extension dispatch, anti-join re-ingest guard.
  */
object RagQueries {

  /** The fixed "chat queries" used by the relevance/routing surface —
    * mirrored verbatim in the oracle SQL VALUES lists. Query 2 retrieves
    * <3 docs AND matches no keywords, so it exercises the non-relevant
    * path of the gate (app.py:279-295). */
  val chatQueries: Seq[(Int, String)] = Seq(
    0 -> "spark merge join speed",
    1 -> "filter window hash table scan",
    2 -> "purple elephant quantum")

  /** VALUES list for oracle SQL — shared with AgentQueries' router oracle
    * so quoting can never diverge between the gate and the router. */
  private[queries] val chatQueriesSqlValues =
    chatQueries.map { case (i, q) => s"($i, '${q.replace("'", "''")}')" }.mkString(", ")

  private def chatQueriesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    chatQueries.toDF("query_id", "qtext")
  }

  // --- O16: sliding chat-memory window ------------------------------------
  /** Last-10-messages-per-session transcript (app.py:110-120): messages are
    * modeled from `events` (session=user_id, seq=event_id, role=event_type,
    * content=props). rank<=10 compiles to WindowGroupLimitExec; the
    * transcript concat is an ObjectHashAggregate over ≤10 rows per key. */
  def memoryWindow(spark: SparkSession, dir: String): DataFrame = {
    val msgs = Tables.events(spark, dir).select(
      col("user_id").as("session_id"),
      col("event_id").as("seq"),
      col("event_type").as("role"),
      col("props").as("content"))
    val w = Window.partitionBy("session_id").orderBy(desc("seq"))
    msgs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .withColumn("line", concat(upper(col("role")), lit(": "), col("content")))
      .groupBy(col("session_id"))
      .agg(
        count(lit(1)).as("n_msgs"),
        array_join(
          transform(array_sort(collect_list(struct(col("seq"), col("line")))), _.getField("line")),
          "\n\n").as("transcript"))
      .orderBy(col("session_id"))
  }

  val memoryWindowOracle: String =
    """WITH m AS (
      |  SELECT user_id AS session_id, event_id AS seq,
      |         upper(event_type) || ': ' || props AS line,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events)
      |SELECT session_id, count(*) AS n_msgs,
      |       string_agg(line, chr(10) || chr(10) ORDER BY seq) AS transcript
      |FROM m WHERE rn <= 10 GROUP BY session_id ORDER BY session_id""".stripMargin

  // --- O9: preview scan (first 10 tokens + ellipsis marker) ---------------
  def preview(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        concat(
          array_join(slice(col("toks"), 1, 10), " "),
          when(size(col("toks")) > 10, lit(" ...")).otherwise(lit(""))).as("preview"),
        size(col("toks")).cast("bigint").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val previewOracle: String =
    """SELECT doc_id,
      |  array_to_string(string_split(text, ' ')[1:10], ' ') ||
      |    CASE WHEN len(string_split(text, ' ')) > 10 THEN ' ...' ELSE '' END AS preview,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- O14+O23: context assembly (top-3 × 300 chars per query) ------------
  /** Retrieval context exactly as the reference assembles it
    * (app.py:359, 544): top-3 docs per query, first 300 chars each,
    * joined with ' '. Retrieval = cosine top-3 over embeddings, joined to
    * documents on vec_id=doc_id (broadcast: k·|queries| rows). */
  def contextAssembly(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = emb.select(col("vec_id"), col("embedding").as("cvec"))
    val top3 = TopK.topKCosine(queries, cands, k = 3)
    val docs = Tables.documents(spark, dir)
    top3.join(docs, top3("vec_id") === docs("doc_id"))
      .withColumn("snippet", substring(col("text"), 1, 300))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_sources"),
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("snippet")))), _.getField("snippet")),
          " ").as("context"))
      .orderBy(col("query_id"))
  }

  val contextAssemblyOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 3),
      |     c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      |     scored AS (
      |       SELECT q.query_id, c.vec_id,
      |              row_number() OVER (PARTITION BY q.query_id
      |                                 ORDER BY list_cosine_similarity(qe, ce) DESC, c.vec_id) AS rnk
      |       FROM q CROSS JOIN c),
      |     top3 AS (SELECT query_id, vec_id, rnk FROM scored WHERE rnk <= 3)
      |SELECT query_id, count(*) AS n_sources,
      |       string_agg(substring(d.text, 1, 300), ' ' ORDER BY rnk) AS context
      |FROM top3 JOIN documents d ON top3.vec_id = d.doc_id
      |GROUP BY query_id ORDER BY query_id""".stripMargin

  // --- O19/O20: relevance gate --------------------------------------------
  /** Replicates app.py:279-295 arithmetic exactly: relevant iff
    * n_docs >= 3 (short-circuit) OR matches >= n_keywords/2, where
    * keywords are distinct query tokens with length > 3 and a match is a
    * (doc, keyword) pair with the keyword contained in the doc text.
    * The "retrieved set" is a deterministic 5/5/2-doc window per query. */
  def relevanceGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = chatQueriesDf(spark)
    val retrieved = queries.join(docs,
      col("doc_id") >= col("query_id") * 5 &&
        col("doc_id") <= col("query_id") * 5 + when(col("query_id") === 2, 1).otherwise(4))
    val kws = queries
      .select(col("query_id"), explode(split(lower(col("qtext")), " ")).as("kw"))
      .filter(length(col("kw")) > 3).distinct()
    val matches = retrieved.join(kws, Seq("query_id"))
      .filter(col("text").contains(col("kw")))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_matches"))
    val nDocs = retrieved.groupBy(col("query_id")).agg(count(lit(1)).as("n_docs"))
    val nKws = kws.groupBy(col("query_id")).agg(count(lit(1)).as("n_keywords"))
    queries.select("query_id")
      .join(nDocs, Seq("query_id"), "left")
      .join(nKws, Seq("query_id"), "left")
      .join(matches, Seq("query_id"), "left")
      .na.fill(0, Seq("n_docs", "n_keywords", "n_matches"))
      .withColumn("relevant",
        col("n_docs") >= 3 || col("n_matches") >= col("n_keywords") / lit(2.0))
      .orderBy(col("query_id"))
  }

  val relevanceGateOracle: String =
    s"""WITH q(query_id, qtext) AS (VALUES $chatQueriesSqlValues),
       |  retrieved AS (
       |    SELECT q.query_id, d.doc_id, d.text FROM q JOIN documents d
       |    ON d.doc_id >= q.query_id * 5
       |   AND d.doc_id <= q.query_id * 5 + CASE WHEN q.query_id = 2 THEN 1 ELSE 4 END),
       |  kws AS (
       |    SELECT DISTINCT query_id, kw
       |    FROM (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS kw FROM q)
       |    WHERE length(kw) > 3),
       |  m AS (SELECT r.query_id, count(*) AS n_matches
       |        FROM retrieved r JOIN kws k ON r.query_id = k.query_id
       |        WHERE contains(r.text, k.kw) GROUP BY r.query_id),
       |  nd AS (SELECT query_id, count(*) AS n_docs FROM retrieved GROUP BY query_id),
       |  nk AS (SELECT query_id, count(*) AS n_keywords FROM kws GROUP BY query_id)
       |SELECT q.query_id, coalesce(nd.n_docs, 0) AS n_docs,
       |       coalesce(nk.n_keywords, 0) AS n_keywords,
       |       coalesce(m.n_matches, 0) AS n_matches,
       |       (coalesce(nd.n_docs, 0) >= 3
       |        OR coalesce(m.n_matches, 0) >= coalesce(nk.n_keywords, 0) / 2.0) AS relevant
       |FROM q LEFT JOIN nd USING (query_id) LEFT JOIN nk USING (query_id)
       |       LEFT JOIN m USING (query_id)
       |ORDER BY query_id""".stripMargin

  // --- O22/O13: containment theta-join ------------------------------------
  /** The (query-token × doc) containment join itself, pairs materialized.
    * The token side is tiny and broadcast — BroadcastNestedLoopJoin with
    * the `contains` predicate evaluated in codegen. */
  def containmentJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 20)
    val kws = chatQueriesDf(spark)
      .select(col("query_id"), explode(split(lower(col("qtext")), " ")).as("kw"))
      .filter(length(col("kw")) > 3).distinct()
    docs.join(broadcast(kws), col("text").contains(col("kw")))
      .select(col("query_id"), col("kw"), col("doc_id"))
      .orderBy(col("query_id"), col("kw"), col("doc_id"))
  }

  val containmentJoinOracle: String =
    s"""WITH q(query_id, qtext) AS (VALUES $chatQueriesSqlValues),
       |  kws AS (
       |    SELECT DISTINCT query_id, kw
       |    FROM (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS kw FROM q)
       |    WHERE length(kw) > 3)
       |SELECT query_id, kw, doc_id
       |FROM documents d JOIN kws k ON contains(d.text, k.kw)
       |WHERE d.doc_id < 20
       |ORDER BY query_id, kw, doc_id""".stripMargin

  // --- O10: extension-based dispatch --------------------------------------
  /** Synthesizes the reference's `name.split('.')[-1].lower()` dispatch
    * (app.py:460) over generated file names, then counts per format. */
  def extensionDispatch(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("file_name",
        format_string("file_%d.%s", col("doc_id"),
          when(col("doc_id") % 3 === 0, "PDF")
            .when(col("doc_id") % 3 === 1, "docx").otherwise("txt")))
      .withColumn("ext", lower(element_at(split(col("file_name"), "\\."), -1)))
      .groupBy(col("ext"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("ext"))
  }

  val extensionDispatchOracle: String =
    """WITH f AS (
      |  SELECT doc_id, n_chars,
      |         printf('file_%d.%s', doc_id,
      |                CASE WHEN doc_id % 3 = 0 THEN 'PDF'
      |                     WHEN doc_id % 3 = 1 THEN 'docx' ELSE 'txt' END) AS file_name
      |  FROM documents)
      |SELECT lower(string_split(file_name, '.')[-1]) AS ext,
      |       count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM f GROUP BY 1 ORDER BY ext""".stripMargin

  // --- O11: non-empty predicate / coalesce default ------------------------
  def nonEmptyDefaults(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(length(trim(col("props"))) > 0)
      .withColumn("etype", coalesce(nullif(trim(col("event_type")), lit("")), lit("unknown")))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("etype"))
  }

  val nonEmptyDefaultsOracle: String =
    """SELECT coalesce(nullif(trim(event_type), ''), 'unknown') AS etype,
      |       count(*) AS n_events
      |FROM events WHERE length(trim(props)) > 0
      |GROUP BY 1 ORDER BY etype""".stripMargin

  // --- O15/O25: anti-join re-ingest guard ---------------------------------
  /** New-file change detection (app.py:455): incoming batch minus already
    * indexed docs, as a left_anti join. */
  def reingestGuard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.filter(col("source") === "src0")
    val indexed = docs.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("ix_id"))
    incoming.join(indexed, col("doc_id") === col("ix_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val reingestGuardOracle: String =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE source = 'src0'
      |  AND NOT EXISTS (SELECT 1 FROM documents i
      |                  WHERE i.doc_id % 7 = 0 AND i.doc_id = documents.doc_id)
      |ORDER BY doc_id""".stripMargin

  // --- D2: fixed-stride chunker (oracle-checkable variant) ----------------
  /** SQL-expressible stride chunking (SURVEY §7.2 step 2): windows of 120
    * chars every 80 chars. The separator-aware recursive variant below is
    * the faithful one; this variant exists for cross-engine verification. */
  def chunkStride(spark: SparkSession, dir: String): DataFrame = {
    val size = 120
    val stride = 80
    Tables.documents(spark, dir)
      // empty docs produce no chunks (sequence(0,-1,s) throws under ANSI;
      // the oracle's generate_series returns empty — filter on both sides)
      .filter(length(col("text")) > 0)
      .withColumn("len", length(col("text")))
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), col("len") - 1, lit(stride))).as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        col("start").cast("bigint").as("start"),
        expr(s"substring(text, start + 1, $size)").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val chunkStrideOracle: String =
    """SELECT doc_id,
      |  CAST(start // 80 AS INTEGER) AS chunk_id,
      |  CAST(start AS BIGINT) AS start,
      |  substring(text, CAST(start AS INTEGER) + 1, 120) AS chunk
      |FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) - 1, 80)) AS start
      |      FROM documents WHERE length(text) > 0)
      |ORDER BY doc_id, chunk_id""".stripMargin

  // --- D2 faithful: recursive separator-aware chunker ---------------------
  /** The reference's actual splitter semantics via Dataset.flatMap
    * (size/overlap scaled to the corpus: 200/40).
    *
    * Oracle: on this corpus class (single-space ASCII, no newlines, every
    * word shorter than chunkSize − overlap) the recursive splitter
    * REDUCES to a closed form — greedy word-packing where chunk k spans
    * words [s_k, e_k] with e_k = max e such that span(s_k, e) ≤ 200 and
    * s_{k+1} = min s such that span(s, e_k) ≤ 40 (span = characters
    * including inner separators; both argmaxes are monotone, so they are
    * prefix-counts over the word-offset array). That IS expressible in
    * DuckDB as a recursive CTE over (doc, chunk_k, start_word) — one
    * iteration per chunk, not per word. The general splitter semantics
    * (nested separators, oversized splits, char-split fallback) stay
    * covered by ChunkerSpec's unit tests; the oracle's preconditions are
    * verified for every fixture rung in CurationQueriesSpec/corpus
    * probes (max word 8 chars, no double/edge spaces, no newlines). */
  def chunkRecursive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.flatMap { case (id, text) =>
      Chunker.chunkWithIds(text, chunkSize = 200, overlap = 40)
        .map(c => (id, c.chunkId, c.text.length, c.text))
    }.toDF("doc_id", "chunk_id", "chunk_len", "chunk")
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Closed-form greedy word-packing as a DuckDB recursive CTE (see the
    * Scaladoc above for the derivation and preconditions). `aa` = word
    * lengths, `cc` = 0-based char offset of each word; span(s,e) =
    * cc[e]+aa[e]−cc[s]. The recursion emits one row per CHUNK, so depth =
    * max chunks per doc (~4 here), independent of document length. */
  val chunkRecursiveOracle: String =
    """WITH RECURSIVE
      |base AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w
      |  FROM documents WHERE length(text) > 0),
      |words AS (
      |  SELECT doc_id, i, len(w[i]) AS a
      |  FROM base, unnest(generate_series(1, len(w))) AS t(i)),
      |offs AS (
      |  SELECT doc_id, i, a,
      |         sum(a + 1) OVER (PARTITION BY doc_id ORDER BY i
      |                          ROWS UNBOUNDED PRECEDING) - (a + 1) AS c
      |  FROM words),
      |arr AS (
      |  SELECT doc_id, list(a ORDER BY i) AS aa, list(c ORDER BY i) AS cc,
      |         count(*) AS nw
      |  FROM offs GROUP BY doc_id),
      |chunks AS (
      |  SELECT doc_id, 0 AS k, CAST(1 AS BIGINT) AS s FROM arr
      |  UNION ALL
      |  SELECT r.doc_id, r.k + 1, n.next_s
      |  FROM (
      |    SELECT c.doc_id, c.k, a.nw,
      |           c.s - 1 + len(list_filter(generate_series(c.s, a.nw),
      |             e2 -> a.cc[e2] + a.aa[e2] - a.cc[c.s] <= 200)) AS e,
      |           a.cc AS cc, a.aa AS aa, c.s AS s
      |    FROM chunks c JOIN arr a USING (doc_id)) r
      |  CROSS JOIN LATERAL (SELECT r.e + 1 - len(list_filter(generate_series(r.s, r.e),
      |             s2 -> r.cc[r.e] + r.aa[r.e] - r.cc[s2] <= 40)) AS next_s) n
      |  WHERE r.e < r.nw)
      |SELECT b.doc_id, CAST(ch.k AS INTEGER) AS chunk_id,
      |       CAST(a.cc[e.e] + a.aa[e.e] - a.cc[ch.s] AS INTEGER) AS chunk_len,
      |       substring(b.text, CAST(a.cc[ch.s] AS INTEGER) + 1,
      |                 CAST(a.cc[e.e] + a.aa[e.e] - a.cc[ch.s] AS INTEGER)) AS chunk
      |FROM chunks ch
      |JOIN arr a USING (doc_id)
      |JOIN base b USING (doc_id)
      |CROSS JOIN LATERAL (SELECT ch.s - 1 + len(list_filter(generate_series(ch.s, a.nw),
      |       e2 -> a.cc[e2] + a.aa[e2] - a.cc[ch.s] <= 200)) AS e) e
      |ORDER BY doc_id, chunk_id""".stripMargin

  // --- O7: embed + index build (rows-only) --------------------------------
  /** Ingestion tail (app.py:204-212): chunks → deterministic hash embedding
    * → index rows. Writing the result IS the index build; embedding values
    * are unit-tested (EmbedderSpec), not oracle-checked. The output carries
    * scalar digests of the vector (dim, L2 norm, element sum) rather than
    * the raw ARRAY column — array cells aren't sortable/hashable in the
    * driver's comparator, and the digests pin the same bytes. */
  def indexBuild(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkRecursive(spark, dir)
    val emb = HashEmbedder.embedUdf(64)
    chunks
      .withColumn("embedding", graft.functions.VectorFns.asDouble(emb(col("chunk"))))
      .select(col("doc_id"), col("chunk_id"), col("chunk"),
        size(col("embedding")).as("emb_dim"),
        round(graft.functions.VectorFns.normL2(col("embedding")), 6).as("emb_norm"),
        round(expr("aggregate(embedding, 0D, (a, x) -> a + x)"), 6).as("emb_sum"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // --- q81: BM25 keyword ranking -------------------------------------------
  /** Okapi BM25 (k1=1.2, b=0.75, Lucene's ln(1 + (N-df+.5)/(df+.5)) idf)
    * over the chat queries — the ranking the reference's keyword leg
    * (app.py:279-295 counts matches; BM25 is what a real keyword engine
    * computes over the same tokens).
    *
    * Scale shape: the corpus is exploded ONCE and immediately semi-joined
    * against the broadcast query-term dictionary — tf, df and every later
    * stage see only matching (doc, term) rows, never the full vocabulary
    * (contrast q44, whose product is the corpus-wide df). Corpus stats
    * (N, Σdl) reduce to one broadcast row; Σdl sums LONG token counts so
    * avgdl is a single exact division, not an order-sensitive double sum.
    * Per-term contributions round into DECIMAL(28,12) before the per-doc
    * sum, so the float total is order-insensitive (the repo's standard
    * trick for cross-engine float aggregation) and the rank window orders
    * by the exact decimal, not its double projection. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .withColumn("dl", expr("size(toks)").cast("bigint"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val terms = chatQueriesDf(spark)
      .select(col("query_id"), explode(split(lower(col("qtext")), " ")).as("term"))
      .filter(length(col("term")) > 3).distinct()
    val matched = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(terms.select("term").distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val contrib = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(terms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c",
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .cast("decimal(28,12)"))
    val w = Window.partitionBy("query_id").orderBy(desc("s"), asc("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id")).agg(sum(col("c")).as("s"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double"), 6).as("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val bm25Oracle: String =
    s"""WITH chatq(query_id, qtext) AS (VALUES $chatQueriesSqlValues),
       |  terms AS (
       |    SELECT DISTINCT query_id, term
       |    FROM (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS term FROM chatq)
       |    WHERE length(term) > 3),
       |  docs AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
       |           FROM documents),
       |  dls AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       |  stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dls),
       |  matched AS (
       |    SELECT t.doc_id, t.term, CAST(count(*) AS DOUBLE) AS tf
       |    FROM (SELECT doc_id, unnest(toks) AS term FROM docs) t
       |    WHERE t.term IN (SELECT DISTINCT term FROM terms) GROUP BY 1, 2),
       |  dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM matched GROUP BY term),
       |  contrib AS (
       |    SELECT te.query_id, m.doc_id,
       |           CAST(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
       |                * m.tf * 2.2 / (m.tf + 1.2 * (0.25 + 0.75 * CAST(dls.dl AS DOUBLE) / s.avgdl))
       |                AS DECIMAL(28,12)) AS c
       |    FROM matched m JOIN dfreq d USING (term) JOIN terms te USING (term)
       |         JOIN dls ON dls.doc_id = m.doc_id CROSS JOIN stats s),
       |  agg AS (SELECT query_id, doc_id, sum(c) AS s FROM contrib GROUP BY 1, 2),
       |  ranked AS (SELECT query_id, doc_id, s,
       |                    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rnk
       |             FROM agg)
       |SELECT query_id, doc_id, round(CAST(s AS DOUBLE), 6) AS bm25, CAST(rnk AS INTEGER) AS rank
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin

  // --- q82: reciprocal-rank-fusion hybrid search ----------------------------
  /** RRF (Cormack et al. 2009, the fusion every hybrid search engine
    * ships): vector leg = q17's top-20 cosine ranking, keyword leg =
    * q19's match-count ranking, fused as Σ 1/(60 + rank). The reference's
    * hybrid combine (O24, app.py's doc+web merge) upgraded from
    * concatenation to principled rank fusion.
    *
    * Cross-engine exactness is free here: fusion consumes only INTEGER
    * ranks (ties broken on ids), and 1/(60+r) is one correctly-rounded
    * IEEE division, so the two-term sum is bit-identical in any engine.
    * Scale: each leg ends in a WindowGroupLimit (≤20 rows/query cross the
    * wire), the fusion join and final window touch ≤40 rows/query. */
  def rrfHybrid(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val vleg = TopK.topKCosine(
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.select(col("vec_id"), col("embedding").as("cvec")), k = 20)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank").as("vrank"))
    val kws = chatQueriesDf(spark)
      .select(col("query_id").cast("bigint").as("query_id"),
        explode(split(lower(col("qtext")), " ")).as("kw"))
      .filter(length(col("kw")) > 3).distinct()
    val wk = Window.partitionBy("query_id").orderBy(desc("n_matches"), asc("doc_id"))
    val kleg = Tables.documents(spark, dir)
      .join(broadcast(kws), col("text").contains(col("kw")))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("n_matches"))
      .withColumn("krank", row_number().over(wk))
      .filter(col("krank") <= 20)
      .select(col("query_id"), col("doc_id"), col("krank"))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("doc_id"))
    vleg.join(kleg, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("krank")), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 10)
      .select(col("query_id").cast("int").as("query_id"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"),
        col("vrank").cast("int").as("vrank"), col("krank").cast("int").as("krank"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val rrfHybridOracle: String =
    s"""WITH chatq(query_id, qtext) AS (VALUES $chatQueriesSqlValues),
       |  q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |        FROM embeddings WHERE vec_id < 3),
       |  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |  vleg AS (
       |    SELECT query_id, vec_id AS doc_id, rnk AS vrank FROM (
       |      SELECT q.query_id, c.vec_id,
       |             row_number() OVER (PARTITION BY q.query_id
       |                                ORDER BY list_cosine_similarity(qe, ce) DESC, c.vec_id) AS rnk
       |      FROM q CROSS JOIN c) WHERE rnk <= 20),
       |  kws AS (
       |    SELECT DISTINCT query_id, kw
       |    FROM (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS kw FROM chatq)
       |    WHERE length(kw) > 3),
       |  km AS (SELECT k.query_id, d.doc_id, count(*) AS n_matches
       |         FROM kws k JOIN documents d ON contains(d.text, k.kw) GROUP BY 1, 2),
       |  kleg AS (
       |    SELECT query_id, doc_id, rnk AS krank FROM (
       |      SELECT query_id, doc_id,
       |             row_number() OVER (PARTITION BY query_id ORDER BY n_matches DESC, doc_id) AS rnk
       |      FROM km) WHERE rnk <= 20),
       |  fused AS (
       |    SELECT coalesce(v.query_id, k.query_id) AS query_id,
       |           coalesce(v.doc_id, k.doc_id) AS doc_id,
       |           coalesce(1e0 / (60 + v.vrank), 0e0) + coalesce(1e0 / (60 + k.krank), 0e0) AS rrf,
       |           v.vrank, k.krank
       |    FROM vleg v FULL OUTER JOIN kleg k
       |      ON v.query_id = k.query_id AND v.doc_id = k.doc_id),
       |  ranked AS (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
       |    FROM fused)
       |SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, round(rrf, 6) AS rrf,
       |       CAST(vrank AS INTEGER) AS vrank, CAST(krank AS INTEGER) AS krank,
       |       CAST(rnk AS INTEGER) AS rank
       |FROM ranked WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin

  // --- q90: retrieval evaluation metrics ------------------------------------
  /** The eval harness every retrieval stack needs: score one ranker
    * against another as ground truth. Here the exact top-10 cosine
    * ranking (the reference's vector leg) is the relevance set and the
    * BM25 keyword leg (q81, top-5) is the system under test; per query
    * the output is overlap, recall@5 and MRR, plus a macro-average row
    * (query_id = -1).
    *
    * Exactness: membership and ranks are INTEGERS; recall is a
    * small-integer division; each reciprocal rank is ONE IEEE division
    * cast to DECIMAL(28,12) before any sum (the repo's order-insensitive
    * float-aggregation trick), so every engine computes the identical
    * decimal. Scale: both rankers end in WindowGroupLimit (≤10 rows per
    * query cross the wire); the metric join touches ≤15 rows per query. */
  def retrievalMetrics(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val gt = TopK.topKCosine(
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.select(col("vec_id"), col("embedding").as("cvec")), k = 10)
      .select(col("query_id").cast("int").as("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("grank"))
    val sys = bm25(spark, dir).select(col("query_id"), col("doc_id"), col("rank").as("srank"))
    // anchor on the query UNIVERSE: a system that returns nothing for a
    // query (query 2 matches no keywords) scores 0, it doesn't vanish
    val perQuery = chatQueriesDf(spark).select(col("query_id"))
      .join(sys.join(gt, Seq("query_id", "doc_id"), "left"), Seq("query_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("grank").isNotNull, 1L).otherwise(0L)).as("n_overlap"),
        // reciprocal rank of the FIRST system hit that is relevant
        min(when(col("grank").isNotNull, col("srank"))).as("first_hit_rank"))
      .withColumn("recall_at_5",
        round(col("n_overlap").cast("double") / lit(5.0), 6))
      .withColumn("rr",
        coalesce((lit(1.0) / col("first_hit_rank").cast("double"))
          .cast("decimal(28,12)"), lit(0.0).cast("decimal(28,12)")))
    val macroRow = perQuery.agg(
      lit(-1).as("query_id"),
      sum(col("n_overlap")).as("n_overlap"),
      lit(null).cast("int").as("first_hit_rank"),
      round(avg(col("recall_at_5")), 6).as("recall_at_5"),
      sum(col("rr")).as("rr_sum"),
      count(lit(1)).as("n_q"))
      .select(col("query_id"), col("n_overlap"), col("first_hit_rank"),
        col("recall_at_5"),
        round((col("rr_sum") / col("n_q")).cast("double"), 6).as("mrr"))
    perQuery
      .select(col("query_id"), col("n_overlap"), col("first_hit_rank").cast("int"),
        col("recall_at_5"), round(col("rr").cast("double"), 6).as("mrr"))
      .unionByName(macroRow)
      .orderBy(col("query_id"))
  }

  val retrievalMetricsOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |        FROM embeddings WHERE vec_id < 3),
       |  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |  gt AS (
       |    SELECT CAST(query_id AS INTEGER) AS query_id, vec_id AS doc_id, rnk AS grank FROM (
       |      SELECT q.query_id, c.vec_id,
       |             row_number() OVER (PARTITION BY q.query_id
       |                                ORDER BY list_cosine_similarity(qe, ce) DESC, c.vec_id) AS rnk
       |      FROM q CROSS JOIN c) WHERE rnk <= 10),
       |  sys AS (SELECT query_id, doc_id, rank AS srank FROM (
       |    ${bm25Oracle})),
       |  chatq(query_id, qtext) AS (VALUES $chatQueriesSqlValues),
       |  joined AS (
       |    SELECT s.query_id, s.srank, g.grank
       |    FROM sys s LEFT JOIN gt g ON s.query_id = g.query_id AND s.doc_id = g.doc_id),
       |  per_q AS (
       |    SELECT cq.query_id,
       |      CAST(sum(CASE WHEN grank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |      min(CASE WHEN grank IS NOT NULL THEN srank END) AS first_hit_rank
       |    FROM chatq cq LEFT JOIN joined j ON cq.query_id = j.query_id
       |    GROUP BY cq.query_id),
       |  scored AS (
       |    SELECT query_id, n_overlap, CAST(first_hit_rank AS INTEGER) AS first_hit_rank,
       |      round(CAST(n_overlap AS DOUBLE) / 5.0, 6) AS recall_at_5,
       |      coalesce(CAST(1e0 / first_hit_rank AS DECIMAL(28,12)),
       |               CAST(0 AS DECIMAL(28,12))) AS rr
       |    FROM per_q),
       |  macro AS (
       |    SELECT -1 AS query_id, CAST(sum(n_overlap) AS BIGINT) AS n_overlap,
       |      CAST(NULL AS INTEGER) AS first_hit_rank,
       |      round(avg(recall_at_5), 6) AS recall_at_5,
       |      round(CAST(sum(rr) / count(*) AS DOUBLE), 6) AS mrr
       |    FROM scored)
       |SELECT query_id, n_overlap, first_hit_rank, recall_at_5,
       |       round(CAST(rr AS DOUBLE), 6) AS mrr FROM scored
       |UNION ALL SELECT * FROM macro
       |ORDER BY query_id""".stripMargin

  // --- q93: Kendall-tau rank agreement --------------------------------------
  /** How much does hybrid fusion reorder the vector ranking? Kendall's
    * tau between the exact cosine top-10 and the RRF top-10 per query,
    * over their SHARED documents: concordant/discordant pair counts and
    * tau = (C − D) / (n(n−1)/2). Everything is INTEGER until the final
    * ratio (one division of small exact integers, rounded at 6), so the
    * agreement score is bit-exact in any engine. Scale: both rankings
    * are ≤10 rows per query past their WindowGroupLimits, the pair
    * self-join is ≤45 rows per query — the metric costs nothing at any
    * corpus size because the rankers already bounded their outputs. */
  def rankAgreement(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val a = TopK.topKCosine(
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.select(col("vec_id"), col("embedding").as("cvec")), k = 10)
      .select(col("query_id").cast("int").as("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("arank"))
    val b = rrfHybrid(spark, dir)
      .select(col("query_id"), col("doc_id"), col("rank").as("brank"))
    val shared = a.join(b, Seq("query_id", "doc_id"))
    val p1 = shared.select(col("query_id"), col("doc_id").as("d1"),
      col("arank").as("a1"), col("brank").as("b1"))
    val p2 = shared.select(col("query_id"), col("doc_id").as("d2"),
      col("arank").as("a2"), col("brank").as("b2"))
    val pairs = p1.join(p2, Seq("query_id")).filter(col("d1") < col("d2"))
      .withColumn("concordant",
        ((col("a1") < col("a2")) === (col("b1") < col("b2"))).cast("long"))
    pairs.groupBy(col("query_id"))
      .agg(
        (count(lit(1)) * 2).as("n_pairs_x2"),
        sum(col("concordant")).as("concordant"),
        sum(lit(1L) - col("concordant")).as("discordant"))
      .withColumn("n_shared",
        ((lit(1.0) + sqrt(lit(1.0) + lit(4.0) * col("n_pairs_x2"))) / 2).cast("long"))
      .withColumn("tau", round(
        (col("concordant") - col("discordant")).cast("double") / (col("n_pairs_x2") / lit(2.0)), 6))
      .select(col("query_id"), col("n_shared"), col("concordant"), col("discordant"), col("tau"))
      .orderBy(col("query_id"))
  }

  val rankAgreementOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |        FROM embeddings WHERE vec_id < 3),
       |  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |  a AS (
       |    SELECT CAST(query_id AS INTEGER) AS query_id, vec_id AS doc_id, rnk AS arank FROM (
       |      SELECT q.query_id, c.vec_id,
       |             row_number() OVER (PARTITION BY q.query_id
       |                                ORDER BY list_cosine_similarity(qe, ce) DESC, c.vec_id) AS rnk
       |      FROM q CROSS JOIN c) WHERE rnk <= 10),
       |  b AS (SELECT query_id, doc_id, rank AS brank FROM (
       |    ${rrfHybridOracle})),
       |  shared AS (
       |    SELECT a.query_id, a.doc_id, a.arank, b.brank
       |    FROM a JOIN b ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
       |  pairs AS (
       |    SELECT s1.query_id,
       |      CASE WHEN (s1.arank < s2.arank) = (s1.brank < s2.brank)
       |           THEN 1 ELSE 0 END AS concordant
       |    FROM shared s1 JOIN shared s2
       |      ON s1.query_id = s2.query_id AND s1.doc_id < s2.doc_id),
       |  agg AS (
       |    SELECT query_id, CAST(count(*) * 2 AS BIGINT) AS n_pairs_x2,
       |      CAST(sum(concordant) AS BIGINT) AS concordant,
       |      CAST(sum(1 - concordant) AS BIGINT) AS discordant
       |    FROM pairs GROUP BY query_id)
       |SELECT query_id,
       |  CAST((1.0 + sqrt(1.0 + 4.0 * n_pairs_x2)) / 2 AS BIGINT) AS n_shared,
       |  concordant, discordant,
       |  round(CAST(concordant - discordant AS DOUBLE) / (n_pairs_x2 / 2.0), 6) AS tau
       |FROM agg ORDER BY query_id""".stripMargin

  // --- registry -----------------------------------------------------------
  // --- q104: inverted-index build (segmented, delta-encoded postings) ------
  /** The search-index BUILD as a Spark job — the artifact q81's BM25
    * would consult instead of re-exploding the corpus per query.
    * Postings are SEGMENTED by doc_id range (the Lucene segment layout):
    * a term's posting list at 100 TB is unbounded (a stopword's postings
    * are the corpus), so no task ever materializes one — each
    * (term, segment of 64 docs) group collects a BOUNDED sorted run,
    * delta-encodes it (gap compression, the classic index trick), and
    * emits the segment's stats + a sha256 of the encoded run so the
    * oracle witnesses the exact encoding. Output bounded to the top
    * terms by df for a stable result set; the full build is the same
    * plan minus the limit.
    *
    * Shape: explode → (term, doc) tf pre-agg → (term, segment) bounded
    * collect — two shuffles, both carrying (term, ids, counts) only;
    * no unbounded per-key state anywhere. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val seg = 64
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("term"))
      .filter(length(col("term")) > 3)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("segment", expr(s"doc_id div $seg"))
      .groupBy(col("term"), col("segment"))
      .agg(count(lit(1)).as("seg_df"), sum(col("tf")).as("seg_tf"),
        sort_array(collect_list(col("doc_id"))).as("docs"))
      // delta encode: first entry absolute within the segment, then gaps
      .withColumn("gaps", expr(
        """concat(array(element_at(docs, 1)),
          |  zip_with(slice(docs, 2, greatest(size(docs)-1, 0)),
          |           slice(docs, 1, greatest(size(docs)-1, 0)),
          |           (a, b) -> a - b))""".stripMargin))
      .withColumn("postings_sha",
        sha2(concat_ws(",", expr("transform(gaps, x -> cast(x as string))")), 256))
      // reused by both the top-50 stats branch and the final probe join —
      // uncached, the whole corpus explode + two shuffles would run twice
      // (session-lifetime contract: see graft.core.Caching)
      .planCache()
    val df = postings.groupBy(col("term"))
      .agg(sum(col("seg_df")).as("df"), sum(col("seg_tf")).as("total_tf"),
        count(lit(1)).as("n_segments"))
    val w = Window.orderBy(desc("df"), asc("term"))
    val top = df.orderBy(desc("df"), asc("term")).limit(50)
      .withColumn("term_rank", row_number().over(w).cast("int"))
    postings.join(broadcast(top), Seq("term"))
      .select(col("term"), col("term_rank"), col("df"), col("total_tf"),
        col("n_segments"), col("segment"), col("seg_df"), col("seg_tf"),
        col("postings_sha"))
      .orderBy(col("term_rank"), col("segment"))
  }

  val invertedIndexOracle: String =
    """WITH tf AS (
      |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id,
      |           unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
      |    FROM documents)
      |  WHERE length(term) > 3 GROUP BY 1, 2),
      |  segs AS (
      |  SELECT term, doc_id // 64 AS segment,
      |         CAST(count(*) AS BIGINT) AS seg_df,
      |         CAST(sum(tf) AS BIGINT) AS seg_tf,
      |         list_sort(list(doc_id)) AS docs
      |  FROM tf GROUP BY 1, 2),
      |  enc AS (
      |  SELECT term, segment, seg_df, seg_tf,
      |    sha256(array_to_string(
      |      list_concat([docs[1]],
      |        list_transform(generate_series(2, len(docs)),
      |          i -> docs[i] - docs[i-1])), ',')) AS postings_sha
      |  FROM segs),
      |  tot AS (
      |  SELECT term, CAST(sum(seg_df) AS BIGINT) AS df,
      |         CAST(sum(seg_tf) AS BIGINT) AS total_tf,
      |         CAST(count(*) AS BIGINT) AS n_segments
      |  FROM enc GROUP BY 1),
      |  top AS (
      |  SELECT term, df, total_tf, n_segments,
      |         CAST(row_number() OVER (ORDER BY df DESC, term) AS INTEGER) AS term_rank
      |  FROM tot ORDER BY df DESC, term LIMIT 50)
      |SELECT e.term, t.term_rank, t.df, t.total_tf, t.n_segments,
      |       e.segment, e.seg_df, e.seg_tf, e.postings_sha
      |FROM enc e JOIN top t USING (term)
      |ORDER BY t.term_rank, e.segment""".stripMargin

  // --- q111: BM25 answered FROM the persisted index artifact -----------------
  /** q81 re-scans the corpus per query batch; this is the production
    * search path it amortizes into: the index is BUILT ONCE as a
    * parquet lake — `postings(term, doc_id, tf)` range-partitioned and
    * sorted by term, `doclens(doc_id, dl)` — and every query batch
    * afterwards reads ONLY the posting rows for its terms: the
    * query-term filter is a literal `IN`, so it pushes into the parquet
    * scan and the term-sorted layout lets row-group min/max statistics
    * skip everything else (the Lucene-segment economics, in lake form;
    * plan-asserted in RagIndexSpec). Corpus-level stats (N, avgdl)
    * reduce from the doclens table — index metadata, not a corpus
    * rescan. Scoring arithmetic is q81's VERBATIM, so q81's oracle
    * applies unchanged: the artifact round trip (write → read →
    * pushdown) is the delta under test, and the documented build-cost
    * amortization (the q38/q39 trade) gets its query-side half
    * measured. */
  /** Write q111's lake layout — `postings(term, doc_id, dl, tf)` range-
    * partitioned and sorted by term, `doclens(doc_id, dl)` — for `docsIn`
    * under `staging`. Artifact partition counts are sized in ROWS, not
    * bytes: the round-14 rung probe (RungAudit lakes) caught the
    * dictionary-compression collapse here — 4.6M postings rows compress
    * to 25 MB, so a hardcoded 8-way range split (and a default write for
    * doclens) arrived as 8/1 scan partitions at the 100× rung while the
    * floor target was 28. Same conditional-floor discipline as
    * Tables.floored: ≥2k rows per partition, capped at the session's
    * shuffle parallelism, so small scales don't over-split and big ones
    * stay term-sorted for row-group min/max skipping. Shared by q111
    * (whole corpus) and q130 (base / delta subsets). */
  private def writeBm25Lake(spark: SparkSession, docsIn: DataFrame,
                            staging: java.io.File): Unit = {
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val docs = docsIn
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .withColumn("dl", expr("size(toks)").cast("bigint"))
    // doc count from the raw table's footer metadata (no tokenization)
    val nDocs = docsIn.count()
    docs.select(col("doc_id"), col("dl"))
      .repartition(math.max(1L, math.min(shuffleParts, nDocs / 2000)).toInt,
        col("doc_id"))
      .write.parquet(new java.io.File(staging, "doclens").getAbsolutePath)
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist() // sized by a count, then written: ONE aggregation pass
    try {
      val nPost = postings.count()
      postings
        .repartitionByRange(
          math.max(8L, math.min(shuffleParts, nPost / 2000)).toInt, col("term"))
        .sortWithinPartitions(col("term"))
        .write.parquet(new java.io.File(staging, "postings").getAbsolutePath)
    } finally postings.unpersist()
  }

  /** q81's scoring arithmetic over an arbitrary (doclens, matched
    * postings) pair — shared by q111 (one lake) and q130 (base ∪ delta).
    * `matched` must already carry the query-term filter so it pushed
    * into every contributing parquet scan. */
  private def bm25Serve(spark: SparkSession, doclens: DataFrame,
                        matched: DataFrame): DataFrame = {
    val stats = doclens.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val terms = chatQueriesDf(spark)
      .select(col("query_id"), explode(split(lower(col("qtext")), " ")).as("term"))
      .filter(length(col("term")) > 3).distinct()
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val contrib = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(terms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c",
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .cast("decimal(28,12)"))
    val w = Window.partitionBy("query_id").orderBy(desc("s"), asc("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id")).agg(sum(col("c")).as("s"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double"), 6).as("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The constant chat-query terms (derived from the reference's canned
    * questions, not from data) — the literals that push into every
    * postings scan. */
  private def bm25QueryTerms: Seq[String] =
    chatQueries.flatMap(_._2.toLowerCase.split(" "))
      .filter(_.length > 3).distinct.sorted

  def bm25FromIndex(spark: SparkSession, dir: String): DataFrame = {
    val idxRoot = SourceQueries.stagedBlobs(dir, "bm25idx2") { staging =>
      writeBm25Lake(spark, Tables.documents(spark, dir), staging)
    }
    val doclens = spark.read.parquet(s"$idxRoot/doclens")
    val matched = spark.read.parquet(s"$idxRoot/postings")
      .filter(col("term").isin(bm25QueryTerms: _*))
    bm25Serve(spark, doclens, matched)
  }

  // --- q130: incremental postings append (the text-side q129) ---------------
  /** The postings lake's day-N+1 shape: the standing corpus' index
    * (doc_id % 10 != 7) persists once; the day's batch (doc_id % 10 == 7)
    * is tokenized ALONE — the append's cost is proportional to the batch,
    * never the corpus — and lands as separate term-sorted delta files;
    * the base lake is never rewritten (RagIndexSpec snapshots its files
    * across a forced re-append). Serving reads base ∪ delta with the
    * query-term IN filter pushed into BOTH parquet scans, and the
    * corpus-level stats (N, avgdl, per-term df) reduce over the merged
    * doclens/postings — index metadata, not a corpus rescan.
    *
    * BM25 is not incremental in the naive sense — every score depends on
    * corpus-global N/avgdl/df, so appending documents shifts EVERY
    * term's idf. The merged-stats serve handles that exactly: scoring
    * the union with stats reduced over the union is arithmetically
    * identical to a full rebuild, which is why q81's oracle applies
    * VERBATIM — "incremental append + merged serve ≡ rebuild" is the
    * bit-exact invariant under test (the reference instead re-embeds
    * and recreates its whole collection per ingest, app.py:289-297). */
  /** Stage (once per corpus fingerprint) the q130 base and delta BM25
    * lakes; returns (baseRoot, deltaRoot). Shared by q130's merged-stats
    * serve and q158's compaction so both exercise the same artifact
    * generations. */
  private def bm25IncRoots(spark: SparkSession, dir: String): (java.io.File, java.io.File) = {
    val docsAll = Tables.documents(spark, dir)
    val baseRoot = SourceQueries.stagedBlobs(dir, "bm25inc") { staging =>
      writeBm25Lake(spark, docsAll.filter(col("doc_id") % 10 =!= 7), staging)
    }
    val deltaRoot = SourceQueries.stagedBlobs(dir, "bm25incd") { staging =>
      writeBm25Lake(spark, docsAll.filter(col("doc_id") % 10 === 7), staging)
    }
    (baseRoot, deltaRoot)
  }

  def bm25IncrementalAppend(spark: SparkSession, dir: String): DataFrame = {
    val (baseRoot, deltaRoot) = bm25IncRoots(spark, dir)
    def lake(root: java.io.File, part: String): DataFrame =
      spark.read.parquet(s"$root/$part")
    val doclens = lake(baseRoot, "doclens").unionByName(lake(deltaRoot, "doclens"))
    // filter each side BEFORE the union so the pushed In(term, …) is
    // explicit per scan (Catalyst pushes through Union too; this keeps
    // the contract visible in the plan and the spec)
    val matched = lake(baseRoot, "postings").filter(col("term").isin(bm25QueryTerms: _*))
      .unionByName(lake(deltaRoot, "postings").filter(col("term").isin(bm25QueryTerms: _*)))
    bm25Serve(spark, doclens, matched)
  }

  // --- q158: postings-lake compaction (q156's text-side twin) ---------------
  /** The lakehouse OPTIMIZE step for the q130 postings family: base +
    * delta merge into ONE new generation WITHOUT re-tokenizing a single
    * document — the compactor reads only the two ARTIFACT lakes (their
    * slim (term, doc_id, dl, tf) rows, never text) and rewrites the
    * union with the same term-sorted range layout and row-sized
    * partition floors the build used, so row-group min/max skipping
    * keeps working on the merged generation. Serving is [[bm25Serve]]
    * over the compacted lake ALONE — one scan per query batch instead of
    * base+delta per delta accumulated, with the query-term IN filter
    * pushed into the single merged scan — and because merged-stats serve
    * ≡ rebuild (q130's invariant), q81's whole-corpus oracle applies
    * VERBATIM to the compacted generation: a dropped or duplicated
    * posting anywhere in the merge breaks the bit-exact gate.
    *
    * 100 TB economics: compaction cost ∝ |index rows| (tens of bytes per
    * posting), not |corpus text|; re-tokenizing at compaction time would
    * be the corpus-sized pass this operator exists to avoid. Publish is
    * atomic + fingerprint-idempotent (Bm25CompactSpec snapshots mtimes
    * across a re-run). Reference anchor: the same standing-collection
    * lifecycle as q156 (app.py:204-212, 261-271). */
  private def bm25CompactedRoot(spark: SparkSession, dir: String): java.io.File = {
    val (baseRoot, deltaRoot) = bm25IncRoots(spark, dir)
    SourceQueries.stagedBlobs(dir, "bm25comp") { staging =>
      val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
      def lake(root: java.io.File, part: String): DataFrame =
        spark.read.parquet(new java.io.File(root, part).getAbsolutePath)
      val doclens = lake(baseRoot, "doclens").unionByName(lake(deltaRoot, "doclens"))
        .persist()
      try {
        val nDocs = doclens.count()
        doclens
          .repartition(math.max(1L, math.min(shuffleParts, nDocs / 2000)).toInt,
            col("doc_id"))
          .write.parquet(new java.io.File(staging, "doclens").getAbsolutePath)
      } finally doclens.unpersist()
      val postings = lake(baseRoot, "postings").unionByName(lake(deltaRoot, "postings"))
        .persist()
      try {
        val nPost = postings.count()
        postings
          .repartitionByRange(
            math.max(8L, math.min(shuffleParts, nPost / 2000)).toInt, col("term"))
          .sortWithinPartitions(col("term"))
          .write.parquet(new java.io.File(staging, "postings").getAbsolutePath)
      } finally postings.unpersist()
    }
  }

  def bm25CompactedServe(spark: SparkSession, dir: String): DataFrame = {
    val compRoot = bm25CompactedRoot(spark, dir)
    val doclens = spark.read.parquet(s"$compRoot/doclens")
    val matched = spark.read.parquet(s"$compRoot/postings")
      .filter(col("term").isin(bm25QueryTerms: _*))
    bm25Serve(spark, doclens, matched)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_inverted_index" -> ((s, d) => invertedIndex(s, d)),
    "q111_bm25_from_index" -> ((s, d) => bm25FromIndex(s, d)),
    "q130_bm25_incremental" -> ((s, d) => bm25IncrementalAppend(s, d)),
    "q158_postings_compact" -> ((s, d) => bm25CompactedServe(s, d)),
    "q16_memory_window" -> ((s, d) => memoryWindow(s, d)),
    "q09_preview" -> ((s, d) => preview(s, d)),
    "q14_context_assembly" -> ((s, d) => contextAssembly(s, d)),
    "q19_relevance_gate" -> ((s, d) => relevanceGate(s, d)),
    "q22_containment_join" -> ((s, d) => containmentJoin(s, d)),
    "q10b_ext_dispatch" -> ((s, d) => extensionDispatch(s, d)),
    "q11b_nonempty_defaults" -> ((s, d) => nonEmptyDefaults(s, d)),
    "q25_reingest_guard" -> ((s, d) => reingestGuard(s, d)),
    "q02_chunk_stride" -> ((s, d) => chunkStride(s, d)),
    "q02b_chunk_recursive" -> ((s, d) => chunkRecursive(s, d)),
    "q07_index_build" -> ((s, d) => indexBuild(s, d)),
    "q81_bm25" -> ((s, d) => bm25(s, d)),
    "q82_rrf_hybrid" -> ((s, d) => rrfHybrid(s, d)),
    "q90_retrieval_metrics" -> ((s, d) => retrievalMetrics(s, d)),
    "q93_rank_agreement" -> ((s, d) => rankAgreement(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q104_inverted_index" -> invertedIndexOracle,
    // q111: identical scoring arithmetic to q81 from the index artifact —
    // the persisted-lake round trip is the delta under test
    "q111_bm25_from_index" -> bm25Oracle,
    // q130: merged-stats serving over base ∪ delta ≡ a full rebuild, so
    // the whole-corpus oracle applies verbatim — the incremental append
    // round trip is the delta under test
    "q130_bm25_incremental" -> bm25Oracle,
    // q158: compacted-generation serve — merged-stats serve ≡ rebuild, so the
    // whole-corpus oracle applies verbatim (the merge is the delta under test)
    "q158_postings_compact" -> bm25Oracle,
    "q16_memory_window" -> memoryWindowOracle,
    "q09_preview" -> previewOracle,
    "q14_context_assembly" -> contextAssemblyOracle,
    "q19_relevance_gate" -> relevanceGateOracle,
    "q22_containment_join" -> containmentJoinOracle,
    "q10b_ext_dispatch" -> extensionDispatchOracle,
    "q11b_nonempty_defaults" -> nonEmptyDefaultsOracle,
    "q25_reingest_guard" -> reingestGuardOracle,
    "q02_chunk_stride" -> chunkStrideOracle,
    "q02b_chunk_recursive" -> chunkRecursiveOracle,
    "q81_bm25" -> bm25Oracle,
    "q82_rrf_hybrid" -> rrfHybridOracle,
    "q90_retrieval_metrics" -> retrievalMetricsOracle,
    "q93_rank_agreement" -> rankAgreementOracle
  )
}
