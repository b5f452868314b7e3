package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Builder-owned BIG-RUNG evidence tool — NOT driver surface. Closes the
  * sweep's EXCLUDED rows with ENGINE-INTERNAL differentials where DuckDB
  * itself exhausts resources at sf100 (per /tmp/verify_sf100/sweep.json:
  * q13/q13b/q13c oracle OOM, q02b oracle OOM, q36b oracle timeout), and
  * probes the artifact lakes' READ paths for the parallelism collapse
  * the base tables were floored against.
  *
  * Modes (all run when only <sfDir> is given):
  *  - asof:  q13 (composed join+window) vs q13b (custom merge exec) must
  *           be SET-EQUAL; q13c (outer) restricted to matches must equal
  *           q13b, and its row count must equal the purchase count. Three
  *           independent implementations agreeing replaces the oracle.
  *  - chunk: q02b's distributed output vs an INDEPENDENT driver replay of
  *           the closed-form greedy word-packing (the same derivation the
  *           DuckDB oracle uses, re-implemented here, not Chunker code)
  *           on a deterministic doc_id sample.
  *  - srp:   q36b's rows re-scored from raw vectors (bit-exact cosine
  *           witness) + exact brute-force top-5 recall measured
  *           engine-side.
  *  - lakes: partition-count probe over every persisted artifact lake's
  *           scan (postings/doclens, IVF cells, PQ codebook/invlists/
  *           centroids) vs the Tables-floor target, flagging collapse.
  *
  * Usage: runMain graft.RungAudit <sfDir> [asof|chunk|srp|lakes ...]
  */
object RungAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val known = Set("asof", "chunk", "srp", "lakes", "blobs", "buckets", "gc",
      "bandlsh", "q116probe", "timeq", "abq")
    // bandlsh/q116probe/timeq are TIMING probes (box-dependent), not
    // correctness audits — they run only when asked for explicitly
    val modes = if (args.length > 1) args.drop(1).toSet
                else known - "bandlsh" - "q116probe" - "timeq"
    require(modes.subsetOf(known),
      s"unknown mode(s) ${(modes -- known).mkString(", ")} — " +
        s"valid: ${known.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "28")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    def report(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failed = true
      println(s"AUDIT $name ${if (ok) "PASS" else "FAIL"} $detail")
    }
    if (modes("asof")) asof(spark, sfDir, report)
    if (modes("chunk")) chunk(spark, sfDir, report)
    if (modes("srp")) srp(spark, sfDir, report)
    if (modes("lakes")) lakes(spark, sfDir, report)
    if (modes("blobs")) blobs(spark, sfDir, report)
    if (modes("buckets")) buckets(spark, sfDir, report)
    if (modes("gc")) gc(spark, sfDir, report)
    if (modes("bandlsh")) bandlsh(spark, sfDir, report)
    if (modes("q116probe")) q116probe(spark, sfDir, report)
    if (modes("timeq")) timeq(spark, sfDir, report)
    if (modes("abq")) abq(spark, sfDir, report)
    spark.stop()
    if (failed) sys.exit(1)
  }

  /** Set-equality via two-sided exceptAll: cheap at the rung (one
    * shuffle each way), no driver materialization. */
  private def setEqual(a: DataFrame, b: DataFrame): (Boolean, Long, Long) = {
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    (onlyA == 0 && onlyB == 0, onlyA, onlyB)
  }

  private def asof(spark: SparkSession, sfDir: String,
                   report: (String, Boolean, String) => Unit): Unit = {
    val t0 = System.nanoTime()
    val q13 = SparkEntry.queries("q13_asof_join")(spark, sfDir)
    val q13b = SparkEntry.queries("q13b_asof_merge")(spark, sfDir)
    val q13c = SparkEntry.queries("q13c_asof_merge_outer")(spark, sfDir)
    val (e1, a1, b1) = setEqual(q13, q13b)
    report("asof_q13_vs_q13b", e1, s"onlyComposed=$a1 onlyMerge=$b1")
    val (e2, a2, b2) = setEqual(q13c.filter(col("last_error_id").isNotNull), q13b)
    report("asof_q13c_matched_vs_q13b", e2, s"onlyOuter=$a2 onlyInner=$b2")
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val outerRows = q13c.count()
    report("asof_q13c_preserves_all_purchases", outerRows == purchases,
      s"outer=$outerRows purchases=$purchases")
    println(f"AUDIT asof done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  /** The DuckDB oracle's closed-form greedy word-packing, re-derived
    * independently (see q02b's Scaladoc for the derivation): chunk k
    * spans words [s,e] with e maximal s.t. span(s,e) ≤ 200 chars, and
    * the next start is the minimal s' s.t. span(s',e) ≤ 40 (the
    * overlap), strictly after the previous start. */
  private[graft] def greedyPack(text: String): Vector[(Int, String)] = {
    val words = text.split(" ").toVector
    val aa = words.map(_.length)
    // cc(i) = 0-based char offset of word i
    val cc = aa.scanLeft(0)((acc, a) => acc + a + 1).init
    def span(s: Int, e: Int): Int = cc(e) + aa(e) - cc(s)
    val out = Vector.newBuilder[(Int, String)]
    var s = 0
    var k = 0
    var done = false
    while (!done) {
      var e = s
      while (e + 1 < words.length && span(s, e + 1) <= 200) e += 1
      out += k -> text.substring(cc(s), cc(e) + aa(e))
      if (e == words.length - 1) done = true
      else {
        var s2 = e
        while (s2 - 1 > s && span(s2 - 1, e) <= 40) s2 -= 1
        s = s2
        k += 1
      }
    }
    out.result()
  }

  private def chunk(spark: SparkSession, sfDir: String,
                    report: (String, Boolean, String) => Unit): Unit = {
    val t0 = System.nanoTime()
    // deterministic bounded sample, spread across the id space
    val MOD = 997
    val sample = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0 && col("doc_id") % MOD === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q02b_chunk_recursive")(spark, sfDir)
      .filter(col("doc_id") % MOD === 0)
      .select(col("doc_id"), col("chunk_id"), col("chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val expected = sample.flatMap { case (id, text) =>
      greedyPack(text).map { case (k, c) => (id, k) -> c } }
    val missing = expected.keySet -- got.keySet
    val extra = got.keySet -- expected.keySet
    val wrong = expected.count { case (k, v) => got.get(k).exists(_ != v) }
    report("chunk_q02b_driver_replay",
      missing.isEmpty && extra.isEmpty && wrong == 0,
      s"docs=${sample.size} chunks=${expected.size} missing=${missing.size} " +
        s"extra=${extra.size} wrong=$wrong " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  private def srp(spark: SparkSession, sfDir: String,
                  report: (String, Boolean, String) => Unit): Unit = {
    import graft.functions.VectorFns
    import org.apache.spark.sql.expressions.Window
    val t0 = System.nanoTime()
    val res = SparkEntry.queries("q36b_ann_srp_md5")(spark, sfDir)
      .collect() // columns: (query_id, vec_id, cosine, rank)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // exact brute-force top-5 over ALL vectors, engine-side (3 × N dots)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      .withColumn("n", VectorFns.normL2(col("v")))
    val qvecs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val wq = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    val exact = e.crossJoin(broadcast(qvecs))
      .withColumn("cosine",
        VectorFns.safeCosine(VectorFns.dot(col("qv"), col("v")), col("qn"), col("n")))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // (a) bit-exact cosine witness: every returned pair re-scored from raw
    // vectors must round to the same 6 decimals
    val rescored = {
      val pairs = res.map { case (q, v, _, _) => (q, v) }.toSet
      val vecIds = pairs.map(_._2) ++ pairs.map(_._1)
      val vecs = e.filter(col("vec_id").isin(vecIds.toSeq: _*))
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
      res.map { case (q, v, c, rk) =>
        val (qv, qn) = vecs(q)
        val (vv, vn) = vecs(v)
        val dot = qv.zip(vv).map { case (x, y) => x * y }.sum
        val cos = if (qn == 0 || vn == 0) 0.0 else dot / (qn * vn)
        (q, v, c, rk, math.abs(BigDecimal(cos).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble - c) < 1e-9)
      }
    }
    val badCos = rescored.filterNot(_._5)
    report("srp_q36b_cosine_witness", badCos.isEmpty,
      s"rows=${res.length} mismatched=${badCos.length}")
    // (b) ranks strictly follow cosine order within each query
    val rankOk = res.groupBy(_._1).forall { case (_, rows) =>
      rows.sortBy(_._4).sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }
    }
    report("srp_q36b_rank_order", rankOk, "")
    // (c) recall@5 vs exact brute force — LSH is approximate by design;
    // this records the measured recall as rung evidence, no hard floor
    val hits = res.count { case (q, v, _, _) => exact.contains((q, v)) }
    println(f"AUDIT srp_q36b_recall@5 INFO ${hits.toDouble / exact.size}%.2f " +
      f"($hits/${exact.size}) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  /** Artifact-lake read-path probe: for each persisted index lake, the
    * scan's partition count vs the Tables-floor target
    * (min(shuffle.partitions, rows/2000)). A lake whose scan arrives
    * under half the target is flagged COLLAPSE — the dictionary-
    * compression failure mode the base text/vector tables were floored
    * against in round 12. */
  private def lakes(spark: SparkSession, sfDir: String,
                    report: (String, Boolean, String) => Unit): Unit = {
    // ensure the artifacts exist (content-addressed: no-ops when staged)
    Seq("q111_bm25_from_index", "q35c_ann_ivf_index", "q38b_ann_pq_index",
        "q39b_ann_ivfpq_index", "q129_ivf_index_append",
        "q130_bm25_incremental", "q156b_ann_compacted_serve",
        "q158_postings_compact").foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).count()
    }
    val sfName = new java.io.File(sfDir).getName
    val roots = new java.io.File("/root/repo/target").listFiles()
      .filter(f => f.isDirectory && f.getName.matches(
        s"blobs_(bm25idx2|ivfidx|pqidx|ivfinc|ivfincd|bm25inc|bm25incd|ivfcomp|bm25comp)_${java.util.regex.Pattern.quote(sfName)}_.*"))
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    for (root <- roots.sortBy(_.getName);
         sub <- root.listFiles().filter(_.isDirectory).sortBy(_.getName)) {
      val df = spark.read.parquet(sub.getAbsolutePath)
      val rows = df.count()
      val parts = df.rdd.getNumPartitions
      val bytes = sub.listFiles().filter(_.isFile).map(_.length()).sum
      val target = math.min(shuffleParts, math.max(1L, rows / 2000))
      // a collapse is a FAILURE (exit 1), consistent with the other modes —
      // automation gating rung evidence on the exit code must see it
      report(s"lake_${root.getName.split("_")(1)}/${sub.getName}",
        parts.toLong * 2 >= target,
        f"rows=$rows parts=$parts target=$target bytes=${bytes / 1024}KiB")
    }
  }

  /** Blob-lake read-path probe (the binaryFile/file-per-task lakes the
    * parquet probe above cannot see): for each staged blob lake, the
    * scan's partition count vs min(shuffle parallelism, file count) —
    * a blob scan that cannot keep every core busy serializes the decode
    * stage, the q89b/q89c "write-side partitioning IS read parallelism"
    * contract made measurable. jpg/pngmut are file-per-doc (parallelism
    * bounded only by packing); jsonlzst is DELIBERATELY 8 unsplittable
    * frames — its target is its file count, by design. */
  private def blobs(spark: SparkSession, sfDir: String,
                    report: (String, Boolean, String) => Unit): Unit = {
    // ensure the lakes exist (content-addressed: no-ops when staged)
    Seq("q60s_jpeg_metadata", "q116_image_neardup", "q89c_jsonl_zstd",
        "q160_avro_changelog", "q160b_avro_schema_evolution").foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).count()
    }
    val sfName = new java.io.File(sfDir).getName
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    for (fmt <- Seq("jpg2", "pngmut", "jsonlzst", "avrocdc", "avrocdc2")) {
      // newest generation by mtime — a regenerated source parquet leaves
      // the stale content-addressed lake behind, and name order is
      // arbitrary hash order; the ensure-step above staged the live one
      val root = new java.io.File("/root/repo/target").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"blobs_${fmt}_${sfName}_"))
        .sortBy(_.lastModified()).lastOption.getOrElse(
          sys.error(s"blob lake blobs_${fmt}_${sfName}_* not staged"))
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      val fs = files(root)
      val df = spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true") // jsonlzst nests one subdir
        .load(root.getAbsolutePath)
      val parts = df.rdd.getNumPartitions
      val target = math.min(shuffleParts, fs.length.toLong)
      // avrocdc: one file per 64Ki-record write chunk — each decodes
      // independently, so the recoverable parallelism floor is the FILE
      // count; binaryFile legitimately bin-packs the small files into
      // fewer partitions (openCost/maxPartitionBytes), which is packing,
      // not collapse — accept it at the lakes() half-floor tolerance as
      // long as the file count itself clears the floor
      val ok = if (fmt.startsWith("avrocdc"))
        fs.length >= target && parts.toLong * 2 >= target
      else parts >= target
      report(s"blob_$fmt", ok,
        f"files=${fs.length} parts=$parts target=$target " +
          f"bytes=${fs.map(_.length()).sum / (1024 * 1024)}MiB")
    }
  }

  /** Bucketed-table read-path probe (q121/q122's co-location artifact):
    * at the rung, the pair expansion's merge join must STILL run with
    * zero exchange below it (co-location is only worth staging if it
    * holds at scale), and the bucket layout must be the declared 8
    * files — the write-side parallelism knob, like jsonlzst's frames. */
  private def buckets(spark: SparkSession, sfDir: String,
                      report: (String, Boolean, String) => Unit): Unit = {
    val out = SparkEntry.queries("q121_basket_pairs")(spark, sfDir)
    // execute THIS QueryExecution so AQE finalizes before the plan read
    val rows = out.queryExecution.executedPlan.execute().count()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val idx = plan.indexOf("SortMergeJoin")
    val shuffleFree = idx >= 0 && !plan.substring(idx).contains("Exchange")
    // resolve the EXACT fingerprinted table the query read (shared name
    // helper — never a stale same-prefix sibling, ADVICE r15)
    val tbl = graft.queries.RelationalQueries.bucketedTableName(sfDir)
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val tblDir = new java.io.File(wh, tbl)
    require(tblDir.isDirectory, s"bucketed table $tbl not staged")
    val bucketFiles = tblDir.listFiles().count(_.getName.endsWith(".parquet"))
    report("bucket_lineitem", shuffleFree && bucketFiles == 8,
      f"pairs=$rows bucketFiles=$bucketFiles shuffleFreeJoin=$shuffleFree tbl=$tbl")

    // q122 probe (VERDICT r15 task 6): the five PageRank iterations must
    // reuse the checkpointed src-partitioned edge layout — exchange count
    // in the final plan stays CONSTANT per iteration (rank-side shuffle +
    // dst aggregate, never an edge re-shuffle), and the measured shuffle
    // volume is proportional to (node, rank) pairs, not 5× the edge list.
    val sc = spark.sparkContext
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
        }
      }
    }
    sc.addSparkListener(listener)
    val pr = SparkEntry.queries("q122_pagerank")(spark, sfDir)
    val nNodes = pr.queryExecution.executedPlan.execute().count()
    Thread.sleep(2000) // drain the async listener bus before reading totals
    sc.removeSparkListener(listener)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.queryExecution.executedPlan.execute().count(): Unit
      "Exchange (hash|range)partitioning".r.findAllIn(
        df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head).length
    }
    // exchange-count LINEARITY, measured not hand-budgeted: growing the
    // iteration count must add a CONSTANT number of exchanges per round
    // (the rank-side join shuffle + the dst aggregate — never an edge
    // re-shuffle, whose tell would be superlinear growth), and that
    // constant is ≤ 3. A hand-tuned total budget FAILed here (r16) while
    // the volume invariant held — the budget had miscounted the one-time
    // exchanges, so the probe now measures the slope directly.
    val ex1 = exchanges(
      graft.queries.RelationalQueries.pagerankFixedPointN(spark, sfDir, 1))
    val ex3 = exchanges(
      graft.queries.RelationalQueries.pagerankFixedPointN(spark, sfDir, 3))
    val ex5 = exchanges(pr)
    val perIter = (ex3 - ex1) / 2.0
    // ±1 slope tolerance (ADVICE r16): AQE re-optimization (a broadcast
    // conversion at low iteration counts, stage coalescing) can perturb one
    // run's exchange count by 1 without any edge re-shuffle — whose tell
    // would be a SUPERLINEAR slope change (≥ the per-iteration edge
    // exchange count), far outside ±1.
    val linear = math.abs((ex5 - ex3) - (ex3 - ex1)) <= 1 && perIter <= 3.0
    // shuffle volume bound for the 5-iteration run: one-time edge
    // repartition + 5 × two rounds of 16-byte (node/dst, long) rows,
    // with 4× serialization slack
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    val nEdges = 2L * li.as("x")
      .join(li.as("y"),
        expr("x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey"))
      .select(col("x.l_partkey"), col("y.l_partkey")).distinct().count()
    val bound = (nEdges * 24 + 5L * 2 * nNodes * 24) * 4
    val volumeOk = shuffleWrite.get() < bound
    report("bucket_q122_iterations", linear && volumeOk,
      f"nodes=$nNodes edges<=$nEdges exchanges(1/3/5 iters)=$ex1/$ex3/$ex5 " +
        f"perIter=$perIter%.1f (<=3, constant) " +
        f"shuffleMiB=${shuffleWrite.get() / (1024 * 1024)} " +
        f"boundMiB=${bound / (1024 * 1024)} recs=${shuffleRecs.get()}")
  }

  /** Band-LSH join-strategy A/B (VERDICT r16 task 4): q116 and q33b share
    * the bandedLshPairs tail; its r15 SMJ→shuffled-hash switch was never
    * measured on clean interleaved draws (2.03→1.44 claimed, but the only
    * clean round records straddle a VM change). This probe times both
    * strategies INTERLEAVED in one session — same JVM, same box, same
    * minute — via the graft.bandlsh.join system property, reports medians,
    * and verifies each run actually used the requested join operator and
    * returned the same row count. INFO output (no hard floor): the
    * decision rule "keep shuffle_hash iff its median wins" is applied by
    * the builder reading the record into SCALING.md. */
  private def bandlsh(spark: SparkSession, sfDir: String,
                      report: (String, Boolean, String) => Unit): Unit = {
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    def once(q: String, strategy: String): (Double, Long, String) = {
      System.setProperty("graft.bandlsh.join", strategy)
      try {
        spark.catalog.clearCache()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t0 = System.nanoTime()
        val n = df.queryExecution.executedPlan.execute().count()
        val dt = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        (dt, n, plan)
      } finally System.clearProperty("graft.bandlsh.join")
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    for (q <- Seq("q116_image_neardup", "q33b_neardup_simhash_md5")) {
      if (SparkEntry.queries.contains(q)) {
        // warm both paths once (codec lake staging, codegen) outside timing
        once(q, "merge"); once(q, "shuffle_hash")
        val draws = (1 to reps).map { _ =>
          (once(q, "merge"), once(q, "shuffle_hash"))
        }
        val (mTimes, hTimes) = (draws.map(_._1._1), draws.map(_._2._1))
        val rowsOk = draws.forall { case ((_, nm, _), (_, nh, _)) => nm == nh }
        val planOk = draws.head._1._3.contains("SortMergeJoin") &&
          draws.head._2._3.contains("ShuffledHashJoin")
        report(s"bandlsh_ab_$q", rowsOk && planOk,
          f"merge=${median(mTimes)}%.2fs shuffle_hash=${median(hTimes)}%.2fs " +
            f"(reps=$reps interleaved; rowsEqual=$rowsOk planShapesOk=$planOk; " +
            f"winner=${if (median(hTimes) <= median(mTimes)) "shuffle_hash" else "merge"})")
      }
    }
  }

  /** Generic single-query timing probe in the bench's exact draw shape
    * (entry() warm-up once, then clearCache + DataFrame.count per rep;
    * cold first draw reported separately, median of 5 warm draws) —
    * built for the record_suspects guard's named follow-ups, where ONE
    * flagged query needs a quiet-box draw without paying a full bench
    * run (first use: q32b's r18 "box wobble" adjudication, re-check
    * trigger ">1.1 s on a quiet box next round"). Query names come from
    * GRAFT_TIMEQ (comma-separated registry keys). */
  private def timeq(spark: SparkSession, sfDir: String,
                    report: (String, Boolean, String) => Unit): Unit = {
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val names = sys.env.getOrElse("GRAFT_TIMEQ", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "timeq: set GRAFT_TIMEQ=<query>[,<query>…]")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"timeq: unknown queries ${unknown.mkString(", ")}")
    try { SparkEntry.entry(spark).count(); () } catch { case _: Throwable => () }
    for (q <- names) {
      def draw(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = draw()
      val warm = (1 to 5).map(_ => draw())
      report(s"timeq_$q", true,
        f"cold=$cold%.2fs warm_median=${median(warm)}%.2fs " +
          s"draws=${warm.map(w => f"$w%.2f").mkString(",")}")
    }
  }

  /** Generic interleaved variant A/B in the bench's draw shape (r20,
    * VERDICT r19 task 1): a system property selects a code variant inside
    * a query path; draws alternate variants so box drift hits both legs
    * equally. Reads GRAFT_AB_PROP (the sys-prop name), GRAFT_AB_VALUES
    * (comma list; first = current default), GRAFT_TIMEQ (query names),
    * GRAFT_AB_REPS (default 5). Per query × variant it reports the cold
    * (first-after-warmup) draw and the interleaved warm median, plus a
    * row-count equality check across variants. */
  private def abq(spark: SparkSession, sfDir: String,
                  report: (String, Boolean, String) => Unit): Unit = {
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val prop = sys.env.getOrElse("GRAFT_AB_PROP",
      sys.error("abq: set GRAFT_AB_PROP=<system property>"))
    val values = sys.env.getOrElse("GRAFT_AB_VALUES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(values.length >= 2, "abq: GRAFT_AB_VALUES needs >= 2 comma-separated values")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val names = sys.env.getOrElse("GRAFT_TIMEQ", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "abq: set GRAFT_TIMEQ=<query>[,<query>…]")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"abq: unknown queries ${unknown.mkString(", ")}")
    try { SparkEntry.entry(spark).count(); () } catch { case _: Throwable => () }
    for (q <- names) {
      def draw(v: String): (Double, Long) = {
        System.setProperty(prop, v)
        try {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, sfDir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        } finally System.clearProperty(prop)
      }
      val cold = values.map(v => v -> draw(v)).toMap
      val warm = (1 to reps).map(_ => values.map(v => v -> draw(v)))
      val rowsOk = (warm.flatten ++ cold.toSeq).map(_._2._2).distinct.length == 1
      val med = values.map(v => v -> median(warm.map(_.toMap.apply(v)._1)))
      val winner = med.minBy(_._2)._1
      report(s"abq_${q}_$prop", rowsOk,
        med.map { case (v, m) => f"$v=${m}%.2fs(cold=${cold(v)._1}%.2f)" }
          .mkString(" ") +
          s" reps=$reps rowsEqual=$rowsOk winner=$winner " +
          s"draws=" + values.map(v =>
            v + ":" + warm.map(w => f"${w.toMap.apply(v)._1}%.2f").mkString(","))
            .mkString(" "))
    }
  }

  /** The q116 bench-vs-A/B paradox probe (VERDICT r17 task 1): the r17
    * record measured q116 at 3.94 s while the same round's interleaved
    * bandlsh A/B measured 2.02-2.05 s on the same box class. This mode
    * reproduces BOTH protocols in ONE JVM: (a) Bench's exact draw shape
    * (entry() warm-up, then clearCache + DataFrame.count per rep) with
    * the FIRST draw kept separate — it carries whatever one-time cost
    * (staging existence check, first PNG decode wave, page-cache fill,
    * codegen) the bench's rep 1 pays; (b) five more bench-shape draws
    * once warm; run alongside `bandlsh` in the same invocation for the
    * (c) leg. If cold ≈ warm ≈ 2 s, the 3.94 s record was box noise; if
    * warm draws sit near 4 s here too, the bench pays something this
    * probe also pays and the gap is protocol-real. */
  private def q116probe(spark: SparkSession, sfDir: String,
                        report: (String, Boolean, String) => Unit): Unit = {
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    // decomposed bench draw: DataFrame CONSTRUCTION (staging check +
    // binaryFile listing + analysis — the part the bandlsh A/B clock
    // excludes) vs count() execution
    def draw(): (Double, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q116_image_neardup")(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    try { SparkEntry.entry(spark).count(); () } catch { case _: Throwable => () }
    val cold = draw()
    val warm = (1 to 5).map(_ => draw())
    report("q116_bench_protocol", true,
      f"cold=${cold._1 + cold._2}%.2fs(build=${cold._1}%.2f) " +
        f"warm_total_median=${median(warm.map(w => w._1 + w._2))}%.2fs " +
        f"warm_build_median=${median(warm.map(_._1))}%.2fs " +
        f"warm_count_median=${median(warm.map(_._2))}%.2fs " +
        s"draws=${warm.map(w => f"${w._1}%.2f+${w._2}%.2f").mkString(",")}")
  }

  /** Staging-GC probe (VERDICT r15 task 4): after the bucketed table and
    * a blob lake are (re)staged, each family must hold exactly ONE live
    * artifact — old-fingerprint generations are reaped at staging time —
    * and the sweep stats report the bytes reclaimed this run. */
  private def gc(spark: SparkSession, sfDir: String,
                 report: (String, Boolean, String) => Unit): Unit = {
    // touch the two staging families this process exercises
    SparkEntry.queries("q121_basket_pairs")(spark, sfDir).count(): Unit
    val sfName = new java.io.File(sfDir).getName
    val sfTbl = sfName.replace('.', '_')
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val bktGens = Option(wh.listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.startsWith(s"lineitem_bkt_${sfTbl}_") &&
        !f.getName.startsWith("."))
    val target = new java.io.File("/root/repo/target")
    val families = Option(target.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.startsWith("blobs_") && n.contains(s"_${sfName}_"))
      .groupBy(_.split(s"_${sfName}_").head)
    val multi = families.filter(_._2.length > 1)
    val (gcDirs, gcBytes) = graft.core.Staging.sweepStats
    report("staging_gc", bktGens == 1 && multi.isEmpty,
      f"bucketGens=$bktGens blobFamilies=${families.size} " +
        f"multiGenFamilies=${multi.keys.mkString(",")} " +
        f"reclaimedDirs=$gcDirs reclaimedMiB=${gcBytes / (1024 * 1024)}")
  }
}
