package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.queries.SourceQueries

/** q158's contract: the compacted postings generation holds exactly
  * base ∪ delta (no re-tokenization — the merge is artifact-to-artifact),
  * serving reads ONLY the compacted lake with the query-term filter
  * pushed into its single scan, and a re-run serves the published
  * generation without rewriting a byte. */
class Bm25CompactSpec extends SparkSuite {

  private def lake(fmt: String): java.io.File = {
    val root = SourceQueries.stagedBlobRoot(sfDir, fmt)
    assert(root.exists(), s"lake $fmt not staged at $root")
    root
  }

  test("compacted generation = base ∪ delta, row-exact on both parts") {
    SparkEntry.queries("q158_postings_compact")(spark, sfDir).collect()
    def rows(fmt: String, part: String): Long =
      spark.read.parquet(new java.io.File(lake(fmt), part).getAbsolutePath).count()
    for (part <- Seq("postings", "doclens")) {
      assert(rows("bm25comp", part) == rows("bm25inc", part) + rows("bm25incd", part),
        s"$part: compacted row count diverges from base+delta")
    }
    // payload-exact, not just counts: the merged posting set is identical
    val union = spark.read.parquet(new java.io.File(lake("bm25inc"), "postings").getAbsolutePath)
      .unionByName(spark.read.parquet(new java.io.File(lake("bm25incd"), "postings").getAbsolutePath))
    val comp = spark.read.parquet(new java.io.File(lake("bm25comp"), "postings").getAbsolutePath)
    assert(comp.exceptAll(union).count() == 0 && union.exceptAll(comp).count() == 0,
      "compacted postings are not exactly base ∪ delta")
  }

  test("serving reads only the compacted lake, term filter pushed into its scan") {
    val df = SparkEntry.queries("q158_postings_compact")(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("blobs_bm25comp_"), formatted.take(1500))
    assert(!formatted.contains("blobs_bm25incd_"),
      "serve still consults the delta lake — compaction did not make the generation self-contained")
    assert(!formatted.contains("blobs_bm25inc_" + new java.io.File(sfDir).getName),
      "serve still consults the old base lake")
    assert(!formatted.contains("documents.parquet"),
      "serve touches the corpus — the index, not the text, must answer")
    val pushed = formatted.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("In(term") || pushed.contains("EqualTo(term"), formatted.take(2000))
  }

  test("re-run serves the published generation without rewriting") {
    SparkEntry.queries("q158_postings_compact")(spark, sfDir).collect()
    def snap: Map[String, Long] = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getAbsolutePath -> f.lastModified)
      walk(lake("bm25comp")).toMap
    }
    val before = snap
    SparkEntry.queries("q158_postings_compact")(spark, sfDir).collect()
    assert(snap == before, "re-run rewrote the published compacted generation")
  }
}
