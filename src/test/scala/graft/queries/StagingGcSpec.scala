package graft.queries

import graft.SparkSuite
import graft.core.Staging
import java.io.File

/** VERDICT r15 task 4: fingerprint-keyed staged artifacts must not
  * accumulate across corpus regenerations — staging a family against a
  * CHANGED source reaps the old-fingerprint generation, leaving exactly
  * one live artifact, while in-flight (young, dot-prefixed) stagings of
  * concurrent sessions are left alone. */
class StagingGcSpec extends SparkSuite {

  /** A throwaway corpus dir whose documents.parquet / lineitem.parquet
    * can be "regenerated" (mtime-bumped) to change the fingerprint. */
  private def tmpCorpus(name: String): File = {
    val dir = new File(s"/root/repo/target/gcspec_$name")
    Staging.rmTree(dir)
    dir.mkdirs()
    import spark.implicits._
    Seq((1L, "alpha", 5L), (2L, "beta", 4L), (3L, "gamma", 5L))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(new File(dir, "documents.parquet").getAbsolutePath)
    Seq((10L, 100L), (10L, 101L), (11L, 100L), (11L, 101L), (12L, 102L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(new File(dir, "lineitem.parquet").getAbsolutePath)
    dir
  }

  /** Bump every file's mtime far enough that the (name, length, mtime)
    * fingerprint is guaranteed to change — the regenerated-corpus signal. */
  private def regenerate(dir: File): Unit = {
    def touch(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(touch)
      f.setLastModified(f.lastModified() + 60000): Unit
    }
    touch(dir)
  }

  private def family(parent: File, prefix: String): Seq[String] =
    Option(parent.listFiles()).getOrElse(Array.empty[File])
      .map(_.getName).filter(_.startsWith(prefix)).toSeq

  test("restaging a blob lake after corpus regen leaves exactly one live generation") {
    val corpus = tmpCorpus("blobs")
    val target = new File("/root/repo/target")
    def stage(): File = SourceQueries.stagedBlobs(
      corpus.getAbsolutePath, "gctest") { staging =>
      java.nio.file.Files.write(new File(staging, "blob.bin").toPath, Array[Byte](1, 2, 3))
    }
    val g1 = stage()
    assert(family(target, "blobs_gctest_").contains(g1.getName))
    regenerate(corpus)
    val g2 = stage()
    assert(g2.getName != g1.getName, "fingerprint must change on regeneration")
    val live = family(target, "blobs_gctest_")
    assert(live == Seq(g2.getName),
      s"exactly one live generation expected, got $live")
    assert(!g1.exists(), "the stale generation must be reaped")
    Staging.rmTree(corpus): Unit
    Staging.rmTree(g2): Unit
  }

  test("a YOUNG in-flight staging dir survives the sweep; an old orphan does not") {
    val corpus = tmpCorpus("tmps")
    val target = new File("/root/repo/target")
    val sfName = corpus.getName
    val young = new File(target, s".blobs_gctest2_${sfName}_tmp_inflight")
    young.mkdirs()
    val orphan = new File(target, s".blobs_gctest2_${sfName}_tmp_crashed")
    orphan.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000): Unit
    val g = SourceQueries.stagedBlobs(corpus.getAbsolutePath, "gctest2") { staging =>
      java.nio.file.Files.write(new File(staging, "b").toPath, Array[Byte](7))
    }
    assert(young.exists(), "a fresh concurrent staging must not be reaped")
    assert(!orphan.exists(), "a crashed run's stale tmp dir must be reaped")
    Staging.rmTree(young): Unit
    Staging.rmTree(corpus): Unit
    Staging.rmTree(g): Unit
  }

  test("restaging the bucketed lineitem table after corpus regen leaves one live table dir") {
    val corpus = tmpCorpus("bkt")
    val wh = new File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val prefix = s"lineitem_bkt_${corpus.getName}_"
    RelationalQueries.basketPairs(spark, corpus.getAbsolutePath).count(): Unit
    val t1 = RelationalQueries.bucketedTableName(corpus.getAbsolutePath)
    assert(family(wh, prefix) == Seq(t1))
    regenerate(corpus)
    RelationalQueries.basketPairs(spark, corpus.getAbsolutePath).count(): Unit
    val t2 = RelationalQueries.bucketedTableName(corpus.getAbsolutePath)
    assert(t2 != t1, "table fingerprint must change on regeneration")
    val live = family(wh, prefix)
    assert(live == Seq(t2), s"exactly one live table dir expected, got $live")
    spark.sql(s"DROP TABLE IF EXISTS `$t1`")
    spark.sql(s"DROP TABLE IF EXISTS `$t2`")
    Staging.rmTree(new File(wh, t2)): Unit
    Staging.rmTree(corpus): Unit
  }
}
