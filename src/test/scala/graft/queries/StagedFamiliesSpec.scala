package graft.queries

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Staged-artifact family names must be globally unique: two
  * `stagedBlobs` call sites sharing an `fmt` silently share (and
  * clobber) one on-disk artifact family — the bug class q161c hit when
  * it briefly reused q118's "evolake" name and each query found the
  * OTHER's layout under its expected root. The registry is the source
  * tree itself, so the check runs against whatever is actually merged. */
class StagedFamiliesSpec extends AnyFunSuite {

  test("every stagedBlobs fmt is used by exactly one call site") {
    val srcRoot = java.nio.file.Paths.get("/root/repo/src/main/scala")
    val pat = """stagedBlobs\(\s*dir\s*,\s*"([a-z0-9]+)"""".r
    val uses = java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        pat.findAllMatchIn(text).map(m => m.group(1) -> p.getFileName.toString)
      }.toSeq
    val dup = uses.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty,
      s"stagedBlobs families reused across call sites: " +
        dup.map { case (f, sites) => s"$f -> ${sites.map(_._2).mkString(",")}" }
          .mkString("; "))
    assert(uses.nonEmpty, "no stagedBlobs call sites found — pattern rotted")
  }
}
