package graft.core

import java.io.File

/** Shared discipline for every fingerprint-keyed staged artifact (blob
  * lakes, bucketed metastore tables, stream-source dirs, persisted ANN
  * indexes): one canonical source fingerprint, one atomic temp→rename
  * publish, and one stale-generation sweep so a regenerated corpus
  * leaves exactly ONE live artifact per family (VERDICT r15 task 4 —
  * previously old-fingerprint generations accumulated forever).
  *
  * Scale note: locally these artifacts live under target/ and the
  * warehouse dir; on a cluster they'd be DFS paths, where the same
  * rename-publish + prefix-sweep pattern is the standard "commit by
  * rename, GC by manifest" lake discipline.
  */
object Staging {

  /** Content-identity fingerprint of a source file or directory tree:
    * name, length and mtime folded per file in sorted order. Cheap
    * (no byte reads), stable across sessions, and changes whenever the
    * driver regenerates a corpus. Shared by stagedBlobs,
    * bucketedLineitem and the stream-events staging so audits can
    * recompute the EXACT artifact name a query used instead of
    * prefix+mtime guessing (ADVICE r15). */
  def fingerprint(f: File): Long =
    if (f.isDirectory)
      f.listFiles().sortBy(_.getName)
        .foldLeft(f.getName.hashCode.toLong)((a, c) => a * 1000003L + fingerprint(c))
    else f.getName.hashCode.toLong * 31L + f.length() * 1000003L + f.lastModified()

  def hexFingerprint(f: File): String =
    java.lang.Long.toHexString(fingerprint(f))

  /** Recursive delete tolerant of a concurrent racer deleting the same
    * tree (listFiles() → null mid-walk). Returns bytes reclaimed. */
  def rmTree(f: File): Long = {
    val sub =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).map(rmTree).sum
      else f.length()
    f.delete()
    sub
  }

  /** Atomic publish: rename a fully-populated staging dir onto the
    * final path; on a lost race, reclaim the staging copy and verify
    * the winner's artifact exists. */
  def publish(staging: File, dest: File): Unit =
    if (!staging.renameTo(dest)) {
      rmTree(staging)
      if (!dest.exists()) sys.error(s"could not publish staged dir $dest")
    }

  /** Stale-generation sweep: delete every sibling of `live` whose name
    * starts with `prefix` but is not `live` itself — i.e. artifacts of
    * the same family keyed by an OLD corpus fingerprint, plus orphaned
    * `.…_tmp_` staging dirs from crashed runs. Concurrent readers of an
    * old generation are by definition reading a corpus that no longer
    * exists, so reclaiming it is safe — but a DOT-prefixed tmp dir may
    * belong to a concurrent populate still in flight, so those are only
    * reaped once older than 15 min (a crashed run, not a live one).
    * Returns (dirs, bytes) reclaimed. */
  def sweepStale(parent: File, prefix: String, live: String): (Int, Long) = {
    val tmpCutoff = System.currentTimeMillis() - 15L * 60 * 1000
    val stale = Option(parent.listFiles()).getOrElse(Array.empty[File])
      .filter { f =>
        val n = f.getName
        if (n == live) false
        else if (n.startsWith(prefix)) true
        else n.startsWith("." + prefix) && f.lastModified() < tmpCutoff
      }
    val bytes = stale.map(rmTree).sum
    (stale.length, bytes)
  }

  @volatile private var reclaimedDirs: Long = 0L
  @volatile private var reclaimedBytes: Long = 0L

  /** Accumulate GC stats for the RungAudit `gc` probe. */
  def recordSweep(dirs: Int, bytes: Long): Unit = synchronized {
    reclaimedDirs += dirs; reclaimedBytes += bytes
  }

  def sweepStats: (Long, Long) = (reclaimedDirs, reclaimedBytes)
}
