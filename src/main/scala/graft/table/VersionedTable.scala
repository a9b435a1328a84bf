package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper

/** Thrown when an optimistic commit loses the race: another writer
  * published the version this transaction targeted. The caller re-reads
  * the new snapshot and retries (or surfaces the conflict).
  */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/** A minimal versioned, transactional table over plain parquet — the
  * "Parquet/Delta" capability named in BASELINE.json, built in the style
  * of the PUBLIC Delta Lake transaction-log protocol (an append-only log
  * of JSON commit files describing add/remove actions over immutable
  * data files; no Delta code, just the published idea).
  *
  * Layout under the table root:
  * {{{
  *   _txn_log/00000000000000000000.json   one file PER VERSION, JSON lines:
  *       {"commit":{"version":0,"op":"create","readVersion":-1}}
  *       {"add":{"path":"data/<uuid>","rows":1500}}
  *       {"remove":{"path":"data/<older>"}}
  *   data/<uuid>/part-*.parquet           immutable Spark parquet writes
  * }}}
  *
  * The contract, and how each piece is achieved on a filesystem:
  *
  *   - ATOMIC COMMIT: the commit content is written to a temp name, then
  *     PUBLISHED via `Files.createLink(versionFile, tmp)` — hard-link
  *     creation is a single atomic syscall that FAILS if the target
  *     exists, so a version file is only ever observed complete, and two
  *     writers can never both claim one version. (The rename-based
  *     alternative, `ATOMIC_MOVE`, silently REPLACES on POSIX — it is
  *     atomic but detects no conflict.) On object stores the same
  *     publish step is the store's put-if-absent / conditional-write.
  *   - OPTIMISTIC CONCURRENCY: a transaction notes the version it read,
  *     targets `readVersion + 1`, and the publish step either wins or
  *     throws [[CommitConflictException]] — classic optimistic
  *     concurrency control. Blind appends can safely retry on a fresh
  *     read (they touch no existing file); rewriting commits (overwrite/
  *     merge) must re-run their dataflow against the new snapshot, so
  *     the decision is the caller's.
  *   - SNAPSHOT ISOLATION: data files are immutable and never deleted
  *     (no VACUUM here), and a snapshot resolves the active-file list of
  *     ONE version at construction — concurrent commits change the log,
  *     never a file a reader already holds. A reader sees exactly the
  *     files some single commit published: no torn reads, no phantom
  *     mixes of two versions.
  *   - TIME TRAVEL: `snapshot(spark, versionAsOf = Some(v))` replays the
  *     log only through v — the "VERSION AS OF" read.
  *
  * At 100 TB the log stays kilobytes per commit (it names directories,
  * not rows), readers list one small directory, and the data path is
  * untouched parquet — the scheme adds zero I/O to scans beyond reading
  * the file list from the log instead of from a directory listing (which
  * is itself the point: object-store listings are neither atomic nor
  * consistent; the log is).
  */
final class VersionedTable private (val root: Path) {
  import VersionedTable._

  private def logDir: Path = root.resolve(LogDirName)

  /** Largest committed version, or -1 for an empty/uninitialized log. */
  def latestVersion: Long = {
    val files = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala
        .map(_.getFileName.toString)
        // only fully-published version files count — a crashed writer's
        // .tmp-* debris must stay invisible to readers
        .filter(_.matches("\\d{20}\\.json"))
        .map(_.stripSuffix(".json").toLong)
        .foldLeft(-1L)(math.max)
    } finally files.close()
  }

  /** Active data paths (relative) at `version`: replay adds minus removes
    * through the log prefix. Insertion order is kept so snapshots list
    * files deterministically.
    */
  def activeFiles(version: Long): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet[String]()
    (0L to version).foreach { v =>
      val f = logDir.resolve(versionFileName(v))
      require(Files.exists(f), s"missing log version $v in $logDir")
      Files.readAllLines(f).forEach { line =>
        val node = Mapper.readTree(line)
        if (node.has("add")) active += node.get("add").get("path").asText()
        if (node.has("remove")) active -= node.get("remove").get("path").asText()
      }
    }
    active.toSeq
  }

  /** Snapshot read — latest version by default, `versionAsOf` for time
    * travel. The returned frame is pinned to the resolved file list:
    * commits that land afterwards cannot change what it reads.
    */
  def snapshot(spark: SparkSession, versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.getOrElse(latestVersion)
    require(v >= 0, s"table at $root has no committed version")
    val files = activeFiles(v)
    require(files.nonEmpty, s"version $v of $root holds no data files")
    spark.read.parquet(files.map(f => root.resolve(f).toString): _*)
  }

  /** Write `df` as a fresh immutable data directory; returns its
    * table-relative path. Not yet visible — only a commit publishes it.
    */
  private def writeData(df: DataFrame): (String, Long) = {
    val rel = s"data/${UUID.randomUUID()}"
    val rows = df.count()
    df.write.mode("errorifexists").parquet(root.resolve(rel).toString)
    (rel, rows)
  }

  /** Publish one commit targeting `readVersion + 1`.
    * @throws CommitConflictException if that version was taken first.
    */
  def commit(op: String, readVersion: Long,
             adds: Seq[(String, Long)], removes: Seq[String]): Long = {
    val version = readVersion + 1
    val sb = new StringBuilder
    sb.append(s"""{"commit":{"version":$version,"op":"${op}","readVersion":$readVersion}}""")
    adds.foreach { case (p, n) =>
      sb.append('\n').append(s"""{"add":{"path":"$p","rows":$n}}""") }
    removes.foreach { p =>
      sb.append('\n').append(s"""{"remove":{"path":"$p"}}""") }
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, sb.toString)
    val target = logDir.resolve(versionFileName(version))
    try {
      Files.createLink(target, tmp) // atomic publish + conflict check
      version
    } catch {
      case _: FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"version $version of $root was committed by another writer " +
            s"(this transaction read version $readVersion)")
    } finally Files.deleteIfExists(tmp)
  }

  /** Blind append: conflict-free by construction (touches no existing
    * file), so a lost race is safely retried against the fresh latest.
    */
  def append(df: DataFrame, maxRetries: Int = 5): Long = {
    val (rel, rows) = writeData(df)
    var attempt = 0
    while (true) {
      try return commit("append", latestVersion, Seq(rel -> rows), Nil)
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Replace the full table content (the rewriting commit class: a lost
    * race means the inputs changed, so the conflict PROPAGATES — the
    * caller must recompute against the new snapshot, not blind-retry).
    */
  def overwrite(df: DataFrame, readVersion: Long): Long = {
    val removed = activeFiles(readVersion)
    val (rel, rows) = writeData(df)
    commit("overwrite", readVersion, Seq(rel -> rows), removed)
  }

  /** MERGE INTO through the log: q62's co-partitioned full-outer merge
    * (graft.streaming.CdcApply.mergeBatch — update patches, delete wins,
    * insert appends) applied to the `readVersion` snapshot, committed as
    * one rewriting transaction. Same conflict semantics as overwrite.
    */
  def merge(spark: SparkSession, changes: DataFrame, readVersion: Long): Long = {
    val merged = graft.streaming.CdcApply.mergeBatch(
      snapshot(spark, Some(readVersion)), changes)
    val removed = activeFiles(readVersion)
    val (rel, rows) = writeData(merged)
    commit("merge", readVersion, Seq(rel -> rows), removed)
  }
}

object VersionedTable {
  private val LogDirName = "_txn_log"
  private val Mapper = new ObjectMapper()

  private def versionFileName(v: Long): String = f"$v%020d.json"

  /** Create a new table at `root` with `df` as version 0. */
  def create(root: String, df: DataFrame): VersionedTable = {
    val r = Paths.get(root)
    Files.createDirectories(r.resolve(LogDirName))
    val t = new VersionedTable(r)
    require(t.latestVersion == -1L, s"table already exists at $root")
    val (rel, rows) = t.writeData(df)
    t.commit("create", -1L, Seq(rel -> rows), Nil)
    t
  }

  /** Open an existing table. */
  def open(root: String): VersionedTable = {
    val r = Paths.get(root)
    require(Files.isDirectory(r.resolve(LogDirName)), s"no table log at $root")
    new VersionedTable(r)
  }
}
