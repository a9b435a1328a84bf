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

/** Thrown when a write batch (or, for ADD CONSTRAINT, the existing table)
  * violates an active CHECK constraint. The write publishes nothing.
  */
class ConstraintViolationException(msg: String) extends RuntimeException(msg)

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

  /** Largest checkpointed version ≤ `version`, or -1 if none. */
  private def latestCheckpointAtOrBefore(version: Long): Long = {
    val files = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("\\d{20}\\.checkpoint\\.json"))
        .map(_.stripSuffix(".checkpoint.json").toLong)
        .filter(_ <= version)
        .foldLeft(-1L)(math.max)
    } finally files.close()
  }

  /** Active data paths (relative) at `version`: start from the newest
    * checkpoint at or before it, then replay only the log TAIL.
    * Insertion order is kept so snapshots list files deterministically.
    * With periodic checkpoints a reader's cost is O(commits since last
    * checkpoint), not O(table lifetime) — the piece that keeps a table
    * with years of minutely commits readable in constant time.
    */
  def activeFiles(version: Long): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet[String]()
    val cp = latestCheckpointAtOrBefore(version)
    if (cp >= 0) {
      val node = Mapper.readTree(
        Files.readString(logDir.resolve(checkpointFileName(cp))))
      node.get("active").forEach(p =>
        active += (if (p.isTextual) p.asText() else p.get("path").asText()))
    }
    (cp + 1 to version).foreach { v =>
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

  /** Active files at `version` WITH their logged row counts and stats —
    * the full add-entry view [[restore]] needs to re-activate a past
    * file set. Same checkpoint + tail replay as activeFiles; files that
    * entered via a checkpoint written before checkpoints carried row
    * counts surface rows = -1 (advisory metadata, never load-bearing).
    */
  def activeAdds(version: Long): Seq[AddEntry] = {
    val active = scala.collection.mutable.LinkedHashMap[String, AddEntry]()
    val cp = latestCheckpointAtOrBefore(version)
    if (cp >= 0) {
      val node = Mapper.readTree(
        Files.readString(logDir.resolve(checkpointFileName(cp))))
      node.get("active").forEach { p =>
        if (p.isTextual) active(p.asText()) = AddEntry(p.asText(), -1L, None)
        else {
          val path = p.get("path").asText()
          val rows = if (p.has("rows")) p.get("rows").asLong() else -1L
          val st = if (p.has("min") && p.has("max"))
            Some((p.get("min").asLong(), p.get("max").asLong())) else None
          active(path) = AddEntry(path, rows, st)
        }
      }
    }
    (cp + 1 to version).foreach { v =>
      val f = logDir.resolve(versionFileName(v))
      require(Files.exists(f), s"missing log version $v in $logDir")
      Files.readAllLines(f).forEach { line =>
        val node = Mapper.readTree(line)
        if (node.has("add")) {
          val a = node.get("add")
          val path = a.get("path").asText()
          val st = if (a.has("min") && a.has("max"))
            Some((a.get("min").asLong(), a.get("max").asLong())) else None
          active(path) = AddEntry(path, a.get("rows").asLong(), st)
        }
        if (node.has("remove")) active -= node.get("remove").get("path").asText()
      }
    }
    active.values.toSeq
  }

  /** RESTORE the table to the content (and schema) of `toVersion` as a
    * NEW commit — the Delta-style metadata-only rollback: no data file
    * is copied or rewritten, the commit simply re-activates the target
    * version's file set and removes everything added since. History is
    * PRESERVED: the rolled-back versions stay time-travelable, and a
    * restore can itself be restored away. Conflict class: rewriting
    * (like overwrite) — a racer's commit invalidates the file-set
    * delta, so the conflict propagates to the caller. Fails loudly if
    * vacuum already reclaimed a target file (the restore horizon is the
    * vacuum horizon, exactly as in the Delta protocol).
    */
  def restore(toVersion: Long, readVersion: Long): Long = {
    require(toVersion <= readVersion,
      s"restore target $toVersion is ahead of read version $readVersion")
    val target = activeAdds(toVersion)
    target.foreach { a =>
      // "fails loudly" must mean real content: a bare existence check
      // passes on a partially deleted directory and surfaces later as a
      // read error. Evidence = at least one parquet part file, or a
      // bucket subdirectory (optimize commits nest __bucket=N dirs).
      val dir = root.resolve(a.path)
      val hasContent = Files.isDirectory(dir) && {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.exists { p =>
            p.getFileName.toString.endsWith(".parquet") || Files.isDirectory(p)
          }
        } finally s.close()
      }
      require(hasContent,
        s"restore target ${a.path} was vacuumed or partially deleted; version $toVersion is unrecoverable")
    }
    val current = activeFiles(readVersion).toSet
    val targetPaths = target.map(_.path).toSet
    val adds = target.filterNot(a => current.contains(a.path))
    val removes = current.diff(targetPaths).toSeq
    commit("restore", readVersion, adds, removes,
      schemaJson = schemaOf(toVersion).map(_.json))
  }

  /** Write a checkpoint of the CURRENT latest version's active-file list.
    * Idempotent and crash-safe (tmp + atomic link; an existing checkpoint
    * for the version is left alone). Checkpoints are pure accelerators:
    * replay without them is always correct, so losing one costs time,
    * never consistency.
    */
  def checkpoint(): Long = {
    val v = latestVersion
    require(v >= 0, "nothing to checkpoint")
    val target = logDir.resolve(checkpointFileName(v))
    if (!Files.exists(target)) {
      val files = activeFiles(v)
      // stats ride the checkpoint too, so data-skipping reads share the
      // O(tail) replay bound instead of re-walking the whole log
      val stats = fileStats(v)
      val rows = activeAdds(v).map(a => a.path -> a.rows).toMap
      val entries = files.map { f =>
        val r = rows.get(f).filter(_ >= 0).map(n => s""","rows":$n""").getOrElse("")
        stats.get(f) match {
          case Some((mn, mx)) => s"""{"path":"$f"$r,"min":$mn,"max":$mx}"""
          case None => s"""{"path":"$f"$r}"""
        }
      }
      val tmp = logDir.resolve(s".tmp-cp-${UUID.randomUUID()}.json")
      Files.writeString(tmp,
        s"""{"version":$v,"active":[${entries.mkString(",")}]}""")
      try Files.createLink(target, tmp)
      catch { case _: FileAlreadyExistsException => () } // racer wrote it
      finally Files.deleteIfExists(tmp)
    }
    v
  }

  /** The table schema AT `version`: the newest commit at or before it
    * that recorded one (every data-writing commit does). Scanned
    * newest-first so vacuum/checkpoint-obsoleted old log files are never
    * needed. None only for pre-schema-logging tables (falls back to
    * parquet self-description).
    */
  def schemaOf(version: Long): Option[org.apache.spark.sql.types.StructType] = {
    var v = version
    while (v >= 0) {
      val f = logDir.resolve(versionFileName(v))
      if (Files.exists(f)) {
        var found: Option[String] = None
        Files.readAllLines(f).forEach { line =>
          val node = Mapper.readTree(line)
          if (node.has("commit") && node.get("commit").has("schema"))
            found = Some(node.get("commit").get("schema").toString)
        }
        found.foreach { s =>
          return Some(org.apache.spark.sql.types.DataType.fromJson(s)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
        }
      }
      v -= 1
    }
    None
  }

  /** Snapshot read — latest version by default, `versionAsOf` for time
    * travel. The returned frame is pinned to the resolved file list:
    * commits that land afterwards cannot change what it reads.
    *
    * SCHEMA EVOLUTION: the read is driven by the LOGGED schema of the
    * target version, not by any one file's footer — files written
    * before an additive column existed surface it as NULL (the parquet
    * reader fills missing columns), and time travel to an old version
    * reads the old schema without the later columns. This is why the
    * schema lives in the log: a directory of mixed-footer files has no
    * authoritative answer to "what columns does this table have as of
    * version v"; the commit that created v does.
    */
  def snapshot(spark: SparkSession, versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.getOrElse(latestVersion)
    require(v >= 0, s"table at $root has no committed version")
    val files = activeFiles(v)
    require(files.nonEmpty, s"version $v of $root holds no data files")
    val reader = schemaOf(v).fold(spark.read)(s => spark.read.schema(s))
    reader.parquet(files.map(f => root.resolve(f).toString): _*)
  }

  /** Per-file stats recorded in the log for `version`:
    * path -> (min, max) of the table's stats column, absent for files
    * committed without stats. Same O(tail) replay as activeFiles — the
    * checkpoint carries the stats, and the tail replay is STRICT
    * (missing tail log file = loud failure, never silently degraded
    * pruning).
    */
  def fileStats(version: Long): Map[String, (Long, Long)] = {
    val stats = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    val cp = latestCheckpointAtOrBefore(version)
    if (cp >= 0) {
      val node = Mapper.readTree(
        Files.readString(logDir.resolve(checkpointFileName(cp))))
      node.get("active").forEach { p =>
        if (!p.isTextual && p.has("min") && p.has("max"))
          stats(p.get("path").asText()) = (p.get("min").asLong(), p.get("max").asLong())
      }
    }
    (cp + 1 to version).foreach { v =>
      val f = logDir.resolve(versionFileName(v))
      require(Files.exists(f), s"missing log version $v in $logDir")
      Files.readAllLines(f).forEach { line =>
        val node = Mapper.readTree(line)
        if (node.has("add")) {
          val a = node.get("add")
          if (a.has("min") && a.has("max"))
            stats(a.get("path").asText()) = (a.get("min").asLong(), a.get("max").asLong())
        }
        if (node.has("remove")) stats -= node.get("remove").get("path").asText()
      }
    }
    stats.toMap
  }

  /** Data-skipping snapshot read: prune data files whose logged
    * [min, max] span of the stats column cannot intersect [lo, hi] —
    * BEFORE Spark lists a single footer. This is the zone-map / Delta
    * data-skipping idea lifted into the commit log: parquet row-group
    * stats prune I/O inside a file the scanner already opened, log
    * stats prune the FILES, which at 100 TB is the difference between
    * planning over thousands of objects and planning over the few a
    * time-ordered ingest actually touches (append-mostly tables are
    * naturally clustered on ingest keys, so spans are tight in
    * practice; a z-order rewrite — q86 — tightens two dimensions at
    * once). Files with no recorded stats are conservatively kept, and
    * the residual filter still applies, so the read is always correct,
    * just cheaper. Returns the frame plus how many files survived of
    * the total (the spec pins the skipping really happened).
    */
  def snapshotWhere(spark: SparkSession, lo: Long, hi: Long,
                    versionAsOf: Option[Long] = None): (DataFrame, Int, Int) = {
    val statsCol = statsColumn.getOrElse(
      throw new IllegalStateException(s"table at $root records no stats column"))
    val v = versionAsOf.getOrElse(latestVersion)
    val files = activeFiles(v)
    val stats = fileStats(v)
    val kept = files.filter { f =>
      stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
    require(kept.nonEmpty, s"no file of version $v can contain [$lo, $hi]")
    // same logged-schema read discipline as snapshot(): which footers
    // survive pruning must not decide the result schema
    val reader = schemaOf(v).fold(spark.read)(sch => spark.read.schema(sch))
    val df = reader.parquet(kept.map(f => root.resolve(f).toString): _*)
      .filter(org.apache.spark.sql.functions.col(statsCol).between(lo, hi))
    (df, kept.length, files.length)
  }

  /** The column this table logs min/max stats for (from version 0's
    * commit metadata), if any.
    */
  def statsColumn: Option[String] = {
    val f = logDir.resolve(versionFileName(0L))
    if (!Files.exists(f)) None
    else {
      var found: Option[String] = None
      Files.readAllLines(f).forEach { line =>
        val node = Mapper.readTree(line)
        if (node.has("commit") && node.get("commit").has("statsCol"))
          found = Some(node.get("commit").get("statsCol").asText())
      }
      found
    }
  }

  /** Write `df` as a fresh immutable data directory; returns the add
    * entry (path, rows, and — when the table logs a stats column — the
    * written data's min/max of it, gathered in the SAME aggregate pass
    * as the row count). Not yet visible — only a commit publishes it.
    */
  private def writeData(df: DataFrame,
                        statsCol: Option[String] = statsColumn): AddEntry = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val rel = s"data/${UUID.randomUUID()}"
    val entry = statsCol match {
      case Some(c) =>
        val r = df.agg(count(lit(1)), min(col(c)).cast("long"),
          max(col(c)).cast("long")).head()
        AddEntry(rel, r.getLong(0),
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))
      case None => AddEntry(rel, df.count(), None)
    }
    df.write.mode("errorifexists").parquet(root.resolve(rel).toString)
    entry
  }

  /** Publish one commit targeting `readVersion + 1`.
    * @throws CommitConflictException if that version was taken first.
    */
  def commit(op: String, readVersion: Long,
             adds: Seq[AddEntry], removes: Seq[String],
             statsColMeta: Option[String] = None,
             schemaJson: Option[String] = None,
             txnId: Option[Long] = None,
             constraintsJson: Option[String] = None): Long = {
    val version = readVersion + 1
    val sb = new StringBuilder
    val meta = statsColMeta.map(c => s""","statsCol":"$c"""").getOrElse("") +
      schemaJson.map(j => s""","schema":$j""").getOrElse("") +
      txnId.map(t => s""","txn":$t""").getOrElse("") +
      constraintsJson.map(c => s""","constraints":$c""").getOrElse("")
    sb.append(s"""{"commit":{"version":$version,"op":"${op}","readVersion":$readVersion$meta}}""")
    adds.foreach { a =>
      val st = a.stats.map { case (mn, mx) => s""","min":$mn,"max":$mx""" }.getOrElse("")
      sb.append('\n').append(s"""{"add":{"path":"${a.path}","rows":${a.rows}$st}}""") }
    removes.foreach { p =>
      sb.append('\n').append(s"""{"remove":{"path":"$p"}}""") }
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, sb.toString)
    val target = logDir.resolve(versionFileName(version))
    try {
      Files.createLink(target, tmp) // atomic publish + conflict check
      // periodic checkpoint so reader replay stays O(interval); purely
      // an accelerator, so best-effort is correct
      if (version > 0 && version % CheckpointInterval == 0)
        try checkpoint() catch { case _: Throwable => () }
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
  def append(df: DataFrame, maxRetries: Int = 5,
             txnId: Option[Long] = None): Long = {
    // Validate BEFORE writeData so a violating batch publishes nothing,
    // not even an orphan data file. Validation reads the entry-time
    // constraint set; a constraint added concurrently with this append
    // has the same write-write race Delta documents for its own path.
    validateConstraints(df, latestVersion, "append")
    val add = writeData(df)
    var attempt = 0
    while (true) {
      // ONE latestVersion read per attempt, used for BOTH the schema
      // merge and the commit target: reading it twice would let a
      // foreign commit slip between the reads and this append succeed
      // while logging a schema merged against the stale version —
      // silently narrowing away the racer's new columns. With a single
      // read, any interleaving commit surfaces as a conflict and the
      // retry recomputes the merge (additive evolution: the new logged
      // schema is the previous schema plus any columns this batch
      // introduces — an append can widen the table, never narrow it).
      val rv = latestVersion
      val schema = Some(evolvedSchema(df, rv))
      try return commit("append", rv, Seq(add), Nil, schemaJson = schema,
        txnId = txnId)
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
  def overwrite(df: DataFrame, readVersion: Long,
                txnId: Option[Long] = None): Long = {
    validateConstraints(df, readVersion, "overwrite")
    val removed = activeFiles(readVersion)
    val add = writeData(df)
    // a full replace REDEFINES the schema (it may drop columns)
    commit("overwrite", readVersion, Seq(add), removed,
      schemaJson = Some(df.schema.json), txnId = txnId)
  }

  /** The op name and the add-entry delta of ONE commit (not the
    * replayed active set) — what an incremental consumer (replication,
    * audit) needs to apply exactly that commit's effect.
    */
  def commitInfo(version: Long): (String, Seq[AddEntry], Seq[String]) = {
    val f = logDir.resolve(versionFileName(version))
    require(Files.exists(f), s"missing log version $version in $logDir")
    var op = "?"
    val adds = scala.collection.mutable.ArrayBuffer[AddEntry]()
    val removes = scala.collection.mutable.ArrayBuffer[String]()
    Files.readAllLines(f).forEach { line =>
      val node = Mapper.readTree(line)
      if (node.has("commit")) op = node.get("commit").get("op").asText()
      if (node.has("add")) {
        val a = node.get("add")
        val st = if (a.has("min") && a.has("max"))
          Some((a.get("min").asLong(), a.get("max").asLong())) else None
        adds += AddEntry(a.get("path").asText(), a.get("rows").asLong(), st)
      }
      if (node.has("remove")) removes += node.get("remove").get("path").asText()
    }
    (op, adds.toSeq, removes.toSeq)
  }

  /** Schema at `asOf` widened by any columns `df` introduces. */
  private def evolvedSchema(df: DataFrame, asOf: Long): String = {
    val merged = schemaOf(asOf) match {
      case Some(p) =>
        val extra = df.schema.fields.filterNot(f => p.fieldNames.contains(f.name))
        org.apache.spark.sql.types.StructType(p.fields ++ extra)
      case None => df.schema
    }
    merged.json
  }

  /** MERGE INTO through the log: q62's co-partitioned full-outer merge
    * (graft.streaming.CdcApply.mergeBatch — update patches, delete wins,
    * insert appends) applied to the `readVersion` snapshot, committed as
    * one rewriting transaction. Same conflict semantics as overwrite.
    */
  def merge(spark: SparkSession, changes: DataFrame, readVersion: Long,
            txnId: Option[Long] = None): Long = {
    val merged = graft.streaming.CdcApply.mergeBatch(
      snapshot(spark, Some(readVersion)), changes)
    // the merged RESULT is validated (deletes can't violate; updates and
    // inserts land in it), same point in the flow as Delta's merge check
    validateConstraints(merged, readVersion, "merge")
    val removed = activeFiles(readVersion)
    val add = writeData(merged)
    commit("merge", readVersion, Seq(add), removed,
      schemaJson = Some(merged.schema.json), txnId = txnId)
  }

  /** The most recently committed transaction id (the idempotence cursor
    * for at-least-once writers like foreachBatch: batch ids are
    * monotonic, so a batch ≤ this id was already applied and must be
    * skipped on replay — the public Delta txnAppId/txnVersion pattern).
    * Scans newest→oldest and stops at the first commit carrying one.
    */
  def lastTxnId: Option[Long] = {
    var v = latestVersion
    while (v >= 0) {
      val f = logDir.resolve(versionFileName(v))
      if (Files.exists(f)) {
        var found: Option[Long] = None
        Files.readAllLines(f).forEach { line =>
          val node = Mapper.readTree(line)
          if (node.has("commit") && node.get("commit").has("txn"))
            found = Some(node.get("commit").get("txn").asLong())
        }
        if (found.isDefined) return found
      }
      v -= 1
    }
    None
  }

  // ------------------------------------------------------------------
  // CHECK constraints (the Delta `ALTER TABLE ADD CONSTRAINT` surface):
  // declarative row predicates logged IN the commit log — every
  // constraint-changing commit records the FULL active set (the schemaOf
  // pattern), so the set at any version is the newest such commit at or
  // before it, O(log tail) to resolve and time-travel-consistent. Writes
  // validate the incoming batch BEFORE any data file is written, so a
  // violation publishes nothing — not even an orphan file. SQL CHECK
  // semantics: a NULL predicate passes.

  /** Active CHECK constraints at `version`, newest-logged set wins. */
  def constraintsOf(version: Long): Seq[(String, String)] = {
    var v = version
    while (v >= 0) {
      val f = logDir.resolve(versionFileName(v))
      if (Files.exists(f)) {
        var found: Option[Seq[(String, String)]] = None
        Files.readAllLines(f).forEach { line =>
          val node = Mapper.readTree(line)
          if (node.has("commit") && node.get("commit").has("constraints")) {
            val arr = node.get("commit").get("constraints")
            val b = Seq.newBuilder[(String, String)]
            arr.forEach(el =>
              b += ((el.get("name").asText(), el.get("expr").asText())))
            found = Some(b.result())
          }
        }
        found.foreach(cs => return cs)
      }
      v -= 1
    }
    Nil
  }

  /** Active CHECK constraints of the latest version. */
  def checkConstraints: Seq[(String, String)] = constraintsOf(latestVersion)

  private def constraintsToJson(cs: Seq[(String, String)]): String =
    cs.map { case (n, e) =>
      s"""{"name":${Mapper.writeValueAsString(n)},"expr":${Mapper.writeValueAsString(e)}}"""
    }.mkString("[", ",", "]")

  /** Throw [[ConstraintViolationException]] if `df` violates any of the
    * active constraints at `version`. One combined pass over the batch
    * when all pass (the common case); only a failure pays per-constraint
    * re-evaluation to NAME the violated constraint in the error.
    */
  private[graft] def validateConstraints(df: DataFrame, version: Long,
                                  op: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val cs = constraintsOf(version)
    if (cs.isEmpty) return
    def violated(e: String) = not(coalesce(expr(e), lit(true)))
    val anyBad = cs.map(c => violated(c._2)).reduce(_ || _)
    if (df.where(anyBad).take(1).nonEmpty) {
      val culprit = cs.find(c => df.where(violated(c._2)).take(1).nonEmpty)
        .getOrElse(cs.head)
      throw new ConstraintViolationException(
        s"$op to $root violates CHECK constraint '${culprit._1}' " +
          s"(${culprit._2})")
    }
  }

  /** Add a named CHECK constraint. Like Delta's ADD CONSTRAINT, the
    * EXISTING table must already satisfy it (validated against the read
    * snapshot before the commit publishes); concurrent commits retry the
    * read-validate-commit cycle.
    */
  def addCheckConstraint(spark: SparkSession, name: String, exprStr: String,
                         maxRetries: Int = 5): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    var attempt = 0
    while (true) {
      val rv = latestVersion
      val existing = constraintsOf(rv)
      require(!existing.exists(_._1 == name),
        s"constraint '$name' already exists on $root")
      if (rv >= 0 &&
          snapshot(spark, Some(rv))
            .where(not(coalesce(expr(exprStr), lit(true)))).take(1).nonEmpty)
        throw new ConstraintViolationException(
          s"cannot add CHECK constraint '$name' ($exprStr): " +
            s"existing rows of $root violate it")
      try return commit("addConstraint", rv, Nil, Nil,
        constraintsJson = Some(constraintsToJson(existing :+ (name, exprStr))))
      catch {
        case e: CommitConflictException =>
          attempt += 1; if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Drop a named CHECK constraint (no-op validation; the set shrinks). */
  def dropCheckConstraint(name: String, maxRetries: Int = 5): Long = {
    var attempt = 0
    while (true) {
      val rv = latestVersion
      val existing = constraintsOf(rv)
      require(existing.exists(_._1 == name),
        s"constraint '$name' does not exist on $root")
      try return commit("dropConstraint", rv, Nil, Nil,
        constraintsJson = Some(constraintsToJson(existing.filterNot(_._1 == name))))
      catch {
        case e: CommitConflictException =>
          attempt += 1; if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** CHANGE DATA FEED between two versions, keyed by `keyCol`: what a
    * downstream consumer must apply to move from `fromVersion`'s state
    * to `toVersion`'s — one row per changed key tagged insert / update /
    * delete. Computed as one full-outer join of the two snapshots on the
    * key with a struct compare over their common columns (version-diff
    * semantics; a log that RECORDED row-level changes per commit could
    * serve this without the join, which is the production upgrade path —
    * the API contract is identical). Unchanged keys drop out before
    * anything is returned, so feed volume tracks churn, not table size.
    */
  def changes(spark: SparkSession, keyCol: String,
              fromVersion: Long, toVersion: Long): DataFrame =
    changesWithImages(spark, keyCol, fromVersion, toVersion)
      .select(org.apache.spark.sql.functions.col(keyCol),
        org.apache.spark.sql.functions.col("_change_type"))

  /** [[changes]] plus the row IMAGES (Delta CDF's preimage/postimage):
    * `_before` is the row's non-key struct at `fromVersion` (NULL for
    * inserts), `_after` at `toVersion` (NULL for deletes). This is the
    * feed shape incremental consumers need — an aggregate
    * materialization updates from `_after − _before` signed deltas
    * (q141) without touching unchanged rows; key-only [[changes]] can
    * say WHAT moved but not by how much.
    */
  def changesWithImages(spark: SparkSession, keyCol: String,
                        fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat_ws, count, lit, max,
      not, raise_error, struct, when}
    require(fromVersion < toVersion,
      s"changes requires fromVersion < toVersion, got $fromVersion >= $toVersion")
    val before = snapshot(spark, Some(fromVersion))
    val after = snapshot(spark, Some(toVersion))
    val common = before.columns.filter(after.columns.contains).filter(_ != keyCol)
    // PRECONDITION, enforced: `keyCol` identifies at most one row per
    // snapshot. A duplicated key would fan the full-outer join out and
    // silently corrupt every downstream delta algebra (q141), so each
    // side pre-aggregates per key — max(struct) is the row itself when
    // the key is unique, and the guard raises DURING execution (inside
    // the _change_type expression, so column pruning can't drop it) the
    // moment any key holds >1 row. The groupBy hash-partitions each
    // side on the key, which is exactly the join's requirement — the
    // guard adds no exchange beyond what the join itself needs.
    // (max(struct) requires orderable field types — no new restriction:
    // the null-safe struct compare below already requires comparable
    // ones, and MapType is neither; CDF over map-typed columns was
    // never expressible in this classifier.)
    def keyed(df: DataFrame, img: String, n: String) =
      df.groupBy(col(keyCol)).agg(
        max(struct(common.map(col): _*)).as(img), count(lit(1)).as(n))
    val b = keyed(before, "_before", "_nb")
    val a = keyed(after, "_after", "_na")
    val dupGuard = raise_error(concat_ws("",
      lit(s"changesWithImages: duplicate '$keyCol' in snapshot (key="),
      col(keyCol).cast("string"), lit(")"))).cast("string")
    b.join(a, Seq(keyCol), "full_outer")
      .withColumn("_change_type",
        when(col("_nb") > 1 || col("_na") > 1, dupGuard)
          .when(col("_before").isNull, "insert")
          .when(col("_after").isNull, "delete")
          // null-SAFE struct compare: a field moving null->value (or
          // back) is an update; plain =!= returns null there and the
          // row would silently vanish from the feed
          .when(not(col("_before") <=> col("_after")), "update"))
      .filter(col("_change_type").isNotNull)
      .select(col(keyCol), col("_change_type"), col("_before"), col("_after"))
  }

  /** Small-file compaction THROUGH the log (Delta OPTIMIZE's shape): the
    * active files of `readVersion` are rewritten into ~`targetBytes`
    * outputs and swapped in one rewriting commit that changes ZERO rows
    * — readers of any version, before or after, see identical data;
    * only the file layout (and scan cost) changes. Pairs with
    * ops/Layout.compact, which documents why repartition (a shuffle)
    * beats coalesce for uniform output sizes.
    */
  /** DELETE WHERE through the log — the Delta delete algorithm with
    * file-level pruning: ONE distributed pass finds the files that
    * actually contain matching rows (`input_file_name` over the
    * predicate's survivors), only THOSE files are rewritten without
    * their matches, and untouched files keep their existing add entries
    * — zero I/O for data the predicate never touches, which at 100 TB
    * (with clustering, q-optimize) is almost all of it. Time travel
    * still reads the deleted rows at pre-delete versions (immutable
    * files); PHYSICAL removal — the compliance half of a
    * right-to-be-forgotten pipeline — is `vacuum` past the delete's
    * horizon, spec-proven to remove the bytes from disk. Rewriting
    * conflict class (like compact/overwrite): a lost race propagates.
    * Returns the committed version, or -1 if nothing matched (no empty
    * commit published).
    */
  def deleteWhere(spark: SparkSession, predicate: String,
                  readVersion: Long): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, input_file_name, lit, not}
    val snap = snapshot(spark, Some(readVersion))
    val touchedUris = snap.where(expr(predicate))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet // bounded by |active files|
    if (touchedUris.isEmpty) return -1L
    val touched = activeFiles(readVersion).filter { rel =>
      touchedUris.exists(u => u.contains(rel))
    }
    val reader = schemaOf(readVersion).fold(spark.read)(s => spark.read.schema(s))
    val kept = reader
      .parquet(touched.map(f => root.resolve(f).toString): _*)
      // DELETE WHERE p removes rows where p is TRUE; NULL keeps the row
      .where(not(coalesce(expr(predicate), lit(false))))
    val add = writeData(kept)
    commit("delete", readVersion, Seq(add), touched,
      schemaJson = Some(snap.schema.json))
  }

  def compact(spark: SparkSession, targetBytes: Long, readVersion: Long): Long = {
    val removed = activeFiles(readVersion)
    val df = snapshot(spark, Some(readVersion))
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val add = writeData(df.repartition(nOut))
    commit("compact", readVersion, Seq(add), removed,
      schemaJson = Some(df.schema.json))
  }

  /** OPTIMIZE: rewrite the active file set CLUSTERED by `clusterKey`
    * into up to `nBuckets` range buckets — one add entry per bucket,
    * written in a single pass (`write.partitionBy` on the computed
    * bucket id), published as ONE rewriting commit. Layout-only: same
    * rows, every version's readers unaffected, history intact. What it
    * buys: per-entry min/max stats become tight near-disjoint ranges,
    * so [[snapshotWhere]] prunes to ~1/nBuckets of the data instead of
    * reading everything — the `OPTIMIZE ... ZORDER BY` shape (pass an
    * interleaved key, ops/Layout.scala's bit trick, for
    * multi-dimensional locality; the bucketing mechanics don't care
    * what the key expression is). Boundaries are exact percentiles of
    * the key — an (nBuckets−1)-value driver-held literal, the
    * IVF-codebook pattern; at 100 TB swap in `approx_percentile`
    * (boundary placement changes, correctness doesn't: any boundaries
    * yield the same rows, only skipping tightness varies). Conflict
    * class: rewriting, like compact/overwrite.
    */
  def optimize(spark: SparkSession, clusterKey: org.apache.spark.sql.Column,
               nBuckets: Int, readVersion: Long): Long = {
    import org.apache.spark.sql.functions._
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val removed = activeFiles(readVersion)
    val df = snapshot(spark, Some(readVersion))
    val keyed = df.withColumn("__ck", clusterKey.cast("double"))
    val cuts: Seq[Double] =
      if (nBuckets == 1) Nil
      else {
        val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
        keyed.agg(expr(s"percentile(__ck, array(${qs.mkString(",")}))"))
          .head().getSeq[Double](0)
      }
    val bucket = cuts.foldLeft(lit(0))((acc, c) =>
      acc + when(col("__ck") >= c, 1).otherwise(0))
    val rel = s"data/${UUID.randomUUID()}"
    val out = keyed.withColumn("__bucket", bucket).drop("__ck")
    out.write.mode("errorifexists").partitionBy("__bucket")
      .parquet(root.resolve(rel).toString)
    // one aggregate yields every bucket's row count and stats span
    val adds = (statsColumn match {
      case Some(c) =>
        out.groupBy(col("__bucket"))
          .agg(count(lit(1)), min(col(c)).cast("long"), max(col(c)).cast("long"))
          .collect()
          .map(r => AddEntry(s"$rel/__bucket=${r.getInt(0)}", r.getLong(1),
            if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      case None =>
        out.groupBy(col("__bucket")).agg(count(lit(1))).collect()
          .map(r => AddEntry(s"$rel/__bucket=${r.getInt(0)}", r.getLong(1), None))
    }).toSeq.sortBy(_.path)
    commit("optimize", readVersion, adds, removed,
      schemaJson = Some(df.schema.json))
  }

  /** Physically delete data directories no version ≥ `horizon`
    * references — the retention trade every table format makes explicit:
    * time travel BEFORE the horizon dies (a vacuumed version's read
    * fails fast on the missing file, never silently returns partial
    * data), storage is reclaimed, every version ≥ horizon is untouched.
    * Returns the deleted table-relative paths.
    */
  def vacuum(horizon: Long, minAgeMs: Long = 600000L): Seq[String] = {
    val latest = latestVersion
    require(horizon >= 0 && horizon <= latest,
      s"vacuum horizon $horizon outside [0, $latest]")
    val referenced = (horizon to latest).flatMap(activeFiles).toSet
    val dataDir = root.resolve("data")
    val cutoff = System.currentTimeMillis() - minAgeMs
    val all = Files.list(dataDir)
    val victims =
      try {
        import scala.jdk.CollectionConverters._
        all.iterator().asScala
          // the age guard protects a CONCURRENT writer: its data dir is
          // on disk before its commit publishes, and deleting it would
          // corrupt the commit that then succeeds (log-only). Directories
          // younger than the retention window are never victims — the
          // same modification-time guard production table formats use.
          .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
          .map(p => s"data/${p.getFileName}")
          // an optimize commit's add entries are NESTED under one data
          // dir (data/<uuid>/__bucket=N), so a top-level child is live
          // when any referenced path sits below it — a flat contains()
          // here would hand a live optimized table to the deleter
          .filterNot(rel => referenced.contains(rel) ||
            referenced.exists(_.startsWith(rel + "/")))
          .toList
      } finally all.close()
    victims.foreach { rel =>
      // recursive: victims can themselves hold bucket subdirectories
      val walk = Files.walk(root.resolve(rel))
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      } finally walk.close()
    }
    victims
  }
}

object VersionedTable {
  private[graft] val LogDirName = "_txn_log"
  private val Mapper = new ObjectMapper()

  /** NET-EFFECT composition of two change feeds (the Delta CDF
    * "net changes" semantic): given the v0→v1 and v1→v2 image feeds,
    * produce the v0→v2 feed directly — insert∘delete and
    * update-back-to-original cancel, insert∘update collapses to one
    * insert with the final image, delete∘insert of an identical row
    * vanishes. The algebra is one keyed full-outer join (net before =
    * the OLDER feed's preimage where present, net after = the NEWER
    * feed's postimage where present) + the same null-safe classifier
    * snapshots use — so `compose(changes(a,b), changes(b,c)) ==
    * changes(a,c)` exactly, which TableSpec pins. Consumers replaying a
    * backlog apply one net row per key instead of every intermediate
    * event; feed volume stays churn-bounded under composition.
    *
    * PRECONDITION: each feed carries AT MOST ONE row per key — the
    * contract [[changesWithImages]] guarantees (and now enforces) for
    * its own output. A multi-row-per-key feed would fan the full-outer
    * join out and produce a corrupt net feed; when composing feeds from
    * an external writer, net them per key first.
    */
  def composeChanges(keyCol: String, older: DataFrame, newer: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, not, when}
    val a = older.select(col(keyCol), col("_before").as("_b1"), col("_after").as("_a1"))
    val b = newer.select(col(keyCol), col("_before").as("_b2"), col("_after").as("_a2"))
    // a feed row always carries >= 1 non-null image, so "present" is
    // distinguishable from the full-outer join's all-null absence
    val in1 = col("_b1").isNotNull || col("_a1").isNotNull
    val in2 = col("_b2").isNotNull || col("_a2").isNotNull
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("_before", when(in1, col("_b1")).otherwise(col("_b2")))
      .withColumn("_after", when(in2, col("_a2")).otherwise(col("_a1")))
      .withColumn("_change_type",
        when(col("_before").isNull && col("_after").isNull, null)
          .when(col("_before").isNull, "insert")
          .when(col("_after").isNull, "delete")
          .when(not(col("_before") <=> col("_after")), "update"))
      .filter(col("_change_type").isNotNull)
      .select(col(keyCol), col("_change_type"), col("_before"), col("_after"))
  }

  /** Auto-checkpoint cadence: replay cost is bounded by this many
    * commit files plus one checkpoint read.
    */
  val CheckpointInterval = 10

  /** One published data write: table-relative path, row count, and the
    * stats column's (min, max) when the table records stats.
    */
  final case class AddEntry(path: String, rows: Long, stats: Option[(Long, Long)])

  private def versionFileName(v: Long): String = f"$v%020d.json"
  private def checkpointFileName(v: Long): String = f"$v%020d.checkpoint.json"

  /** Create a new table at `root` with `df` as version 0. `statsCol`
    * (an integral column) turns on per-file min/max stats in every
    * subsequent commit — the data-skipping input of `snapshotWhere`.
    */
  def create(root: String, df: DataFrame,
             statsCol: Option[String] = None,
             txnId: Option[Long] = None): VersionedTable = {
    val r = Paths.get(root)
    Files.createDirectories(r.resolve(LogDirName))
    val t = new VersionedTable(r)
    require(t.latestVersion == -1L, s"table already exists at $root")
    val add = t.writeData(df, statsCol)
    t.commit("create", -1L, Seq(add), Nil, statsColMeta = statsCol,
      schemaJson = Some(df.schema.json), txnId = txnId)
    t
  }

  /** Open an existing table. */
  def open(root: String): VersionedTable = {
    val r = Paths.get(root)
    require(Files.isDirectory(r.resolve(LogDirName)), s"no table log at $root")
    new VersionedTable(r)
  }
}
