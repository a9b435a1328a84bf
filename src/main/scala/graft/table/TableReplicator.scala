package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental table replication: stream the source's commit log (the
  * `graft-table-log` DSv2 source) and apply each committed version's
  * CONTENT effect to a target table — the cross-region/DR sibling of
  * CdcApply's row-level feed, composed entirely from public pieces the
  * library already ships.
  *
  * Per-version application, cost proportional to what the source itself
  * paid (never a full re-ship of an unchanged table):
  *   - `append` → read exactly that commit's added files, append them
  *     to the target (cost ∝ the batch);
  *   - rewriting content ops (`merge`, `overwrite`, `restore`,
  *     `create`) → overwrite the target with the source snapshot AT
  *     that version (cost ∝ the table — parity with the source's own
  *     rewrite, which also touched every row);
  *   - layout-only ops (`compact`, `optimize`) → SKIPPED: target
  *     content is already identical, and the target is free to run its
  *     own layout maintenance.
  *
  * Exactly-once, twice over: the log stream's offsets are source
  * versions checkpointed by the engine, and every target commit carries
  * `txnId = source version`, so a replayed micro-batch (crash between
  * target commit and checkpoint write) is skipped by the target's
  * `lastTxnId` cursor — the same idempotence contract CdcApply uses.
  */
object TableReplicator {

  /** Content ops the target must re-apply via snapshot overwrite. */
  private val Rewrites = Set("create", "merge", "overwrite", "restore")

  def start(spark: SparkSession, sourceRoot: String, targetRoot: String,
            checkpoint: String): StreamingQuery = {
    spark.readStream.format("graft-table-log").load(sourceRoot)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val versions = batch.select(col("version"), col("op"))
          .collect() // metadata-scale: a handful of (version, op) rows
          .map(r => (r.getLong(0), r.getString(1)))
          .sortBy(_._1)
        if (versions.nonEmpty)
          applyVersions(spark, sourceRoot, targetRoot, versions.toIndexedSeq)
        ()
      }
      .start()
  }

  private def applyVersions(spark: SparkSession, sourceRoot: String,
                            targetRoot: String,
                            versions: Seq[(Long, String)]): Unit = {
    val src = VersionedTable.open(sourceRoot)
    versions.foreach { case (v, op) =>
      val tgt = ensureTarget(spark, src, targetRoot, v)
      // idempotence cursor: a replayed batch (crash before checkpoint)
      // must not re-apply a version the target already committed
      if (!tgt.lastTxnId.exists(_ >= v)) (op match {
        case "append" =>
          val (_, adds, _) = src.commitInfo(v)
          val files = adds.map(a => Paths.get(sourceRoot).resolve(a.path).toString)
          val reader = src.schemaOf(v).fold(spark.read)(s => spark.read.schema(s))
          tgt.append(reader.parquet(files: _*), txnId = Some(v))
        case o if Rewrites(o) =>
          tgt.overwrite(src.snapshot(spark, Some(v)), tgt.latestVersion,
            txnId = Some(v))
        case _ => () // compact/optimize: layout-only, nothing to replicate
      })
    }
  }

  /** Open the target, creating it from the source's version-`v` snapshot
    * on first contact (txn-stamped, so replayed creation is detected).
    * Always yields a live table — creation IS the first contact.
    */
  private def ensureTarget(spark: SparkSession, src: VersionedTable,
                           targetRoot: String, v: Long): VersionedTable =
    if (Files.isDirectory(Paths.get(targetRoot).resolve(VersionedTable.LogDirName)))
      VersionedTable.open(targetRoot)
    else
      // created directly from the source snapshot at v, txn-stamped so a
      // replay of the same micro-batch sees the cursor and skips
      VersionedTable.create(targetRoot, src.snapshot(spark, Some(v)),
        txnId = Some(v))
}
