package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Named queries over [[VersionedTable]] — the transactional-table
  * surface as oracle-checked inventory rows.
  *
  * The demo table is built ONCE per (jvm, sf dir) with a deterministic
  * three-version history derived from `customer` (the same change
  * classes as q62, ops/Relational.scala — update %10, delete %7∧¬%10,
  * insert %13 — so the oracle can rebuild every version by pure SQL):
  *
  *   v0 CREATE    = customer (c_custkey, c_name, c_acctbal)
  *   v1 APPEND    = v0 ∪ the insert class (blind append — conflict-free)
  *   v2 MERGE     = update + delete classes applied through
  *                  VersionedTable.merge (q62's full-outer merge core,
  *                  committed as one rewriting transaction)
  *
  * q104 time-travels to the PINNED version 1 — the read must see exactly
  * the append snapshot regardless of the later merge commit. q105 reads
  * the latest version — MERGE-through-the-log, oracle-checked against
  * the same change algebra in SQL. TableSpec covers what SQL cannot:
  * snapshot isolation across commits, atomicity, and the concurrent-
  * writer conflict.
  */
object TableOps {

  private val tableOnce = scala.collection.concurrent.TrieMap[String, String]()
  private val buildLock = new Object

  /** The q62 change classes on `base`, minus the insert class (those rows
    * enter at v1 via append): updates patch c_acctbal, deletes drop rows.
    */
  private def mergeChanges(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    base.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey", lit("U").as("op"),
        lit(null).cast(StringType).as("new_name"),
        ($"c_acctbal" + 100.0).as("new_bal"))
      .unionAll(base.filter($"c_custkey" % 7 === 3 && $"c_custkey" % 10 =!= 0)
        .select($"c_custkey", lit("D").as("op"),
          lit(null).cast(StringType).as("new_name"),
          lit(null).cast(DoubleType).as("new_bal")))
  }

  /** The q62 insert class as plain rows (append payload). The new name
    * carries the ORIGINAL key, mirroring q62 and its oracle.
    */
  private def insertRows(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    base.filter($"c_custkey" % 13 === 0)
      .select(($"c_custkey" + 1000000000L).as("c_custkey"),
        concat(lit("Customer#new"), $"c_custkey".cast(StringType)).as("c_name"),
        lit(1000.0).as("c_acctbal"))
  }

  /** One-time three-version table build, idempotent per sf dir (and
    * locked: VersionedTable.create is errorifexists-strict, so the
    * bench's concurrent warmup must not race two builders).
    */
  private[graft] def ensureDemoTable(s: SparkSession, dir: String): String =
    buildLock.synchronized {
      tableOnce.getOrElseUpdate(dir, {
        import s.implicits._
        val base = Tables.customer(s, dir)
          .select($"c_custkey", $"c_name", $"c_acctbal")
        val root = graft.ops.Core.tmp("graft_vtable")
        val t = VersionedTable.create(root, base) // v0
        t.append(insertRows(base))                // v1
        t.merge(s, mergeChanges(base), readVersion = 1L) // v2
        root
      })
    }

  private val evoOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time schema-evolution demo table: v0 carries (c_custkey,
    * c_acctbal); v1 appends a batch that INTRODUCES c_segment. The
    * logged schema widens additively, so the latest read surfaces the
    * new column with NULL for pre-evolution files.
    */
  private[graft] def ensureEvoTable(s: SparkSession, dir: String): String =
    buildLock.synchronized {
      evoOnce.getOrElseUpdate(dir, {
        import s.implicits._
        val cust = Tables.customer(s, dir)
        val root = graft.ops.Core.tmp("graft_vtable_evo")
        val t = VersionedTable.create(root,
          cust.select($"c_custkey", $"c_acctbal"))
        t.append(cust.filter($"c_custkey" % 3 === 0)
          .select(($"c_custkey" + 2000000000L).as("c_custkey"), $"c_acctbal",
            $"c_mktsegment".as("c_segment")))
        root
      })
    }

  // q108: SCHEMA EVOLUTION read — the snapshot is driven by the LOGGED
  // schema of the target version, not any one file's footer: rows
  // written before c_segment existed surface it as NULL (the parquet
  // reader fills missing columns), rows after carry their values. The
  // oracle rebuilds exactly that frame with a NULL literal — proving
  // additive evolution changes no existing byte and invents no rows.
  private def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = ensureEvoTable(s, dir)
    VersionedTable.open(root).snapshot(s).orderBy("c_custkey")
  }

  // q104: TIME TRAVEL — read the table VERSION AS OF 1 (the pinned
  // pre-merge snapshot). The later merge commit removed v1's files from
  // the ACTIVE set, but immutable data + log replay reconstruct exactly
  // the append state; the oracle rebuilds it as customer ∪ insert class.
  // No arithmetic touches c_acctbal on this path, so doubles cross the
  // compare bit-exact (write → parquet → read is identity).
  private def timeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = ensureDemoTable(s, dir)
    VersionedTable.open(root).snapshot(s, versionAsOf = Some(1L))
      .orderBy("c_custkey")
  }

  // q105: MERGE INTO through the transaction log — the latest snapshot
  // after the v2 merge commit. Update bals are base + 100.0 computed in
  // double on BOTH engines (one exact-operand add, no rounding needed).
  private def tableMerge(s: SparkSession, dir: String): DataFrame = {
    val root = ensureDemoTable(s, dir)
    VersionedTable.open(root).snapshot(s)
      .orderBy("c_custkey")
  }

  // q109: CHANGE DATA FEED — the row-level diff a consumer applies to
  // move from v0 to v2 of the demo table: the append batch surfaces as
  // inserts, the merge's update class as updates (value diff on the
  // struct compare — bal moved by +100), its delete class as deletes.
  // Unchanged keys never appear, so feed volume tracks churn. The
  // oracle rebuilds the three change classes by pure SQL.
  private def changeFeed(s: SparkSession, dir: String): DataFrame = {
    val root = ensureDemoTable(s, dir)
    VersionedTable.open(root)
      .changes(s, "c_custkey", fromVersion = 0L, toVersion = 2L)
      .orderBy("c_custkey", "_change_type")
  }

  // q141: INCREMENTAL AGGREGATE MAINTENANCE off the change feed — the
  // materialized-view refresh a 100 TB pipeline runs instead of
  // recomputing: a per-bucket (count, sum) materialization built at v0
  // is rolled forward to v2 by SIGNED DELTAS from the CDF images
  // (insert → +after, delete → −before, update → after − before), then
  // must equal the direct aggregate of the final state — which is
  // exactly what the oracle computes by the change algebra in SQL. The
  // state is exact integer CENTS — floor(bal * 100) per row BEFORE any
  // aggregation, the q160/q176 scaled-int contract — so the delta
  // algebra is associative int64 arithmetic and the incremental result
  // is bit-equal to the recompute. (Rounds 8–9 hashed a DECIMAL built
  // from double casts here and it was the suite's only unstable row;
  // no decimal encoding or rounding-mode choice may reach the hash.)
  // Groups whose count reaches zero are retracted, the MV
  // invariant a maintenance path must keep that a recompute gets for
  // free. Scale shape: update cost is one shuffle over |feed| + |groups|
  // — churn-sized, never table-sized; the demo feed derives from a
  // snapshot diff (see changesWithImages), a writer that logs row-level
  // changes serves the same contract without it.
  private def deltaAggMaintenance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = ensureDemoTable(s, dir)
    val t = VersionedTable.open(root)
    // floor(x * 100) is the same IEEE-double op on both engines and the
    // cast to int64 after floor is exact — applied PER ROW, before any
    // sum, so only associative integer addition ever crosses partitions
    val cents = (c: Column) => floor(c * 100).cast(LongType)
    val a0 = t.snapshot(s, Some(0L))
      .groupBy(($"c_custkey" % 50).as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(cents($"c_acctbal")).as("bal"))
    val deltas = t.changesWithImages(s, "c_custkey", fromVersion = 0L, toVersion = 2L)
      .select(($"c_custkey" % 50).as("bucket"),
        when($"_change_type" === "insert", 1L)
          .when($"_change_type" === "delete", -1L)
          .otherwise(0L).as("cnt"),
        (coalesce(cents($"_after.c_acctbal"), lit(0L))
          - coalesce(cents($"_before.c_acctbal"), lit(0L))).as("bal"))
    a0.unionByName(deltas)
      .groupBy($"bucket")
      .agg(sum($"cnt").as("n_rows"), sum($"bal").as("bal"))
      .filter($"n_rows" > 0)
      .select($"bucket".cast(LongType).as("bucket"),
        $"n_rows".cast(LongType).as("n_rows"),
        $"bal".cast(LongType).as("sum_bal_cents"))
      .orderBy("bucket")
  }

  // q190: INCREMENTAL JOIN-AGGREGATE MAINTENANCE — the join-delta rule
  // beside q141's pure-aggregate deltas: the MV is per-bucket order
  // count + order cents over (live customers ⋈ orders), and the CDF
  // rolls it forward as dMV = (signed customer deltas) ⋈ orders — the
  // one-sided join algebra (dA ⋈ B) every fact-stream × dimension MV
  // uses. Two properties the recompute gets free and the maintenance
  // path must prove: (1) non-key UPDATES contribute ZERO join delta (the
  // +100 bal wave never touches orders, so those keys are filtered
  // before the probe — churn that costs nothing), and (2) inserts with
  // no matching orders contribute nothing (inner-join delta). Update
  // cost: |changed keys| equi-probe into orders — churn-sized, never
  // (customers ⋈ orders)-sized. Exact int64 cents per the q141/q160
  // contract; sums are associative integer adds.
  private def deltaJoinMaintenance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = ensureDemoTable(s, dir)
    val t = VersionedTable.open(root)
    val cents = (c: Column) => floor(c * 100).cast(LongType)
    val ord = Tables.orders(s, dir)
      .select($"o_custkey", cents($"o_totalprice").as("oc"))
    val mv0 = t.snapshot(s, Some(0L)).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey")
      .groupBy(($"c_custkey" % 50).as("bucket"))
      .agg(count(lit(1)).as("n"), sum($"oc").as("cents"))
    val signed = t.changesWithImages(s, "c_custkey", fromVersion = 0L, toVersion = 2L)
      .select($"c_custkey",
        when($"_change_type" === "insert", 1L)
          .when($"_change_type" === "delete", -1L)
          .otherwise(0L).as("sgn"))
      .filter($"sgn" =!= 0L) // updates: join payload unchanged, zero delta
    val deltas = signed.join(ord, $"c_custkey" === $"o_custkey")
      .groupBy(($"c_custkey" % 50).as("bucket"))
      .agg(sum($"sgn").as("n"), sum($"sgn" * $"oc").as("cents"))
    mv0.unionByName(deltas)
      .groupBy($"bucket")
      .agg(sum($"n").as("n_orders"), sum($"cents").as("cents"))
      .filter($"n_orders" > 0)
      .select($"bucket".cast(LongType).as("bucket"),
        $"n_orders".cast(LongType).as("n_orders"),
        $"cents".cast(LongType).as("sum_cents"))
      .orderBy("bucket")
  }

  // q193: Merkle anti-entropy diff — the verification step behind
  // TableReplicator: two replicas are compared by BUCKET DIGESTS
  // (md5 over the bucket's custkey-ordered row digests, rows hashed on
  // exact int64 cents so no float formatting ever reaches a hash), and
  // only buckets whose digests disagree surface — with both side's row
  // counts, separating corruption (same count, different digest) from
  // loss (count drift). The replica here diverges deterministically:
  // keys ≡ 5 (mod 97) carry a +1-cent corruption, keys ≡ 7 (mod 101)
  // are missing. At 100 TB the exchange is |buckets| digests —
  // kilobytes — instead of shipping either table; only flagged buckets
  // re-sync (the replicator's repair unit). Scale shape: one groupBy
  // per replica (row digests partial-aggregate into per-bucket ordered
  // lists bounded by bucket size — pick |buckets| so buckets stay
  // memory-sized), one |buckets|-row full-outer join.
  private def merkleDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = (c: Column) => floor(c * 100).cast(LongType)
    val a = Tables.customer(s, dir)
      .select($"c_custkey", $"c_name", cents($"c_acctbal").as("bc"))
    val b = a.filter(!($"c_custkey" % 101 === 7)) // lost rows
      .select($"c_custkey", $"c_name",
        when($"c_custkey" % 97 === 5, $"bc" + 1L).otherwise($"bc").as("bc"))
    def digests(df: DataFrame): DataFrame = df
      .select(($"c_custkey" % 64).as("bucket"), $"c_custkey",
        md5(concat_ws(":", $"c_custkey", $"c_name", $"bc")).as("rd"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws(",",
          expr("transform(sort_array(collect_list(struct(c_custkey, rd)))," +
            " x -> x.rd)"))).as("dig"))
    digests(a).toDF("bucket", "n_a", "dig_a")
      .join(digests(b).toDF("bucket", "n_b", "dig_b"), Seq("bucket"), "full_outer")
      .filter($"dig_a" =!= $"dig_b" || $"dig_a".isNull || $"dig_b".isNull)
      .select($"bucket",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"))
      .withColumn("same_count", $"n_a" === $"n_b")
      .orderBy($"bucket")
  }

  private val restoreOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time restore demo table: the demo history (v0 create, v1
    * append, v2 merge) plus v3 = RESTORE to v1 — the metadata-only
    * rollback that undoes the merge without rewriting a byte of data.
    */
  private[graft] def ensureRestoreTable(s: SparkSession, dir: String): String =
    buildLock.synchronized {
      restoreOnce.getOrElseUpdate(dir, {
        import s.implicits._
        val base = Tables.customer(s, dir)
          .select($"c_custkey", $"c_name", $"c_acctbal")
        val root = graft.ops.Core.tmp("graft_vtable_restore")
        val t = VersionedTable.create(root, base)       // v0
        t.append(insertRows(base))                      // v1
        t.merge(s, mergeChanges(base), readVersion = 1L) // v2
        t.restore(toVersion = 1L, readVersion = 2L)     // v3
        root
      })
    }

  // q126: RESTORE — the latest snapshot AFTER the rollback commit must
  // equal the v1 content exactly (same oracle as q104's pinned time
  // travel, but read through latestVersion: the restore re-activated
  // v1's file set as v3 without copying data). TableSpec covers what
  // SQL cannot: the rolled-back v2 stays time-travelable, the restore
  // reinstates the target version's logged schema, and a concurrent
  // commit makes the restore conflict propagate.
  private def tableRestore(s: SparkSession, dir: String): DataFrame = {
    val root = ensureRestoreTable(s, dir)
    VersionedTable.open(root).snapshot(s).orderBy("c_custkey")
  }

  // q132: DESCRIBE HISTORY through the custom DataSource V2 connector
  // (graft.sources.TableLogSource, short name "graft-table-log") — one
  // row per committed version of the demo table's deterministic
  // create → append → merge history. The oracle reconstructs every row
  // from the change rules over the clean customer table: add/remove
  // counts are protocol facts (append adds 1 entry; merge rewrites 2),
  // rows_added is the committed batch's logged row count. The same
  // connector streams the log (offsets = versions) — spec-tested, since
  // a streaming read has no SQL twin.
  private def tableHistory(s: SparkSession, dir: String): DataFrame = {
    val root = ensureDemoTable(s, dir)
    s.read.format("graft-table-log").load(root)
      .select("version", "op", "read_version", "n_adds", "n_removes", "rows_added")
      .orderBy("version")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_table_history" -> (tableHistory _),
    "q126_table_restore" -> (tableRestore _),
    "q104_time_travel" -> (timeTravel _),
    "q105_table_merge" -> (tableMerge _),
    "q108_schema_evolution" -> (schemaEvolution _),
    "q109_change_feed" -> (changeFeed _),
    "q141_delta_agg_maintenance" -> (deltaAggMaintenance _),
    "q190_delta_join_maintenance" -> (deltaJoinMaintenance _),
    "q193_merkle_diff" -> (merkleDiff _)
  )

  val oracle: Map[String, String] = Map(
    "q132_table_history" ->
      """SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS version, 'create' AS op,
        |         CAST(-1 AS BIGINT) AS read_version,
        |         CAST(1 AS INTEGER) AS n_adds, CAST(0 AS INTEGER) AS n_removes,
        |         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS rows_added
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'append', CAST(0 AS BIGINT),
        |         CAST(1 AS INTEGER), CAST(0 AS INTEGER),
        |         (SELECT CAST(count(*) AS BIGINT) FROM customer
        |          WHERE c_custkey % 13 = 0)
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'merge', CAST(1 AS BIGINT),
        |         CAST(1 AS INTEGER), CAST(2 AS INTEGER),
        |         (SELECT CAST(count(*) AS BIGINT) FROM customer)
        |         + (SELECT count(*) FROM customer WHERE c_custkey % 13 = 0)
        |         - (SELECT count(*) FROM customer
        |            WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0)
        |) ORDER BY version""".stripMargin,
    // restore(v1) read at latest == the v1 append snapshot
    "q126_table_restore" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey + 1000000000,
        |       'Customer#new' || CAST(c_custkey AS VARCHAR), 1000.0::DOUBLE
        |FROM customer WHERE c_custkey % 13 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q104_time_travel" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey + 1000000000,
        |       'Customer#new' || CAST(c_custkey AS VARCHAR), 1000.0::DOUBLE
        |FROM customer WHERE c_custkey % 13 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q105_table_merge" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |del AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0),
        |survivors AS (
        |  SELECT c.c_custkey, c.c_name,
        |         coalesce(u.new_bal, c.c_acctbal) AS c_acctbal
        |  FROM customer c
        |  LEFT JOIN upd u USING (c_custkey)
        |  LEFT JOIN del d USING (c_custkey)
        |  WHERE d.c_custkey IS NULL)
        |SELECT c_custkey, c_name, c_acctbal FROM survivors
        |UNION ALL
        |SELECT c_custkey + 1000000000,
        |       'Customer#new' || CAST(c_custkey AS VARCHAR), 1000.0::DOUBLE
        |FROM customer WHERE c_custkey % 13 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q108_schema_evolution" ->
      """SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS c_segment
        |FROM customer
        |UNION ALL
        |SELECT c_custkey + 2000000000, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 3 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q109_change_feed" ->
      """SELECT c_custkey + 1000000000 AS c_custkey, 'insert' AS _change_type
        |FROM customer WHERE c_custkey % 13 = 0
        |UNION ALL
        |SELECT c_custkey, 'update' FROM customer WHERE c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey, 'delete' FROM customer
        |WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0
        |ORDER BY c_custkey, _change_type""".stripMargin,
    // the maintained MV must equal the direct aggregate of the final
    // (v2) state, rebuilt here by the q105 change algebra
    "q141_delta_agg_maintenance" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |del AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0),
        |survivors AS (
        |  SELECT c.c_custkey,
        |         coalesce(u.new_bal, c.c_acctbal) AS c_acctbal
        |  FROM customer c
        |  LEFT JOIN upd u USING (c_custkey)
        |  LEFT JOIN del d USING (c_custkey)
        |  WHERE d.c_custkey IS NULL),
        |final AS (
        |  SELECT c_custkey, c_acctbal FROM survivors
        |  UNION ALL
        |  SELECT c_custkey + 1000000000, 1000.0::DOUBLE
        |  FROM customer WHERE c_custkey % 13 = 0)
        |SELECT c_custkey % 50 AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_bal_cents
        |FROM final GROUP BY 1 ORDER BY bucket""".stripMargin,
    // the maintained join-MV must equal (live customers ⋈ orders)
    // aggregated over the final (v2) membership — inserts (+1e9 keys)
    // have no orders and updates never change membership, so only the
    // delete wave moves order mass
    "q190_delta_join_maintenance" ->
      """WITH del AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0),
        |live AS (
        |  SELECT c.c_custkey FROM customer c
        |  LEFT JOIN del d USING (c_custkey)
        |  WHERE d.c_custkey IS NULL
        |  UNION ALL
        |  SELECT c_custkey + 1000000000 FROM customer WHERE c_custkey % 13 = 0)
        |SELECT c_custkey % 50 AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM live JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1 HAVING count(*) > 0 ORDER BY bucket""".stripMargin,
    "q193_merkle_diff" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name,
        |         CAST(floor(c_acctbal * 100) AS BIGINT) AS bc
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 97 = 5 THEN bc + 1 ELSE bc END AS bc
        |  FROM a WHERE c_custkey % 101 != 7),
        |da AS (
        |  SELECT c_custkey % 64 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |         md5(string_agg(md5(c_custkey || ':' || c_name || ':' || bc),
        |                        ',' ORDER BY c_custkey)) AS dig
        |  FROM a GROUP BY 1),
        |db AS (
        |  SELECT c_custkey % 64 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |         md5(string_agg(md5(c_custkey || ':' || c_name || ':' || bc),
        |                        ',' ORDER BY c_custkey)) AS dig
        |  FROM b GROUP BY 1)
        |SELECT coalesce(da.bucket, db.bucket) AS bucket,
        |       coalesce(da.n, 0) AS n_a, coalesce(db.n, 0) AS n_b,
        |       coalesce(da.n, 0) = coalesce(db.n, 0) AS same_count
        |FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
        |WHERE da.dig != db.dig OR da.dig IS NULL OR db.dig IS NULL
        |ORDER BY bucket""".stripMargin
  )
}
