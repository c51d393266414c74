package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.series.SeriesOps

/** A graft warehouse: the Spark-native re-expression of a sonnerie database
  * directory (`file_format.md:92-99`).
  *
  * Layout:
  * {{{
  * warehouse/
  *   data/txid=[n]/part-....parquet     // range-partitioned by key, sorted (key, ts)
  *   deletes/txid=[n]/part-....parquet  // (firstKey, lastKey, t0, t1, wildcard)
  *   _manifest/v<seq>.json       // committed txids (atomic snapshot root)
  * }}}
  *
  * Required data columns: `key: String`, `ts: Long` (epoch nanos). All other
  * columns are free-form payload; schemas may differ between transactions
  * (the reference's per-key format strings, SURVEY §1.2) and are merged on
  * read (`mergeSchema`).
  *
  * Scale: each transaction directory is written range-partitioned on `key`
  * and sorted `(key, ts)` within files, so Parquet row-group min/max stats
  * make key-range and wildcard-prefix reads prune to the few row groups that
  * can match — the distributed equivalent of sonnerie's segment binary search
  * (`src/segment_reader.rs:173-234`), with no driver-side index needed.
  */
final class Db(val spark: SparkSession, val warehouse: String) {

  def dataDir = s"$warehouse/data"
  def deleteDir = s"$warehouse/deletes"

  /** Immutable view of the warehouse as of one manifest version. */
  final case class Snapshot(manifest: ManifestState) {
    def isEmpty: Boolean = manifest.dataTxids.isEmpty

    /** Union of all committed data transactions, with `txid` column. */
    def records: DataFrame = {
      require(!isEmpty, "empty warehouse")
      readData(manifest.dataTxids)
    }

    /** Manifest-tracked schema makes planning O(1): no footer fetch per
      * file (`mergeSchema` reads every footer — O(files) at warehouse
      * scale). Partition columns (txid, tbucket) are appended by partition
      * discovery. Falls back to mergeSchema when the manifest predates
      * schema tracking or recorded a type conflict.
      */
    private def readData(txids: Seq[Long]): DataFrame = {
      val dirs = txids.map(t => s"$dataDir/txid=$t")
      val base = spark.read.option("basePath", dataDir)
      if (manifest.schemaDdl.nonEmpty)
        base.schema(org.apache.spark.sql.types.StructType
          .fromDDL(manifest.schemaDdl)).parquet(dirs: _*)
      else base.option("mergeSchema", "true").parquet(dirs: _*)
    }

    def deletes: DataFrame =
      Db.deletesFrame(spark, warehouse, deleteDir, manifest.created,
        manifest.deleteTxids)

    /** Data txids whose manifest stats can overlap the request — the
      * reference's segment binary search at transaction granularity
      * (`src/segment_reader.rs:173-234`): a point/prefix/time read skips
      * whole transactions before any file listing. Overlap checks run in
      * UTF-8 byte order (Spark's own string comparison); txids without
      * stats are conservatively kept.
      */
    def prunedDataTxids(pattern: String, after: Option[Long],
                        before: Option[Long]): Vector[Long] = {
      import java.nio.charset.StandardCharsets.UTF_8
      def bytes(s: String) = s.getBytes(UTF_8)
      def cmp(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val d = (a(i) & 0xff) - (b(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        a.length - b.length
      }
      val w = graft.series.Wildcard(pattern)
      // key bounds implied by the pattern: [lo, hi) in byte order
      val lo: Option[Array[Byte]] =
        if (w.prefix.isEmpty) None else Some(bytes(w.prefix))
      val hi: Option[Array[Byte]] =
        if (w.isExact) Some(bytes(w.pattern) :+ 0.toByte) // [k, k+0x00)
        else if (w.prefix.isEmpty) None
        else {
          val b = bytes(w.prefix)
          var i = b.length - 1
          while (i >= 0 && b(i) == -1) i -= 1
          if (i < 0) None
          else { val out = java.util.Arrays.copyOf(b, i + 1)
                 out(i) = (out(i) + 1).toByte; Some(out) }
        }
      manifest.dataTxids.filter { t =>
        manifest.txStats.get(t).forall { st =>
          val keyOk =
            lo.forall(l => cmp(bytes(st.maxKey), l) >= 0) &&
              hi.forall(h => cmp(bytes(st.minKey), h) < 0)
          val timeOk =
            after.forall(a => st.maxTs >= a) &&
              before.forall(b => st.minTs < b)
          keyOk && timeOk
        }
      }
    }

    /** The full sonnerie read pipeline: key wildcard (prefix-range
      * rewritten), `[t0, t1)` time filter, last-writer-wins across txids,
      * delete-marker anti-join, (key, ts) ordered output — all lazily
      * composed so Catalyst pushes the filters into every per-tx scan.
      * Transactions whose manifest stats cannot overlap are skipped
      * entirely ([[prunedDataTxids]]).
      */
    def read(
        pattern: String = "%",
        after: Option[Long] = None,
        before: Option[Long] = None
    ): DataFrame = {
      val txids = prunedDataTxids(pattern, after, before)
      if (txids.isEmpty) emptyResult()
      else pipeline(
        SeriesOps.keyFilter(readData(txids), pattern), after, before)
    }

    /** ONE read-pipeline pass over the UNION of several key patterns —
      * for consumers that maintain disjoint key families in one
      * warehouse (the sketch stores) and would otherwise scan the store
      * once per family. Row-identical to unioning the per-pattern
      * [[read]]s: the key predicate is the OR of the per-pattern
      * predicates, txid pruning keeps any transaction that can overlap
      * ANY pattern, and last-wins/deletes act per key so disjoint
      * families cannot interfere. UNORDERED by design — every caller
      * aggregates (or re-sorts in the transaction writer); a global
      * (key, ts) sort here would add a range exchange + sampling job
      * that aggregation consumers pay for nothing.
      */
    def readMany(patterns: Seq[String], after: Option[Long] = None,
                 before: Option[Long] = None): DataFrame = {
      require(patterns.nonEmpty, "readMany needs at least one pattern")
      val txids = patterns.flatMap(p => prunedDataTxids(p, after, before))
        .distinct.sorted
      if (txids.isEmpty) emptyResult()
      else {
        val pred = patterns
          .map(p => SeriesOps.keyPredicate(col("key"), p)).reduce(_ || _)
        pipeline(readData(txids).filter(pred), after, before,
          ordered = false)
      }
    }

    /** Read exactly the given `ts` instants (one [[read]] pipeline pass
      * with `ts IN (instants)`). On a time-bucketed warehouse the matching
      * `tbucket IN (…)` predicate is derived alongside AND the scan is
      * rooted at exactly the matching `tbucket=` directories — constructed
      * from the manifest's txids and a cached one-readdir-per-txid bucket
      * listing ([[Db.txBuckets]]) — so the probe never touches (or even
      * LISTS) a non-matching bucket directory, while the plan stays O(1)
      * in the instant count: probing 64 of 4096 index cells is one scan
      * over 64 directories with a 64-value IN-set, not a 64-way union and
      * not a 4096-directory recursive discovery. (Partition pruning alone
      * skips non-matching files at execution, but Spark's eager file
      * index lists every partition directory at plan time — at 4096 cells
      * that listing dominated the probe, measured 8 s steady on a 50k
      * corpus where the data itself scans in milliseconds.) Transactions
      * whose stats overlap no instant are skipped entirely, as in
      * [[read]].
      */
    def readInstants(instants: Seq[Long], pattern: String = "%",
                     ordered: Boolean = true): DataFrame = {
      require(instants.nonEmpty, "readInstants needs at least one instant")
      val lo = instants.min
      val hi = instants.max + 1
      val txids = prunedDataTxids(pattern, Some(lo), Some(hi))
      if (txids.isEmpty) return emptyResult()
      val w = manifest.timeBucket
      // same bucket formula the writer uses (ts - ts % w, Spark's
      // dividend-sign remainder — consistent for negative reserved ts);
      // only meaningful on a time-bucketed warehouse (w > 0)
      lazy val neededBuckets = instants.map(t => t - t % w).distinct
      val base =
        if (w > 0) {
          val dirs = for {
            t <- txids
            bs = Db.txBuckets(spark, warehouse, dataDir, t,
              manifest.version)
            b <- neededBuckets if bs.contains(b)
          } yield s"$dataDir/txid=$t/tbucket=$b"
          if (dirs.isEmpty) return emptyResult()
          val rd = spark.read.option("basePath", dataDir)
          val df =
            if (manifest.schemaDdl.nonEmpty)
              rd.schema(StructType.fromDDL(manifest.schemaDdl))
                .parquet(dirs: _*)
            else rd.option("mergeSchema", "true").parquet(dirs: _*)
          SeriesOps.keyFilter(df, pattern)
        } else SeriesOps.keyFilter(readData(txids), pattern)
      val bucketed =
        if (w > 0 && base.columns.contains("tbucket"))
          // belt-and-braces partition predicate on top of the direct
          // roots: keeps the scan's PartitionFilters explicit (asserted
          // by PersistedIndexSpec) and correct even if a future caller
          // bypasses the direct-path construction
          base.filter(col("tbucket").isin(neededBuckets: _*))
        else base
      val filtered = bucketed.filter(col("ts").isin(instants: _*))
      val merged = SeriesOps.lastWins(filtered, Seq("key", "ts"), "txid")
      val visible = SeriesOps.applyDeletes(merged, deletes)
        .drop("txid").drop("tbucket")
      // ordered=false skips the global (key, ts) range-shuffle-sort —
      // for consumers that re-shuffle anyway (the ANN probe's rank
      // window), the sort is a wasted exchange over every matched row
      if (ordered) SeriesOps.ordered(visible) else visible
    }

    /** Zero-row result with the read pipeline's output shape. Must not go
      * through [[records]]: the documented bootstrap pattern
      * (`cursor = maxTxid; tail(cursor)` before any commit) reads an empty
      * warehouse, which should yield zero rows, not throw.
      */
    private def emptyResult(): DataFrame = {
      val schema: StructType =
        if (manifest.schemaDdl.nonEmpty)
          StructType.fromDDL(manifest.schemaDdl) // excludes partition cols
        else if (!isEmpty)
          records.drop("txid").drop("tbucket").schema
        else // nothing ever committed: the canonical series shape
          StructType(Seq(
            StructField("key", StringType, nullable = false),
            StructField("ts", LongType, nullable = false)))
      SeriesOps.ordered(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }

    /** Exact-key point lookup (reference `DatabaseReader::get`,
      * `src/database_reader.rs:168-175`). An exact string compare — NOT the
      * wildcard path: sonnerie wildcards have no escape syntax, so a key
      * containing a literal `%` is only reachable this way.
      */
    def get(key: String, after: Option[Long] = None, before: Option[Long] = None): DataFrame = {
      // exact-match txid pruning by stats bounds (key may contain a
      // literal '%', so no Wildcard parse here — direct range check)
      import java.nio.charset.StandardCharsets.UTF_8
      val kb = key.getBytes(UTF_8)
      def cmp(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val d = (a(i) & 0xff) - (b(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        a.length - b.length
      }
      val txids = manifest.dataTxids.filter { t =>
        manifest.txStats.get(t).forall { st =>
          cmp(st.maxKey.getBytes(UTF_8), kb) >= 0 &&
            cmp(st.minKey.getBytes(UTF_8), kb) <= 0 &&
            after.forall(a => st.maxTs >= a) &&
            before.forall(b => st.minTs < b)
        }
      }
      if (txids.isEmpty) emptyResult()
      else pipeline(readData(txids).filter(col("key") === key), after, before,
        // ONE key's records: a global range sort would pay a sampling
        // job + shuffle as pure fixed cost per lookup — a coalesced
        // single-partition sort yields the identical order without
        // either (spill-safe for outsized series; the parallel path for
        // wide results remains read(pattern))
        pointLookup = true)
    }

    /** One committed transaction's records, (key, ts) ordered — the
      * single-tx dump surface (reference `examples/get.rs:5-46`).
      */
    def transaction(txid: Long): DataFrame = {
      require(manifest.dataTxids.contains(txid), s"unknown txid $txid")
      SeriesOps.ordered(readData(Seq(txid)).drop("txid").drop("tbucket"))
    }

    /** Highest committed txid (data or delete) — the resume cursor for
      * [[tail]]. -1 on an empty warehouse.
      */
    def maxTxid: Long =
      (manifest.dataTxids ++ manifest.deleteTxids).foldLeft(-1L)(math.max)

    /** Change feed: everything committed AFTER `sinceTxid` — the
      * incremental-consumption primitive (sonnerie-serve's live GET /
      * reader-cache invalidation loop, `src/bin/sonnerie-serve.rs:242-264`,
      * re-expressed as a cursor over commit order). Returns the new data
      * txids' records with last-wins applied among themselves and any new
      * delete markers applied (a delete only suppresses lower txids, as
      * always), (key, ts) ordered. Poll pattern:
      * {{{
      * var cursor = db.snapshot().maxTxid
      * while (true) { val s = db.snapshot()
      *   process(s.tail(cursor)); cursor = s.maxTxid; sleep(…) }
      * }}}
      * Each batch scans only the new transaction directories — cost is the
      * new data, never the warehouse.
      */
    def tail(sinceTxid: Long, pattern: String = "%",
             after: Option[Long] = None,
             before: Option[Long] = None): DataFrame = {
      val newData = manifest.dataTxids.filter(_ > sinceTxid)
      if (newData.isEmpty) return emptyResult()
      val recs = readData(newData)
      val newDeletes = Db.deletesFrame(spark, warehouse, deleteDir,
        manifest.created, manifest.deleteTxids.filter(_ > sinceTxid))
      val filtered = SeriesOps.timeRange(
        SeriesOps.keyFilter(recs, pattern), after, before)
      val merged = SeriesOps.lastWins(filtered, Seq("key", "ts"), "txid")
      val visible = SeriesOps.applyDeletes(merged, newDeletes)
      SeriesOps.ordered(visible.drop("txid").drop("tbucket"))
    }

    private def pipeline(filtered0: DataFrame, after: Option[Long],
                         before: Option[Long],
                         pointLookup: Boolean = false,
                         ordered: Boolean = true): DataFrame = {
      // time-bucketed warehouse: derive the partition-column predicate so
      // time ranges prune whole tbucket= directories before any IO
      val w = manifest.timeBucket
      val bucketed =
        if (w > 0 && filtered0.columns.contains("tbucket")) {
          val preds =
            after.map(a => col("tbucket") >= a - a % w).toSeq ++
              before.map(b => col("tbucket") < b).toSeq
          preds.reduceOption(_ && _).fold(filtered0)(filtered0.filter)
        } else filtered0
      val filtered = SeriesOps.timeRange(bucketed, after, before)
      val merged = SeriesOps.lastWins(filtered, Seq("key", "ts"), "txid")
      val visible = SeriesOps.applyDeletes(merged, deletes)
        .drop("txid").drop("tbucket")
      if (pointLookup)
        visible.coalesce(1).sortWithinPartitions(col("key"), col("ts"))
      else if (ordered) SeriesOps.ordered(visible)
      else visible
    }
  }

  def snapshot(): Snapshot = Snapshot(Manifest.current(warehouse))

  /** Time travel: the warehouse exactly as of a manifest version
    * (see [[Manifest.versions]]). Old versions stay readable until
    * [[Compactor.vacuum]] prunes unreferenced transaction dirs.
    */
  def snapshotAt(version: Long): Snapshot =
    Snapshot(Manifest.at(warehouse, version))

  def read(pattern: String = "%", after: Option[Long] = None,
           before: Option[Long] = None): DataFrame =
    snapshot().read(pattern, after, before)

  def get(key: String, after: Option[Long] = None,
          before: Option[Long] = None): DataFrame =
    snapshot().get(key, after, before)

  def tail(sinceTxid: Long, pattern: String = "%"): DataFrame =
    snapshot().tail(sinceTxid, pattern)
}

object Db {
  def apply(spark: SparkSession, warehouse: String): Db = new Db(spark, warehouse)

  /** Per-transaction `tbucket=` directory sets, ONE readdir each, cached
    * for the driver's life: a published transaction directory is
    * immutable (writes claim fresh txids; compaction publishes new txids
    * and only [[Compactor.vacuum]] removes dead dirs, which no live
    * manifest references), so within one warehouse lifetime the listing
    * cannot go stale. The one way it CAN: the warehouse is deleted and
    * recreated at the same path — detected by the manifest-version
    * watermark below (versions restart on recreation), which purges the
    * warehouse's entries. This is what makes
    * [[Db.Snapshot.readInstants]] O(probed cells) instead of
    * O(all cells): the per-cell directory layout is discovered once per
    * (warehouse, txid), not re-walked on every probe. Bounded: entries
    * are one Long set per txid; cleared wholesale past a generous cap
    * (re-listing is one readdir).
    */
  private val bucketCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), java.util.Set[java.lang.Long]]()

  /** Highest manifest version observed per warehouse. A version BELOW
    * the watermark is only a trigger to look closer: it is either a
    * harmless time-travel read (`snapshotAt` of an old version — the
    * same warehouse, every cached listing still valid) or a warehouse
    * deleted and recreated at the same path (txids AND manifest versions
    * restart — every cached listing poisoned). The two are told apart by
    * [[Manifest.identity]] — the manifest-minted warehouse UUID, with
    * the oldest-file identity heuristic as the pre-field fallback; only
    * a recreation changes either — so historical
    * snapshots no longer thrash the cache for every concurrent reader,
    * and the recreation purge stays correct. The id check costs one
    * readdir + stat and runs ONLY on regression (steady-state probes
    * never pay it). Residual blind spot unchanged from the watermark
    * design: a recreation that fast-forwards past the old version
    * before any read is only caught once a regression exposes it.
    */
  private val versionWatermark =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** [[Manifest.identity]] as of the first cached listing — the
    * baseline the regression check compares against.
    */
  private val creationIds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[store] def txBuckets(spark: SparkSession, warehouse: String,
                               dataDir: String, txid: Long,
                               manifestVersion: Long)
      : java.util.Set[java.lang.Long] = {
    if (bucketCache.size > 16384) { bucketCache.clear(); creationIds.clear() }
    // tx dirs are immutable once published, so (warehouse, txid) is a
    // valid key for the driver's life — EXCEPT when a warehouse is
    // deleted and recreated at the same path; see versionWatermark
    val seen = versionWatermark.get(warehouse)
    if (seen != null && manifestVersion < seen) {
      val cur = Manifest.identity(warehouse)
      val known = creationIds.get(warehouse)
      if (known == null || known.isEmpty || cur.isEmpty || cur != known) {
        // recreated (or identity unknowable): purge and rebase
        bucketCache.keySet.removeIf(_._1 == warehouse)
        creationIds.put(warehouse, cur)
        versionWatermark.put(warehouse, manifestVersion)
      }
      // else: time travel within the same warehouse — caches stay
    }
    versionWatermark.merge(warehouse, manifestVersion,
      (a, b) => if (a >= b) a else b)
    creationIds.computeIfAbsent(warehouse, Manifest.identity)
    bucketCache.computeIfAbsent((warehouse, txid), _ => {
      val path = new org.apache.hadoop.fs.Path(s"$dataDir/txid=$txid")
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      val out = new java.util.HashSet[java.lang.Long]()
      fs.listStatus(path).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("tbucket="))
          out.add(java.lang.Long.valueOf(n.stripPrefix("tbucket=").toLong))
      }
      out
    })
  }

  val deleteSchema: StructType = StructType(Seq(
    StructField("firstKey", StringType, nullable = false),
    StructField("lastKey", StringType, nullable = false), // "" = unbounded
    StructField("t0", LongType, nullable = false),        // inclusive
    StructField("t1", LongType, nullable = false),        // exclusive
    StructField("wildcard", StringType, nullable = false)
  ))

  private val deleteSchemaWithTxid: StructType =
    deleteSchema.add(StructField("txid", LongType, nullable = false))

  /** Delete markers as a driver-LOCAL relation, collected once per
    * (warehouse identity, txid set) and cached. Rationale (guide §2.4,
    * §5): the read pipeline BROADCASTS the marker table into every scan
    * ([[graft.series.SeriesOps.applyDeletes]]) — with a parquet child
    * that broadcast build is one extra Spark job (scan + collect) on
    * EVERY execution of every read of a store that has ever folded or
    * deleted, for a table that is one row per delete *operation* and
    * already ends up on the driver per execution. A LocalRelation child
    * makes the broadcast build job-free and reads the marker files once
    * per txid set instead of once per executed plan. Sound for the same
    * reason [[txBuckets]] is: published delete directories are
    * immutable, and the key carries the manifest-minted warehouse
    * identity so a deleted-and-recreated warehouse cannot alias a stale
    * entry (identity-less legacy manifests skip the cache). Bounded: a
    * txid-set key holds one Row per marker; oversized marker sets (ops
    * count, not data) fall back to the parquet scan and are never
    * cached.
    */
  private val deletesCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Seq[Long]), Array[org.apache.spark.sql.Row]]()

  /** Marker sets handed out once already — the second request of the
    * same set is the collect-and-cache trigger, so a set read exactly
    * once (the common one-shot query) never pays a collect job it will
    * not amortize: first use is lazy (one broadcast-build job at
    * execution, exactly the pre-cache cost), the second use's collect
    * REPLACES that set's broadcast job, and every later use is job-free.
    */
  private val deletesSeen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[
      (String, String, Seq[Long])]()

  /** Marker-row count past which a delete set stays on the parquet path
    * (a store with this many UNCOMPACTED delete operations needs vacuum,
    * not a bigger driver).
    */
  private val DeletesCacheMaxRows = 65536

  private[store] def deletesFrame(spark: SparkSession, warehouse: String,
                                  deleteDir: String, created: String,
                                  txids: Seq[Long]): DataFrame = {
    if (txids.isEmpty) return emptyDeletes(spark)
    // explicit schema: markers have ONE fixed shape (writeDeleteMarker),
    // so the reader must not pay a footer schema-inference job per
    // constructed plan
    def parquetFrame: DataFrame =
      spark.read.schema(deleteSchema).option("basePath", deleteDir)
        .parquet(txids.map(t => s"$deleteDir/txid=$t"): _*)
        // partition-column discovery may type txid as INT; the local
        // path pins LongType, so both paths expose one schema
        .select(deleteSchemaWithTxid.fieldNames.map(f =>
          col(f).cast(deleteSchemaWithTxid(f).dataType)): _*)
    if (created.isEmpty) return parquetFrame // identity-less: no caching
    if (deletesCache.size > 16384) { deletesCache.clear(); deletesSeen.clear() }
    val key = (warehouse, created, txids)
    val hit = deletesCache.get(key)
    val rows =
      if (hit != null) hit
      else if (deletesSeen.add(key)) null // first use: stay lazy
      else {
        val collected = parquetFrame.collect()
        if (collected.length > DeletesCacheMaxRows) null
        else { deletesCache.put(key, collected); collected }
      }
    if (rows == null) parquetFrame
    else spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), deleteSchemaWithTxid)
  }

  def emptyDeletes(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      deleteSchema.add(StructField("txid", LongType, nullable = false))
    )
}
