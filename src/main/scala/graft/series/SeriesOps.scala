package graft.series

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's core read-pipeline operators over the canonical series shape
  * `(key: String, ts: Long /*epoch nanos*/, txid: Long, …value cols)`.
  *
  * Each operator is a pure `DataFrame => DataFrame` composition of built-in
  * (codegen'd, pushdown-friendly) Spark primitives — the Spark-native
  * re-expression of the reference pipeline (sonnerie
  * `src/database_reader.rs`, `src/merge.rs`, `src/key_reader.rs`):
  *
  *  - [[keyFilter]]     = wildcard/exact/range key predicate with prefix-range
  *                        rewrite (ref `src/wildcard.rs`, `src/database_reader.rs:236-252`)
  *  - [[timeRange]]     = `[t0, t1)` nanos filter (ref `src/main.rs:256-293`)
  *  - [[lastWins]]      = N-way-merge last-writer-wins dedup
  *                        (ref `Merge::discard_repetitions`, `src/merge.rs:93-158`)
  *  - [[applyDeletes]]  = range-delete anti-join (ref
  *                        `DatabaseRecordIterator::next`, `src/database_reader.rs:474-518`)
  *  - [[ordered]]       = global (key, ts) output order (ref `src/database_reader.rs:406-429`)
  *
  * Scale notes (100 TB): every filter here is a sargable conjunction Catalyst
  * pushes into the Parquet scan; `lastWins` is a single hash-aggregate with
  * map-side partial aggregation (no window/sort shuffle); `applyDeletes` is a
  * broadcast nested-loop anti-join — correct because the delete-marker table
  * is tiny by construction (one row per delete *operation*, not per deleted
  * record), so it is always broadcastable.
  */
object SeriesOps {

  /** Key predicate for a wildcard pattern, rewritten for pushdown:
    * exact → `key = lit`; `prefix%` → `[prefix, succ)` range only;
    * general pattern → prefix range AND residual LIKE.
    */
  def keyPredicate(key: Column, pattern: String): Column = {
    val w = Wildcard(pattern)
    if (w.isExact) key === w.pattern
    else {
      // The successor upper bound is only sound for ASCII prefixes (same
      // guard as LikePrefixRangeRule): bumping a non-ASCII last char can
      // produce an unpaired surrogate whose UTF-8 bytes mis-bound the
      // range. The lower bound is always sound (UTF8String compares in
      // UTF-8 byte order); non-ASCII prefixes keep the LIKE residual.
      val ascii = w.prefix.nonEmpty && w.prefix.forall(_ < 0x7f)
      val range: Option[Column] =
        if (w.prefix.isEmpty) None
        else {
          val lower = key >= w.prefix
          Some(
            if (ascii) Wildcard.asciiSuccessor(w.prefix) match {
              case Some(succ) => lower && key < succ
              case None       => lower
            }
            else lower)
        }
      // all-% patterns (empty prefix) match everything: lit(true), not
      // LIKE '%' — the optimizer rewrites the latter to IsNotNull(key),
      // silently dropping null-key rows from full scans
      if (w.isPrefixOnly && (ascii || w.prefix.isEmpty))
        range.getOrElse(lit(true))
      else range.map(_ && key.like(w.likePattern)).getOrElse(key.like(w.likePattern))
    }
  }

  def keyFilter(df: DataFrame, pattern: String, keyCol: String = "key"): DataFrame =
    df.filter(keyPredicate(col(keyCol), pattern))

  /** Lexicographic key range `[from, until)`; either bound optional. */
  def keyRange(df: DataFrame, from: Option[String], until: Option[String],
               keyCol: String = "key"): DataFrame = {
    val k = col(keyCol)
    val preds = from.map(k >= _).toSeq ++ until.map(k < _).toSeq
    preds.reduceOption(_ && _).fold(df)(df.filter)
  }

  /** Time range `[t0, t1)` in epoch nanos (inclusive/exclusive as the
    * reference's `--after-time`/`--before-time`).
    */
  def timeRange(df: DataFrame, t0: Option[Long], t1: Option[Long],
                tsCol: String = "ts"): DataFrame = {
    val t = col(tsCol)
    val preds = t0.map(t >= _).toSeq ++ t1.map(t < _).toSeq
    preds.reduceOption(_ && _).fold(df)(df.filter)
  }

  /** Last-writer-wins across transactions: for each (key, ts) keep the row
    * from the highest txid. One aggregation (`max_by` over a struct) with
    * map-side partial aggregation, so duplicate (key, ts) groups collapse
    * *before* the shuffle — the property that matters at scale, and what a
    * `row_number` window (full shuffle + sort of every row) cannot do.
    * Note: the struct-valued buffer makes Spark plan a SortAggregate rather
    * than HashAggregate; the partial/final split and single exchange remain.
    *
    * `tieBreak` columns break txid ties deterministically (the reference
    * cannot tie: one row per (key, ts) per tx).
    */
  def lastWins(df: DataFrame, keyCols: Seq[String] = Seq("key", "ts"),
               txidCol: String = "txid",
               tieBreak: Seq[String] = Nil): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).map(col)
    val ord = struct((col(txidCol) +: tieBreak.map(col)): _*)
    val winner = max_by(struct(payload: _*), ord).as("_w")
    df.groupBy(keyCols.map(col): _*)
      .agg(winner)
      .select(keyCols.map(col) ++ payload.map(c => col(s"_w.${c.toString}").as(c.toString)): _*)
      .select(df.columns.map(col): _*) // restore original column order
  }

  /** Alternative last-wins formulation: a slim `max(txid)` aggregation
    * (shuffle ships only the key columns + txid, with map-side partials)
    * followed by a left-semi join back on (keyCols, txid). Two exchanges
    * instead of [[lastWins]]'s one — but the max_by exchange carries the
    * FULL payload in a struct buffer and plans as SortAggregate, so on a
    * low-overwrite warehouse (partial agg collapses nothing) the wide
    * sort-agg exchange can cost more than slim-agg + hash-semi-join.
    * A/B'd in StressBench; numbers in SCALE.md. Assumes at most one row
    * per (keyCols, txid), which the transaction writer guarantees.
    */
  def lastWinsSemi(df: DataFrame, keyCols: Seq[String] = Seq("key", "ts"),
                   txidCol: String = "txid"): DataFrame = {
    val winners = df.groupBy(keyCols.map(col): _*)
      .agg(max(col(txidCol)).as(txidCol))
    df.join(winners, keyCols :+ txidCol, "left_semi")
  }

  /** Delete-marker anti-join. `deletes` schema:
    * `(firstKey, lastKey /* "" = unbounded, exclusive */, t0 /* incl */,
    *   t1 /* excl */, wildcard, txid)`.
    * A record is suppressed iff some marker with a *later* txid covers it
    * (ref semantics incl. the txid condition — a re-insert after a delete
    * survives, `src/database_reader.rs:483-518`).
    * The marker table is rows-per-operation small → broadcast theta join.
    */
  def applyDeletes(records: DataFrame, deletes: DataFrame,
                   keyCol: String = "key", tsCol: String = "ts",
                   txidCol: String = "txid"): DataFrame = {
    val r = records.alias("r")
    val d = deletes.alias("d")
    val cond =
      col(s"r.$txidCol") < col(s"d.txid") &&
        col(s"r.$keyCol") >= col("d.firstKey") &&
        (col("d.lastKey") === "" || col(s"r.$keyCol") < col("d.lastKey")) &&
        col(s"r.$tsCol") >= col("d.t0") &&
        col(s"r.$tsCol") < col("d.t1") &&
        expr(s"r.$keyCol LIKE d.wildcard")
    r.join(broadcast(d), cond, "left_anti")
  }

  /** Global output order (key, ts) — the invariant every reference read
    * upholds. Range-partition sort; cheap when upstream is already
    * range-partitioned by key.
    */
  def ordered(df: DataFrame, keyCol: String = "key", tsCol: String = "ts"): DataFrame =
    df.orderBy(col(keyCol), col(tsCol))

  /** Column projection by 1-based positions over the value columns
    * (reference `--columns 1,3,5-7`, `src/main.rs:135-139`).
    */
  def selectColumns(df: DataFrame, fixed: Seq[String], positions: Seq[Int],
                    valueCols: Seq[String]): DataFrame = {
    val picked = positions.flatMap(i => valueCols.lift(i - 1))
    df.select((fixed ++ picked).map(col): _*)
  }

  /** Skew-resistant equi-join: salt the (skewed) left side into `factor`
    * sub-keys and replicate the right side across every salt, so one hot
    * key spreads over `factor` tasks instead of melting one executor. The
    * salt is deterministic (hash of all left columns, not rand()) so plans
    * stay reproducible. AQE's skew-join handles moderate skew; this is for
    * the pathological hot-key case (one key = 10% of 100 TB).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val exploded = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Per-key grouped iteration (reference `feature=by-key`, `src/bykey.rs`):
    * surfaces as groupBy(key) aggregation; callers needing ordered per-key
    * iteration use a Window.partitionBy(key).orderBy(ts).
    */
  def byKeyStats(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        min_by(col(valueCol), struct(col("ts"))).as("first_value"),
        max_by(col(valueCol), struct(col("ts"))).as("last_value")
      )

  /** Per-key previous-value delta — idiomatic window over the series. */
  def withLagDelta(df: DataFrame, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"))
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("delta", col(valueCol) - col("prev_value"))
  }
}
