package graft.series

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-add time-series analytics the reference delegates to client code
  * ("load the data and process it through other means", sonnerie
  * `README.md:23-25`) — expressed as native Spark plans.
  */
object SeriesAnalytics {

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` per key. Implemented with the union + running
    * `last(ignoreNulls)` window — one shuffle on (key), no range
    * cross-product, the scalable formulation of a point-in-time lookup.
    * Right side should be unique per (key, ts) (dedupe upstream).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("_side", lit(1))
      .withColumns(payloadCols.map(c => s"_r_$c" -> lit(null)).toMap)
    val rTagged = right.select(
      (Seq(col(keyCol), col(tsCol)) :+ lit(0).as("_side")) ++
        payloadCols.map(c => col(c).as(s"_r_$c")): _*)
      .withColumns(left.columns.filterNot(Seq(keyCol, tsCol).contains)
        .map(c => c -> lit(null)).toMap)

    val unioned = lTagged.unionByName(rTagged)
    // right rows sort before left rows at equal ts → inclusive match
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapNanos`. One window pass;
    * shuffles once on key.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapNanos: Long, orderTieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: orderTieBreak.map(col)): Seq[Column]
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          col(tsCol) - col("_prev_ts") > gapNanos, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(cum))
      .drop("_prev_ts", "_new_session")
  }

  /** Session-level rollup (count, bounds, duration). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapNanos: Long, orderTieBreak: Seq[String] = Nil): DataFrame =
    sessionize(df, keyCol, tsCol, gapNanos, orderTieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ns")
      )

  /** Tumbling-window resample: per key, fixed `widthNanos` buckets with
    * count/min/max/decimal-exact sum of a value column.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
               widthNanos: Long): DataFrame =
    df.groupBy(col(keyCol),
        (col(tsCol) - (col(tsCol) % widthNanos)).as("bucket_ts"))
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("vsum")
      )

  /** Gap-fill: densify each key's series onto a fixed `widthNanos` grid
    * between its first and last observed bucket, forward-filling missing
    * buckets from the latest earlier observation (`is_observed` marks
    * real vs filled rows). Bucket value = max within the bucket
    * (deterministic). One shuffle to bucket, one to window — the grid is
    * generated per key with `sequence`, so a key's cost is proportional
    * to its own span, never a global cross product.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
              widthNanos: Long): DataFrame = {
    val b = df.groupBy(col(keyCol),
        (col(tsCol) - (col(tsCol) % widthNanos)).as("bucket_ts"))
      .agg(max(col(valueCol)).as("_v"))
      .withColumn("_obs", lit(1L))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket_ts")).as("_lo"), max(col("bucket_ts")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), lit(widthNanos)))
          .as("bucket_ts"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq(keyCol, "bucket_ts"), "left")
      .select(col(keyCol), col("bucket_ts"),
        last(col("_v"), ignoreNulls = true).over(w).as(valueCol),
        coalesce(col("_obs"), lit(0L)).as("is_observed"))
  }

  /** Per-key rolling-window statistics over the last `nRows` observations
    * (count / min / max / decimal-exact sum) — the monitoring-dashboard
    * smoothing query. One window pass, one shuffle on key; the frame is
    * ROW-based so the cost per row is O(1) state however dense the
    * series, and the decimal sum keeps the result bit-identical across
    * engines (a double sum would depend on the window implementation's
    * addition order — DuckDB uses segment trees). `tieCols` break
    * equal-ts ordering so the frame contents are deterministic.
    */
  def rollingStats(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, nRows: Int,
                   tieCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieCols.map(col)): Seq[Column]
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    df.select(
      (Seq(col(keyCol), col(tsCol)) ++ tieCols.map(col)) ++ Seq(
        count(lit(1)).over(w).as("roll_n"),
        min(col(valueCol)).over(w).as("roll_min"),
        max(col(valueCol)).over(w).as("roll_max"),
        sum(col(valueCol).cast("decimal(18,2)")).over(w)
          .cast("double").as("roll_sum")): _*)
  }

  /** Counter-rate accounting with reset detection (the PromQL `increase`
    * contract): per key, consecutive deltas are summed, and a decrease is
    * read as a counter restart — the new value counts in full, never a
    * negative delta. One lag window + one aggregation, both on the same
    * key shuffle. Decimal arithmetic end to end so the totals are exact.
    * Output: (key, n, resets, increase).
    */
  def counterIncrease(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String,
                      tieCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieCols.map(col)): Seq[Column]
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val v = col(valueCol).cast("decimal(18,2)")
    df.select(col(keyCol), v.as("_v"), lag(v, 1).over(w).as("_prev"))
      .select(col(keyCol),
        when(col("_prev").isNull, lit(0).cast("decimal(18,2)"))
          .when(col("_v") >= col("_prev"), col("_v") - col("_prev"))
          .otherwise(col("_v")).as("_delta"),
        when(col("_prev").isNotNull && col("_v") < col("_prev"), 1L)
          .otherwise(0L).as("_reset"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("_reset")).as("resets"),
        sum(col("_delta")).cast("double").as("increase"))
  }

  /** Exponentially-weighted moving average with α = 1/2, integer-exact:
    * per key in (ts, tie) order, `s₀ = v₀` and `sₜ = ⌊(vₜ + sₜ₋₁)/2⌋`
    * over micro-quantized values. EWMA is a sequential recursion — each
    * output depends on the whole prefix, which no window frame or
    * aggregate expresses — so this is the one series operator on the
    * per-partition imperative tier (SURVEY §7.3's last resort, used for
    * the one shape that needs it): repartition on key, secondary-sort
    * within partitions, one typed pass with O(1) state per task. Keys
    * never split across partitions, so a key's recursion always sees
    * its own full ordered history; the floor keeps the arithmetic in
    * integers, which is what lets a recursive-CTE oracle reproduce the
    * stream bit-for-bit.
    *
    * Input columns: key (string), ts / tie / vm (long; vm = value in
    * micro-units). Output adds `ewma_micro`.
    */
  def ewmaHalf(df: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, vmCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        col(tieCol).cast("long"), col(vmCol).cast("long"))
      .as[(String, Long, Long, Long)]
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(tieCol))
    sorted.mapPartitions { it =>
      // a null key is a legal group (e.g. concat over a null column), so
      // a null curKey sentinel would silently treat the null group's
      // first row as a continuation — track seeding explicitly
      var started = false
      var curKey: String = null
      var s = 0L
      it.map { case (k, ts, tie, vm) =>
        s = if (!started || k != curKey) vm else Math.floorDiv(vm + s, 2)
        started = true
        curKey = k
        (k, ts, tie, vm, s)
      }
    }.toDF(keyCol, tsCol, tieCol, vmCol, "ewma_micro")
  }

  /** Pipe rows through an external command, one subprocess per partition —
    * the reference's `read --parallel CMD` (sonnerie `src/main.rs:234-279`)
    * re-expressed as `RDD.pipe`: partitioned external consumers with the
    * process boundary per task.
    */
  def pipe(df: DataFrame, cmd: String): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(concat_ws("\t",
      df.columns.map(c => col(c).cast("string")): _*))
      .as[String]
    spark.createDataset(lines.rdd.pipe(cmd))
  }
}
