package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.series.SeriesOps

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ pipeline value-add), each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible.
  *
  * Cross-engine determinism rules used throughout (so the driver's
  * hash-compare is byte-stable):
  *   - money/double aggregations go through exact DECIMAL sums, cast to
  *     DOUBLE only at the end (FP sum order would differ between engines);
  *   - every query ends in a total ORDER BY in both engines;
  *   - nanosecond timestamps stay BIGINT epoch-nanos end-to-end
  *     (`spark.sql.legacy.parquet.nanosAsLong` ↔ DuckDB `epoch_ns`).
  */
object SparkEntry {

  /** The canonical series view of the `events` table:
    * `(key, ts nanos, txid, event_id, value, props)` — sonnerie's data model
    * (`key → [(ts, values…)]`, SURVEY §1.1) projected onto driver testdata.
    * txid is synthesized from event_id to exercise multi-transaction
    * semantics (last-wins, delete precedence).
    */
  def series(spark: SparkSession, sfDir: String): DataFrame =
    Graft
      .events(spark, sfDir)
      .select(
        concat(col("event_type"), lit("/"), col("user_id").cast("string"))
          .as("key"),
        // The engine's canonical ts is full epoch-nanos (Graft.normalizeTs
        // absorbs the testdata's physical encoding). The µs-floor below is
        // a no-op on µs-encoded data and matches DuckDB's µs flooring of
        // the legacy TIMESTAMP(NANOS) encoding — kept so the oracle view
        // is identical under both. Nanos fidelity is covered by warehouse
        // round-trip specs (TxWriterSpec), not the DuckDB gate.
        (col("ts") - col("ts") % 1000).as("ts"),
        (col("event_id") % 4).as("txid"),
        col("event_id"),
        col("value"),
        col("props")
      )

  private val seriesSql =
    """series AS (
      |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
      |         epoch_ns(ts) AS ts,
      |         event_id % 4 AS txid,
      |         event_id, value, props
      |  FROM events
      |)""".stripMargin

  // [2024-01-05, 2024-01-20) in epoch nanos — inside the events time span.
  private val T0 = 1704412800000000000L
  private val T1 = 1705708800000000000L

  private def sumDec(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** The testdata money columns are 2-decimal values stored as double; cast
    * to DECIMAL(18,2) *before* any arithmetic so every product/sum is exact
    * decimal math — identical in Spark and DuckDB (double-rounding of
    * intermediate products is NOT portable across engines).
    */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Flagship: full sonnerie read pipeline — wildcard key filter (with
    * prefix-range rewrite), time range, last-writer-wins across txids,
    * range-delete anti-join, (key, ts) ordered output.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val s = series(spark, sfDir)
    val filtered = SeriesOps.timeRange(
      SeriesOps.keyFilter(s, "%e%"),
      Some(T0),
      None
    )
    val deduped =
      SeriesOps.lastWins(filtered, Seq("key", "ts"), "txid", Seq("event_id"))
    val deletes = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('click', 'login', ${T0}L, ${T1}L, '%', 3L)
         |  AS t(firstKey, lastKey, t0, t1, wildcard, txid)""".stripMargin
    )
    SeriesOps.ordered(SeriesOps.applyDeletes(deduped, deletes))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ PipelineQueries.queries ++ AnalyticsQueries.queries

  def oracleSql: Map[String, String] =
    coreOracleSql ++ PipelineQueries.oracleSql ++ AnalyticsQueries.oracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── §2.1 scans ────────────────────────────────────────────────────
    "s1_snapshot_scan" -> { (s, d) =>
      series(s, d)
        .select("key", "ts", "txid", "event_id", "value")
        .orderBy("key", "ts", "event_id")
    },
    // ── §2.2 filters / projections ────────────────────────────────────
    "f1_point_lookup" -> { (s, d) =>
      series(s, d)
        .filter(SeriesOps.keyPredicate(col("key"), "click/7"))
        .select("key", "ts", "event_id", "value")
        .orderBy("ts", "event_id")
    },
    "f2_key_range" -> { (s, d) =>
      SeriesOps
        .keyRange(series(s, d), Some("error/2"), Some("purchase/5"))
        .select("key", "ts", "event_id", "value")
        .orderBy("key", "ts", "event_id")
    },
    "f3_wildcard" -> { (s, d) =>
      SeriesOps
        .keyFilter(series(s, d), "p%/1%")
        .select("key", "ts", "event_id", "value")
        .orderBy("key", "ts", "event_id")
    },
    "f5_time_range" -> { (s, d) =>
      SeriesOps
        .timeRange(series(s, d), Some(T0), Some(T1))
        .select("key", "ts", "event_id", "value")
        .orderBy("key", "ts", "event_id")
    },
    "f6_projection" -> { (s, d) =>
      series(s, d).select("key", "value").orderBy("key", "value")
    },
    // ── §2.3 merge (last-writer-wins across transactions) ─────────────
    "j1_last_wins" -> { (s, d) =>
      val hourly = series(s, d)
        .withColumn("tsb", col("ts") - (col("ts") % 3600000000000L))
        .select("key", "tsb", "txid", "event_id", "value")
      SeriesOps
        .lastWins(hourly, Seq("key", "tsb"), "txid", Seq("event_id"))
        .orderBy("key", "tsb")
    },
    // ── §2.9 range-delete anti-join ───────────────────────────────────
    "f7_delete_antijoin" -> { (s, d) =>
      val deletes = s.sql(
        s"""SELECT * FROM VALUES
           |  ('click', 'login', ${T0}L, ${T1}L, '%/1%', 2L),
           |  ('purchase', '', 0L, 9223372036854775807L, 'purchase/3', 3L)
           |  AS t(firstKey, lastKey, t0, t1, wildcard, txid)""".stripMargin
      )
      SeriesOps
        .applyDeletes(series(s, d), deletes)
        .select("key", "ts", "txid", "event_id", "value")
        .orderBy("key", "ts", "event_id")
    },
    // ── §2.4 grouping / aggregation ───────────────────────────────────
    "g1_bykey_stats" -> { (s, d) =>
      series(s, d)
        .groupBy("key")
        .agg(
          count(lit(1)).as("n"),
          min("ts").as("first_ts"),
          max("ts").as("last_ts"),
          sumDec(col("value")).as("sum_value")
        )
        .orderBy("key")
    },
    // ── §2.6 sort / top-k ─────────────────────────────────────────────
    "o3_topk" -> { (s, d) =>
      series(s, d)
        .select("key", "ts", "event_id", "value")
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)
    },
    // ── value-add: TPC-H style analytics ──────────────────────────────
    "q1_agg" -> { (s, d) =>
      Graft
        .lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(
            dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))) *
              (lit(1) + dec2(col("l_tax")))
          ).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q5_multi_join" -> { (s, d) =>
      // TPC-H Q5 shape: fact table joined to a chain of small dimensions —
      // every dimension side broadcast, zero shuffle joins
      val r = Graft.region(s, d).filter(col("r_name") === "ASIA")
      val n = Graft.nation(s, d)
      val c = Graft.customer(s, d)
      val o = Graft.orders(s, d)
      val l = Graft.lineitem(s, d)
      val su = Graft.supplier(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    "q3_join_topk" -> { (s, d) =>
      val c = Graft.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Graft.orders(s, d)
      val l = Graft.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    // ── value-add: window functions over the series ───────────────────
    "w1_lag_delta" -> { (s, d) =>
      SeriesOps
        .withLagDelta(
          series(s, d).select("key", "ts", "event_id", "value"),
          "value"
        )
        .orderBy("key", "ts", "event_id")
    }
  )

  private def coreOracleSql: Map[String, String] = Map(
    "s1_snapshot_scan" ->
      s"""WITH $seriesSql
         |SELECT key, ts, txid, event_id, value FROM series
         |ORDER BY key, ts, event_id""".stripMargin,
    "f1_point_lookup" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value FROM series
         |WHERE key = 'click/7' ORDER BY ts, event_id""".stripMargin,
    "f2_key_range" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value FROM series
         |WHERE key >= 'error/2' AND key < 'purchase/5'
         |ORDER BY key, ts, event_id""".stripMargin,
    "f3_wildcard" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value FROM series
         |WHERE key LIKE 'p%/1%'
         |ORDER BY key, ts, event_id""".stripMargin,
    "f5_time_range" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value FROM series
         |WHERE ts >= $T0 AND ts < $T1
         |ORDER BY key, ts, event_id""".stripMargin,
    "f6_projection" ->
      s"""WITH $seriesSql
         |SELECT key, value FROM series ORDER BY key, value""".stripMargin,
    "j1_last_wins" ->
      s"""WITH $seriesSql
         |SELECT key, tsb, txid, event_id, value FROM (
         |  SELECT key, ts - (ts % 3600000000000) AS tsb, txid, event_id, value,
         |         row_number() OVER (PARTITION BY key, ts - (ts % 3600000000000)
         |                            ORDER BY txid DESC, event_id DESC) AS rn
         |  FROM series
         |) WHERE rn = 1
         |ORDER BY key, tsb""".stripMargin,
    "f7_delete_antijoin" ->
      s"""WITH $seriesSql,
         |deletes(firstKey, lastKey, t0, t1, wildcard, txid) AS (
         |  VALUES ('click', 'login', $T0, $T1, '%/1%', 2),
         |         ('purchase', '', 0, 9223372036854775807, 'purchase/3', 3))
         |SELECT key, ts, txid, event_id, value FROM series r
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM deletes d
         |  WHERE r.txid < d.txid
         |    AND r.key >= d.firstKey
         |    AND (d.lastKey = '' OR r.key < d.lastKey)
         |    AND r.ts >= d.t0 AND r.ts < d.t1
         |    AND r.key LIKE d.wildcard)
         |ORDER BY key, ts, event_id""".stripMargin,
    "g1_bykey_stats" ->
      s"""WITH $seriesSql
         |SELECT key, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM series GROUP BY key ORDER BY key""".stripMargin,
    "o3_topk" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value FROM series
         |ORDER BY value DESC, event_id LIMIT 100""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "w1_lag_delta" ->
      s"""WITH $seriesSql
         |SELECT key, ts, event_id, value,
         |       lag(value, 1) OVER (PARTITION BY key ORDER BY ts) AS prev_value,
         |       value - lag(value, 1) OVER (PARTITION BY key ORDER BY ts) AS delta
         |FROM series
         |ORDER BY key, ts, event_id""".stripMargin
  )
}
