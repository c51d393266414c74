package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.functions.HistogramAgg
import graft.ops.Multimodal
import graft.series.SeriesAnalytics

/** Remaining SURVEY §2 surface + value-add analytics as oracle-checked
  * queries: typed Aggregator map-reduce (G2), subprocess pipe (P3),
  * sessionization / resampling / as-of join (§2.5 value-add), set ops
  * (§2.7), rollup (§2.4 value-add), multimodal feature plumbing.
  */
object AnalyticsQueries {

  private val GAP = 1800000000000L // 30 min in nanos

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G2: client map-reduce → typed Aggregator (rayon.rs:12-93)
    "g2_custom_agg" -> { (s, d) =>
      import s.implicits._
      val hist = udaf(new HistogramAgg(50.0, 10))
      Graft.events(s, d)
        .groupBy(col("event_type"))
        .agg(hist(col("value")).as("bins"))
        .select(col("event_type"), posexplode(col("bins")))
        .select(col("event_type"), col("pos").cast("long").as("bin"),
          col("col").as("n"))
        .orderBy("event_type", "bin")
    },
    // P3: partitioned subprocess pipe (main.rs:234-279)
    "p3_pipe" -> { (s, d) =>
      import s.implicits._
      val lines = SeriesAnalytics.pipe(
        SparkEntry.series(s, d).select("key", "ts", "event_id"), "cat")
      lines.map(l => l.split("\t")(0)).toDF("key")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy("key")
    },
    // value-add: gap sessionization
    "w2_sessionize" -> { (s, d) =>
      SeriesAnalytics.sessionStats(
          Graft.events(s, d)
            .select(col("user_id"), (col("ts") - col("ts") % 1000).as("ts"),
              col("event_id")), // µs-floor ts for the DuckDB oracle
          "user_id", "ts", GAP, Seq("event_id"))
        .orderBy("user_id", "session_id")
    },
    // value-add: tumbling-window resample (daily)
    "w3_resample" -> { (s, d) =>
      SeriesAnalytics.resample(SparkEntry.series(s, d),
          "key", "ts", "value", 86400000000000L)
        .orderBy("key", "bucket_ts")
    },
    // value-add: grid densify + forward fill (client-side analytics in
    // the reference, README.md:23-25)
    "w5_gapfill" -> { (s, d) =>
      SeriesAnalytics.gapFill(
          SparkEntry.series(s, d).select("key", "ts", "value"),
          "key", "ts", "value", 86400000000000L)
        .orderBy("key", "bucket_ts")
    },
    // value-add: per-key rolling-window smoothing (last-7-rows stats),
    // decimal-exact sums so the hash can't drift on window addition order
    "w6_rolling" -> { (s, d) =>
      val ev = Graft.events(s, d).select(
        concat(col("event_type"), lit("/"), col("user_id").cast("string"))
          .as("key"),
        (col("ts") - col("ts") % 1000).as("ts"), // µs-floor for the oracle
        col("event_id"), col("value"))
      SeriesAnalytics.rollingStats(ev, "key", "ts", "value", 7,
          Seq("event_id"))
        .orderBy("key", "ts", "event_id")
    },
    // value-add: counter-rate accounting with reset detection (the
    // PromQL `increase` contract over last-wins series)
    "w7_counter_rate" -> { (s, d) =>
      val ev = Graft.events(s, d).select(
        concat(col("event_type"), lit("/"), col("user_id").cast("string"))
          .as("key"),
        (col("ts") - col("ts") % 1000).as("ts"),
        col("event_id"), col("value"))
      SeriesAnalytics.counterIncrease(ev, "key", "ts", "value",
          Seq("event_id"))
        .orderBy("key")
    },
    // value-add: integer-exact EWMA (α = 1/2) — the one sequential
    // recursion in the family, driven through the per-partition
    // imperative tier; the recursive-CTE oracle reproduces the integer
    // stream exactly
    "w8_ewma" -> { (s, d) =>
      val ev = Graft.events(s, d).select(
        concat(col("event_type"), lit("/"), col("user_id").cast("string"))
          .as("key"),
        (col("ts") - col("ts") % 1000).as("ts"),
        col("event_id"),
        round(col("value") * 1e6).cast("long").as("vm"))
      SeriesAnalytics.ewmaHalf(ev, "key", "ts", "event_id", "vm")
        .orderBy("key", "ts", "event_id")
    },
    // value-add: as-of join (absent in reference, SURVEY §2.3)
    "j2_asof_join" -> { (s, d) =>
      val ev = Graft.events(s, d)
        .withColumn("ts", col("ts") - col("ts") % 1000) // µs-floor for oracle
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max("value").as("signup_value"))
      SeriesAnalytics.asOfJoin(purchases, signups, "user_id", "ts",
          Seq("signup_value"))
        .orderBy("user_id", "ts", "event_id")
    },
    // §2.7 set operations — "engaged but not noisy" users; every leg is
    // non-empty at each scale factor so all three operators do real work
    "x1_setops" -> { (s, d) =>
      val ev = Graft.events(s, d)
      def users(t: String) =
        ev.filter(col("event_type") === t).select("user_id").distinct()
      val noisy = ev.groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("errs"))
        .filter(col("errs") > col("clicks")).select("user_id")
      users("click").intersect(users("purchase")).except(noisy)
        .orderBy("user_id")
    },
    // value-add: hierarchical rollup aggregation
    "g3_rollup" -> { (s, d) =>
      Graft.events(s, d)
        .rollup(col("event_type"), (col("user_id") % 5).as("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
        .orderBy(col("event_type").asc_nulls_first, col("cohort").asc_nulls_first)
    },
    // multimodal: binary columns + batched partition-local decode (stub)
    "mm_features" -> { (s, d) =>
      Multimodal.featureQuery(s, Graft.documents(s, d))
        .orderBy("media_id", "i")
    },
    // value-add: ranking window — top-3 spenders per event type
    "w4_rank_topn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val spend = Graft.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("spend"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("spend").desc, col("user_id"))
      spend.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("event_type"), col("user_id"), col("spend"),
          col("rnk").cast("long"))
        .orderBy("event_type", "rnk")
    },
    // value-add: semi-structured JSON column extraction (events.props)
    "x2_json_extract" -> { (s, d) =>
      Graft.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    // value-add: Pearson correlation with engine-portable exactness —
    // moments accumulated as exact int64 (cents × small residue), one
    // IEEE-double formula at the end (identical bits on any engine;
    // Spark's built-in corr() accumulates doubles in partition order and
    // is NOT cross-engine stable)
    "g5_corr" -> { (s, d) =>
      val x = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val y = col("user_id") % 97
      def d0(c: Column) = c.cast("double")
      Graft.events(s, d)
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy("event_type")
        // moments summed as decimal(38,0): per-row products fit int64 but
        // their SUM wraps silently at ~1e12 rows — DuckDB accumulates in
        // HUGEINT, so int64 accumulation here would hash-diverge at scale
        // instead of erroring (values are identical at any non-wrapping SF)
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
        .select(col("event_type"), col("n"),
          round(
            (d0(col("n")) * d0(col("sxy")) - d0(col("sx")) * d0(col("sy"))) /
              (sqrt(d0(col("n")) * d0(col("sxx")) - d0(col("sx")) * d0(col("sx"))) *
                sqrt(d0(col("n")) * d0(col("syy")) - d0(col("sy")) * d0(col("sy")))),
            9).as("corr_xy"))
        .orderBy("event_type")
    },
    // value-add: exact interpolated percentiles (Spark `percentile` and
    // DuckDB `quantile_cont` share the linear-interpolation definition;
    // round(9) guards the last ulp)
    "g6_percentile" -> { (s, d) =>
      Graft.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(percentile(col("value"), lit(0.5)), 9).as("p50"),
          round(percentile(col("value"), lit(0.9)), 9).as("p90"),
          round(percentile(col("value"), lit(0.99)), 9).as("p99"))
        .orderBy("event_type")
    },
    // §2.4 value-add: exact distinct aggregation
    "g4_distinct" -> { (s, d) =>
      Graft.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },
    // Storage-engine lifecycle as a driver-visible query (rows-only check:
    // not ANSI-SQL-expressible — it exercises TxWriter/Db/delete against a
    // real on-disk warehouse built from the events table)
    "wh_roundtrip" -> { (s, d) =>
      import graft.store.{Db, TxWriter}
      val wh = java.nio.file.Files.createTempDirectory("graft-whq").toString
      val db = Db(s, wh)
      val series = SparkEntry.series(s, d)
        .select(col("key"), col("ts"), col("value"), col("event_id"))
      TxWriter.write(db, series.filter(col("event_id") % 2 === 0))
      TxWriter.write(db, series.filter(col("event_id") % 2 === 1))
      TxWriter.delete(db, wildcard = "error%")
      db.read("%", after = Some(0L))
        .select("key", "ts", "value")
        .orderBy("key", "ts")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // wh_roundtrip writes a REAL on-disk warehouse and reads it back; the
    // oracle is the algebraic result: (key, ts) pairs are unique in events,
    // both data txids precede the delete marker, so the read equals the
    // series minus all 'error%' keys
    "wh_roundtrip" ->
      """WITH series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, value
        |  FROM events)
        |SELECT key, ts, value FROM series
        |WHERE key NOT LIKE 'error%'
        |ORDER BY key, ts""".stripMargin,
    "w4_rank_topn" ->
      """SELECT event_type, user_id, spend, rnk FROM (
        |  SELECT event_type, user_id,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) DESC,
        |                    user_id) AS rnk
        |  FROM events GROUP BY event_type, user_id)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,
    "x2_json_extract" ->
      """SELECT event_type,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "g5_corr" ->
      """WITH b AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |         user_id % 97 AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x*y) AS BIGINT) AS sxy,
        |         CAST(sum(x*x) AS BIGINT) AS sxx,
        |         CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM b GROUP BY event_type)
        |SELECT event_type, n,
        |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |        (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
        |         sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 9) AS corr_xy
        |FROM a ORDER BY event_type""".stripMargin,
    "g6_percentile" ->
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.5), 9) AS p50,
        |       round(quantile_cont(value, 0.9), 9) AS p90,
        |       round(quantile_cont(value, 0.99), 9) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "g4_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "g2_custom_agg" ->
      """WITH bins AS (
        |  SELECT event_type,
        |         least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin
        |  FROM events),
        |counts AS (SELECT event_type, bin, count(*) AS n FROM bins GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT event_type, i AS bin
        |  FROM events CROSS JOIN range(10) t(i))
        |SELECT g.event_type, g.bin, coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN counts c
        |  ON g.event_type = c.event_type AND g.bin = c.bin
        |ORDER BY g.event_type, g.bin""".stripMargin,
    "p3_pipe" ->
      """SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |       count(*) AS n
        |FROM events GROUP BY key ORDER BY key""".stripMargin,
    "w2_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |         CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(sum(new_session) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS t_start, max(ts) AS t_end,
        |       max(ts) - min(ts) AS duration_ns
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "w3_resample" ->
      """WITH series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, value FROM events)
        |SELECT key, ts - (ts % 86400000000000) AS bucket_ts, count(*) AS n,
        |       min(value) AS vmin, max(value) AS vmax,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM series GROUP BY key, bucket_ts ORDER BY key, bucket_ts""".stripMargin,
    "w5_gapfill" ->
      """WITH series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, value FROM events),
        |b AS (SELECT key, ts - ts % 86400000000000 AS bucket_ts,
        |             max(value) AS v
        |      FROM series GROUP BY key, bucket_ts),
        |bounds AS (SELECT key, min(bucket_ts) AS lo, max(bucket_ts) AS hi
        |           FROM b GROUP BY key),
        |grid AS (SELECT key,
        |                unnest(range(lo, hi + 86400000000000, 86400000000000))
        |                  AS bucket_ts
        |         FROM bounds),
        |j AS (SELECT g.key, g.bucket_ts, b.v,
        |             CASE WHEN b.bucket_ts IS NULL THEN 0 ELSE 1 END AS obs
        |      FROM grid g LEFT JOIN b
        |        ON g.key = b.key AND g.bucket_ts = b.bucket_ts)
        |SELECT key, bucket_ts,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY key
        |         ORDER BY bucket_ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |       CAST(obs AS BIGINT) AS is_observed
        |FROM j ORDER BY key, bucket_ts""".stripMargin,
    "w6_rolling" ->
      """WITH series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, event_id, value FROM events)
        |SELECT key, ts, event_id,
        |       count(*) OVER w AS roll_n,
        |       min(value) OVER w AS roll_min,
        |       max(value) OVER w AS roll_max,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         AS roll_sum
        |FROM series
        |WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY key, ts, event_id""".stripMargin,
    "w7_counter_rate" ->
      """WITH series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, event_id, value FROM events),
        |lagged AS (
        |  SELECT key, CAST(value AS DECIMAL(18,2)) AS v,
        |         lag(CAST(value AS DECIMAL(18,2))) OVER
        |           (PARTITION BY key ORDER BY ts, event_id) AS prev
        |  FROM series),
        |d AS (
        |  SELECT key,
        |         CASE WHEN prev IS NULL THEN CAST(0 AS DECIMAL(18,2))
        |              WHEN v >= prev THEN v - prev ELSE v END AS delta,
        |         CASE WHEN prev IS NOT NULL AND v < prev THEN 1
        |              ELSE 0 END AS reset
        |  FROM lagged)
        |SELECT key, count(*) AS n, CAST(sum(reset) AS BIGINT) AS resets,
        |       CAST(sum(delta) AS DOUBLE) AS increase
        |FROM d GROUP BY key ORDER BY key""".stripMargin,
    "w8_ewma" ->
      """WITH RECURSIVE series AS (
        |  SELECT event_type || '/' || CAST(user_id AS VARCHAR) AS key,
        |         epoch_ns(ts) AS ts, event_id,
        |         CAST(round(value * 1000000.0, 0) AS BIGINT) AS vm,
        |         row_number() OVER (
        |           PARTITION BY event_type || '/' || CAST(user_id AS VARCHAR)
        |           ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events),
        |ew AS (
        |  SELECT key, ts, event_id, vm, rn, vm AS ewma_micro
        |  FROM series WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.ts, o.event_id, o.vm, o.rn,
        |         CAST(floor((o.vm + e.ewma_micro) / 2.0) AS BIGINT)
        |  FROM series o JOIN ew e ON e.key = o.key AND o.rn = e.rn + 1)
        |SELECT key, ts, event_id, vm, ewma_micro FROM ew
        |ORDER BY key, ts, event_id""".stripMargin,
    "j2_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, max(value) AS signup_value
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_ns(ts))
        |SELECT p.user_id, p.ts, p.event_id, p.value,
        |       s.signup_value AS asof_signup_value
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin,
    "x1_setops" ->
      """WITH noisy AS (
        |  SELECT user_id FROM (
        |    SELECT user_id,
        |           count(*) FILTER (WHERE event_type = 'click') AS clicks,
        |           count(*) FILTER (WHERE event_type = 'error') AS errs
        |    FROM events GROUP BY user_id)
        |  WHERE errs > clicks)
        |(SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        | INTERSECT
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |EXCEPT
        |SELECT user_id FROM noisy
        |ORDER BY user_id""".stripMargin,
    "g3_rollup" ->
      """SELECT event_type, user_id % 5 AS cohort, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY ROLLUP (event_type, cohort)
        |ORDER BY event_type ASC NULLS FIRST, cohort ASC NULLS FIRST""".stripMargin,
    "mm_features" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id,
         |         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         |         text::BLOB AS bytes
         |  FROM documents)
         |SELECT media_id, kind, octet_length(bytes) AS byte_len, i,
         |       round(${Multimodal.sqlFeature("bytes", "i")}, 9) AS f
         |FROM media CROSS JOIN range(${Multimodal.FEATURE_DIM}) t(i)
         |ORDER BY media_id, i""".stripMargin
  )
}
