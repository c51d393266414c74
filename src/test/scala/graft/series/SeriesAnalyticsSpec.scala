package graft.series

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed cases for the window-family analytics the oracle rows
  * exercise at corpus scale — the reset/frame edge semantics are easier
  * to read off four rows than off 10k.
  */
class SeriesAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingStats: ROW frame contents, ties broken, decimal sums") {
    val df = Seq(
      ("a", 1L, 1L, 1.5), ("a", 2L, 2L, 2.25), ("a", 2L, 3L, 4.0),
      ("a", 5L, 4L, 8.0), ("b", 1L, 5L, 100.0))
      .toDF("key", "ts", "event_id", "value")
    val got = SeriesAnalytics.rollingStats(df, "key", "ts", "value", 3,
        Seq("event_id"))
      .orderBy("key", "ts", "event_id")
      .select("key", "roll_n", "roll_min", "roll_max", "roll_sum")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 1.5, 1.5, 1.5),
      ("a", 2L, 1.5, 2.25, 3.75),      // (1.5, 2.25)
      ("a", 3L, 1.5, 4.0, 7.75),       // (1.5, 2.25, 4.0)
      ("a", 3L, 2.25, 8.0, 14.25),     // frame slid: (2.25, 4.0, 8.0)
      ("b", 1L, 100.0, 100.0, 100.0)), // keys never mix
      got.toString)
  }

  test("ewmaHalf: per-key integer recursion, keys isolated, " +
      "any input partitioning") {
    val df = Seq(
      ("a", 1L, 1L, 100L), ("a", 2L, 2L, 50L), ("a", 3L, 3L, 7L),
      ("b", 1L, 4L, 9L)).toDF("key", "ts", "event_id", "vm")
    // a: 100 -> (50+100)/2 = 75 -> (7+75)/2 = 41; b starts fresh at 9
    val want = Seq(
      ("a", 1L, 1L, 100L, 100L), ("a", 2L, 2L, 50L, 75L),
      ("a", 3L, 3L, 7L, 41L), ("b", 1L, 4L, 9L, 9L))
    for (parts <- Seq(1, 3, 7)) {
      val got = SeriesAnalytics.ewmaHalf(df.repartition(parts),
          "key", "ts", "event_id", "vm")
        .orderBy("key", "ts", "event_id")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"parts=$parts: $got")
    }
    // a NULL key is a legal group (concat over a null column): its first
    // row must SEED the recursion, not continue from the sentinel state
    val withNull = Seq((null.asInstanceOf[String], 1L, 1L, 100L),
      (null.asInstanceOf[String], 2L, 2L, 50L), ("a", 1L, 3L, 8L))
      .toDF("key", "ts", "event_id", "vm")
    val gotNull = SeriesAnalytics.ewmaHalf(withNull,
        "key", "ts", "event_id", "vm")
      .orderBy("ts", "event_id")
      .select("vm", "ewma_micro").as[(Long, Long)].collect().toSet
    assert(gotNull == Set((100L, 100L), (50L, 75L), (8L, 8L)),
      gotNull.toString)
  }

  test("counterIncrease: monotone deltas sum; a decrease is a restart") {
    val df = Seq(
      // c: 10 -> 15 (+5) -> 3 (RESET, +3) -> 7 (+4) => increase 12, 1 reset
      ("c", 1L, 1L, 10.0), ("c", 2L, 2L, 15.0), ("c", 3L, 3L, 3.0),
      ("c", 4L, 4L, 7.0),
      // d: single observation => nothing accrues
      ("d", 1L, 5L, 42.0))
      .toDF("key", "ts", "event_id", "value")
    val got = SeriesAnalytics.counterIncrease(df, "key", "ts", "value",
        Seq("event_id"))
      .orderBy("key")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("c", 4L, 1L, 12.0), ("d", 1L, 0L, 0.0)),
      got.toString)
  }
}
