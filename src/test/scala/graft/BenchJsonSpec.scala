package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's error accounting: a query that throws is excluded
  * from the total and surfaces under `errors` with its failure count —
  * the JSON line can't silently shrink when a query breaks.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val mins = Seq("q_ok" -> 1.5, "q_broken" -> 0.01, "q_ok2" -> 2.0)
  private val spreads = Seq("q_ok" -> 1.1, "q_broken" -> 1.0, "q_ok2" -> 1.2)

  test("clean run: no errors key noise, total sums all queries") {
    val j = Bench.renderJson(mins, spreads, Map.empty, 0.1, 1.05, 3, 1,
      contaminated = false, "/tmp/sf")
    assert(j.contains(""""err_count":0"""))
    assert(j.contains(""""errors":{}"""))
    assert(j.contains(""""value":3.510"""))
    assert(j.contains(""""q_broken":0.010"""))
  }

  test("a broken query poisons the line visibly and leaves the total") {
    val j = Bench.renderJson(mins, spreads,
      Map("q_broken" -> 3), 0.1, 1.05, 3, 1, contaminated = false, "/tmp/sf")
    assert(j.contains(""""errors":{"q_broken":3}"""))
    assert(j.contains(""""err_count":3"""))
    // excluded from both the total and the per-query times
    assert(j.contains(""""value":3.500,"""))
    assert(!j.contains(""""q_broken":0.010"""))
  }

  test("raw queries + scalars ride the line's TAIL so they survive the " +
      "recorder's truncation; errored queries excluded from norm map") {
    val j = Bench.renderJson(mins, spreads, Map("q_broken" -> 1),
      0.1, 1.05, 3, 1, contaminated = false, "/tmp/sf",
      sentParMin = 0.5, sentParSpread = 1.08)
    // 1.5 s at a 0.1 s sentinel = 15.0000 machine-relative units;
    // 4 decimals so a sub-percent drift (the signal these fields exist
    // to detect) survives the rounding
    assert(j.contains(""""queries_norm":{"q_ok":15.0000,"q_ok2":20.0000}"""))
    assert(j.contains(""""total_norm":35.0000"""))
    assert(j.contains(""""norm_unit":"query_min/sentinel_min""""))
    // the parallel-sentinel fields ride the tail too: its own min/spread
    // plus the total renormalized by it (3.5 s / 0.5 s = 7.0)
    assert(j.contains(""""sentinel_par_sec":0.5000"""))
    assert(j.contains(""""sentinel_par_spread":1.0800"""))
    assert(j.contains(""""total_norm_par":7.0000"""))
    // tail ordering (r19 recording contract): the sacrificial normalized
    // map leads; the RAW contract map and every summary scalar own the
    // tail, so a ~2 KB tail cut keeps raw seconds + sentinels (norm is
    // recomputable as raw / sentinel_sec)
    assert(j.indexOf("\"queries\":") > j.indexOf("queries_norm"))
    assert(j.indexOf("\"sentinel_sec\":") > j.indexOf("\"queries\":"))
    assert(j.indexOf("total_norm_par") > j.indexOf("\"sentinel_sec\":"))
    assert(j.indexOf("total_sec") > j.indexOf("total_norm_par"))
    assert(j.indexOf("\"sf\":") > j.indexOf("total_norm_par"))
  }

  test("a query faster than the sentinel keeps resolution instead of " +
      "quantizing to 0.0x") {
    val j = Bench.renderJson(Seq("q_fast" -> 0.0123), Seq("q_fast" -> 1.0),
      Map.empty, 0.1, 1.05, 3, 1, contaminated = false, "/tmp/sf",
      sentParMin = 0.5, sentParSpread = 1.0)
    assert(j.contains(""""queries_norm":{"q_fast":0.1230}"""))
  }

  test("spread collapses to aggregate stats + the noisiest queries") {
    val j = Bench.renderJson(mins, spreads, Map.empty, 0.1, 1.05, 3, 1,
      contaminated = false, "/tmp/sf")
    assert(j.contains(""""spread_max":1.20"""))
    assert(j.contains(""""spread_p95":"""))
    // worst-first top list, no full per-query spread map
    assert(j.contains(""""spread_top":{"q_ok2":1.20"""))
    assert(!j.contains(""""spread":{"""))
  }
}
