package graft.plans

import graft.{SparkSpec, SparkEntry}

/** Fleet-wide plan hygiene: no query in the driver surface may plan a
  * CartesianProduct — at 100 TB an accidental cross product is a cluster
  * outage, not a slowdown. (BroadcastNestedLoopJoin with a tiny build side
  * is the intended shape for theta joins and is allowed.)
  */
class PlanHygieneSpec extends SparkSpec {

  test("no CartesianProduct in any driver query plan") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
