package graft.plans

import graft.SparkSpec
import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed fact-fact joins must plan WITHOUT a shuffle exchange: the
  * whole point of paying the bucketed write is deleting the join-time
  * exchange of the large side (SCALE.md q3/q5 experiment).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket join plans with no shuffle exchange, same results") {
    val dir = tmpDir("graft-bucket")
    val orders = (1L to 400L).map(o => (o, o % 7)).toDF("orderkey", "cust")
    val lineitem = (1L to 2000L).map(i => (i % 400 + 1, i, i * 3))
      .toDF("orderkey", "linenum", "qty")

    Bucketing.writeBucketed(orders, "b_orders", s"$dir/orders", "orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$dir/lineitem", "orderkey", 8)

    val joined = Bucketing.table(spark, "b_lineitem")
      .join(Bucketing.table(spark, "b_orders"), "orderkey")
      .groupBy("cust").agg(sum("qty").as("q"))

    // disable auto-broadcast so the join would otherwise shuffle
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val phys =
      try joined.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(!phys.contains("Exchange hashpartitioning(orderkey"),
      s"join-side exchange survived bucketing:\n$phys")

    val expect = lineitem.join(orders, "orderkey")
      .groupBy("cust").agg(sum("qty").as("q"))
      .as[(Long, Long)].collect().toSet
    assert(joined.as[(Long, Long)].collect().toSet == expect)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
