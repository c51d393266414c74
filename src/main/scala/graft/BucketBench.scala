package graft

import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.ops.Bucketing

/** The q3/q5 fact-table bucketing experiment (SCALE.md): write lineitem
  * and orders bucketed on their orderkey and measure the q3-shaped join
  * against the plain parquet path. Auto-broadcast is disabled for the
  * fact-fact join so the measurement reflects the 100 TB shape (at real
  * scale neither fact side broadcasts); the dimension stays an explicit
  * broadcast, as in q3 itself.
  *
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.BucketBench"`
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession(
      Runtime.getRuntime.availableProcessors().min(32), 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def q3(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame,
           c: org.apache.spark.sql.DataFrame) =
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)

    def timed(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"BUCKETBENCH $name run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }

    val cust = Graft.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")

    timed("plain  ")(
      q3(Graft.lineitem(spark, sfDir), Graft.orders(spark, sfDir), cust)
        .collect())

    val dir = java.nio.file.Files.createTempDirectory("graft-bucketbench").toString
    val t0 = System.nanoTime()
    Bucketing.writeBucketed(Graft.lineitem(spark, sfDir), "bb_lineitem",
      s"$dir/lineitem", "l_orderkey", 16)
    Bucketing.writeBucketed(Graft.orders(spark, sfDir), "bb_orders",
      s"$dir/orders", "o_orderkey", 16)
    println(f"BUCKETBENCH bucketed-write ${(System.nanoTime() - t0) / 1e9}%6.3f s")

    val lb = Bucketing.table(spark, "bb_lineitem")
    val ob = Bucketing.table(spark, "bb_orders")
    timed("bucketed")(q3(lb, ob, cust).collect())

    val phys = q3(lb, ob, cust).queryExecution.executedPlan.toString
    val exchangeFree = !phys.contains("Exchange hashpartitioning(l_orderkey") &&
      !phys.contains("Exchange hashpartitioning(o_orderkey")
    println(s"BUCKETBENCH fact-join exchange deleted: $exchangeFree")
    spark.stop()
  }
}
