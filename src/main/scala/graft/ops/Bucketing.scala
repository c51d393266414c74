package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fact-table bucketing: write both sides of a recurring fact-fact join
  * pre-hash-partitioned on the join key, so the join plans with NO
  * shuffle exchange — each task zips bucket i of both tables. At 100 TB
  * this deletes the single largest data movement of q3/q5-shaped
  * workloads (the lineitem⋈orders exchange ships the whole fact table);
  * the price is paid once at write time and amortized over every join.
  *
  * Spark's bucketing rides the table catalog (`bucketBy` requires
  * `saveAsTable`), so these land in the session catalog with an explicit
  * `path` — external tables, data under the caller's directory.
  */
object Bucketing {

  /** Write `df` bucketed by `key` as external table `name` at `path`.
    * Same bucket count on both join sides ⇒ exchange-free join;
    * `sortBy(key)` additionally lets a one-file-per-bucket read skip the
    * sort-merge sort.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
