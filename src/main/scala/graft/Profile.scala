package graft

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.ops.Dedup

/** Dev-only stage profiler: times sub-stages of the slowest bench queries
  * so optimization targets measurements, not guesses. Not part of the
  * driver contract.
  */
object Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession(cores = 32)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Graft.documents(spark, sfDir)
    t("docs.count")(docs.count())
    println("PROFILE docs partitions: " + docs.rdd.getNumPartitions)

    // ngram jaccard stages
    val bucket = concat(col("lang"), lit("/"),
      (col("n_chars") / 50).cast("long").cast("string"))
    val ex = Graft.rebalance(docs)
      .select(col("doc_id").as("id"), bucket.as("bucket"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), col("bucket"), size(col("sh")).as("sz"),
        explode(col("sh")).as("h"))
    t("jac: shingle+explode rebal")(ex.count())
    t("jac: shingle+explode rebal2")(ex.count())
    val exS = docs
      .select(col("doc_id").as("id"), bucket.as("bucket"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), col("bucket"), size(col("sh")).as("sz"),
        explode(col("sh")).as("h"))
    t("jac: shingle+explode serial")(exS.count())
    val exR = ex.repartition(col("bucket"), col("h"))
    val l = exR.alias("l"); val r = exR.alias("r")
    val joined = l.join(r,
      col("l.bucket") === col("r.bucket") && col("l.h") === col("r.h") &&
        col("l.id") < col("r.id"))
    t("jac: self-join")(joined.count())
    val grouped = joined
      .groupBy(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.sz").as("sz1"), col("r.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
    t("jac: +group")(grouped.count())
    val full = graft.PipelineQueries.queries("dedup_ngram_jaccard")(spark, sfDir)
    t("jac: full plan-only")(full.queryExecution.executedPlan)
    t("jac: full query")(full.count())
    t("jac: full again")(full.count())
    // how much is job fixed-cost? a trivial count on the same table
    t("trivial docs.count again")(Graft.documents(spark, sfDir).count())

    // minhash stages
    val withSig = docs
      .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), Dedup.minhashSignature(col("sh")).as("sig"))
    t("mh: signatures")(withSig.count())
    val fullMh = graft.PipelineQueries.queries("dedup_minhash_lsh")(spark, sfDir)
    t("mh: full query")(fullMh.count())

    val fullSh = graft.PipelineQueries.queries("dedup_simhash")(spark, sfDir)
    t("sh: full query")(fullSh.count())

    // wh_roundtrip piecewise
    {
      import graft.store.{Db, TxWriter}
      val wh = java.nio.file.Files.createTempDirectory("graft-whp").toString
      val db = Db(spark, wh)
      val series = SparkEntry.series(spark, sfDir)
        .select(col("key"), col("ts"), col("value"), col("event_id"))
      t("wh: write even")(TxWriter.write(db, series.filter(col("event_id") % 2 === 0)))
      t("wh: write odd")(TxWriter.write(db, series.filter(col("event_id") % 2 === 1)))
      t("wh: delete")(TxWriter.delete(db, wildcard = "error%"))
      t("wh: read back")(db.read("%", after = Some(0L))
        .select("key", "ts", "value").orderBy("key", "ts").count())
    }
    val fullWh = graft.AnalyticsQueries.queries("wh_roundtrip")(spark, sfDir)
    t("wh: full query")(fullWh.count())

    spark.stop()
  }
}
