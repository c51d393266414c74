package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query job anatomy: how many Spark jobs / stages / tasks a
  * warm run of each named query launches, and the wall time — so the
  * optimization loop can tell fixed job-count overhead (scheduling,
  * per-action planning) from real data-plane cost before touching any
  * operator. Not part of the driver contract.
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.configure(spark)

    val verbose = sys.env.get("QJOBS_VERBOSE").contains("1")
    final class Counter extends SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = j.stageInfos.map(_.name).distinct.mkString(" | ").take(120)
        jobStart.put(j.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd)
          : Unit = {
        val s = jobStart.remove(j.jobId)
        if (s != null && verbose) {
          jobLines.add(f"  job=${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
          ()
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L); ()
        }
      }
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm pass: codegen, file listing caches
      val c = new Counter
      spark.sparkContext.addSparkListener(c)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a moment to drain before reading
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(c)
      println(f"QJOBS $name%-28s wall=$wall%8.3f s jobs=${c.jobs.get}%4d " +
        f"stages=${c.stages.get}%4d tasks=${c.tasks.get}%6d " +
        f"taskTime=${c.taskNanos.get / 1e9}%9.3f s")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        c.jobLines.asScala.foreach(println)
      }
    }
    spark.stop()
  }
}
