package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of [[Sequencing.sourceMixTemperature]] (the α-exponentiated
  * sampling weights; cross-engine exactness is the `tp_source_mix_temp`
  * driver row's job): α<1 shifts mass toward small sources, α=1 recovers
  * the proportional distribution, and the probabilities form a
  * distribution.
  */
class SequencingSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources with strongly skewed token mass: 100 / 1000 / 10000
  private lazy val docs = (
    (0 until 10).map(i => (s"a$i", "small", 10L)) ++
    (0 until 10).map(i => (s"b$i", "mid", 100L)) ++
    (0 until 10).map(i => (s"c$i", "big", 1000L))
  ).toDF("doc_id", "source", "n_tok")

  test("alpha<1 upsamples small sources relative to proportional") {
    val m = Sequencing.sourceMixTemperature(docs, "source", "n_tok", 0.5)
      .select("source", "p_raw", "p_temp")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("small")._2 > m("small")._1, s"small: $m")
    assert(m("big")._2 < m("big")._1, s"big: $m")
    // both are distributions (rounding leaves ~1e-6 slack)
    assert(math.abs(m.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-5)
    // order is preserved: bigger source never drops below a smaller one
    assert(m("big")._2 > m("mid")._2 && m("mid")._2 > m("small")._2)
  }

  test("alpha=1 recovers the proportional distribution") {
    val m = Sequencing.sourceMixTemperature(docs, "source", "n_tok", 1.0)
      .select("source", "p_raw", "p_temp")
      .as[(String, Double, Double)].collect()
    m.foreach { case (s, raw, temp) =>
      assert(math.abs(raw - temp) < 2e-6, s"$s: $raw vs $temp")
    }
  }

  test("alpha=0 is uniform over non-empty sources") {
    val m = Sequencing.sourceMixTemperature(docs, "source", "n_tok", 0.0)
      .select("p_temp").as[Double].collect()
    m.foreach(p => assert(math.abs(p - 1.0 / 3) < 2e-6))
  }

  test("zero-token sources get probability 0, others renormalize over them") {
    val withEmpty = docs
      .union(Seq(("z0", "empty", 0L)).toDF("doc_id", "source", "n_tok"))
    val m = Sequencing.sourceMixTemperature(withEmpty, "source", "n_tok", 0.5)
      .select("source", "p_temp").as[(String, Double)].collect().toMap
    assert(m("empty") == 0.0)
    assert(math.abs(m.view.filterKeys(_ != "empty").values.sum - 1.0) < 1e-5)
  }

  test("assignBins aggregates to exactly packBins") {
    val docs = (0L until 200L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tok")
    val agg = Sequencing.assignBins(docs, "doc_id", "n_tok", 256L, 4)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = Sequencing.packBins(docs, "doc_id", "n_tok", 256L, 4)
      .select("shard", "bin", "n_docs", "tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(agg == direct)
  }

  test("packOffsets: contiguous block-diagonal layout within every bin") {
    val docs = (0L until 200L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tok")
    val rows = Sequencing.packOffsets(docs, "doc_id", "n_tok", 256L, 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    rows.groupBy(r => (r._1, r._2)).foreach { case (bin, ds) =>
      val sorted = ds.sortBy(_._3)
      assert(sorted.head._5 == 0L, s"$bin first doc must start at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._5 == a._5 + a._4,
            s"$bin: doc ${b._3} starts at ${b._5}, expected ${a._5 + a._4}")
        case _ =>
      }
    }
    // totals agree with the pack aggregate
    val ends = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(ds => ds.map(_._4).sum).toMap
    val packed = Sequencing.packBins(docs, "doc_id", "n_tok", 256L, 4)
      .select("shard", "bin", "tokens")
      .as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(ends == packed, "offset ends must sum to the bin token totals")
  }

  test("writeShards' sink plan has exactly one exchange (pre-shuffle feeds window AND sort)") {
    val docs = (0L until 200L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tok")
    val sink = Sequencing.binned(docs, "doc_id", "n_tok", 256L, 4,
        preShuffle = true)
      .sortWithinPartitions(col("bin"), col("doc_id"))
    sink.collect()
    val plan = sink.queryExecution.executedPlan.toString
    val kinds = "Exchange [a-z]+partitioning".r.findAllIn(plan).toSet
    assert(kinds.size <= 1 && plan.contains("Exchange hashpartitioning"),
      s"expected ONE hash exchange, saw $kinds:\n${plan.take(1500)}")
  }

  test("writeShards: one bin-ordered file per shard, layout round-trips") {
    val docs = (0L until 300L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tok")
    val dir = tmpDir("graft-shards")
    Sequencing.writeShards(docs, "doc_id", "n_tok", 256L, 4, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.length == 4, s"expected 4 shard dirs: ${shardDirs.toSeq}")
    shardDirs.foreach { sd =>
      val files = new java.io.File(s"$dir/$sd").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$sd should hold ONE file, got ${files.length}")
    }
    val back = spark.read.parquet(dir)
    // layout contract: within a shard file, rows stream bins in order
    shardDirs.foreach { sd =>
      val bins = spark.read.parquet(s"$dir/$sd").select("bin")
        .as[Long].collect()
      assert(bins.sameElements(bins.sorted), s"$sd rows not bin-ordered")
    }
    // content contract: the materialized layout aggregates to packBins
    val agg = back.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = Sequencing.packBins(docs, "doc_id", "n_tok", 256L, 4)
      .select("shard", "bin", "n_docs", "tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(agg == direct)
  }
}
