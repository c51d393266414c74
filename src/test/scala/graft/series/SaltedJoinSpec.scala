package graft.series

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    // pathological skew: one key owns 90% of the fact side
    val fact = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"d$i") }.toDF("k", "d")

    val plain = fact.join(dim, Seq("k")).select("k", "v", "d")
    val salted = SeriesOps.saltedJoin(fact, dim, Seq("k"), factor = 8)
      .select("k", "v", "d")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's rows really do land in multiple salt partitions
    val spread = fact.withColumn("_salt", pmod(hash(fact.columns.map(col): _*), lit(8)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(spread > 1, s"hot key not spread (salt partitions: $spread)")
  }

  test("salted left join keeps unmatched rows exactly once") {
    val fact = ((1 to 50).map(i => ("hot", i.toLong)) ++
      (1 to 20).map(i => (s"k$i", i.toLong)) ++
      (1 to 10).map(i => (s"miss$i", i.toLong))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"d$i") }.toDF("k", "d")
    val plain = fact.join(dim, Seq("k"), "left").select("k", "v", "d")
    val salted = SeriesOps.saltedJoin(fact, dim, Seq("k"), 8, "left")
      .select("k", "v", "d")
    assert(salted.count() == 80 && plain.count() == 80)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
