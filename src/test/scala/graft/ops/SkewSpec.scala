package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) plus a tail — the shape AQE's partition
  // splitting cannot fix because a single key is indivisible by hash
  private lazy val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
  private lazy val small = (Seq(("hot", "H")) ++
    (1 to 50).map(i => (s"k$i", s"d$i"))).toDF("k", "label")

  test("salted inner join == plain inner join") {
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "label").as[(String, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .select("k", "v", "label").as[(String, Long, String)].collect().sorted
    assert(salted.sameElements(plain) && plain.length == 950)
  }

  test("salted left join == plain left join (unmatched rows kept once)") {
    val plain = big.join(small, Seq("k"), "left")
      .select("k", "v", "label").as[(String, Long, Option[String])]
      .collect().sorted
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8, "left")
      .select("k", "v", "label").as[(String, Long, Option[String])]
      .collect().sorted
    assert(salted.sameElements(plain) && plain.length == 1000)
  }

  test("hot key spreads across salt buckets") {
    val spread = big.filter(col("k") === "hot")
      .withColumn("_salt", pmod(hash(col("k"), col("v")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 4, s"salt should scatter the hot key, got $spread buckets")
  }
}
