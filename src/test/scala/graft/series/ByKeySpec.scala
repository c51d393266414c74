package graft.series

import graft.SparkSpec
import org.apache.spark.sql.Row

class ByKeySpec extends SparkSpec {
  import spark.implicits._

  private val data = (for {
    k <- Seq("a", "b", "c", "dd")
    t <- 0L until 25L
  } yield (k, 24L - t, s"$k-${24 - t}")) // deliberately unsorted input

  test("mapKeys sees each key once with ts-ascending records") {
    val df = scala.util.Random.shuffle(data).toDF("key", "ts", "v")
    val out = ByKey.mapKeys(df, "key", "ts") { (k, rows) =>
      val ts = rows.map(_.getLong(1)).toVector
      assert(ts == ts.sorted, s"key $k not ts-ordered")
      Iterator.single((k, ts.size, ts.headOption.getOrElse(-1L)))
    }.collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 25, 0L), ("b", 25, 0L), ("c", 25, 0L), ("dd", 25, 0L)))
  }

  test("inner iterators can be dropped early (skip-rest-of-key semantics)") {
    val df = data.toDF("key", "ts", "v")
    val out = ByKey.mapKeys(df, "key", "ts") { (k, rows) =>
      Iterator.single(k -> rows.take(2).length) // consume only 2, drop rest
    }.collect().toMap
    assert(out == Map("a" -> 2, "b" -> 2, "c" -> 2, "dd" -> 2))
  }

  test("groupRuns splits consecutive runs lazily") {
    val runs = ByKey.groupRuns(Iterator(1, 1, 2, 3, 3, 3), identity[Int])
      .map { case (k, it) => (k, it.size) }.toVector
    assert(runs == Vector((1, 2), (2, 1), (3, 3)))
  }
}
