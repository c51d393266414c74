package graft.series

import graft.SparkSpec

/** Model-based combinatorial delete test — the Spark re-expression of the
  * reference's 80-case macro matrix (`configurable_delete_test`,
  * `src/tests.rs:1159-1302`): 5 wildcard shapes × 2^4 bound presences; every
  * surviving record must violate the marker's predicate and every suppressed
  * record must satisfy it, against an independent in-memory model.
  */
class DeleteMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val keys =
    Seq("alpha", "apple", "axe", "banana", "beta", "cat", "data", "delta")
  private val records: Seq[(String, Long, Long, Long)] = // key, ts, txid, v
    for {
      (k, i) <- keys.zipWithIndex
      t <- 0L until 9L
    } yield (k, t, (i + t) % 3, i * 100L + t)

  private val wildcards = Seq("%", "a%", "%a%", "%a", "a%a")
  // bounds at ~1/3 and ~2/3 of the key/time domains (reference picks
  // quantiles of the data the same way, src/tests.rs:1168-1190)
  private val kLo = "axe"
  private val kHi = "cat"
  private val tLo = 3L
  private val tHi = 6L
  private val dTxid = 2L

  private def likeMatch(pattern: String, s: String): Boolean = {
    val rx = pattern.flatMap {
      case '%' => ".*"
      case c   => java.util.regex.Pattern.quote(c.toString)
    }
    s.matches(rx)
  }

  test("80-case delete matrix matches the model") {
    val df = records.toDF("key", "ts", "txid", "v")
    for {
      w <- wildcards
      useFk <- Seq(false, true)
      useLk <- Seq(false, true)
      useT0 <- Seq(false, true)
      useT1 <- Seq(false, true)
    } {
      val fk = if (useFk) kLo else ""
      val lk = if (useLk) kHi else ""
      val t0 = if (useT0) tLo else 0L
      val t1 = if (useT1) tHi else Long.MaxValue
      val deletes =
        Seq((fk, lk, t0, t1, w, dTxid)).toDF("firstKey", "lastKey", "t0", "t1", "wildcard", "txid")

      val survivors = SeriesOps
        .applyDeletes(df, deletes)
        .select("key", "ts", "txid", "v")
        .as[(String, Long, Long, Long)]
        .collect()
        .toSet

      def model(k: String, t: Long, tx: Long): Boolean = // true = suppressed
        tx < dTxid &&
          k >= fk && (lk.isEmpty || k < lk) &&
          t >= t0 && t < t1 &&
          likeMatch(w, k)

      val expected = records.filterNot { case (k, t, tx, _) => model(k, t, tx) }.toSet
      assert(survivors == expected,
        s"case wildcard=$w fk=$fk lk=$lk t0=$t0 t1=$t1")
    }
  }
}
