package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off the portable content hash ([[PortableHash.h60]]),
  * never an RNG: the same row lands in the same sample/split on every
  * engine, every run, every cluster size — the property that makes
  * training sets reproducible and leakage-auditable. (The reference has no
  * sampling; its client-side map-reduce role, sonnerie `README.md:23-25`,
  * is exactly where these run.)
  *
  * Scale: all three operators are embarrassingly parallel single-pass
  * filters/projections over the scan (no shuffle at all for [[hashSample]]
  * and [[assignSplit]]; one per-stratum shuffle for [[stratifiedSample]]'s
  * rank) — they hold unchanged at 100 TB.
  */
object Sampling {

  private val BUCKETS = 1000000L

  /** Bucket in [0, BUCKETS) from the id's decimal string — the unit of
    * all deterministic sampling decisions.
    */
  def hashBucket(id: Column): Column =
    PortableHash.h60(id.cast("string")) % BUCKETS

  def sqlHashBucket(idExpr: String): String =
    s"(${PortableHash.sqlH60(s"CAST($idExpr AS VARCHAR)")} % $BUCKETS)"

  /** Keep ~`rate` of rows, chosen by id hash (0 < rate <= 1). */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit((rate * BUCKETS).toLong))

  def sqlHashSamplePred(idExpr: String, rate: Double): String =
    s"${sqlHashBucket(idExpr)} < ${(rate * BUCKETS).toLong}"

  /** Exactly `k` rows per stratum (fewer if the stratum is smaller),
    * chosen and ordered by id hash — a deterministic stratified sample.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * the A-ES one-pass scheme): each row draws a deterministic uniform
    * u = (h60(id)+1)/2^60 ∈ (0,1] and keeps key ln(u)/w — the k largest
    * keys are a weight-proportional sample, the standard
    * quality-weighted corpus subsampler ([[hashSample]]'s uniform rate
    * can't express "prefer high-quality documents"). Deterministic and
    * engine-portable: the only float ops are one ln, one divide and the
    * 9-dp round guarding the hash compare; ties break on id. The plan
    * is a TakeOrdered — per-partition top-k heaps, no global sort.
    * Zero/negative weights are excluded (their key would be −∞).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (PortableHash.h60(col(idCol).cast("string")) + 1).cast("double") /
      math.pow(2.0, 60)
    df.filter(col(weightCol) > 0)
      .withColumn("_key", round(log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .drop("_key")
  }

  /** DuckDB twin of [[weightedSample]]'s selection predicate — the same
    * ordered-key subquery (adjacent so they cannot drift).
    */
  def sqlWeightedSampleFrom(table: String, idCol: String, wExpr: String,
                            k: Int): String =
    s"""(SELECT * EXCLUDE (_key) FROM (
       |  SELECT *, round(ln((${PortableHash.sqlH60(s"CAST($idCol AS VARCHAR)")} + 1)::DOUBLE
       |                     / pow(2.0, 60)) / CAST($wExpr AS DOUBLE), 9)
       |            AS _key
       |  FROM $table WHERE $wExpr > 0)
       | ORDER BY _key DESC, $idCol LIMIT $k)""".stripMargin

  /** Train/val/test assignment by hash bucket: `[0, pTrain)` → train,
    * `[pTrain, pTrain+pVal)` → val, rest → test.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  pTrain: Double, pVal: Double): DataFrame = {
    val b = hashBucket(col(idCol))
    val tEnd = (pTrain * BUCKETS).toLong
    val vEnd = ((pTrain + pVal) * BUCKETS).toLong
    df.withColumn("split",
      when(b < tEnd, "train").when(b < vEnd, "val").otherwise("test"))
  }

  def sqlAssignSplit(idExpr: String, pTrain: Double, pVal: Double): String = {
    val tEnd = (pTrain * BUCKETS).toLong
    val vEnd = ((pTrain + pVal) * BUCKETS).toLong
    s"""CASE WHEN ${sqlHashBucket(idExpr)} < $tEnd THEN 'train'
       |     WHEN ${sqlHashBucket(idExpr)} < $vEnd THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Corpus mixing by token budget: within each stratum (language,
    * source, domain…), keep documents in hash order until the stratum's
    * cumulative `weightCol` (tokens, chars, bytes) reaches `budget` —
    * the deterministic "N tokens of each language" data-mixing step every
    * pretraining corpus goes through. A document is kept only if it fits
    * the remaining budget entirely.
    *
    * One shuffle (per-stratum window). A pretraining mix has few strata,
    * so a single stratum can dominate; at 100 TB the running sum stays a
    * window (Spark range-partitions the sort), never a driver loop.
    */
  def tokenBudget(df: DataFrame, strataCol: String, idCol: String,
                  weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("_cum", sum(col(weightCol)).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** DuckDB twin of [[tokenBudget]]'s keep-predicate (adjacent so they
    * cannot drift); the windowed sum is CAST to BIGINT per the HUGEINT
    * portability rule.
    */
  def sqlTokenBudgetFrom(table: String, strataCol: String, idCol: String,
                         weightCol: String, budget: Long): String =
    s"""(SELECT * FROM (
       |  SELECT *, CAST(sum($weightCol) OVER (
       |      PARTITION BY $strataCol
       |      ORDER BY ${sqlHashBucket(idCol)}, $idCol
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum
       |  FROM $table)
       | WHERE _cum <= $budget)""".stripMargin

  /** Deterministic global shuffle into training shards — the "shuffle the
    * corpus before training" step: `shard` = id-hash mod nShards, `pos` =
    * the row's position within its shard ordered by (hash, id). The order
    * is a pure function of the ids, so the shuffle is reproducible across
    * engines, runs, and cluster sizes, and any contiguous slice of a
    * shard is an unbiased corpus sample (documents that were adjacent in
    * the source are scattered by the hash).
    *
    * Scale: the assignment is a map-only projection; `pos` is one
    * per-shard window whose parallelism equals nShards — size nShards to
    * the output file count (hundreds+ at 100 TB), and the physical write
    * is `repartition(shard) + sortWithinPartitions(hash, id)`, the same
    * exchange the window already did.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("shard", (hashBucket(col(idCol)) % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** DuckDB twin of [[shuffleShards]] (adjacent so they cannot drift). */
  def sqlShuffleShardsFrom(table: String, idCol: String,
                           nShards: Int): String =
    s"""(SELECT *,
       |  CAST(row_number() OVER (
       |      PARTITION BY ${sqlHashBucket(idCol)} % $nShards
       |      ORDER BY ${sqlHashBucket(idCol)}, $idCol) AS BIGINT) AS pos,
       |  CAST(${sqlHashBucket(idCol)} % $nShards AS BIGINT) AS shard
       | FROM $table)""".stripMargin
}
