package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence preparation for training pipelines: fixed-size token chunking
  * with overlap, deterministic context-window packing, and source-mixture
  * reweighting. (The reference engine stops at retrieval; these are the
  * steps between a cleaned corpus and a training batch, the same role as
  * its client-side map-reduce, sonnerie `README.md:23-25`.)
  *
  * Scale notes per operator are on the methods; none of them ever builds a
  * global structure — chunking is a scan-speed explode, packing is a
  * per-shard window (shard count sets the parallelism floor), mixing is
  * one tiny aggregation.
  */
object Sequencing {

  /** Split each document into fixed-`size`-token chunks overlapping by
    * `overlap` tokens (stride = size − overlap) — the sliding-window
    * sequence prep for long documents. Pure scan + explode: no shuffle,
    * output rows = Σ ceil((n_tokens − overlap) / stride), so it holds
    * unchanged at 100 TB.
    *
    * Chunk count: `max(1, ceil((n_tokens − overlap) / stride))`; the last
    * chunk may be short (`chunk_tokens < size`). Tokens are the same
    * whitespace tokens as [[TextAnalysis.tokenCount]].
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val stride = size - overlap
    // ceil((nt - overlap) / stride) via exact double floor: token counts
    // are far below 2^53, so both engines floor the same double
    val nt = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val nChunks = greatest(lit(1L),
      floor((nt - overlap + (stride - 1)).cast("double") / lit(stride.toDouble))
        .cast("long"))
    df.select(col(idCol), nt.as("_nt"), nChunks.as("_nc"))
      .select(col(idCol), col("_nt"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(size.toLong), col("_nt") - col("chunk_id") * stride)
          .as("chunk_tokens"))
  }

  /** DuckDB twin of [[chunk]] (adjacent so they cannot drift). */
  def sqlChunkFrom(table: String, idCol: String, textCol: String,
                   size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""(SELECT $idCol, chunk_id, chunk_id * $stride AS start_tok,
       |        least($size, nt - chunk_id * $stride) AS chunk_tokens
       | FROM (
       |   SELECT $idCol, nt,
       |          unnest(range(greatest(1, CAST(floor(
       |            CAST(nt - $overlap + ${stride - 1} AS DOUBLE) / $stride)
       |            AS BIGINT)))) AS chunk_id
       |   FROM (SELECT $idCol,
       |                CAST(len(string_split($textCol, ' ')) AS BIGINT) AS nt
       |         FROM $table)))""".stripMargin
  }

  /** The one shared binning computation: shard hash + per-shard
    * cumulative-token window + bin formula. `preShuffle` pins the
    * window's exchange to exactly `shards` partitions (hash on the shard
    * column), which the window and everything after it then reuse -- the
    * single-exchange shape the sink wants; without it the window takes
    * the default shuffle width (right for the slim aggregate path).
    */
  private[ops] def binned(df: DataFrame, idCol: String, tokCol: String,
                     window: Long, shards: Int,
                     preShuffle: Boolean): DataFrame = {
    val withShard = df.withColumn("shard",
      Sampling.hashBucket(col(idCol)) % shards)
    val base =
      if (preShuffle) withShard.repartition(shards, col("shard"))
      else withShard
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("_cum", sum(col(tokCol).cast("long")).over(w))
      .withColumn("bin",
        floor((col("_cum") - col(tokCol).cast("long")).cast("double")
          / lit(window.toDouble)).cast("long"))
      .drop("_cum")
  }

  /** Deterministic context-window packing: documents are sharded by id
    * hash (so the layout is reproducible and the sort is per-shard, never
    * global), ordered by id within the shard, and cut into bins of
    * `window` tokens by cumulative token count — the offline analogue of
    * sequence packing for pretraining batches. A document straddling a
    * boundary starts the next bin's count (bin = floor((cum − tok) /
    * window): the bin a document *starts* in).
    *
    * Returns per-bin stats `(shard, bin, n_docs, tokens, fill)`. One
    * shuffle (the per-shard window); shards bound both skew and the
    * running-sum reorder domain, so parallelism = `shards` regardless of
    * corpus size — size `shards` to the cluster, not the data.
    */
  def packBins(df: DataFrame, idCol: String, tokCol: String,
               window: Long, shards: Int): DataFrame =
    // slim projection first: only (id, tok) ride the window shuffle
    binned(df.select(col(idCol), col(tokCol)), idCol, tokCol, window,
        shards, preShuffle = false)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol).cast("long")).as("tokens"))
      .withColumn("fill",
        round(col("tokens").cast("double") / lit(window.toDouble), 6))

  /** Per-document bin assignment -- the relation [[packBins]] aggregates,
    * exposed so a sink can materialize the layout. Passthrough columns
    * survive; adds (shard, bin).
    */
  def assignBins(df: DataFrame, idCol: String, tokCol: String,
                 window: Long, shards: Int): DataFrame =
    binned(df, idCol, tokCol, window, shards, preShuffle = false)

  /** Per-document intra-bin token offsets — the block-diagonal-attention
    * metadata a trainer needs when several documents pack into one
    * context window: within (shard, bin) in id order, `tok_start` is the
    * cumulative token count of the preceding documents (and
    * `tok_start + n_tok` the exclusive end). One additional window over
    * the already-clustered binned relation — (shard, bin) refines the
    * pack window's own `shard` clustering, so no new shuffle shape is
    * introduced at scale.
    */
  def packOffsets(df: DataFrame, idCol: String, tokCol: String,
                  window: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy("shard", "bin").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    assignBins(df.select(col(idCol), col(tokCol)), idCol, tokCol,
        window, shards)
      .withColumn("tok_start",
        coalesce(sum(col(tokCol).cast("long")).over(w), lit(0L)))
      .select(col("shard"), col("bin"), col(idCol).as("doc_id"),
        col(tokCol).cast("long").as("n_tok"), col("tok_start"))
      .orderBy("shard", "bin", "doc_id")
  }

  /** Materialize packed training shards: one parquet file per shard under
    * `dir/shard=N/`, rows sorted by (bin, id) inside the file so a
    * trainer streams bins in order without any read-side sort. The write
    * plan is ONE hash exchange into exactly `shards` partitions -- the
    * pre-shuffle satisfies the window's clustering requirement, so the
    * window and the partition-local sort both run on that same exchange
    * (SequencingSpec pins it). Shards are sized to the cluster, so this
    * is the parallelism floor, not a bottleneck; at 100 TB raise
    * `shards`, not the per-shard file count -- the layout contract
    * (bin-ordered rows within a shard) is what downstream loaders
    * depend on.
    */
  def writeShards(df: DataFrame, idCol: String, tokCol: String,
                  window: Long, shards: Int, dir: String): Unit =
    // the leading `shard` column makes the partition-local sort SATISFY
    // the ordering partitionBy() requires — without it Spark inserts its
    // own [shard]-only sort above this one, and SortExec is not
    // stability-guaranteed once a partition spills to multiple runs: the
    // merge would interleave equal-shard rows and break the bin-ordered
    // file contract exactly at the scale it exists for
    binned(df, idCol, tokCol, window, shards, preShuffle = true)
      .sortWithinPartitions(col("shard"), col("bin"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** DuckDB twin of [[packBins]] (adjacent so they cannot drift). */
  /** The per-document binned relation as a DuckDB derived table:
    * ($idCol, shard, tok, bin) — shared by the pack aggregate and the
    * offsets twin so the bin math cannot drift between them.
    */
  def sqlBinnedFrom(table: String, idCol: String, tokExpr: String,
                    window: Long, shards: Int): String =
    s"""(SELECT $idCol, shard, tok,
       |        CAST(floor(CAST(cum - tok AS DOUBLE) / $window) AS BIGINT)
       |          AS bin
       | FROM (
       |   SELECT $idCol, tok, shard,
       |          CAST(sum(tok) OVER (PARTITION BY shard ORDER BY $idCol
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |   FROM (SELECT $idCol, CAST($tokExpr AS BIGINT) AS tok,
       |                (${Sampling.sqlHashBucket(idCol)}) % $shards AS shard
       |         FROM $table)))""".stripMargin

  def sqlPackBinsFrom(table: String, idCol: String, tokExpr: String,
                      window: Long, shards: Int): String =
    s"""(SELECT shard, bin, count(*) AS n_docs,
       |        CAST(sum(tok) AS BIGINT) AS tokens,
       |        round(CAST(sum(tok) AS DOUBLE) / $window, 6) AS fill
       | FROM ${sqlBinnedFrom(table, idCol, tokExpr, window, shards)}
       | GROUP BY shard, bin)""".stripMargin

  /** DuckDB twin of [[packOffsets]] (adjacent so they cannot drift). */
  def sqlPackOffsetsFrom(table: String, idCol: String, tokExpr: String,
                         window: Long, shards: Int): String =
    s"""SELECT shard, bin, $idCol AS doc_id, tok AS n_tok,
       |       CAST(COALESCE(sum(tok) OVER (PARTITION BY shard, bin
       |         ORDER BY $idCol
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         AS BIGINT) AS tok_start
       |FROM ${sqlBinnedFrom(table, idCol, tokExpr, window, shards)}
       |ORDER BY shard, bin, doc_id""".stripMargin

  /** Source-mixture reweighting: per-source document/token totals plus the
    * sampling weight that would flatten the mixture to uniform across
    * sources (`weight s = (total_tokens / n_sources) / tokens_s` — > 1
    * upsample, < 1 downsample). The universal knob of corpus assembly
    * ("how much of each domain"). One tiny aggregation (rows = number of
    * sources) joined back as a broadcast scalar; nothing here grows with
    * corpus size except the first scan.
    */
  def sourceMix(df: DataFrame, srcCol: String, tokCol: String): DataFrame = {
    val g = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol).cast("long")).as("tokens"))
    // the global totals come from a window over the GROUPED result — only
    // #sources rows land in the single partition, and the corpus is
    // scanned once (a second agg subtree would scan it twice)
    val w = Window.partitionBy()
    // zero/NULL token total → NULL weight (identical CASE on both sides):
    // a bare division would give Infinity in Spark but engine-dependent
    // output in DuckDB, breaking the hash-exact contract on such data
    g.withColumn("weight",
        when(coalesce(col("tokens"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(round((sum(col("tokens")).over(w).cast("double") /
            count(lit(1)).over(w)) / col("tokens").cast("double"), 6)))
  }

  /** Temperature-scaled source sampling probabilities: p_temp ∝ tokens^α
    * (exponentiated smoothing, the multilingual/data-recipe standard —
    * α<1 upsamples small sources, α=1 is proportional, α=0 uniform).
    * Output per source: (source, n_docs, tokens, p_raw, p_temp), both
    * probabilities rounded to 6dp. The powered mass is micro-quantized to
    * int64 at the #sources-row grouped table before the normalizing sum
    * (exact, order-independent — the same device as [[Selection]]'s
    * log-sums), so the only cross-engine float op is `pow` itself on
    * identical integer inputs. Same scale shape as [[sourceMix]]: one
    * corpus scan, then window totals over #sources rows.
    */
  def sourceMixTemperature(df: DataFrame, srcCol: String, tokCol: String,
                           alpha: Double): DataFrame = {
    val g = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol).cast("long")).as("tokens"))
    val w = Window.partitionBy()
    val li = round(pow(col("tokens").cast("double"), alpha) * 1000000d, 0)
      .cast("long")
    g.withColumn("_li",
        when(coalesce(col("tokens"), lit(0L)) <= 0L, lit(0L)).otherwise(li))
      .withColumn("p_raw",
        when(coalesce(sum(col("tokens")).over(w), lit(0L)) === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("tokens").cast("double") /
            sum(col("tokens")).over(w).cast("double"), 6)))
      .withColumn("p_temp",
        when(sum(col("_li")).over(w) === 0L, lit(null).cast("double"))
          .otherwise(round(col("_li").cast("double") /
            sum(col("_li")).over(w).cast("double"), 6)))
      .drop("_li")
  }

  /** DuckDB twin of [[sourceMixTemperature]] (adjacent so they cannot
    * drift).
    */
  def sqlSourceMixTemperatureFrom(table: String, srcCol: String,
                                  tokExpr: String, alpha: Double): String =
    s"""(SELECT source, n_docs, tokens,
       |        CASE WHEN COALESCE(tot, 0) = 0 THEN NULL
       |             ELSE round(CAST(tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6)
       |        END AS p_raw,
       |        CASE WHEN ltot = 0 THEN NULL
       |             ELSE round(CAST(li AS DOUBLE) / CAST(ltot AS DOUBLE), 6)
       |        END AS p_temp
       | FROM (SELECT source, n_docs, tokens, li,
       |              CAST(sum(tokens) OVER () AS BIGINT) AS tot,
       |              CAST(sum(li) OVER () AS BIGINT) AS ltot
       |       FROM (SELECT source, n_docs, tokens,
       |                    CASE WHEN COALESCE(tokens, 0) <= 0 THEN 0
       |                         ELSE CAST(round(pow(CAST(tokens AS DOUBLE),
       |                                              $alpha) * 1000000.0, 0)
       |                                   AS BIGINT) END AS li
       |             FROM (SELECT $srcCol AS source, count(*) AS n_docs,
       |                          CAST(sum($tokExpr) AS BIGINT) AS tokens
       |                   FROM $table GROUP BY $srcCol) g) p) q)""".stripMargin

  /** DuckDB twin of [[sourceMix]] (adjacent so they cannot drift). */
  def sqlSourceMixFrom(table: String, srcCol: String, tokExpr: String): String =
    s"""(SELECT source, n_docs, tokens,
       |        CASE WHEN COALESCE(tokens, 0) = 0 THEN NULL
       |             ELSE round((CAST(tot AS DOUBLE) / ns)
       |                        / CAST(tokens AS DOUBLE), 6) END
       |          AS weight
       | FROM (SELECT $srcCol AS source, count(*) AS n_docs,
       |              CAST(sum($tokExpr) AS BIGINT) AS tokens
       |       FROM $table GROUP BY $srcCol) g
       | CROSS JOIN (SELECT count(*) AS ns, CAST(sum(t) AS BIGINT) AS tot
       |             FROM (SELECT CAST(sum($tokExpr) AS BIGINT) AS t
       |                   FROM $table GROUP BY $srcCol)) s)""".stripMargin
}
