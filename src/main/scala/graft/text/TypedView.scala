package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed flat projection of canonical union-struct series data — the
  * reference's typed read API (`FromRecord`, sonnerie
  * `src/records.rs:456-588`): when a series's format is fixed (or widenable
  * to a requested format), expose `vals` as ordinary typed columns
  * `c1..cn`; fail loudly on incompatible/mixed series exactly as the
  * reference's per-class checks do (`src/records.rs:74-114`).
  *
  * Widening is same-class only: `i`→`I`, `u`→`U`, `f`→`F` (and identity);
  * never cross-class, never narrowing.
  */
object TypedView {

  /** Format codes each target code accepts (ref `FromRecord` impls). */
  private val accepts: Map[Char, Set[Char]] = Map(
    'i' -> Set('i'), 'I' -> Set('i', 'I'),
    'u' -> Set('u'), 'U' -> Set('u', 'U'),
    'f' -> Set('f'), 'F' -> Set('f', 'F'),
    's' -> Set('s'), 'B' -> Set('B')
  )

  def compatible(dataFmt: String, targetFmt: String): Boolean =
    dataFmt.length == targetFmt.length &&
      dataFmt.zip(targetFmt).forall { case (d, t) => accepts(t).contains(d) }

  /** Column extractor for one value cell under a target code, widening the
    * stored branch where allowed.
    */
  private def cell(vals: Column, i: Int, code: Char): Column = {
    val c = element_at(vals, i + 1)
    code match {
      case 'i' => c.getField("i32")
      case 'I' => coalesce(c.getField("i64"), c.getField("i32").cast("long"))
      case 'u' => c.getField("u32")
      case 'U' => coalesce(c.getField("u64"),
        c.getField("u32").cast("decimal(20,0)"))
      case 'f' => c.getField("f32")
      case 'F' => coalesce(c.getField("f64"), c.getField("f32").cast("double"))
      case 's' => c.getField("str")
      case 'B' => c.getField("bytes")
      case x   => throw new IllegalArgumentException(s"unknown code '$x'")
    }
  }

  /** Project canonical `(key, ts, fmt, vals)` rows to
    * `(key, ts, c1, …, cn)` under `targetFmt`. Validates eagerly that every
    * record's stored format is acceptable (one small aggregation over the
    * distinct formats — cheap: format strings are low-cardinality), and
    * throws [[IncompatibleFormat]] naming the offending format otherwise.
    */
  def flat(df: DataFrame, targetFmt: String): DataFrame = {
    RowCodec.validate(targetFmt)
    val fmts = df.select(col("fmt")).distinct()
      .collect().map(_.getString(0))
    fmts.find(!compatible(_, targetFmt)).foreach { bad =>
      throw new IncompatibleFormat(
        s"series contains format '$bad' not readable as '$targetFmt'")
    }
    val cells = targetFmt.zipWithIndex.map { case (code, i) =>
      cell(col("vals"), i, code).as(s"c${i + 1}")
    }
    df.select(col("key") +: col("ts") +: cells: _*)
  }

  final class IncompatibleFormat(msg: String) extends RuntimeException(msg)
}
