package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout clustering (Z-order) for the export
  * destination — the data-skipping lever the flat per-table layout
  * leaves on the table.
  *
  * Problem at 100 TB: parquet row-group pruning works off per-file
  * min/max stats, so it only prunes on columns the layout is sorted
  * by. A linear sort on (a, b) prunes a perfectly and b not at all —
  * the b-ranges of every file span the whole domain. Z-ordering maps
  * each row to a point on a space-filling curve that interleaves the
  * bits of per-column RANK BUCKETS, so files cover small
  * hyper-rectangles of the combined domain and a selective predicate
  * on ANY clustered column overlaps only ~N^((k-1)/k) of N files
  * instead of all of them.
  *
  * Scale shape: one pass computes per-column approximate quantile
  * boundaries (a fixed few-KB aggregate, merged map-side); bucketing
  * each value against the broadcast boundary array is a narrow,
  * codegen'd higher-order-function expression; the only shuffle is
  * the final `repartitionByRange` on the z-value — exactly the
  * exchange any re-layout must pay. Quantile (not min/max-uniform)
  * buckets make the curve skew-resistant: each bucket holds ~1/B of
  * the rows regardless of value distribution.
  */
object Layout {

  /** Append a z-value column (named `out`) interleaving `bits` bits
    * per column of the quantile-bucket ranks of `cols`. k·bits must
    * fit a long. Fails loudly if `out` already exists — silently
    * overwriting a user column is how data disappears.
    *
    * Degenerate inputs stay total: an empty frame and an all-null
    * column both have no rank order to interleave, so their buckets
    * are all 0 (one curve cell) — the layout is a no-op, not a crash.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
             out: String = "zorder"): DataFrame = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits > 63")
    require(!df.columns.contains(out),
      s"zValue output column '$out' already exists in the input — " +
        "pass a different `out` name")
    // non-numeric columns would cast('double') to all-null, null every
    // z-value, and collapse repartitionByRange into ONE partition —
    // silent layout destruction. Fail loudly instead.
    cols.foreach { c =>
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case _: NumericType | TimestampType | TimestampNTZType => ()
        case other => throw new IllegalArgumentException(
          s"zValue column '$c' is $other — only numeric/timestamp " +
            "columns have a meaningful rank order to interleave " +
            "(cast dates/strings to a numeric rank first)")
      }
    }
    val buckets = 1 << bits
    // one aggregate row: quantile boundaries for every column at once
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val boundaryRow = df.select(cols.map(c =>
      percentile_approx(col(c).cast("double"), typedLit(qs), lit(10000))
        .as(c)): _*).take(1).headOption
    val bucketOf: Map[String, Column] = cols.zipWithIndex.map {
      case (c, i) =>
        // empty input → no row; all-null column → null boundary array.
        // Either way there is nothing to rank against: bucket 0.
        val bs = boundaryRow.flatMap(r => Option(r.getSeq[Double](i)))
        c -> (bs match {
          case None => lit(0)
          // rank bucket = #boundaries <= v; literal array keeps the
          // comparison inside codegen (no UDF, no join)
          case Some(b0) => aggregate(typedLit(b0),
            lit(0),
            (acc, b) =>
              acc + when(col(c).cast("double") >= b, 1).otherwise(0))
        })
    }.toMap
    // interleave: z bit (j·k + c) = bit j of column c's bucket —
    // column 0 owns the most-significant position of each bit group
    val k = cols.size
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, ci)) =>
        val bit = shiftright(bucketOf(c).cast("long"), j).bitwiseAND(lit(1L))
        a.bitwiseOR(shiftleft(bit, j * k + (k - 1 - ci)))
      }
    }
    df.withColumn(out, z)
  }

  /** Re-layout `df` into `numFiles` z-ordered files: range-partition
    * on the z-value (each output file covers one contiguous curve
    * segment = one small hyper-rectangle per file), sort within, drop
    * the helper column. The helper uses a reserved internal name, so
    * an input that itself has a `zorder` column passes through intact.
    * Compose with Exporter/Compactor writes.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 8): DataFrame = {
    val zc = "__graft_zorder"
    zValue(df, cols, bits, out = zc)
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
