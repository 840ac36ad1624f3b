package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric per-vector int8 compression of
  * float embedding columns (the standard memory/IO lever for
  * billion-vector ANN — 4x smaller vectors, SIMD-friendly integer dot
  * products downstream).
  *
  * Scale story (100 TB): quantization is embarrassingly parallel — a
  * narrow per-row transform with no shuffle, running inside whole-stage
  * codegen over the higher-order array functions. A 100 TB float corpus
  * becomes 25 TB of int8 + one double per vector; the dequantized
  * reconstruction error is bounded by scale/2 per element (QuantizeSpec
  * pins the bound). Everything is expressed with built-in array
  * expressions (`transform`/`aggregate`) — no UDF, engine-portable
  * (the x19 oracle recomputes it in DuckDB via list_transform).
  *
  * Reference anchor: the reference stores only opaque payload bytes
  * (/root/reference/lib/hbacker/export.rb:145-169 moves cells, never
  * interprets them); quantization is part of the [EXT] training-data
  * surface layered on the same engine.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization.
    *
    * Adds `q_scale` = max|x| / 127 (double) and `q_vec` =
    * round(x / q_scale) as int (so the domain is [-127, 127] — the
    * asymmetric -128 slot is deliberately unused, keeping negation
    * closed). An all-zero (or empty) vector gets q_scale = 0 and an
    * all-zero q_vec rather than a division by zero.
    *
    * Determinism: max/abs/cast are exact on floats; the one division
    * and the half-away-from-zero round are identical IEEE ops in any
    * engine, so quantized vectors are bit-reproducible cross-engine.
    */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val scale =
      coalesce(array_max(transform(col(vecCol), x => abs(x))).cast("double"),
        lit(0.0)) / lit(127.0)
    df.withColumn("q_scale", scale)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col("q_scale")).cast("int"))))
  }

  /** Reconstruction of an int8-quantized vector back to float space.
    * Element-wise error is at most q_scale / 2 (round-off), which
    * QuantizeSpec asserts against the original vectors.
    */
  def dequantize(qVec: Column, qScale: Column): Column =
    transform(qVec, x => (x.cast("double") * qScale).cast("float"))

  /** Integer dot product of two quantized vectors, rescaled to the
    * original space: (qa·qb) * sa * sb. This is the ANN fast path —
    * the accumulation is exact 64-bit integer arithmetic; only the
    * final two multiplies touch floating point.
    */
  def dotRescaled(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => (x.cast("long") * y.cast("long"))),
      lit(0L), (acc, v) => acc + v).cast("double") * sa * sb
}
