package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/bandwidth at scale: symmetric
  * int8 quantization per vector (scale = max|x| / 127). 4× smaller than
  * float32 on disk and over the shuffle wire; approximate cosine on
  * quantized vectors stays within ~1% for typical embeddings, and the
  * per-vector scale column lets exact-magnitude consumers dequantize.
  * All pure Column expressions (HOF lambdas reference only their own
  * variables — see the staging rule in Dedup). */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127 (0-vectors → scale 0). */
  def int8Scale(v: Column): Column =
    aggregate(v.cast("array<double>"), lit(0.0),
      (acc, x) => greatest(acc, abs(x))) / lit(127.0)

  /** Quantize to array<tinyint> given the precomputed scale ATTRIBUTE.
    * Rounding is written out explicitly (half away from zero via floor)
    * rather than via `round()` — engines disagree on double round-half
    * ties, and the explicit formula is reproducible in the oracle. */
  def toInt8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v.cast("array<double>"), _ => lit(0).cast("byte")))
      .otherwise(transform(v.cast("array<double>"),
        x => when(x >= 0, floor(x / scale + 0.5))
          .otherwise(-floor(-(x / scale) + 0.5)).cast("byte")))

  /** Dequantize back to array<double>. */
  def fromInt8(q: Column, scale: Column): Column =
    transform(q, b => b.cast("double") * scale)

  /** Dot product of two quantized vectors in integer arithmetic,
    * rescaled: (Σ qa·qb) · sa · sb. */
  def dotInt8(qa: Column, qb: Column, sa: Column, sb: Column): Column =
    aggregate(zip_with(qa, qb, (a, b) => a.cast("int") * b.cast("int")),
      lit(0), (acc, v) => acc + v).cast("double") * sa * sb
}
