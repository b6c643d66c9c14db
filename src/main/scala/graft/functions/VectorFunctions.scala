package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns as PURE COLUMN
  * EXPRESSIONS (`zip_with` / `aggregate` / `transform` higher-order
  * functions) — whole-stage-codegen'd, no UDF, no serialization round-trip.
  * This is the scoring-pipeline hot path at 100TB: a cosine against a fixed
  * centroid or a norm filter runs inside the scan's codegen stage, fuses with
  * pushed filters, and never leaves Tungsten rows. The Scala-side twins
  * (`operators/Similarity.cosine`) remain for driver-side/per-partition
  * algorithmic code (k-means, heaps); spec-gated agreement keeps them in
  * lockstep.
  */
object VectorFunctions {

  /** Dot product — left-fold in DOUBLE over the zipped pair (float operands
    * are upcast per element, so precision matches the Scala twin's loop).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with the zero-vector guard of the Scala twin. */
  def cosineSim(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Euclidean (L2) distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Unit-normalize (zero vectors pass through unchanged). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  /** Component count above a threshold — an INTEGER metric (exactly
    * reproducible in any engine, per the repo's oracle discipline).
    */
  def nAbove(a: Column, threshold: Double): Column =
    size(filter(a, x => x > threshold))

  // --- int8 quantization (the 100TB shuffle lever: 4x fewer bytes than
  //     float32 for every embedding that moves through a join or index) ----

  /** Per-vector symmetric scale: absmax/127 (0.0 for the all-zero vector). */
  def int8Scale(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double")))) / 127.0

  /** Symmetric int8 quantization against `scale`: round(x/scale) clamped to
    * [-127, 127] (array<int> carrying int8-range values — Tungsten stores
    * them compactly, and integer arithmetic downstream is EXACT, so every
    * derived metric is engine-reproducible bit-for-bit; rounding is
    * half-away-from-zero in both Spark and DuckDB). The all-zero vector
    * (scale 0) quantizes to zeros instead of dividing by zero.
    *
    * PROJECT THE SCALE FIRST: pass `scale` as a materialized column
    * (`.select(..., int8Scale($"v").as("sc"))` then reference `$"sc"`), not
    * the `int8Scale(...)` expression inline — higher-order-function lambda
    * bodies evaluate per ELEMENT with no common-subexpression elimination, so
    * an inline O(d) scale subtree turns the quantization O(d^2) per row.
    */
  def quantizeInt8(a: Column, scale: Column): Column =
    when(scale === 0.0, transform(a, _ => lit(0)))
      .otherwise(transform(a, x =>
        greatest(lit(-127.0), least(lit(127.0), round(x.cast("double") / scale)))
          .cast("int")))

  /** Reconstruction: q * scale back to float. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** EXACT integer dot product of two quantized vectors — the ANN scoring
    * primitive after quantization (rescale with scaleA*scaleB outside).
    */
  def dotInt8(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)
}
