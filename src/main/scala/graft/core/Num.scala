package graft.core

/** Parse failure carrying the reference's panic semantics.
  * The reference (pdfrust) aborts the process on malformed input (269 panic!/unwrap
  * sites); a 10^12-row Spark job must not, so every such site throws this single
  * exception type, caught per row into the `error` output column by the pipeline.
  */
final class PdfParseException(msg: String) extends RuntimeException(msg)

object Err {
  def fail(msg: String): Nothing = throw new PdfParseException(msg)
}

/** PDF numeric: Integer(i32) | Real(f32), with the reference's promotion arithmetic.
  * Ref: /root/reference/src/algebra.rs:3-92. The f32 (Float, not Double) semantics are
  * load-bearing: newline inference compares f32 text-matrix ty values (content.rs:747).
  */
sealed trait Num {
  def toF: Float = this match {
    case NInt(i)  => i.toFloat
    case NReal(f) => f
  }
  def toI: Int = this match {
    case NInt(i)  => i
    case NReal(f) => f.toInt
  }
  /** Rust `usize::from(Number)` — algebra.rs:27-34. */
  def toSize: Int = toI

  def +(rhs: Num): Num = (this, rhs) match {
    case (NInt(a), NInt(b))   => NInt(a + b)
    case (a, b)               => NReal(a.toF + b.toF)
  }
  def *(rhs: Num): Num = (this, rhs) match {
    case (NInt(a), NInt(b))   => NInt(a * b)
    case (a, b)               => NReal(a.toF * b.toF)
  }
  /** Division always yields Real — algebra.rs:36-50. */
  def /(rhs: Num): Num = NReal(this.toF / rhs.toF)
  def unary_- : Num = this match {
    case NInt(i)  => NInt(-i)
    case NReal(f) => NReal(-f)
  }
}
final case class NInt(v: Int) extends Num
final case class NReal(v: Float) extends Num

/** 2x3 affine matrix (a,b,c,d,e,f), f32 throughout — algebra.rs:94-148. */
final case class Mat(a: Float, b: Float, c: Float, d: Float, e: Float, f: Float) {
  def ty: Float = f
  /** Row-vector convention multiply — algebra.rs:136-148. */
  def *(r: Mat): Mat = Mat(
    a * r.a + b * r.c,
    a * r.b + b * r.d,
    c * r.a + d * r.c,
    c * r.b + d * r.d,
    e * r.a + f * r.c + r.e,
    e * r.b + f * r.d + r.f
  )
  /** Rust `Display` ("({}, {}, ...)" with f32 Display) — algebra.rs:97-105. */
  def display: String =
    s"(${RustFmt.f32(a)}, ${RustFmt.f32(b)}, ${RustFmt.f32(c)}, ${RustFmt.f32(d)}, ${RustFmt.f32(e)}, ${RustFmt.f32(f)})"
}
object Mat {
  val identity: Mat = Mat(1.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f)
  def of(ns: Array[Num]): Mat =
    Mat(ns(0).toF, ns(1).toF, ns(2).toF, ns(3).toF, ns(4).toF, ns(5).toF)
}

/** Rust value formatting for the Chars/Font diagnostic modes. Round 6: no
  * longer an approximation — `f32` implements Rust `{}` f32 Display exactly
  * (verified byte-identical against the reference binary's --chars output on
  * all five fixtures, 5.2 MB / ~300k formatted matrices): the SHORTEST
  * decimal that round-trips to the same f32, correctly rounded from the exact
  * binary value with ties AWAY FROM ZERO (JDK 17's Float.toString breaks the
  * same ties to even — 215.890625f prints "215.89063" in Rust, "215.89062"
  * in Java — which is why Float.toString could never golden), rendered in
  * plain positional notation (Rust {} never uses an exponent), integers bare
  * with no ".0", and -0.0 as "-0".
  */
object RustFmt {
  def f32(v: Float): String = {
    if (v.isNaN) return "NaN"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    if (v == 0.0f) return if (1.0f / v < 0) "-0" else "0"
    if (v == v.toLong.toFloat && math.abs(v) < 1e16f) return v.toLong.toString
    val exact = new java.math.BigDecimal(v.toDouble) // float widens to double exactly
    var k = 1
    while (k <= 12) {
      val cand = exact.round(new java.math.MathContext(k, java.math.RoundingMode.HALF_UP))
      if (cand.floatValue() == v) return cand.toPlainString
      k += 1
    }
    exact.toPlainString
  }
}
