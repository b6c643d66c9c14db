package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ported verbatim from /root/reference/src/tokenizer.rs:376-557 (11 vectors). */
class LexerSpec extends AnyFunSuite {

  private def tok(s: String) = new PdfTokenizer(s.getBytes("ISO-8859-1"), 0)
  private def lem(s: String) =
    Lemmatizer(s.getBytes("ISO-8859-1"), 0, new Ctx(s.getBytes("ISO-8859-1"), XRef.default))

  test("tokenizer comment handling (tokenizer.rs:384-392)") {
    val t = tok("%PDF-1.7\n\n1 0 obj  % entry point")
    assert(t.next() == TComment("PDF-1.7".getBytes))
    assert(t.next() == TNum(NInt(1)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TBare("obj".getBytes))
    assert(t.next() == TComment(" entry point".getBytes))
    assert(t.next() == null)
  }

  test("literal string octal escape replicates reference bug (tokenizer.rs:395-398)") {
    assert(tok("(\\003)").next() == TLit(Array[Byte](3)))
  }

  test("literal string (tokenizer.rs:401-407)") {
    assert(tok("(Hello World)").next() == TLit("Hello World".getBytes))
  }

  test("literal string with embedded parenthesis (tokenizer.rs:410-416)") {
    assert(tok("((Hello) (World))").next() == TLit("(Hello) (World)".getBytes))
  }

  test("hex string (tokenizer.rs:419-428)") {
    assert(tok("<4E6F762073686D6F7A206B6120706F702E>").next() ==
      THex(Array[Byte](78, 111, 118, 32, 115, 104, 109, 111, 122, 32, 107, 97, 32, 112, 111, 112, 46)))
  }

  test("numeric float (tokenizer.rs:431-434)") {
    assert(tok("12.34").next() == TNum(NReal(12.34f)))
  }

  test("mediabox floats (tokenizer.rs:437-446)") {
    val t = tok("/MediaBox [ 0 0 200.00 200.00 ] ")
    assert(t.next() == TName("MediaBox"))
    assert(t.next() == TArrayBegin)
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TNum(NReal(200.0f)))
    assert(t.next() == TNum(NReal(200.0f)))
    assert(t.next() == TArrayEnd)
  }

  test("tokenizer_1 pages object (tokenizer.rs:449-474)") {
    val t = tok("2 0 obj\n<<\n  /Type /Pages\n  /MediaBox [ 0 0 200 200 ]\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj\n")
    assert(t.next() == TNum(NInt(2)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TBare("obj".getBytes))
    assert(t.next() == TDictBegin)
    assert(t.next() == TName("Type"))
    assert(t.next() == TName("Pages"))
    assert(t.next() == TName("MediaBox"))
    assert(t.next() == TArrayBegin)
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TNum(NInt(200)))
    assert(t.next() == TNum(NInt(200)))
    assert(t.next() == TArrayEnd)
    assert(t.next() == TName("Count"))
    assert(t.next() == TNum(NInt(1)))
    assert(t.next() == TName("Kids"))
    assert(t.next() == TArrayBegin)
    assert(t.next() == TNum(NInt(3)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TBare("R".getBytes))
    assert(t.next() == TArrayEnd)
    assert(t.next() == TDictEnd)
    assert(t.next() == TObjEnd)
  }

  test("tokenizer font object (tokenizer.rs:477-501)") {
    val t = tok("9 0 obj\n<</Type/Font/Subtype/TrueType/BaseFont/BAAAAA+DejaVuSans\n/FirstChar 0\n/LastChar 27\n/Widths[600 557 611 411 615 974 317 277 634 520 633 634 277 392 612 317\n549 633 634 591 591 634 634 317 684 277 634 579 ]\n/FontDescriptor 7 0 R\n/ToUnicode 8 0 R\n>>")
    assert(t.next() == TNum(NInt(9)))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TBare("obj".getBytes))
    assert(t.next() == TDictBegin)
    assert(t.next() == TName("Type"))
    assert(t.next() == TName("Font"))
    assert(t.next() == TName("Subtype"))
    assert(t.next() == TName("TrueType"))
    assert(t.next() == TName("BaseFont"))
    assert(t.next() == TName("BAAAAA+DejaVuSans"))
    assert(t.next() == TName("FirstChar"))
    assert(t.next() == TNum(NInt(0)))
    assert(t.next() == TName("LastChar"))
    assert(t.next() == TNum(NInt(27)))
    assert(t.next() == TName("Widths"))
    assert(t.next() == TArrayBegin)
    assert(t.next() == TNum(NInt(600)))
    assert(t.next() == TNum(NInt(557)))
    assert(t.next() == TNum(NInt(611)))
  }

  test("lemmatizer fuses obj header and passes dict through (tokenizer.rs:504-527)") {
    val l = lem("9 0 obj\n<</Type/Font/Subtype/TrueType/BaseFont/BAAAAA+DejaVuSans\n/FirstChar 0\n/LastChar 27\n/Widths[600 557 611 411 615 974 317 277 634 520 633 634 277 392 612 317\n549 633 634 591 591 634 634 317 684 277 634 579 ]\n/FontDescriptor 7 0 R\n/ToUnicode 8 0 R\n>>")
    assert(l.next() == TObjBegin)
    assert(l.next() == TDictBegin)
    assert(l.next() == TName("Type"))
    assert(l.next() == TName("Font"))
    assert(l.next() == TName("Subtype"))
    assert(l.next() == TName("TrueType"))
    assert(l.next() == TName("BaseFont"))
    assert(l.next() == TName("BAAAAA+DejaVuSans"))
    assert(l.next() == TName("FirstChar"))
    assert(l.next() == TNum(NInt(0)))
    assert(l.next() == TName("LastChar"))
    assert(l.next() == TNum(NInt(27)))
    assert(l.next() == TName("Widths"))
    assert(l.next() == TArrayBegin)
    assert(l.next() == TNum(NInt(600)))
    assert(l.next() == TNum(NInt(557)))
    assert(l.next() == TNum(NInt(611)))
  }

  test("lemmatizer fuses indirect ref (tokenizer.rs:530-556)") {
    val l = lem("2 0 obj\n<<\n  /Type /Pages\n  /MediaBox [ 0 0 200 200 ]\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj\n")
    assert(l.next() == TObjBegin)
    assert(l.next() == TDictBegin)
    assert(l.next() == TName("Type"))
    assert(l.next() == TName("Pages"))
    assert(l.next() == TName("MediaBox"))
    assert(l.next() == TArrayBegin)
    assert(l.next() == TNum(NInt(0)))
    assert(l.next() == TNum(NInt(0)))
    assert(l.next() == TNum(NInt(200)))
    assert(l.next() == TNum(NInt(200)))
    assert(l.next() == TArrayEnd)
    assert(l.next() == TName("Count"))
    assert(l.next() == TNum(NInt(1)))
    assert(l.next() == TName("Kids"))
    assert(l.next() == TArrayBegin)
    assert(l.next() == TRef(3, 0))
    assert(l.next() == TArrayEnd)
    assert(l.next() == TDictEnd)
    assert(l.next() == TObjEnd)
  }
}

/** Exception-free numeric-parse parity: the hand-rolled byte-wise parse must
  * accept/reject exactly like the old Integer.parseInt-then-Float.parseFloat
  * fallback (which the reference's i32-then-f32 semantics map to).
  */
class NumericParseSpec extends AnyFunSuite {
  private def tok(s: String) = new PdfTokenizer(s.getBytes("ISO-8859-1"), 0)

  test("ints: signs, leading zeros, Int.MinValue") {
    assert(tok("42 ").next() == TNum(NInt(42)))
    assert(tok("+42 ").next() == TNum(NInt(42)))
    assert(tok("-42 ").next() == TNum(NInt(-42)))
    assert(tok("0000000017 ").next() == TNum(NInt(17)))
    // > 11 raw digits but small value: parseInt accepts unlimited leading zeros
    assert(tok("000000000012345 ").next() == TNum(NInt(12345)))
    assert(tok("-000000000012345 ").next() == TNum(NInt(-12345)))
    assert(tok("00000000000000000000 ").next() == TNum(NInt(0)))
    assert(tok("-2147483648 ").next() == TNum(NInt(Int.MinValue)))
    assert(tok("2147483647 ").next() == TNum(NInt(Int.MaxValue)))
  }

  test("tokenizer construction past the buffer fails strict (tokenizer.rs:169 slice panic)") {
    // The reference slices bytes[curr_idx..] at construction; a negative xref
    // offset wraps through `as usize` (xref.rs:171) and panics there. Our
    // constructor must raise PdfParseException — never a raw AIOOBE from
    // next() later (round-7 40k-mutation find, index 32291: xref-entry
    // newline flipped to '-', offset lexed as -9).
    val bytes = "1 0 obj".getBytes("ISO-8859-1")
    intercept[PdfParseException](new PdfTokenizer(bytes, -9))
    intercept[PdfParseException](new PdfTokenizer(bytes, bytes.length + 1))
    assert(new PdfTokenizer(bytes, bytes.length).next() == null) // == len is the empty slice, legal
  }

  test("i32 overflow falls back to f32 (parseInt-NFE parity)") {
    assert(tok("2147483648 ").next() == TNum(NReal(2147483648f)))
    assert(tok("99999999999999 ").next() == TNum(NReal(99999999999999f)))
    assert(tok("-99999999999999 ").next() == TNum(NReal(-99999999999999f)))
  }

  test("floats: dots and signed fractions") {
    assert(tok("1.5 ").next() == TNum(NReal(1.5f)))
    assert(tok("-.5 ").next() == TNum(NReal(-0.5f)))
    assert(tok("+.5 ").next() == TNum(NReal(0.5f)))
    assert(tok("12. ").next() == TNum(NReal(12f)))
    assert(tok(".25 ").next() == TNum(NReal(0.25f)))
  }

  test("rejects become barewords exactly as before (no exceptions)") {
    assert(tok("R ").next() == TBare("R".getBytes))
    assert(tok("n ").next() == TBare("n".getBytes))
    assert(tok("- ").next() == TBare("-".getBytes))
    assert(tok("+ ").next() == TBare("+".getBytes))
    assert(tok(". ").next() == TBare(".".getBytes))
    assert(tok("-. ").next() == TBare("-.".getBytes))
    assert(tok("R5 ").next() == TBare("R5".getBytes))
    assert(tok("1.2.3 ").next() == TBare("1.2.3".getBytes))
    assert(tok("W* ").next() == TBare("W*".getBytes))
  }
}

/** Ported from /root/reference/src/algebra.rs:150-168 (2 vectors). */
class AlgebraSpec extends AnyFunSuite {
  test("matrix mul identity (algebra.rs:155-160)") {
    val m1 = Mat(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)
    assert(m1 * Mat.identity == m1)
  }
  test("matrix mul (algebra.rs:163-167)") {
    val m1 = Mat(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)
    val m2 = Mat(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)
    assert(m1 * m2 == Mat(7.0f, 10.0f, 15.0f, 22.0f, 28.0f, 40.0f))
  }
  test("number promotion arithmetic (algebra.rs:36-92)") {
    assert((NInt(3) + NInt(4)) == NInt(7))
    assert((NInt(3) * NInt(4)) == NInt(12))
    assert((NInt(3) / NInt(4)) == NReal(0.75f))
    assert((NInt(3) + NReal(0.5f)) == NReal(3.5f))
    assert((-NInt(3)) == NInt(-3))
    assert((-NReal(2.5f)) == NReal(-2.5f))
  }
}
