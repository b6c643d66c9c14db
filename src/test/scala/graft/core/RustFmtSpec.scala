package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bit-for-bit validation of the Rust Debug formatters against ground truth
  * GENERATED FROM THE RUST STANDARD LIBRARY itself (round 6): /tmp rustc
  * programs dumped `format!("{:?}", c)` for every non-surrogate BMP
  * codepoint (char form) and `format!("{:?}", format!("x{}", c))` (str
  * form); the committed .tsv.gz test resources are those dumps, and the
  * 8KB runtime bitmaps under main/resources were derived from them. This
  * spec closes the loop: every BMP codepoint's output must match Rust
  * exactly — categories a hand rule misses (grapheme extend, unassigned,
  * private use, NBSP, U+2028/9) included.
  */
class RustFmtSpec extends AnyFunSuite {

  private def lines(resource: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(resource)
    assert(in != null, s"missing $resource")
    val gz = new java.util.zip.GZIPInputStream(in)
    scala.io.Source.fromInputStream(gz, "UTF-8").getLines()
  }

  test("rustCharDebug matches Rust char {:?} on every non-surrogate BMP codepoint") {
    var n = 0
    lines("/escdbg.tsv.gz").foreach { line =>
      val Array(cpS, expected) = line.split("\t", 2)
      val c = cpS.toInt.toChar
      assert(TextAssembly.rustCharDebug(c) == expected,
        f"U+${cpS.toInt}%04X: ours=${TextAssembly.rustCharDebug(c)} rust=$expected")
      n += 1
    }
    assert(n == 63488, s"expected full BMP minus surrogates, saw $n")
  }

  test("rustStrDebug matches Rust str {:?} on every non-surrogate BMP codepoint") {
    var n = 0
    lines("/escstr.tsv.gz").foreach { line =>
      val Array(cpS, expected) = line.split("\t", 2)
      val c = cpS.toInt.toChar
      assert(TextAssembly.rustStrDebug("x" + c) == expected,
        f"U+${cpS.toInt}%04X: ours=${TextAssembly.rustStrDebug("x" + c)} rust=$expected")
      n += 1
    }
    assert(n == 63488, s"expected full BMP minus surrogates, saw $n")
  }

  test("surrogate code units fail loudly in both Debug formatters (ADVICE r6)") {
    // Rust's char/str cannot hold a LONE surrogate, so the reference fails at
    // the ingress (char::decode_utf16, cmap.rs:74) — mirrored by
    // CMap.utf16Char. The formatters' ground-truth bitmaps have no defined
    // bits in U+D800-DFFF; a hostile lone value reaching them must throw,
    // never render generator-dependent garbage.
    intercept[PdfParseException] { TextAssembly.rustCharDebug('\ud800') }
    intercept[PdfParseException] { TextAssembly.rustCharDebug('\udfff') }
    intercept[PdfParseException] { TextAssembly.rustStrDebug("x\ud934y") }
    // lone low, and high-at-end-of-string (no pair possible), still fail
    intercept[PdfParseException] { TextAssembly.rustStrDebug("x\udc00y") }
    intercept[PdfParseException] { TextAssembly.rustStrDebug("x\ud83d") }
  }

  test("rustStrDebug: PAIRED surrogates render as the astral char's Debug form (ADVICE r7)") {
    // A valid high+low pair in a Java String is a real astral char Rust's str
    // CAN hold (4-byte UTF-8 names reach PdfFont via the Utf8.strict
    // bare-token coercion); escape_debug keeps printable astral raw and
    // \u{x}-escapes the rest. Ground truth sweep: tools/refbuild/astralgen
    // dump.rs — every raw/escaped RUN BOUNDARY in U+10000..U+10FFFF plus
    // every 17th codepoint, from format!("{:?}") itself.
    var n = 0
    lines("/escastral.tsv.gz").foreach { line =>
      val Array(cpS, expected) = line.split("\t", 2)
      val s = "x" + new String(Character.toChars(cpS.toInt))
      assert(TextAssembly.rustStrDebug(s) == expected,
        f"U+${cpS.toInt}%04X: ours=${TextAssembly.rustStrDebug(s)} rust=$expected")
      n += 1
    }
    assert(n == 62564, s"expected the committed astral sample, saw $n")
    // directed spot checks (probe.rs ground truth): printable emoji/CJK raw,
    // tag char + plane ceiling escaped
    assert(TextAssembly.rustStrDebug(new String(Character.toChars(0x1F600))) == "\"\uD83D\uDE00\"")
    assert(TextAssembly.rustStrDebug(new String(Character.toChars(0x20BB7))) == "\"\uD842\uDFB7\"")
    assert(TextAssembly.rustStrDebug(new String(Character.toChars(0xE0001))) == "\"\\u{e0001}\"")
    assert(TextAssembly.rustStrDebug(new String(Character.toChars(0x10FFFF))) == "\"\\u{10ffff}\"")
  }

  test("rustStrDebug: STRING-INITIAL position escapes identically (no positional rule)") {
    // the std doc for the escape_debug METHOD says grapheme-extend escapes
    // only at the string start, but Debug for str (what the reference's
    // {:?} uses) escapes position-independently — verified by dumping
    // format!("{:?}", format!("{}x", c)) for every BMP codepoint and
    // diffing against the mid-string table: ZERO positional differences
    // (round-6 review #2, refuted empirically). This gate keeps the claim
    // pinned against the committed initial-position dump.
    var n = 0
    lines("/escstr_initial.tsv.gz").foreach { line =>
      val Array(cpS, expected) = line.split("\t", 2)
      val c = cpS.toInt.toChar
      assert(TextAssembly.rustStrDebug(c + "x") == expected,
        f"U+${cpS.toInt}%04X initial: ours=${TextAssembly.rustStrDebug(c + "x")} rust=$expected")
      n += 1
    }
    assert(n == 63488)
  }

  test("RustFmt.f32 shortest-round-trip sweep (integers, ties, randoms)") {
    // ties away from zero (the JDK-divergent class the reference fixtures hit)
    assert(RustFmt.f32(215.890625f) == "215.89063")
    assert(RustFmt.f32(-215.890625f) == "-215.89063")
    assert(RustFmt.f32(332.078125f) == "332.07813")
    // integers bare, negative zero signed, plain notation
    assert(RustFmt.f32(70f) == "70" && RustFmt.f32(-3f) == "-3")
    assert(RustFmt.f32(-0.0f) == "-0" && RustFmt.f32(0.0f) == "0")
    assert(RustFmt.f32(0.5f) == "0.5")
    // round-trip property over randoms: parse(f32(v)) == v, no exponent form
    val rnd = new scala.util.Random(5)
    (0 until 20000).foreach { _ =>
      val v = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!v.isNaN && !v.isInfinite) {
        val s = RustFmt.f32(v)
        assert(java.lang.Float.parseFloat(s) == v || (v == 0f && s.stripPrefix("-") == "0"),
          s"round-trip broke: $v -> $s")
        assert(!s.contains("E") && !s.contains("e"), s"exponent form leaked: $s")
      }
    }
  }
}
