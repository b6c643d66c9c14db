package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.MiniPdf

/** Property-based gates (SURVEY §5.2 step 3). Raw ScalaCheck driven from
  * ScalaTest (the scalatestplus bridge artifact is not in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("lexer is total on arbitrary bytes: only PdfParseException escapes") {
    check("lexer-total", Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      try {
        val tok = new PdfTokenizer(bytes, 0)
        var t = tok.next()
        var n = 0
        while (t != null && n < 10000) { t = tok.next(); n += 1 }
        true
      } catch {
        case _: PdfParseException => true // reference panics become this
      }
    })
  }

  test("escape-free literal strings round-trip through the lexer") {
    val safeChar = Gen.choose(32.toChar, 126.toChar)
      .retryUntil(c => c != '(' && c != ')' && c != '\\')
    check("literal-roundtrip", Prop.forAll(Gen.listOf(safeChar).map(_.mkString)) { s =>
      new PdfTokenizer(s"($s)".getBytes("ISO-8859-1"), 0).next() match {
        case l: TLit => new String(l.bytes, "ISO-8859-1") == s
        case _       => false
      }
    })
  }

  test("MiniPdf escape round-trips arbitrary printable text through the extractor") {
    val printable = Gen.choose(32.toChar, 126.toChar)
    check("minipdf-roundtrip", Prop.forAll(Gen.listOf(printable).map(_.mkString)) { s =>
      if (s.isEmpty || s.startsWith(" ")) true
      else Pdf(MiniPdf.synthesize(s)).extract(ExtractText) == s
    }, n = 100)
  }

  test("hex strings round-trip") {
    check("hex-roundtrip", Prop.forAll(
      Gen.nonEmptyContainerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
      new PdfTokenizer(s"<$hex>".getBytes("ISO-8859-1"), 0).next() match {
        case h: THex => java.util.Arrays.equals(h.bytes, bytes)
        case _       => false
      }
    })
  }

  test("minhash signature equality rate tracks jaccard within tolerance") {
    import graft.operators.Dedup
    val words = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    check("minhash-estimates", Prop.forAll(words, words) { (a, b) =>
      val sa = Dedup.shingles(a.mkString(" "), 2)
      val sb = Dedup.shingles(b.mkString(" "), 2)
      val exact = Dedup.exactJaccard(sa, sb)
      val est = Dedup.minhashSignature(sa, 128).zip(Dedup.minhashSignature(sb, 128))
        .count { case (x, y) => x == y }.toDouble / 128
      math.abs(est - exact) < 0.35
    }, n = 100)
  }

  test("numeric token parse differentially matches parseInt-then-parseFloat semantics") {
    // arbitrary strings shaped like the tokenizer's numeric precheck: any first
    // char drawn from a hostile set, chars 2..n in [0-9.]
    val first = Gen.oneOf(Gen.numChar, Gen.oneOf('+', '-', '.', 'R', 'n', 'f', 'W', 'q', 'e'))
    val rest = Gen.listOf(Gen.frequency(8 -> Gen.numChar, 2 -> Gen.const('.')))
    val token = for { f <- first; r <- rest } yield (f :: r).mkString
    check("numeric-differential", Prop.forAll(token) { s =>
      // reference semantics via the old exception-driven control flow
      val expected: Tok =
        try TNum(NInt(java.lang.Integer.parseInt(s)))
        catch {
          case _: NumberFormatException =>
            try TNum(NReal(java.lang.Float.parseFloat(s)))
            catch { case _: NumberFormatException => null }
        }
      val got = new PdfTokenizer(s"$s ".getBytes("ISO-8859-1"), 0).next()
      val isNumericShape = s.drop(1).forall(c => c.isDigit || c == '.')
      if (!isNumericShape || expected == null) got == TBare(s.getBytes("ISO-8859-1"))
      else got == expected
    }, n = 500)
  }

  test("passworded round-trip holds for arbitrary passwords across R3/V4/R6") {
    // any password bytes (incl. empty-ish, long, non-ASCII) must round-trip
    // via BOTH the user and owner paths, and a perturbed password must fail
    // loudly — never garble (50 cases/revision: crypto fixtures are ~ms each)
    val genPwd = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 255)).map(_.map(_.toByte).toArray))
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    // pinned regression for the round-6 flake: user=[01] owner=[5b] makes the
    // perturbed password (first byte ^ 0x5a) EXACTLY the owner password — it
    // must OPEN via the owner branch (correct behavior the old property
    // mislabeled as a failure)
    for (r <- Seq(3, 4, 6)) {
      val pdf = MiniPdf.synthesizeEncrypted("property fuzz body", r,
        userPwd = Array[Byte](0x01), ownerPwd = Array[Byte](0x5b))
      assert(Pdf.lenient(pdf, Array[Byte](0x5b)).extract(ExtractText) == "property fuzz body",
        s"r=$r: owner-coincident perturbation must open")
    }
    for (r <- Seq(3, 4, 6)) {
      check(s"pwd-roundtrip-r$r", Prop.forAllNoShrink(genPwd, genPwd) { (user, owner) =>
        val text = "property fuzz body"
        val pdf = MiniPdf.synthesizeEncrypted(text, r, userPwd = user, ownerPwd = owner)
        val viaUser = Pdf.lenient(pdf, user).extract(ExtractText) == text
        // owner path only distinct when the padded forms differ
        val viaOwner = Pdf.lenient(pdf, owner).extract(ExtractText) == text
        val wrong = user.clone(); wrong(0) = (wrong(0) ^ 0x5a).toByte
        // the perturbed password can coincide with the OWNER credential
        // (ScalaCheck drew owner == user-with-first-byte-xored — the round-6
        // flake: rare but real, e.g. user=[01] owner=[5b]); opening via the
        // owner branch is then CORRECT behavior, so assert success IFF the
        // perturbation is the owner credential (legacy revisions authenticate
        // the 32-byte-truncated padded form, so compare the first 32 bytes)
        val wrongIsOwner =
          if (r <= 4) wrong.take(32).sameElements(owner.take(32))
          else wrong.sameElements(owner)
        val wrongOk =
          try { Pdf.lenient(pdf, wrong).extract(ExtractText) == text && wrongIsOwner }
          catch { case e: PdfParseException => !wrongIsOwner && e.getMessage.contains("password") }
        (viaUser && viaOwner && wrongOk) :|
          s"r=$r viaUser=$viaUser viaOwner=$viaOwner wrongOk=$wrongOk " +
          s"wrongIsOwner=$wrongIsOwner user=${hex(user)} owner=${hex(owner)}"
      }, n = 50)
    }
  }

  test("extractTurn is total: arbitrary-byte payloads land in the error column, never throw") {
    import graft.pipeline.{ExtractJob, Turn}
    val anyBytes = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    check("extract-total", Prop.forAll(anyBytes, Gen.oneOf("pdf-b64", "html", "plain")) { (bytes, tool) =>
      val payload =
        if (tool == "pdf-b64") java.util.Base64.getEncoder.encodeToString(bytes)
        else new String(bytes, "ISO-8859-1")
      val out = ExtractJob.extractTurn(Turn("fuzz", 0, "user", payload, tool, null))
      // either extracted or a recorded error; the call itself never throws
      out.error == null || out.extracted_text == null
    }, n = 300)
  }

  test("html escape/extract round-trip on arbitrary printable text") {
    import graft.html.HtmlBoilerplate
    import graft.pipeline.SynthGen
    val printable = Gen.choose(32.toChar, 126.toChar)
    check("html-roundtrip", Prop.forAll(Gen.listOfN(12, Gen.listOfN(5, printable).map(_.mkString)).map(_.mkString(" "))) { s =>
      val norm = HtmlBoilerplate.normalize(s)
      HtmlBoilerplate.extract(SynthGen.wrapHtml(norm)).text == norm
    }, n = 100)
  }
}
