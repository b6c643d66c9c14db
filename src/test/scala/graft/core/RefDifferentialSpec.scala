package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** DIFFERENTIAL fuzz against the live reference binary (round 6): seeded
  * MiniPdf documents — the same synthesizer the pipeline goldens use — run
  * through `pdfrust --<mode>` and through our engine, outputs compared
  * byte-exact per mode. Where RefGoldenSpec pins five fixed fixtures, this
  * suite sweeps the synthesizer's parameter space (texts x layout variants),
  * so a quirk divergence ANYWHERE in the strict path (lexer, escapes, flate
  * round-trip incl. the 10x zero-pad, multi-page joins, matrix arithmetic,
  * Rust value formatting) shows up as a concrete failing (seed, variant).
  *
  * Requires the offline-built reference binary (tools/refbuild/build.sh —
  * validate the inflate stub with tools/refbuild/validate.py first). When
  * the binary is absent the suite CANCELS (assume), never fails: the
  * committed RefGoldenSpec goldens remain the always-on gate.
  */
class RefDifferentialSpec extends AnyFunSuite {

  private val bin = RefBinary.bin
  private def binaryPresent = RefBinary.present

  /** Spawn via the shared hang-safe harness; a hung binary fails loudly here
    * (these sweeps run over well-formed documents).
    */
  private def runRef(mode: String, pdf: Array[Byte]): (Int, String) =
    RefBinary.run(pdf, mode) match {
      case RefBinary.Done(rc, out) => (rc, out)
      case RefBinary.Hung          => fail(s"reference binary hung (--$mode)")
    }

  private def ours(mode: ExtractMode, pdf: Array[Byte]): String =
    Pdf(pdf).extract(mode) + "\n" // reference main println's trailing newline

  private def fontBlocks(s: String): Seq[String] = s.split("\n\n", -1).toSeq.sorted

  // seeded corpus: plain words + punctuation, Latin-1 glyphs (byte-as-char
  // path), and ESCAPE-HEAVY texts — parens, backslashes, nested parens —
  // driving MiniPdf.escapeLiteral through the reference's literal-string
  // un-escaping (incl. the octal-escape quirk's neighborhood). Size scales
  // with GRAFT_DIFF_TEXTS (default 12) for one-off deep sweeps.
  private def texts: Seq[String] = {
    val rnd = new scala.util.Random(1234)
    val words = Seq("alpha", "Beta9", "GAMMA", "delta.", "eps,ilon", "zeta!", "x",
      "(paren)", "back\\slash", "((nested))", "a(b", "c)d", "\\\\double", "(")
    val nTexts = sys.env.getOrElse("GRAFT_DIFF_TEXTS", "12").toInt
    (0 until nTexts).map { i =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ") +
        (if (i % 3 == 0) "éü" else "") // Latin-1 glyphs through the byte-as-char path
    }
  }

  private def variants(text: String): Seq[(String, Array[Byte])] = Seq(
    "plain" -> graft.pipeline.MiniPdf.synthesize(text),
    "multiTj" -> graft.pipeline.MiniPdf.synthesizeMultiTj(text, chunk = 7),
    "multiPage" -> graft.pipeline.MiniPdf.synthesizeMultiPage(text, chunk = 11),
    "flate" -> graft.pipeline.MiniPdf.synthesizeFlate(text)
  )

  test("differential sweep: text/raw-content/chars byte-exact, font modulo order") {
    assume(binaryPresent, s"reference binary not built ($bin) — run tools/refbuild/build.sh")
    var checked = 0
    texts.zipWithIndex.foreach { case (text, ti) =>
      variants(text).foreach { case (vn, pdf) =>
        val id = s"seed-text $ti variant $vn"
        val (rcT, refText) = runRef("text", pdf)
        assert(rcT == 0, s"$id: reference --text exited $rcT")
        assert(ours(ExtractText, pdf) == refText, s"$id: --text diverges")
        val (rcR, refRaw) = runRef("raw-content", pdf)
        assert(rcR == 0 && ours(ExtractRawContent, pdf) == refRaw, s"$id: --raw-content diverges")
        val (rcC, refChars) = runRef("chars", pdf)
        assert(rcC == 0 && ours(ExtractChars, pdf) == refChars, s"$id: --chars diverges")
        val (rcF, refFont) = runRef("font", pdf)
        assert(rcF == 0 && fontBlocks(ours(ExtractFont, pdf)) == fontBlocks(refFont),
          s"$id: --font diverges")
        checked += 1
      }
    }
    info(s"differential sweep: $checked PDFs x 4 modes byte-checked against the binary")
  }

  test("differential: truncated payload — reference panics, strict engine throws") {
    assume(binaryPresent, s"reference binary not built ($bin) — run tools/refbuild/build.sh")
    val whole = graft.pipeline.MiniPdf.synthesize("hello truncation")
    val cut = whole.take(whole.length / 2)
    val (rc, _) = runRef("text", cut)
    assert(rc != 0, "reference accepted a truncated PDF")
    intercept[PdfParseException] { Pdf(cut).extract(ExtractText) }
  }

  /** Full BEHAVIOR-parity contract over synthesizer shapes the reference may
    * reject: either both engines succeed with byte-identical text output, or
    * the reference exits nonzero AND strict mode throws. Covers the shapes
    * strict mode deliberately refuses (xref streams, text-operator pages,
    * encrypted documents) — the parity claim "strict fails exactly where the
    * reference fails" is checked against the live binary, not inferred.
    */
  test("differential: panic parity on xref-stream / text-ops / encrypted shapes") {
    assume(binaryPresent, s"reference binary not built ($bin) — run tools/refbuild/build.sh")
    val text = "parity sweep text with several words"
    val shapes: Seq[(String, Array[Byte])] = Seq(
      "xrefStream" -> graft.pipeline.MiniPdf.synthesizeXrefStream(text),
      "textOps" -> graft.pipeline.MiniPdf.synthesizeTextOps(text, chunk = 9),
      "encryptedR2" -> graft.pipeline.MiniPdf.synthesizeEncrypted(text, r = 2),
      "encryptedR3" -> graft.pipeline.MiniPdf.synthesizeEncrypted(text, r = 3)
    )
    shapes.foreach { case (name, pdf) =>
      val (rc, refOut) = runRef("text", pdf)
      val oursE = try Right(ours(ExtractText, pdf)) catch {
        case e: PdfParseException => Left(e)
        case e: StackOverflowError => Left(e)
      }
      (rc, oursE) match {
        case (0, Right(o)) => assert(o == refOut, s"$name: both succeed but outputs diverge")
        case (n, Left(_)) if n != 0 => () // both refuse — parity
        case (0, Left(e)) => fail(s"$name: reference succeeds, strict throws: $e")
        case (n, Right(o)) => fail(s"$name: reference exits $n, strict returns ${o.take(80)}")
      }
    }
  }
}
