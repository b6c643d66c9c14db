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
    "flate" -> graft.pipeline.MiniPdf.synthesizeFlate(text),
    // chunk-size sweep (round 7, TODO r6): chunk=1 puts EVERY glyph in its own
    // Tj (maximum span/matrix churn), chunk=3 and page-chunk=5 hit the odd
    // split boundaries the fixed 7/11 chunks step over
    "multiTj1" -> graft.pipeline.MiniPdf.synthesizeMultiTj(text, chunk = 1),
    "multiTj3" -> graft.pipeline.MiniPdf.synthesizeMultiTj(text, chunk = 3),
    "multiPage5" -> graft.pipeline.MiniPdf.synthesizeMultiPage(text, chunk = 5),
    // and the new incremental-update shape rides the seeded text sweep too
    "incr2" -> graft.pipeline.MiniPdf.synthesizeIncremental(Seq(text.reverse, text))
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
  /** INCREMENTAL-UPDATE (/Prev chain) differential (round 7, VERDICT r6 #6):
    * multi-generation documents — 2 and 3 chained append-only revisions with
    * object overrides and freed entries — exercise the least-fuzzed
    * load-bearing path, the Prev-chain recursion (xref.rs:123-129 ↔
    * core/Xref.scala:94-104). The quirks this pins (verified against the
    * binary, not inferred): (a) newest-table-first shadowing resolves the
    * rewritten content; (b) the table is keyed by the entry's OWN generation,
    * so a bumped-gen override does NOT shadow the gen-0 lookup and the update
    * is silently invisible; (c) a gen-0 freed entry panics on access while the
    * standard gen-65535 freed convention is a no-op; (d) a garbage /Prev
    * offset panics in both engines.
    */
  test("differential: incremental updates resolve through the /Prev chain identically") {
    assume(binaryPresent, s"reference binary not built ($bin) — run tools/refbuild/build.sh")
    import graft.pipeline.MiniPdf
    def par(name: String, pdf: Array[Byte]): Unit = Seq(
      (ExtractText, "text"), (ExtractChars, "chars"), (ExtractRawContent, "raw-content")
    ).foreach { case (m, f) =>
      RefBinary.parity(name, pdf, m, f).left.foreach(msg => fail(msg))
    }
    // (a) override shadowing: newest revision wins, chain depth 2 and 3
    val two = MiniPdf.synthesizeIncremental(Seq("base revision", "second revision"))
    par("incr-2chain", two)
    assert(Pdf(two).extract(ExtractText) == "second revision")
    val three = MiniPdf.synthesizeIncremental(Seq("first rev", "middle rev", "final rev"))
    par("incr-3chain", three)
    assert(Pdf(three).extract(ExtractText) == "final rev")
    // (b) bumped-generation override: keyed by entry generation, so the (4,0)
    // lookup falls through /Prev to the ORIGINAL content — update invisible
    val bumped = MiniPdf.synthesizeIncremental(Seq("original text", "phantom update"), overrideGen = 1)
    par("incr-gen-bump", bumped)
    assert(Pdf(bumped).extract(ExtractText) == "original text")
    // (c) freed entries: gen-0 free panics at the font lookup (parity: both
    // refuse); gen-65535 free never shadows (5,0) and is a no-op
    par("incr-free-gen0", MiniPdf.synthesizeIncremental(Seq("alive", "freed font"), freeObj5Gen = 0))
    val free65535 = MiniPdf.synthesizeIncremental(Seq("alive", "free noop"), freeObj5Gen = 65535)
    par("incr-free-65535", free65535)
    assert(Pdf(free65535).extract(ExtractText) == "free noop")
    // (d) garbage /Prev offset: point the newest trailer's /Prev past EOF
    // (same-width digit surgery keeps every other offset valid)
    val s = new String(two, java.nio.charset.StandardCharsets.ISO_8859_1)
    val prevAt = s.lastIndexOf("/Prev ")
    require(prevAt > 0)
    val numStart = prevAt + "/Prev ".length
    var numEnd = numStart
    while (numEnd < s.length && s.charAt(numEnd).isDigit) numEnd += 1
    val broken = two.clone()
    (numStart until numEnd).foreach(i => broken(i) = '9')
    par("incr-prev-garbage", broken)
    // seeded sweep over chain shapes: depth x generation x free-entry combos
    // (GRAFT_INCR_FUZZ scales it for one-off deep runs)
    val n = sys.env.getOrElse("GRAFT_INCR_FUZZ", "24").toInt
    val rnd = new scala.util.Random(555)
    val words = Seq("rev", "update", "patch", "éd", "x(y)", "z\\w")
    (0 until n).foreach { i =>
      val depth = 2 + rnd.nextInt(3)
      val texts = (0 until depth).map(d =>
        s"${words(rnd.nextInt(words.length))} $d-" +
          Seq.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.length))).mkString(" "))
      val gen = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(3) else 0
      val free = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => 65535
        case _ => -1
      }
      par(s"incr-fuzz-$i d=$depth g=$gen f=$free",
        MiniPdf.synthesizeIncremental(texts, overrideGen = gen, freeObj5Gen = free))
    }
  }

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
