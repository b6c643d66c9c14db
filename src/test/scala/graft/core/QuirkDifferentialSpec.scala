package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** QUIRK retro-validation against the live reference binary (round 6): every
  * replicated-from-source quirk the engine carries (CLAUDE.md invariants) is
  * CHECKED against the binary's actual behavior on crafted content streams,
  * not just inferred from reading the Rust. Contract per probe (RefBinary
  * .parity): both engines succeed with byte-identical output, or the
  * reference exits nonzero AND strict mode throws. Cancels (never fails)
  * when the binary is absent — build it with tools/refbuild/build.sh.
  *
  * These harnesses earn their keep: their first runs surfaced three real
  * fidelity gaps (missing-operand IndexOutOfBounds leak, past-EOF xref
  * offsets self-healing where the reference panics, lone ')' lexed as a
  * bareword instead of a string opener) — all fixed in round 6.
  */
class QuirkDifferentialSpec extends AnyFunSuite {

  private def check(res: Either[String, Boolean]): Unit =
    res.left.foreach(msg => fail(msg))

  /** Span-sidecar invariant (SURVEY §7.5, VERDICT r6 #7), asserted over every
    * fuzz document the strict engine accepts so spans inherit the living-fuzzer
    * coverage: spans are in-bounds, disjoint and monotone (emitted in
    * instruction order over the append-only output), and every character of
    * the final text NOT covered by a span is one of the engine-inserted '\n'
    * separators (ty-change newlines and page joins belong to no span — the
    * shown bytes themselves are always span-covered).
    */
  private def checkSpans(name: String, pdf: Array[Byte]): Unit = {
    val r =
      try Pdf(pdf).extractResult(ExtractText)
      catch { case _: PdfParseException | _: StackOverflowError => return }
    var prevEnd = 0
    r.spans.foreach { s =>
      assert(s.start >= 0 && s.start <= s.end && s.end <= r.text.length,
        s"$name: out-of-bounds span $s (len=${r.text.length})")
      assert(s.start >= prevEnd, s"$name: overlapping/unordered span $s (prevEnd=$prevEnd)")
      prevEnd = s.end
    }
    val covered = new Array[Boolean](r.text.length)
    r.spans.foreach(s => (s.start until s.end).foreach(covered(_) = true))
    r.text.indices.foreach { i =>
      if (!covered(i))
        assert(r.text.charAt(i) == '\n',
          s"$name: uncovered non-newline char ${r.text.charAt(i).toInt} at $i")
    }
  }

  private val probes: Seq[(String, String)] = Seq(
    // the octal-escape BUG: the reference computes ((c*8)+d*8)+e instead of
    // ((c*8)+d)*8+e (tokenizer quirk) — \101\102\103 must land wherever the
    // buggy formula puts them, identically in both engines
    "octal escape bug" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(\\101\\102\\103 then \\7x) Tj\nET\n",
    // named escapes + line continuation in literal strings
    "literal escapes" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(a\\nb\\tc\\(d\\)e\\\\f) Tj\nET\n",
    // NUL is whitespace to the tokenizer
    "NUL whitespace" ->
      "BT\n\u000070 50 TD\n/F1 12\u0000Tf\n(nul ws) Tj\nET\n",
    // Td with operand count != 2 is skipped wholesale
    "Td arity quirk" ->
      "BT\n/F1 12 Tf\n70 Td\n(arity) Tj\nET\n",
    // unknown operator does NOT clear the operand buffer
    "unknown op keeps operands" ->
      "BT\n/F1 12 Tf\n1 2 zz 70 50 TD\n(buf) Tj\nET\n",
    // TJ arrays: kerning numbers never insert spaces; hex elements decode
    "TJ kerning + hex" ->
      "BT\n70 50 TD\n/F1 12 Tf\n[(A) -500 (B) 120 <434445>] TJ\nET\n",
    // hex string Tj with odd digit count (implied trailing zero)
    "odd hex Tj" ->
      "BT\n70 50 TD\n/F1 12 Tf\n<48656C6C6F2> Tj\nET\n",
    // cm REPLACES the CTM (reference quirk) — must not disturb text assembly
    "cm replace" ->
      "0.5 0 0 0.5 10 10 cm\nBT\n70 50 TD\n/F1 12 Tf\n(cm page) Tj\nET\n",
    // multiple text objects: ty change inserts the newline
    "ty-change newline" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(one) Tj\nET\nBT\n70 40 TD\n/F1 12 Tf\n(two) Tj\nET\n",
    // comments inside content panic in the reference (raw tokenizer catch-all)
    "content comment panics" ->
      "BT\n% a comment\n70 50 TD\n/F1 12 Tf\n(c) Tj\nET\n",
    // unbalanced paren: lexer failure parity
    "unbalanced paren" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(open Tj\nET\n",
    // Tw/Tz/TL through the strict unknown-op path (no forked text assembly)
    "strict text-op passthrough" ->
      "BT\n2 Tw\n110 Tz\n14 TL\n70 50 TD\n/F1 12 Tf\n(ops) Tj\nET\n",
    // RAW HIGH BYTES in the stream: the reference lossy-decodes the whole
    // content to UTF-8 BEFORE lexing (body.rs:522-532) — a lone 0xE9 becomes
    // U+FFFD, a valid UTF-8 sequence survives; both must round identically
    "invalid utf-8 lossy" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(café raw) Tj\nET\n",
    "valid multibyte utf-8" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(cafÃ© enc) Tj\nET\n",
    "high-byte run" ->
      "BT\n70 50 TD\n/F1 12 Tf\n(þÿ) Tj\nET\n",
    // INLINE IMAGES (BI/ID/EI, VERDICT r6 #2): not in the reference's
    // instruction enum (content.rs:46-98), so BI/ID/EI and the dict keys ride
    // the unknown-operator path and the binary payload after ID is LEXED AS
    // ORDINARY TOKENS over the lossy-decoded stream — whatever desync that
    // produces must be byte-identical in both engines. Payload shapes chosen
    // to hit every lexer special case: plain bytes, high bytes (lossy U+FFFD),
    // '(' swallowing EI into a string scan, a lone ')' opening the reference's
    // Delimiter::String scan, '%' eating to EOL, '<'/'>' hex-string framing.
    "inline image plain" ->
      "BT\n/F1 12 Tf\nBI /W 2 /H 2 /CS /G /BPC 8 ID ÿþ EI\n70 50 TD\n(after) Tj\nET\n",
    "inline image high bytes" ->
      "BI /W 1 /H 1 ID éÃ© EI\nBT\n70 50 TD\n/F1 12 Tf\n(hb) Tj\nET\n",
    "inline image open paren payload" ->
      "BT\n/F1 12 Tf\nBI /W 1 /H 1 ID ( EI\n70 50 TD\n(x) Tj\nET\n",
    "inline image close paren payload" ->
      "BT\n/F1 12 Tf\nBI /W 1 /H 1 ID ) EI\n70 50 TD\n(y) Tj\nET\n",
    "inline image percent payload" ->
      "BT\n/F1 12 Tf\nBI /W 1 /H 1 ID %ª» EI\n70 50 TD\n(z) Tj\nET\n",
    "inline image hex framing payload" ->
      "BT\n/F1 12 Tf\nBI /W 1 /H 1 ID <41 42> EI\n70 50 TD\n(h) Tj\nET\n",
    "inline image balanced paren payload" ->
      "BT\n/F1 12 Tf\nBI /W 1 /H 1 ID (EI inside) EI\n70 50 TD\n(b) Tj\nET\n",
    // F32 EXTREMES through TD/cm operands (round 7): chars mode formats the
    // text matrix, so overflow (Rust f32 parse saturates to inf — printed
    // "inf", where a naive Java Float.toString would say "Infinity"),
    // negative zero, the largest finite f32, the smallest denormal, and the
    // 2^24 integer precision edge must all format byte-identically
    "f32 overflow to inf" ->
      "BT\n340282366920938463463374607431768211456 50 TD\n/F1 12 Tf\n(inf) Tj\nET\n",
    "f32 overflow to -inf" ->
      "BT\n-340282366920938463463374607431768211456 50 TD\n/F1 12 Tf\n(ninf) Tj\nET\n",
    "f32 max finite" ->
      "BT\n340282350000000000000000000000000000000 50 TD\n/F1 12 Tf\n(max) Tj\nET\n",
    "f32 min denormal" ->
      "BT\n0.000000000000000000000000000000000000000000001401298464324817 50 TD\n/F1 12 Tf\n(den) Tj\nET\n",
    "f32 negative zero" ->
      "BT\n-0.0 -0 TD\n/F1 12 Tf\n(nz) Tj\nET\n",
    "f32 2^24 precision edge" ->
      "BT\n16777217 16777219 TD\n/F1 12 Tf\n(p24) Tj\nET\n",
    "f32 many-digit mantissa" ->
      "BT\n0.30000001192092896 3.14159265358979 TD\n/F1 12 Tf\n(pi) Tj\nET\n"
  )

  test("quirk probes: crafted content streams behave byte-identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    probes.foreach { case (name, content) =>
      val pdf = graft.pipeline.MiniPdf.synthesizeRawContent(content)
      check(RefBinary.parity(name, pdf, ExtractText, "text"))
      check(RefBinary.parity(name, pdf, ExtractChars, "chars"))
      check(RefBinary.parity(name, pdf, ExtractRawContent, "raw-content"))
      checkSpans(name, pdf)
    }
  }

  /** STALE-XREF self-heal parity (xref.rs:245-268): the reference repairs a
    * wrong xref offset by scanning for "\nN G obj" (with the leading-newline
    * disambiguation that keeps "1 0 obj" from matching inside "11 0 obj"),
    * and PANICS when the offset is out of range or the object is truly
    * absent. Every corrupted-entry shape must behave identically. (First run
    * caught the past-EOF divergence — getAndFix now refuses like the
    * reference's bytes[offset..] slice panic.)
    */
  test("stale xref offsets self-heal identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val base = graft.pipeline.MiniPdf.synthesize("stale xref probe text")
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.lastIndexOf("\nxref\n") // NOT "xref\n": that matches startxref
    require(xrefAt > 0, "xref table not found in the synthesized fixture")
    val firstEntry = s.indexOf("0000000000 65535 f \n", xrefAt) + 20
    require(firstEntry > 20, "free entry not found after the xref header")
    (1 to 6).foreach { obj =>
      Seq(0, 3, 7, 1000000).foreach { delta =>
        val mutated = base.clone()
        val entryPos = firstEntry + (obj - 1) * 20
        val orig = s.substring(entryPos, entryPos + 10).toInt
        val newOff = if (delta == 0) 0 else orig + delta
        val repl = f"$newOff%010d".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        System.arraycopy(repl, 0, mutated, entryPos, 10)
        check(RefBinary.parity(s"stale-xref obj=$obj delta=$delta", mutated, ExtractText, "text"))
      }
    }
  }

  /** NEGATIVE xref offset (round-7 40k-mutation find, index 32291): flipping
    * the newline after the free entry to '-' makes the first in-use entry's
    * offset lex as a negative integer. The reference wraps it through
    * `as usize` (xref.rs:171) and panics at the Tokenizer::new slice
    * (tokenizer.rs:169); our tokenizer constructor must refuse identically
    * instead of escaping with a raw AIOOBE from next().
    */
  /** CMAP-EDGE probes (round 7): the ToUnicode parser's quirks, previously
    * inferred from cmap.rs and gated only through the fixed fixtures' benign
    * cmaps, checked against the binary on CRAFTED streams: the
    * first-two-bytes value rule (`x[0]*256 + x[1]` ignores trailing bytes —
    * cmap.rs:73, so a 4-byte astral pair either maps to its high BMP unit or
    * panics on the surrogate), char::decode_utf16 panic parity on surrogate
    * values (cmap.rs:74), the 1-byte-value index panic, bfrange increments
    * walking INTO the surrogate block, the array bfrange form, two-byte
    * codespace pairing, and the Tj-vs-TJ contrast (Tj stays byte-as-char even
    * WITH a cmap present). All four output modes (font prints the cmap Debug).
    */
  test("ToUnicode cmap edges behave identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val cases: Seq[(String, String, String, Boolean)] = Seq(
      // (name, bf section, content, twoByte)
      ("bfchar basic + Tj contrast",
        "2 beginbfchar <41> <0042> <42> <0041> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<4142>] TJ\n(AB) Tj\nET\n", false),
      ("bfchar 4-byte value takes first two bytes",
        "1 beginbfchar <41> <00420041> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<41>] TJ\nET\n", false),
      ("bfchar surrogate value",
        "1 beginbfchar <41> <D83D> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<41>] TJ\nET\n", false),
      ("bfchar astral pair panics at its high surrogate",
        "1 beginbfchar <41> <D83DDE00> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<41>] TJ\nET\n", false),
      ("bfchar 1-byte value",
        "1 beginbfchar <41> <42> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<41>] TJ\nET\n", false),
      ("bfrange increments into the surrogate block",
        "1 beginbfrange <40> <45> <D7FD> endbfrange",
        "BT\n70 50 TD\n/F1 12 Tf\n[<40>] TJ\nET\n", false),
      ("bfrange array form",
        "1 beginbfrange <41> <43> [<0058> <0059> <005A>] endbfrange",
        "BT\n70 50 TD\n/F1 12 Tf\n[<414243>] TJ\nET\n", false),
      ("two-byte codespace pairs TJ bytes",
        "1 beginbfchar <0041> <0043> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<00410041>] TJ\nET\n", true),
      ("unmapped code under a cmap",
        "1 beginbfchar <41> <0058> endbfchar",
        "BT\n70 50 TD\n/F1 12 Tf\n[<4142>] TJ\nET\n", false),
      ("empty bf section",
        "", "BT\n70 50 TD\n/F1 12 Tf\n[<41>] TJ\n(plain) Tj\nET\n", false)
    )
    cases.foreach { case (name, bf, content, twoByte) =>
      val pdf = graft.pipeline.MiniPdf.synthesizeWithCMap(content, bf, twoByte)
      check(RefBinary.parity(name, pdf, ExtractText, "text"))
      check(RefBinary.parity(name, pdf, ExtractChars, "chars"))
      check(RefBinary.parity(name, pdf, ExtractRawContent, "raw-content"))
      check(RefBinary.parity(name, pdf, ExtractFont, "font",
        normalize = RefBinary.normalizeFont))
      checkSpans(name, pdf)
    }
  }

  /** Seeded CMAP GRAMMAR FUZZ: random bfchar/bfrange sections — valid
    * entries mixed with the full malformation menu (surrogate and 1/3/4-byte
    * values, ranges that walk into the surrogate block, reversed ranges,
    * non-hex tokens where hex is required, truncated sections) — must behave
    * identically through every mode: output parity when the reference
    * accepts, panic parity when it refuses. Size scales with GRAFT_CMAP_FUZZ
    * (default 40 streams x 4 modes).
    */
  test("cmap grammar fuzz: random ToUnicode streams behave identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val n = sys.env.getOrElse("GRAFT_CMAP_FUZZ", "40").toInt
    val rnd = new scala.util.Random(4242)
    def hex2(v: Int) = f"<${v & 0xffff}%04X>"
    def hex1(v: Int) = f"<${v & 0xff}%02X>"
    def value(): String = rnd.nextInt(6) match {
      case 0 => hex2(0x30 + rnd.nextInt(0x5000))         // safe BMP
      case 1 => hex2(0xd800 + rnd.nextInt(0x800))        // surrogate — panic parity
      case 2 => hex1(rnd.nextInt(256))                   // 1-byte — index panic parity
      case 3 => f"<${rnd.nextInt(0x10000)}%04X${rnd.nextInt(0x10000)}%04X>" // 4-byte
      case 4 => hex2(0xd000 + rnd.nextInt(0x1000))       // near the surrogate boundary
      case _ => "(notahex)"                              // wrong token type
    }
    def section(): String = rnd.nextInt(3) match {
      case 0 =>
        val entries = (0 until 1 + rnd.nextInt(3))
          .map(_ => s"${hex1(0x40 + rnd.nextInt(8))} ${value()}").mkString(" ")
        s"1 beginbfchar $entries endbfchar"
      case 1 =>
        val a = 0x40 + rnd.nextInt(6)
        val b = a + rnd.nextInt(8) - 2 // sometimes reversed
        s"1 beginbfrange ${hex1(a)} ${hex1(b)} ${value()} endbfrange"
      case _ =>
        val a = 0x40 + rnd.nextInt(4)
        val vals = (0 until 1 + rnd.nextInt(3)).map(_ => value()).mkString(" ")
        s"1 beginbfrange ${hex1(a)} ${hex1(a + 2)} [$vals] endbfrange"
    }
    (0 until n).foreach { i =>
      val bf = (0 until 1 + rnd.nextInt(2)).map(_ => section()).mkString("\n")
      val codes = (0 until 1 + rnd.nextInt(4)).map(_ => f"${0x40 + rnd.nextInt(8)}%02X").mkString
      val content = s"BT\n70 50 TD\n/F1 12 Tf\n[<$codes>] TJ\n(tail) Tj\nET\n"
      val pdf = graft.pipeline.MiniPdf.synthesizeWithCMap(content, bf)
      if (sys.env.get("GRAFT_CMAP_DUMP").contains(i.toString))
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/cmapfuzz.pdf"), pdf)
      check(RefBinary.parity(s"cmap-fuzz-$i", pdf, ExtractText, "text"))
      check(RefBinary.parity(s"cmap-fuzz-$i", pdf, ExtractChars, "chars"))
      check(RefBinary.parity(s"cmap-fuzz-$i", pdf, ExtractRawContent, "raw-content"))
      check(RefBinary.parity(s"cmap-fuzz-$i", pdf, ExtractFont, "font",
        normalize = RefBinary.normalizeFont))
      checkSpans(s"cmap-fuzz-$i", pdf)
    }
  }

  /** Font Debug ESCAPING (round-7 font-mode mutation find, plain index 27):
    * the reference prints every font string field via `{:?}` (body.rs:206-213),
    * so a control or high byte inside a NAME — which the tokenizer admits
    * byte-as-char, CharacterSet::Regular covers everything outside
    * whitespace/delimiters (tokenizer.rs:80-90) — renders as \u{..}. Our
    * display leaked the raw char until PdfFont.display routed through
    * rustStrDebug. Patch BaseFont in place (same byte length — xref offsets
    * must hold) with C1/C0 controls, a DEL, and a quote-adjacent backslash.
    */
  test("font names with control/high bytes Debug-escape identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val base = graft.pipeline.MiniPdf.synthesize("font escape probe text")
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf("/Helvetica")
    require(at > 0, "Helvetica base font not found in the synthesized fixture")
    Seq("Helv\u0083tica", "H\u0001lvetic\u007f", "He\u00e9vetica", "Helv\\tica")
      .foreach { repl =>
        require(repl.length == "Helvetica".length, s"patch '$repl' must preserve length")
        val mutated = base.clone()
        val bytes = repl.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        System.arraycopy(bytes, 0, mutated, at + 1, bytes.length)
        check(RefBinary.parity(s"font-escape '$repl'", mutated, ExtractFont, "font",
          normalize = RefBinary.normalizeFont))
      }
  }

  test("negative xref offset panics identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val base = graft.pipeline.MiniPdf.synthesize("negative offset probe text")
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val freeEnd = s.indexOf("0000000000 65535 f \n") + 19 // the '\n' slot
    require(freeEnd > 19, "free entry not found")
    for (b <- Seq('-', '+')) { // '+0000000009' stays positive — accept parity
      val mutated = base.clone()
      mutated(freeEnd) = b.toByte
      check(RefBinary.parity(s"xref-entry sign '$b'", mutated, ExtractText, "text"))
    }
  }

  /** Seeded BYTE-MUTATION fuzz: random single/double byte flips over a valid
    * document must keep the engines in behavioral lockstep — identical
    * output when the reference accepts, a strict throw whenever it refuses
    * (any nonzero exit: panic, abort, stack overflow). Mutations that HANG
    * the reference are skipped and counted (the engine's poison guards —
    * depth caps, SOE backstop — intentionally terminate where the reference
    * may not; a hang is not a correctness signal either way). The base stays
    * UNCOMPRESSED: corrupt-zlib behavior would compare the vendored inflate
    * stub against the JDK Inflater, not reference semantics. Size scales
    * with GRAFT_MUTATE_FUZZ (default 120). (First run caught the lone-')'
    * lexer divergence and the missing-operand exception leak.)
    */
  test("byte-mutation fuzz: flip parity with the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val n = sys.env.getOrElse("GRAFT_MUTATE_FUZZ", "120").toInt
    // Base menu shared with the MutProbe replay tool (SYNC CONTRACT there):
    // four uncompressed document shapes — plain, multi-Tj spans, a kids-array
    // page tree, and a /Prev-chained incremental chain — so flips reach the
    // page-tree walk and the Prev recursion, not just the single-page path
    // (round-7: the plain base alone needed 32k mutations to surface the
    // negative-offset find; shape variety beats depth).
    // GRAFT_MUTATE_MODE widens deep runs to other output surfaces — chars in
    // particular stresses the RustFmt f32 formatter with matrices the grammar
    // menu never writes (mutated digits/signs inside TD/cm operands); font
    // (order-normalized — the reference's HashMap iteration is per-process
    // random) is the one mode whose output comes from the OBJECT layer, so
    // mutations in the fonts dict / page tree / xref that text mode shrugs
    // off are load-bearing there.
    val (mode, flag, norm) = sys.env.getOrElse("GRAFT_MUTATE_MODE", "text") match {
      case "chars" => (ExtractChars, "chars", identity[String] _)
      case "raw"   => (ExtractRawContent, "raw-content", identity[String] _)
      case "font"  => (ExtractFont, "font", RefBinary.normalizeFont _)
      case _       => (ExtractText, "text", identity[String] _)
    }
    var hung = 0
    graft.tools.MutProbe.bases.foreach { case (name, seed, mk) =>
      val base = mk()
      val rnd = new scala.util.Random(seed)
      (0 until n).foreach { i =>
        val m = base.clone()
        (0 to rnd.nextInt(2)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        RefBinary.parity(s"$name mutation $i ($flag)", m, mode, flag,
          hangIsSkip = true, normalize = norm) match {
          case Left(msg)    => fail(msg)
          case Right(false) => hung += 1
          case Right(true)  => ()
        }
      }
    }
    info(s"${n * graft.tools.MutProbe.bases.length} mutations checked (${graft.tools.MutProbe.bases.length} bases), $hung hung-reference skips")
  }

  /** Seeded GRAMMAR FUZZ of the content state machine: random operator
    * streams assembled from the full instruction menu (text showing, matrix
    * ops, state save/restore, paths, colors, unknown operators, malformed
    * arities, stray tokens, inline dicts, BT/ET imbalance) must behave
    * identically — output parity when the reference accepts, panic parity
    * when it refuses. Explores interleavings the hand-written probes cannot.
    * Size scales with GRAFT_QUIRK_FUZZ (default 60 streams x 3 modes).
    */
  test("grammar fuzz: random operator streams behave identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val n = sys.env.getOrElse("GRAFT_QUIRK_FUZZ", "60").toInt
    val rnd = new scala.util.Random(42)
    def num(): String = rnd.nextInt(7) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => (-rnd.nextInt(600)).toString
      case 2 => f"${rnd.nextDouble() * 100}%.2f"
      case 3 => "0"
      // f32 extremes (round 7): magnitudes at/over f32 max (saturate to
      // inf), denormals, and >2^24 integers — chars mode must format every
      // one byte-identically (RustFmt.f32 incl. inf/-0.0/denormal forms)
      case 4 => ("1" + "0" * (35 + rnd.nextInt(6))) + (if (rnd.nextBoolean()) "" else ".5")
      case 5 => "-0." + "0" * (30 + rnd.nextInt(15)) + (1 + rnd.nextInt(9))
      case _ => f"${-rnd.nextDouble()}%.3f"
    }
    def str(): String = {
      val words = Seq("fox", "Zq9", "a b", "\\101", "\\n", "x\\(y\\)", "")
      "(" + Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.length))).mkString(" ") + ")"
    }
    def hexStr(): String = "<" + Seq.fill(1 + rnd.nextInt(6))("48656C"(rnd.nextInt(6))).mkString + ">"
    def op(): String = rnd.nextInt(18) match {
      case 0 => s"${num()} ${num()} TD\n"
      case 1 => s"${num()} ${num()} Td\n"
      case 2 => "/F1 12 Tf\n"
      case 3 => s"${str()} Tj\n"
      case 4 => s"[${str()} ${num()} ${str()}] TJ\n"
      case 5 => s"${num()} ${num()} ${num()} ${num()} ${num()} ${num()} cm\n"
      case 6 => "q\n"
      case 7 => "Q\n"
      case 8 => s"${num()} ${num()} m\n"
      case 9 => s"${num()} ${num()} l\n"
      case 10 => s"${num()} w\n"
      case 11 => s"${num()} ${num()} ${num()} rg\n"
      case 12 => s"${hexStr()} Tj\n"
      case 13 => s"${num()} zz${rnd.nextInt(3)}\n" // unknown operator
      case 14 => s"<< /W ${num()} /H ${num()} >>\n" // inline dict — skipped wholesale
      case 15 => "BT\n" // nested/imbalanced text objects
      case 16 => "ET\n"
      case 17 => // inline image: BI/ID/EI ride the unknown-op path; the payload
        // after ID is lexed as ordinary tokens over the lossy-decoded stream
        val payloads = Seq("ÿþ", "AB", "é", "%x", "<41>", "(p)", "*")
        s"BI /W ${1 + rnd.nextInt(4)} /H 1 ID ${payloads(rnd.nextInt(payloads.length))} EI\n"
    }
    (0 until n).foreach { i =>
      val body = Seq.fill(2 + rnd.nextInt(12))(op()).mkString
      val content = s"BT\n/F1 12 Tf\n$body ET\n"
      val pdf = graft.pipeline.MiniPdf.synthesizeRawContent(content)
      check(RefBinary.parity(s"fuzz-$i", pdf, ExtractText, "text"))
      check(RefBinary.parity(s"fuzz-$i", pdf, ExtractChars, "chars"))
      check(RefBinary.parity(s"fuzz-$i", pdf, ExtractRawContent, "raw-content"))
      checkSpans(s"fuzz-$i", pdf)
    }
  }

  test("negative /Length takes the stream to EOF identically to the binary (round-8 objstm-fuzz find)") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    // the reference converts Length with `as usize` (object.rs:135): a
    // negative i32 wraps to ~2^64 and take() clamps at EOF — so text/chars
    // panic at the dangling TStreamEnd and raw-content dumps everything
    // after `stream`. Found by the lenient ObjStm mutation sweep (a '-'
    // flipped into /Length raised a raw IllegalArgumentException in nextN);
    // the fix lives in the SHARED lexer, so gate it strict too.
    val base = graft.pipeline.MiniPdf.synthesize("negative length probe words")
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf("/Length ")
    val m = base.clone()
    m(at + 8) = '-'.toByte // same-width patch: xref offsets stay valid
    check(RefBinary.parity("neg-length", m, ExtractText, "text"))
    check(RefBinary.parity("neg-length", m, ExtractChars, "chars"))
    check(RefBinary.parity("neg-length", m, ExtractRawContent, "raw-content"))
  }

  /** TJ-ARRAY STRUCTURAL fuzz (VERDICT r7 #8): the grammar menu writes only
    * well-formed `[str num str] TJ` triples, so the TJ ARRAY PARSER's edges —
    * foreign element types (names, booleans, dicts, refs, comments), nested
    * arrays, dropped/doubled brackets, a missing TJ, bracket-first streams —
    * stay unexplored by it. Half the streams run against a live /ToUnicode
    * CMap (the TJ path that maps hex codes; Tj stays byte-as-char), so the
    * structural edges hit BOTH assembly routes. Chars mode is the sharp
    * gate (per-glyph diagnostic lines expose element-level divergence that
    * concatenated text can mask); text-mode parity and the span invariant
    * ride along. Size scales with GRAFT_TJ_FUZZ (default 60 x 2 shapes).
    */
  test("TJ structural fuzz: array-shape mutations behave identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val n = sys.env.getOrElse("GRAFT_TJ_FUZZ", "60").toInt
    val rnd = new scala.util.Random(101)
    def num(): String = rnd.nextInt(5) match {
      case 0 => (rnd.nextInt(2000) - 1000).toString
      case 1 => f"${rnd.nextDouble() * 200 - 100}%.3f"
      case 2 => "-0"
      case 3 => ("1" + "0" * (30 + rnd.nextInt(8))) // f32 saturation via kern
      case _ => "." + rnd.nextInt(100) // bare-dot real
    }
    def lit(): String = {
      val w = Seq("kern", "a b", "\\051", "x\\\\y", "", "Zz9", "\\n")
      "(" + w(rnd.nextInt(w.length)) + ")"
    }
    def hexs(): String = { // odd nibble counts exercise the implied-0 pad
      val digits = "0123456789ABCDEFabcdef"
      "<" + Seq.fill(1 + rnd.nextInt(5))(digits(rnd.nextInt(digits.length))).mkString + ">"
    }
    def elem(depth: Int): String = rnd.nextInt(if (depth > 0) 10 else 8) match {
      case 0 => lit()
      case 1 => hexs()
      case 2 | 3 => num()
      case 4 => "/Kern" + rnd.nextInt(3) // name inside the array
      case 5 => Seq("true", "false", "null")(rnd.nextInt(3))
      case 6 => s"${1 + rnd.nextInt(9)} 0 R" // indirect-ref shaped tokens
      case 7 => "% c\n" // comment inside the array
      case 8 => "[" + Seq.fill(1 + rnd.nextInt(3))(elem(depth - 1)).mkString(" ") + "]"
      case _ => "<< /K 1 >>"
    }
    (0 until n).foreach { i =>
      val body = Seq.fill(1 + rnd.nextInt(8))(elem(2)).mkString(" ")
      var tj = s"[$body] TJ\n"
      // structural edits: drop/double a bracket, drop the operator, orphan
      // a closer — each ~1/8 of streams
      rnd.nextInt(8) match {
        case 0 => tj = tj.replaceFirst("\\[", "")
        case 1 => tj = tj.replace("] TJ", " TJ")
        case 2 => tj = tj.replace("] TJ", "]] TJ")
        case 3 => tj = tj.replace("] TJ", "]")
        case 4 => tj = "] " + tj
        case _ => ()
      }
      val content = s"BT\n70 50 TD\n/F1 12 Tf\n$tj(tail) Tj\nET\n"
      val pdf = (i % 3) match {
        case 0 => graft.pipeline.MiniPdf.synthesizeRawContent(content)
        case 1 => graft.pipeline.MiniPdf.synthesizeWithCMap(content,
          "3 beginbfchar <41> <0058> <42> <0059> <43> <005A> endbfchar")
        case _ => graft.pipeline.MiniPdf.synthesizeWithCMap(content,
          // two-byte codespace: hex codes pair up, odd tails pad — the other
          // TJ-with-cmap assembly route
          "2 beginbfchar <0041> <0058> <0042> <0059> endbfchar", twoByte = true)
      }
      val shape = Seq("plain", "cmap", "cmap2")(i % 3)
      check(RefBinary.parity(s"tj-$i-$shape", pdf, ExtractChars, "chars"))
      check(RefBinary.parity(s"tj-$i-$shape", pdf, ExtractText, "text"))
      checkSpans(s"tj-$i-$shape", pdf)
    }
  }

  /** DEEP-NESTING grammar fuzz (VERDICT r6 #3): the flat menu above reaches
    * q/Q//BT/ET only as isolated random ops, so deep save/restore stacks and
    * structured BT..ET blocks with injected imbalance stay unexplored. This
    * generator builds RECURSIVE block structure — q..Q and BT..ET blocks
    * nested to depth ~8 with text-showing bodies — then randomly drops an
    * opener or closer (~1/3 of streams), which drives the reference's
    * graphics-stack pop-on-empty panic (content.rs:127-132) and the tm/tlm
    * reset interaction of re-entered BT. Output parity when the reference
    * accepts, panic parity when it refuses, span invariant on every accepted
    * stream. Size scales with GRAFT_DEEP_FUZZ (default 80 streams x 3 modes).
    */
  test("deep-nesting fuzz: nested q/Q + BT/ET imbalance behaves identically to the binary") {
    assume(RefBinary.present, s"reference binary not built — run tools/refbuild/build.sh")
    val n = sys.env.getOrElse("GRAFT_DEEP_FUZZ", "80").toInt
    val rnd = new scala.util.Random(77)
    def leaf(): String = rnd.nextInt(4) match {
      case 0 => s"(${"deep" + rnd.nextInt(100)}) Tj\n"
      case 1 => s"${rnd.nextInt(100)} ${rnd.nextInt(100) - 50} TD\n"
      case 2 => s"${rnd.nextInt(3)} ${rnd.nextInt(3)} ${rnd.nextInt(3)} ${rnd.nextInt(3)} ${rnd.nextInt(40)} ${rnd.nextInt(40)} cm\n"
      case _ => "/F1 12 Tf\n"
    }
    def block(depth: Int): String = {
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => "q\n" + Seq.fill(1 + rnd.nextInt(2))(block(depth - 1)).mkString + "Q\n"
        case 1 => "BT\n/F1 12 Tf\n" + Seq.fill(1 + rnd.nextInt(2))(block(depth - 1)).mkString + "ET\n"
        case _ => leaf() + (if (rnd.nextBoolean()) block(depth - 1) else "")
      }
    }
    (0 until n).foreach { i =>
      var content = "BT\n/F1 12 Tf\n(top) Tj\nET\n" + block(3 + rnd.nextInt(5))
      // imbalance injection: drop ONE random opener or closer occurrence
      if (rnd.nextInt(3) == 0) {
        val tok = Seq("q\n", "Q\n", "BT\n", "ET\n")(rnd.nextInt(4))
        val at = content.indexOf(tok)
        if (at >= 0) content = content.substring(0, at) + content.substring(at + tok.length)
      }
      // or prepend a bare closer: pops the empty stack immediately
      if (rnd.nextInt(5) == 0) content = "Q\n" + content
      val pdf = graft.pipeline.MiniPdf.synthesizeRawContent(content)
      check(RefBinary.parity(s"deep-$i", pdf, ExtractText, "text"))
      check(RefBinary.parity(s"deep-$i", pdf, ExtractChars, "chars"))
      check(RefBinary.parity(s"deep-$i", pdf, ExtractRawContent, "raw-content"))
      checkSpans(s"deep-$i", pdf)
    }
  }
}
