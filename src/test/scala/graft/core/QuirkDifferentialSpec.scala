package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** QUIRK retro-validation against the live reference binary (round 6): every
  * replicated-from-source quirk the engine carries (CLAUDE.md invariants) is
  * now CHECKED against the binary's actual behavior on crafted content
  * streams, not just inferred from reading the Rust. Contract per probe:
  * both engines succeed with byte-identical --text output, or the reference
  * exits nonzero AND strict mode throws. Cancels (never fails) when the
  * binary is absent — build it with tools/refbuild/build.sh.
  */
class QuirkDifferentialSpec extends AnyFunSuite {

  private val bin = "/tmp/refbuild/target/release/pdfrust"
  private def binaryPresent = new java.io.File(bin).exists

  private def runRef(pdf: Array[Byte]): (Int, String) = {
    val f = java.nio.file.Files.createTempFile("graftquirk", ".pdf")
    java.nio.file.Files.write(f, pdf)
    try {
      val pb = new ProcessBuilder(bin, "--text", f.toString)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      (p.waitFor(), out)
    } finally java.nio.file.Files.delete(f)
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
      "BT\n2 Tw\n110 Tz\n14 TL\n70 50 TD\n/F1 12 Tf\n(ops) Tj\nET\n"
  )

  test("quirk probes: crafted content streams behave byte-identically to the binary") {
    assume(binaryPresent, s"reference binary not built ($bin) — run tools/refbuild/build.sh")
    probes.foreach { case (name, content) =>
      val pdf = graft.pipeline.MiniPdf.synthesizeRawContent(content)
      val (rc, refOut0) = runRef(pdf)
      // the reference println!s an unknown-operator DIAGNOSTIC straight to
      // stdout during parsing ("Content token operator Ok(..) is not known,
      // operands [..]") — a side effect interleaved before the extract
      // output, not part of the returned string (probe-verified round 6);
      // strip those lines so the compare targets extraction semantics
      val refOut = refOut0.split("\n", -1)
        .filterNot(_.startsWith("Content token operator ")).mkString("\n")
      val oursE = try Right(Pdf(pdf).extract(ExtractText) + "\n") catch {
        case e: PdfParseException => Left(e)
      }
      (rc, oursE) match {
        case (0, Right(o)) => assert(o == refOut,
          s"$name: outputs diverge (ref=${refOut.take(60)} ours=${o.take(60)})")
        case (n, Left(_)) if n != 0 => () // both refuse — parity
        case (0, Left(e)) => fail(s"$name: reference succeeds, strict throws: ${e.getMessage}")
        case (n, Right(o)) => fail(s"$name: reference exits $n, strict returns ${o.take(60)}")
      }
    }
  }
}
