package graft.core

import java.util.zip.{DataFormatException, Inflater}

/** FlateDecode with the reference's exact buffer semantics — filters.rs:4-14:
  * the output buffer is exactly 10x the compressed size and the WHOLE buffer is
  * returned: decoded data followed by zero padding (or silently truncated at 10x).
  * The padding is benign for lexing (NUL is whitespace, tokenizer.rs:23) but visible
  * in RawContent output, so it must be preserved for fixture parity.
  */
object Flate {

  /** Exact-size decode, still TRUNCATED at the reference's 10x-compressed cap
    * (filters.rs:7-9 semantics) but without the trailing zero padding. Safe ONLY
    * where the padding is semantically invisible: content streams for Text/Chars
    * interpretation and ToUnicode CMaps re-lex the bytes and NUL is whitespace to
    * the tokenizer (tokenizer.rs:23). RawContent output and xref-stream bodies
    * keep the padded `flateDecode` — the padding is golden-visible there.
    * Motivation: the 10x zero-filled allocation per stream is the dominant GC
    * pressure at high core counts (BENCH.md: G1 pause storms at local[32]).
    */
  def flateDecodeExact(input: Array[Byte]): Array[Byte] = {
    val cap = input.length * 10
    var buf = new Array[Byte](math.max(64, math.min(cap, input.length * 4)))
    val inf = new Inflater()
    inf.setInput(input)
    try {
      var off = 0
      var stalled = false
      while (!inf.finished() && off < cap && !stalled) {
        if (off == buf.length) buf = java.util.Arrays.copyOf(buf, math.min(cap, buf.length * 2L).toInt)
        val n = inf.inflate(buf, off, buf.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        else off += n
      }
      if (off == buf.length) buf else java.util.Arrays.copyOf(buf, off)
    } catch {
      case e: DataFormatException => Err.fail(s"Error: ${e.getMessage}")
    } finally {
      inf.end()
    }
  }

  def flateDecode(input: Array[Byte]): Array[Byte] = {
    val buf = new Array[Byte](input.length * 10)
    val inf = new Inflater()
    inf.setInput(input)
    try {
      var off = 0
      var stalled = false
      while (!inf.finished() && off < buf.length && !stalled) {
        val n = inf.inflate(buf, off, buf.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        else off += n
      }
      buf
    } catch {
      case e: DataFormatException => Err.fail(s"Error: ${e.getMessage}")
    } finally {
      inf.end()
    }
  }
}
