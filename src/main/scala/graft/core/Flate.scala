package graft.core

import java.util.zip.{DataFormatException, Inflater}

/** FlateDecode with the reference's exact buffer semantics — filters.rs:4-14:
  * the output buffer is exactly 10x the compressed size and the WHOLE buffer is
  * returned: decoded data followed by zero padding (or silently truncated at 10x).
  * The padding is benign for lexing (NUL is whitespace, tokenizer.rs:23) but visible
  * in RawContent output, so it must be preserved for fixture parity.
  */
object Flate {
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
