package graft.core

import scala.collection.mutable

/** ToUnicode CMap — cmap.rs:4-155. Parsed token-wise from the (decoded) CMap stream.
  * `isTwoBytes` derives from the first codespacerange hex length (1 byte -> false,
  * 2 -> true, else panic — cmap.rs:41-45). Values are single UTF-16 code units; an
  * unpaired surrogate panics exactly like Rust `char::decode_utf16` (cmap.rs:74).
  */
final case class ToUnicodeCMap(
    beginCodeSpaceRange: Array[Byte],
    endCodeSpaceRange: Array[Byte],
    isTwoBytes: Boolean,
    cmap: Map[Int, Char]
)

object ToUnicodeCMap {

  def parse(value: String): ToUnicodeCMap = {
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tok = new PdfTokenizer(bytes, 0)

    def peek(): Tok = tok.copyCursor.next()

    // scan to begincodespacerange — cmap.rs:18-24
    var scanning = true
    while (scanning) {
      tok.next() match {
        case b: TBare if bEq(b.bytes, "begincodespacerange") => scanning = false
        case null => Err.fail("Reached end of cmap stream before complete")
        case _    => ()
      }
    }
    val begin = tok.next() match {
      case h: THex => h.bytes
      case t       => Err.fail(s"Cmap begincodespacerange next token should be HexString, found $t")
    }
    val end = tok.next() match {
      case h: THex => h.bytes
      case t       => Err.fail(s"Cmap endcodespacerange next token should be HexString, found $t")
    }
    val isTwoBytes = begin.length match {
      case 1 => false
      case 2 => true
      case n => Err.fail(s"Cmap index with byte length $n is not supported")
    }

    val cmap = mutable.HashMap.empty[Int, Char]

    def hexKey(x: Array[Byte], what: String): Int = x.length match {
      case 2 => (x(0) & 0xff) * 256 + (x(1) & 0xff)
      case 1 => x(0) & 0xff
      case n => Err.fail(s"$what should contain one or two bytes, found $n")
    }

    def utf16Char(code: Int): Char = {
      if (code >= 0xd800 && code <= 0xdfff) Err.fail("unpaired surrogate in cmap value")
      code.toChar
    }

    def hexVal(x: Array[Byte]): Int = {
      if (x.length < 2) Err.fail("CMap value hex string too short")
      (x(0) & 0xff) * 256 + (x(1) & 0xff)
    }

    var t = tok.next()
    while (t != null) {
      t match {
        case b: TBare if bEq(b.bytes, "beginbfchar") =>
          var done = false
          while (!done) {
            peek() match {
              case p: TBare if bEq(p.bytes, "endbfchar") => done = true
              case _ =>
                val key = tok.next() match {
                  case h: THex => hexKey(h.bytes, "BFChar key")
                  case null    => Err.fail("CMap unreadable because end of cmap file is reached")
                  case tk      => Err.fail(s"CMap key should be an hex string, found $tk")
                }
                val v = tok.next() match {
                  case h: THex => utf16Char(hexVal(h.bytes))
                  case null    => Err.fail("CMap unreadable because end of cmap file is reached")
                  case tk      => Err.fail(s"CMap val should be an hex string, found $tk")
                }
                cmap(key) = v
            }
          }
        case b: TBare if bEq(b.bytes, "beginbfrange") =>
          var done = false
          while (!done) {
            peek() match {
              case p: TBare if bEq(p.bytes, "endbfrange") => done = true
              case _ =>
                val src1 = tok.next() match {
                  case h: THex => hexKey(h.bytes, "BFRange first source code")
                  case null    => Err.fail("CMap unreadable because end of cmap file is reached")
                  case tk      => Err.fail(s"CMap srcCode1 should be an hex string, found $tk")
                }
                val src2 = tok.next() match {
                  case h: THex => hexKey(h.bytes, "BFRange second source code")
                  case null    => Err.fail("CMap unreadable because end of cmap file is reached")
                  case tk      => Err.fail(s"CMap srcCode2 should be an hex string, found $tk")
                }
                tok.next() match {
                  case h: THex =>
                    // incrementing form — cmap.rs:107-122
                    var dst = hexVal(h.bytes)
                    var idx = src1
                    while (idx <= src2) {
                      cmap(idx) = utf16Char(dst)
                      dst += 1
                      idx += 1
                    }
                  case TArrayBegin =>
                    // array form — cmap.rs:124-138
                    var idx = 0
                    var arrDone = false
                    while (!arrDone) {
                      tok.next() match {
                        case TArrayEnd => arrDone = true
                        case h: THex =>
                          cmap(src1 + idx) = utf16Char(hexVal(h.bytes))
                          idx += 1
                        case null => Err.fail("CMap unreadable because end of cmap file is reached")
                        case tk   => Err.fail(s"CMap range should only contain hex strings, found $tk")
                      }
                    }
                  case null => Err.fail("CMap unreadable because end of cmap file is reached")
                  case tk   => Err.fail(s"CMap dst_string should be an hex string or an array, found $tk")
                }
            }
          }
        case _ => ()
      }
      t = tok.next()
    }

    ToUnicodeCMap(begin, end, isTwoBytes, cmap.toMap)
  }

  private def bEq(a: Array[Byte], s: String): Boolean = {
    if (a.length != s.length) return false
    var i = 0
    while (i < a.length) { if (a(i) != s.charAt(i)) return false; i += 1 }
    true
  }
}
