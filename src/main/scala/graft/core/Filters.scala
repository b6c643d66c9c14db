package graft.core

/** ASCIIHexDecode + LZWDecode stream filters — LENIENT-mode engine extension
  * (PDF 32000-1 §7.4.2 / §7.4.4). The reference supports only FlateDecode and
  * panics on every other filter name (body.rs:42-54); strict mode replicates
  * that panic byte-for-byte, so these decoders are reachable ONLY through
  * `Pdf.lenient` / the `pdf-b64-lenient` pipeline route — the same flag
  * discipline as the lenient xref layer (core/Lenient.scala). The encoders are
  * fixture support for the round-trip gates (MiniPdf synthesizes filtered
  * documents with them) and are deterministic.
  */
object LenientFilters {

  // ---- ASCIIHexDecode -----------------------------------------------------------

  /** Hex pairs; PDF whitespace is ignored, '>' is EOD, an odd trailing digit
    * behaves as if followed by '0'. Any other character fails the parse (the
    * pipeline's per-row error column catches it).
    */
  def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c == '>') { done = true; -1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0c || c == 0) -1
        else Err.fail(s"ASCIIHexDecode: invalid character 0x${c.toHexString}")
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: implicit trailing '0'
    out.toByteArray
  }

  /** Fixture support: uppercase hex + EOD marker. */
  def asciiHexEncode(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](data.length * 2 + 1)
    val digits = "0123456789ABCDEF"
    var i = 0
    while (i < data.length) {
      out(2 * i) = digits.charAt((data(i) & 0xff) >> 4).toByte
      out(2 * i + 1) = digits.charAt(data(i) & 0x0f).toByte
      i += 1
    }
    out(out.length - 1) = '>'
    out
  }

  // ---- LZWDecode ----------------------------------------------------------------

  private val ClearCode = 256
  private val Eod = 257
  private val MaxCode = 4095

  /** LZW: MSB-first 9..12-bit codes, 256 = clear-table, 257 = EOD. With
    * `earlyChange = 1` (the PDF default) the decoder's code width grows when
    * the next free table entry reaches (1<<width)-1 — one code EARLIER than
    * the table forces (the TIFF/PDF early-change off-by-one; pdf.js and
    * Ghostscript decode the same way); `earlyChange = 0` (via /DecodeParms
    * /EarlyChange 0, round 5) switches exactly at (1<<width). A truncated
    * stream (missing EOD) returns what was decoded; an out-of-range code
    * fails the parse.
    */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    require(earlyChange == 0 || earlyChange == 1, s"EarlyChange must be 0 or 1, got $earlyChange")
    val delta = earlyChange
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 16)
    val prefix = new Array[Int](MaxCode + 1) // entries 258..: (prefix code, appended byte)
    val append = new Array[Byte](MaxCode + 1)
    val scratch = new Array[Byte](MaxCode + 2)
    var nextCode = 258
    var width = 9
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0

    // expansion of `code` is emitted to out; returns its first byte
    def emit(code: Int): Byte = {
      var c = code
      var n = 0
      while (c >= 258) { scratch(n) = append(c); n += 1; c = prefix(c) }
      scratch(n) = c.toByte
      val first = scratch(n)
      while (n >= 0) { out.write(scratch(n)); n -= 1 }
      first
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }

    var done = false
    while (!done) {
      while (bitCnt < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xffL); bitCnt += 8; i += 1
      }
      if (bitCnt < width) done = true // truncated: EOD never arrived
      else {
        bitCnt -= width
        val code = ((bitBuf >>> bitCnt) & ((1L << width) - 1)).toInt
        if (code == Eod) done = true
        else if (code == ClearCode) { nextCode = 258; width = 9; prev = -1 }
        else if (prev < 0) {
          if (code > 255) Err.fail(s"LZWDecode: first code after clear must be a literal, got $code")
          emit(code)
          prev = code
        } else {
          if (code > nextCode) Err.fail(s"LZWDecode: code $code out of range (next $nextCode)")
          // register the pending entry BEFORE emitting: a KwKwK code (code ==
          // nextCode) refers to exactly this entry
          val fb = firstByteOf(if (code < nextCode) code else prev)
          if (nextCode <= MaxCode) {
            prefix(nextCode) = prev; append(nextCode) = fb; nextCode += 1
            if (width < 12 && nextCode == (1 << width) - delta) width += 1 // (early) change
          }
          emit(code)
          prev = code
        }
      }
    }
    out.toByteArray
  }

  /** Fixture support: LZW encoder paired with the decoder above (clear
    * emitted at table-full). The encoder's table leads the decoder's by one
    * entry, so its width switch fires one entry after the decoder's at either
    * EarlyChange — the pairing is round-trip-gated in LenientSpec, including
    * across 9->10->11-bit boundaries and the KwKwK case, for BOTH settings.
    */
  def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    require(earlyChange == 0 || earlyChange == 1, s"EarlyChange must be 0 or 1, got $earlyChange")
    val delta = earlyChange
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def write(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) { bitCnt -= 8; out.write(((bitBuf >>> bitCnt) & 0xff).toInt) }
    }
    var table = new scala.collection.mutable.LongMap[Int]()
    var nextCode = 258
    write(ClearCode)
    var cur = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        val hit = table.getOrElse(key, -1)
        if (hit >= 0) cur = hit
        else {
          write(cur)
          table.update(key, nextCode)
          nextCode += 1
          if (width < 12 && nextCode == (1 << width) + 1 - delta) width += 1
          if (nextCode >= MaxCode) { // table (nearly) full: clear both sides
            write(ClearCode) // at the current width; both sides then reset to 9
            table = new scala.collection.mutable.LongMap[Int]()
            nextCode = 258; width = 9
          }
          cur = b // restart the phrase at this byte (post-clear: a literal)
        }
      }
      i += 1
    }
    if (cur >= 0) {
      write(cur)
      // EOD-tail sync: the decoder registers ONE more table entry for this
      // final code (its lag on the encoder closes at the flush, because the
      // flush emit adds no encoder entry). If that registration lands the
      // decoder's nextCode exactly on (1<<width)-1, the decoder widens BEFORE
      // reading the next code — so EOD must be written at the wider width or
      // it is misread as a data code (silent garbage or a spurious failure).
      if (width < 12 && nextCode == (1 << width) - delta) width += 1
    }
    write(Eod)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt) // zero-pad
    out.toByteArray
  }

  // ---- DCTDecode ----------------------------------------------------------------

  /** A DCT-decoded image: raster samples row-major, bands interleaved per
    * pixel (for 8-bit grayscale: exactly the gray bytes).
    */
  final case class DctImage(width: Int, height: Int, bands: Int, samples: Array[Byte])

  // shared across every ImageIO user in the engine (DCT decode, multimodal
  // pixel decode, JPEG fixture encode): the default cache writes temp FILES
  // per decode — pure-memory streams keep executor hot paths off the disk
  private[graft] lazy val imageioInit: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** DCTDecode (PDF 32000-1 §7.4.8): decode the JPEG stream with the JDK's
    * built-in `javax.imageio` reader — no external codec. The reference panics
    * on the filter name (body.rs:42-54); strict mode keeps that panic, so this
    * is reachable only through the lenient flag, like ASCIIHex/LZW above.
    * Decode failures are loud (per-row error column semantics), never partial.
    */
  def dctDecodeImage(data: Array[Byte]): DctImage = {
    imageioInit
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case scala.util.control.NonFatal(e) =>
        Err.fail(s"DCTDecode: JPEG decode failed: ${e.getMessage}") }
    if (img == null) Err.fail("DCTDecode: no registered reader accepts the stream")
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight; val bands = raster.getNumBands
    val out = new Array[Byte](w * h * bands)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { out(i) = raster.getSample(x, y, b).toByte; i += 1; b += 1 }
        x += 1
      }
      y += 1
    }
    DctImage(w, h, bands, out)
  }

  /** Stream-filter form: the decoded data of a DCTDecode stream is its raster
    * sample bytes (the form downstream image consumers want; a DCT stream is
    * never lexed as content).
    */
  def dctDecode(data: Array[Byte]): Array[Byte] = dctDecodeImage(data).samples
}
