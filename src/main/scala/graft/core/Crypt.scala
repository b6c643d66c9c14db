package graft.core

/** Standard security handler decryption — LENIENT-mode engine extension
  * (PDF 32000-1 §7.6.2-7.6.4, revisions 2 and 3: RC4-40/RC4-128, EMPTY user
  * password). The reference ignores the trailer's /Encrypt key entirely
  * (xref.rs:136-146 parses-and-drops it), so it inflates RC4 ciphertext and
  * panics/garbles; strict mode replicates that exactly. Only `Pdf.lenient`
  * derives the file key, VERIFIES the /U entry against the empty user
  * password (anything else fails loudly — no silent garbage), and RC4-decrypts
  * STREAM bytes with per-object keys. Scope, documented: string decryption is
  * not wired (strings parse deep inside the object parser without object-id
  * context); it affects Info metadata only, never extracted text.
  */
object Crypt {

  /** The 32-byte password padding string (PDF 32000-1 Table , §7.6.3.3). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // MessageDigest.getInstance takes a SYNCHRONIZED provider-registry lookup —
  // under a 32-thread executor the per-call lookups (50+ per R3 document)
  // serialize on that lock. One digest per thread, reset per use.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (symmetric: encrypt == decrypt). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def leInt(v: Int): Array[Byte] =
    Array(v, v >>> 8, v >>> 16, v >>> 24).map(b => (b & 0xff).toByte)

  /** Algorithm 2: file encryption key for the EMPTY user password.
    * `n` = key length in bytes (5 for R2, /Length/8 for R3).
    */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], n: Int, r: Int): Array[Byte] = {
    var k = md5(Pad, o, leInt(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) { k = md5(k.take(n)); i += 1 }
    }
    k.take(n)
  }

  private def xorKey(key: Array[Byte], i: Int): Array[Byte] =
    key.map(b => (b ^ i).toByte)

  /** `ownerEntry` memo — the entry is a pure function of (n, r) and fixture
    * synthesis calls it once per document.
    */
  private val ownerCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  def ownerEntryCached(n: Int, r: Int): Array[Byte] =
    ownerCache.computeIfAbsent((n, r), k => ownerEntry(k._1, k._2))

  /** Algorithm 3: the /O entry for empty owner AND user passwords. */
  def ownerEntry(n: Int, r: Int): Array[Byte] = {
    var h = md5(Pad)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val rc4key = h.take(n)
    var o = rc4(rc4key, Pad)
    if (r >= 3) {
      var i = 1
      while (i <= 19) { o = rc4(xorKey(rc4key, i), o); i += 1 }
    }
    o
  }

  /** Algorithms 4 (R2) / 5 (R3): the /U entry for the empty user password. */
  def userEntry(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) { u = rc4(xorKey(key, i), u); i += 1 }
      u ++ new Array[Byte](16) // 32-byte entry; only the first 16 are compared
    }
  }

  /** Algorithm 1 per-object key: MD5(fileKey || obj-LE24 || gen-LE16),
    * truncated to min(n+5, 16).
    */
  def objectKey(key: Array[Byte], obj: Int, gen: Int): Array[Byte] = {
    val tail = Array(obj, obj >>> 8, obj >>> 16, gen, gen >>> 8)
      .map(b => (b & 0xff).toByte)
    md5(key, tail).take(math.min(key.length + 5, 16))
  }

  /** Parsed /Encrypt state + verified file key. */
  final case class Decryptor(key: Array[Byte]) {
    def decrypt(obj: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      rc4(objectKey(key, obj, gen), data)
  }

  private def bytesOf(o: PdfObj, what: String): Array[Byte] = o match {
    case PHexStr(b) => b
    case PStr(s)    => s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    case other      => Err.fail(s"$what should be a string, found $other")
  }

  /** Build a verified decryptor from the /Encrypt dictionary + first /ID
    * element. Fails loudly on: non-Standard handlers, V > 2 / R > 3 (AES and
    * crypt filters out of scope), or a /U that does not match the EMPTY user
    * password (a passworded document must never be silently garbled).
    */
  def standardDecryptor(enc: Map[String, PdfObj], id0: Array[Byte]): Decryptor = {
    enc.get("Filter") match {
      case Some(PName("Standard")) => ()
      case other => Err.fail(s"encryption handler not supported: $other")
    }
    val v = enc.get("V") match { case Some(PNum(NInt(n))) => n; case _ => 0 }
    val r = enc.get("R") match {
      case Some(PNum(NInt(n))) => n
      case _                   => Err.fail("Encrypt dictionary requires /R")
    }
    if (v < 1 || v > 2 || r < 2 || r > 3)
      Err.fail(s"encryption V=$v R=$r not supported (RC4 V1/V2, R2/R3 only)")
    val lengthBits = enc.get("Length") match {
      case Some(PNum(NInt(n))) => n
      case None                => 40
      case _                   => Err.fail("Encrypt /Length should be an integer")
    }
    if (lengthBits % 8 != 0 || lengthBits < 40 || lengthBits > 128)
      Err.fail(s"encryption key length $lengthBits not supported")
    val n = if (r == 2) 5 else lengthBits / 8
    val o = bytesOf(enc.getOrElse("O", Err.fail("Encrypt dictionary requires /O")), "/O")
    val u = bytesOf(enc.getOrElse("U", Err.fail("Encrypt dictionary requires /U")), "/U")
    val p = enc.get("P") match {
      case Some(PNum(NInt(x))) => x
      case _                   => Err.fail("Encrypt dictionary requires /P")
    }
    val key = fileKey(o, p, id0, n, r)
    val expectU = userEntry(key, id0, r)
    val matches =
      if (r == 2) java.util.Arrays.equals(u, expectU)
      else u.length >= 16 && java.util.Arrays.equals(u.take(16), expectU.take(16))
    if (!matches)
      Err.fail("encrypted document is not openable with an empty user password")
    Decryptor(key)
  }
}
