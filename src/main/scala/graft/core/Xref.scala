package graft.core

import scala.collection.immutable.HashMap

/** Cross-reference index — xref.rs. */
sealed trait XRef {
  def get(key: (Int, Int)): Option[Int]
  def getAndFix(key: (Int, Int), bytes: Array[Byte]): Option[Int]
  def getCatalogOffset: Option[Int]
  def infoKey: Option[(Int, Int)]
}

object XRef {
  /** Empty default used where the reference builds `XRefTable::default()`. */
  val default: XRef = XrefTable(NInt(0), None, None, None, None, HashMap.empty)

  /** `XRef::new(bytes, offset)` — xref.rs:39-58: peek dispatch between the classic
    * table (leading `xref` bareword) and an xref stream object (leading numeric).
    */
  /** Max incremental-update (`/Prev`) chain length. A crafted Prev cycle would
    * otherwise recurse unboundedly (StackOverflowError escapes the per-row
    * NonFatal catch and kills the task — poison-payload hardening).
    */
  val MaxPrevChain = 64

  def parse(bytes: Array[Byte], offset: Int, depth: Int = 0): XRef = {
    if (depth > MaxPrevChain) Err.fail(s"xref Prev chain deeper than $MaxPrevChain")
    val peekTok = new PdfTokenizer(bytes, offset).next()
    peekTok match {
      case _: TBare => XrefTable.parse(bytes, offset, depth)
      case TNum(_) =>
        // parsed with a DEFAULT (empty) xref context — indirect /Length panics, as in
        // the reference (object.rs:115-131 via Lemmatizer::from)
        val ctx = new Ctx(bytes, XRef.default)
        ObjParser.parse(Lemmatizer(bytes, offset, ctx)) match {
          case s: PStream => XrefStream.from(s)
          case o          => Err.fail(s"Xref object cannot be of type $o")
        }
      case null => Err.fail("End of stream")
      case _    => Err.fail("Xref object or strign 'xref' not found")
    }
  }

  /** `startxref(bytes)` — xref.rs:286-309: BACKWARD search for the last b"startxref",
    * then the following integer.
    */
  def startxref(bytes: Array[Byte]): Int = {
    val pattern = "startxref".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = bytes.length - pattern.length
    var found = -1
    while (i >= 0 && found < 0) {
      var j = 0
      var ok = true
      while (ok && j < pattern.length) { if (bytes(i + j) != pattern(j)) ok = false else j += 1 }
      if (ok) found = i else i -= 1
    }
    if (found < 0) Err.fail("startxref pattern not found")
    val tok = new PdfTokenizer(bytes, found)
    tok.next() match {
      case b: TBare if java.util.Arrays.equals(b.bytes, pattern) => ()
      case t => Err.fail(s"Startxref string missing in tokenizer, found token $t")
    }
    tok.next() match {
      case TNum(NInt(i)) => i
      case t             => Err.fail(s"Startxref integer missing in tokenizer, found token $t")
    }
  }
}

/** Classic xref table + trailer — xref.rs:60-277. Single-subsection only (the
  * reference reads exactly one `start size` header — xref.rs:196-222).
  */
final case class XrefTable(
    size: Num,
    prev: Option[XRef],
    root: Option[(Int, Int)],
    encrypt: Option[(Int, Int)],
    info: Option[(Int, Int)],
    table: HashMap[(Int, Int), (Int, Boolean)],
    // first trailer /ID element, captured by the LENIENT resolver only (the
    // reference ignores /ID, so the strict parser leaves None — it is needed
    // solely for the lenient decryption key derivation)
    id0: Option[Array[Byte]] = None,
    // object numbers materialized OUT of object streams by the lenient
    // resolver: strings inside an ObjStm are NEVER individually encrypted
    // (PDF 32000-1 §7.5.7 — the container was encrypted once), so string
    // decryption must skip these objects
    objStmMembers: Set[Int] = Set.empty
) extends XRef {

  def len: Int = table.size

  /** xref.rs:228-243 — panic if the entry was freed; fall through the Prev chain. */
  def get(key: (Int, Int)): Option[Int] = table.get(key) match {
    case Some((off, inUse)) =>
      if (inUse) Some(off) else Err.fail("XReftable object was freed")
    case None => prev match {
      case Some(p) => p.get(key)
      case None    => None
    }
  }

  /** Self-healing lookup — xref.rs:245-268: if the bytes at the offset don't start
    * with "N G obj", linear-scan for "\nN G obj" and return match+1.
    */
  def getAndFix(key: (Int, Int), bytes: Array[Byte]): Option[Int] = get(key).map { offset =>
    // the reference slices bytes[offset..] BEFORE probing, so an offset past
    // EOF panics instead of self-healing (Rust slice range panic) — replicate
    // (round-6 stale-xref differential caught the divergence: we healed a
    // delta=+1000000 entry the reference refuses)
    if (offset > bytes.length || offset < 0)
      Err.fail(s"xref offset $offset out of range for object ${key._1} ${key._2}")
    val pattern = s"${key._1} ${key._2} obj".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (startsWithAt(bytes, offset, pattern)) offset
    else {
      val nl = new Array[Byte](pattern.length + 1)
      nl(0) = '\n'
      System.arraycopy(pattern, 0, nl, 1, pattern.length)
      val idx = indexOfSlice(bytes, nl)
      if (idx < 0) Err.fail(s"object header ${key._1} ${key._2} obj not found in byte stream")
      idx + 1
    }
  }

  def getCatalogOffset: Option[Int] = root match {
    case Some(r) => get(r)
    case None    => Err.fail("xref table has no Root")
  }

  def infoKey: Option[(Int, Int)] = info

  private def startsWithAt(bytes: Array[Byte], off: Int, pat: Array[Byte]): Boolean = {
    if (off < 0 || off + pat.length > bytes.length) return false
    var i = 0
    while (i < pat.length) { if (bytes(off + i) != pat(i)) return false; i += 1 }
    true
  }

  private def indexOfSlice(hay: Array[Byte], pat: Array[Byte]): Int = {
    var i = 0
    val end = hay.length - pat.length
    while (i <= end) {
      var j = 0
      var ok = true
      while (ok && j < pat.length) { if (hay(i + j) != pat(j)) ok = false else j += 1 }
      if (ok) return i
      i += 1
    }
    -1
  }
}

object XrefTable {
  /** `XRefTable::from(Tokenizer)` — xref.rs:78-152. */
  def parse(bytes: Array[Byte], offset: Int, depth: Int = 0): XrefTable = {
    val tok = new PdfTokenizer(bytes, offset)
    tok.next() match {
      case b: TBare if bstr(b.bytes) == "xref" => ()
      case b: TBare => Err.fail(s"Startxref string missing, found string ${bstr(b.bytes)}")
      case null => Err.fail("End of file unexpected")
      case t    => Err.fail(s"Incorrect token found at the beginning of XRefTable, found $t")
    }
    val table = readTableSubsection(tok)
    tok.next() match {
      case b: TBare if bstr(b.bytes) == "trailer" => ()
      case b: TBare => Err.fail(s"Trailer string missing, found string ${bstr(b.bytes)}")
      case null => Err.fail("End of file")
      case t    => Err.fail(s"Incorrect token found at the beginning of trailer, found $t")
    }
    // trailer dict parsed over a CLONE of the cursor with a default xref context —
    // xref.rs:112-115 (Object::from(tokenizer.clone()))
    val ctx = new Ctx(bytes, XRef.default)
    val trailer = ObjParser.parse(new Lemmatizer(tok.copyCursor, ctx)) match {
      case PDict(d) => d
      case _        => Err.fail("Trailer should be a dictionary")
    }
    XrefTable(
      size = trailer.get("Size") match {
        case Some(PNum(n)) => n
        case _             => Err.fail("Size should be a numeric")
      },
      prev = trailer.get("Prev") match {
        case Some(PNum(NInt(off))) => Some(XRef.parse(bytes, off, depth + 1))
        case None                  => None
        case _                     => Err.fail("Prev should be a numeric")
      },
      root = trailer.get("Root") match {
        case Some(PRef(o, g, _)) => Some((o, g))
        case _                   => Err.fail("Root should be a Catalog object")
      },
      encrypt = trailer.get("Encrypt") match {
        case Some(PRef(o, g, _)) => Some((o, g))
        case None                => None
        case _                   => Err.fail("Encrypt should be an indirect object")
      },
      info = trailer.get("Info") match {
        case Some(PRef(o, g, _)) => Some((o, g))
        case None                => None
        case _                   => Err.fail("Info should be an indirect object")
      },
      table = table
    )
  }

  /** Single subsection: `start size` then `size` entries — xref.rs:169-222. */
  private[core] def readTableSubsection(tok: PdfTokenizer): HashMap[(Int, Int), (Int, Boolean)] = {
    var table = HashMap.empty[(Int, Int), (Int, Boolean)]
    val start = tok.next() match {
      case TNum(NInt(n)) => n
      case t             => Err.fail(s"Table subsection header start should be an integer, found $t")
    }
    val size = tok.next() match {
      case TNum(NInt(n)) => n
      case t             => Err.fail(s"Table subsection header size should be an integer, found $t")
    }
    var idx = start
    while (idx < start + size) {
      val (number, generation, inUse) = readSubsectionEntry(tok)
      table = table.updated((idx, generation), (number, inUse))
      idx += 1
    }
    table
  }

  /** One entry `offset gen n|f` — xref.rs:169-194. */
  private[core] def readSubsectionEntry(tok: PdfTokenizer): (Int, Int, Boolean) = {
    val number = tok.next() match {
      case TNum(NInt(n)) => n
      case t             => Err.fail(s"Xref entry offset token should be an integer, found $t")
    }
    val generation = tok.next() match {
      case TNum(NInt(n)) => n
      case t             => Err.fail(s"Xref entry generation token should be an integer, found $t")
    }
    val inUse = tok.next() match {
      case b: TBare => bstr(b.bytes) == "n"
      case t        => Err.fail(s"Xref entry in_use token should be a regular string, found $t")
    }
    (number, generation, inUse)
  }

  private def bstr(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
}

/** Xref stream — xref.rs:311-428. Limitations replicated: DecodeParms panics,
  * Index must be exactly [start size], type-2 entries return the CONTAINER's offset
  * (compressed objects are not decoded — xref.rs:347-352), and the catalog offset is
  * stubbed to Some(0) (xref.rs:331-333), which is why the reference's pdflatex fixture
  * is disabled — we exclude it identically.
  */
final case class XrefStream(
    size: Int,
    index: (Int, Int),
    prev: Option[Int],
    w: (Int, Int, Int),
    stream: Array[Byte]
) extends XRef {

  def get(key: (Int, Int)): Option[Int] = get(key, 0)

  /** Depth-guarded: a crafted type-2 entry chain can self-reference — unbounded
    * it is an infinite loop/StackOverflowError (poison-payload hardening).
    */
  private def get(key: (Int, Int), depth: Int): Option[Int] = {
    if (depth > 32) Err.fail("xref stream type-2 indirection deeper than 32")
    val objectIdx = key._1
    if (objectIdx > index._2) Err.fail(s"Object number ${key._1} is out of index")
    val entrySize = w._1 + w._2 + w._3
    val base = objectIdx * entrySize
    if (base + entrySize > stream.length) Err.fail("xref stream entry out of bounds")
    val entryType = num(stream, base, w._1)
    val entryMid = num(stream, base + w._1, w._2)
    entryType match {
      case 1 => Some(entryMid)
      case 0 => None
      case 2 => get((entryMid, 0), depth + 1)
      case _ => Err.fail("Cross reference stream data type can only be 0, 1 or 2")
    }
  }

  def getAndFix(key: (Int, Int), bytes: Array[Byte]): Option[Int] = get(key)

  def getCatalogOffset: Option[Int] = Some(0) // stub — xref.rs:331-333

  def infoKey: Option[(Int, Int)] = None

  /** Big-endian field decode — xref.rs:321-329. */
  private def num(b: Array[Byte], off: Int, len: Int): Int = {
    var res = 0
    var i = 0
    while (i < len) { res = res * 256 + (b(off + i) & 0xff); i += 1 }
    res
  }
}

object XrefStream {
  /** `XRefStream::from(Stream)` — xref.rs:356-428. */
  def from(s: PStream): XrefStream = {
    val size = s.header.get("Size") match {
      case Some(PNum(NInt(n))) => n
      case Some(o) => Err.fail(s"Cross reference stream dictionnary contains a Size with wrong type, found $o")
      case None    => Err.fail("Cross reference stream dictionnary does not contains the required Size key")
    }
    s.header.get("DecodeParms") match {
      case Some(PDict(_)) => Err.fail("Data encoded with custom filters which is currently not supported")
      case Some(o)        => Err.fail(s"DecodeParams should be a dictionnary, found $o")
      case None           => ()
    }
    val index = s.header.get("Index") match {
      case Some(PArr(a)) =>
        if (a.length != 2) Err.fail("Cross reference stream key 'Index' is not an array of length 2")
        (asInt(a(0)), asInt(a(1)))
      case Some(o) => Err.fail(s"Cross reference stream dictionnary contains a Index value with wrong type, found $o")
      case None    => (0, size)
    }
    val prev = s.header.get("Prev") match {
      case Some(PNum(NInt(n))) => Some(n)
      case Some(o) => Err.fail(s"Cross reference stream dictionnary contains a Prev value with wrong type, found $o")
      case None    => None
    }
    val w = s.header.get("W") match {
      case Some(PArr(a)) if a.length >= 3 => (asInt(a(0)), asInt(a(1)), asInt(a(2)))
      case Some(o) => Err.fail(s"Cross reference stream dictionnary key W should contain an array, found $o")
      case None    => Err.fail("Cross reference stream dictionnary key W is required")
    }
    XrefStream(size, index, prev, w, Flate.flateDecode(s.bytes))
  }

  private def asInt(o: PdfObj): Int = o match {
    case PNum(NInt(n)) => n
    case other         => Err.fail(s"expected integer, found $other")
  }
}
