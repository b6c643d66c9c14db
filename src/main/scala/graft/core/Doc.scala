package graft.core

/** Document tree: streams, fonts, resources, pages, catalog — body.rs. */

sealed trait BodyFilter
case object FlateDecodeFilter extends BodyFilter
/** Lenient-only (core/Filters.scala); strict mode panics like the reference. */
case object AsciiHexFilter extends BodyFilter
case object LzwFilter extends BodyFilter
case object DctFilter extends BodyFilter

object BodyFilter {
  /** body.rs:42-54 — only FlateDecode supported in strict mode; the lenient
    * engine extension additionally admits ASCIIHexDecode, LZWDecode and
    * DCTDecode (any other name keeps the reference's exact panic in both
    * modes).
    */
  def from(name: String, lenient: Boolean = false): BodyFilter = name match {
    case "FlateDecode"                  => FlateDecodeFilter
    case "ASCIIHexDecode" if lenient    => AsciiHexFilter
    case "LZWDecode" if lenient         => LzwFilter
    case "DCTDecode" if lenient         => DctFilter
    case other                          => Err.fail(s"Filter name $other is currently not supported")
  }
}

/** Stream dictionary projection — body.rs:56-85. `lzwEarlyChange` (round 5,
  * LENIENT-only — the reference never reads /DecodeParms in body streams)
  * carries /DecodeParms /EarlyChange for the LZW filter; every other
  * DecodeParms key is ignored here (predictors are an xref-stream concern,
  * core/Lenient.scala).
  */
final case class StreamDict(length: Num, filter: Option[BodyFilter],
                            lzwEarlyChange: Int = 1)

object StreamDict {
  def from(dict: Map[String, PdfObj], lenient: Boolean = false): StreamDict = StreamDict(
    length = dict.get("Length") match {
      case Some(PNum(n)) => n
      case Some(PRef(obj, gen, ctx)) =>
        ctx.xref.getAndFix((obj, gen), ctx.bytes) match {
          case Some(address) =>
            ObjParser.parseAt(ctx, address) match {
              case PNum(n) => n
              case _       => Err.fail("Length should be a numeric")
            }
          case None => Err.fail("Length should be an indirect object")
        }
      case None => Err.fail("stream dict has no Length")
      case _    => Err.fail("Length should be a numeric")
    },
    filter = dict.get("Filter") match {
      case Some(PName(name)) => Some(BodyFilter.from(name, lenient))
      case None              => None
      case _                 => Err.fail("Filter should be a name")
    },
    lzwEarlyChange =
      if (!lenient) 1 // strict never reads /DecodeParms (reference parity)
      else {
        val isLzw = dict.get("Filter").contains(PName("LZWDecode"))
        def earlyOf(dp: Map[String, PdfObj]): Int = dp.get("EarlyChange") match {
          case Some(PNum(NInt(0))) => 0
          case _                   => 1
        }
        dict.get("DecodeParms") match {
          case Some(PDict(dp)) => earlyOf(dp)
          // the legal single-filter array form
          case Some(PArr(Vector(PDict(dp)))) => earlyOf(dp)
          // indirect DecodeParms: resolve through the ref's own context
          case Some(PRef(obj, gen, rctx)) =>
            rctx.xref.getAndFix((obj, gen), rctx.bytes) match {
              case Some(at) => ObjParser.parseAt(rctx, at) match {
                case PDict(dp) => earlyOf(dp)
                case o if isLzw =>
                  Err.fail(s"LZW /DecodeParms should resolve to a dictionary, found $o")
                case _ => 1
              }
              case None if isLzw => Err.fail("LZW /DecodeParms ref not found in xref")
              case None          => 1
            }
          case None => 1
          // an unreadable DecodeParms SHAPE on an LZW stream must fail loudly
          // (decoding with the wrong width timing garbles); other filters
          // ignore DecodeParms here (predictors are the xref resolver's)
          case Some(o) if isLzw =>
            Err.fail(s"LZW /DecodeParms not supported in this form: $o")
          case Some(_) => 1
        }
      }
  )
}

/** Typed stream — body.rs:87-116. */
final case class BodyStream(dict: StreamDict, content: Array[Byte]) {
  /** body.rs:103-109 — FlateDecode (with 10x zero-pad semantics) or raw; the
    * lenient-only filters decode exactly (no pad quirk — that quirk is a
    * FlateDecode implementation artifact of the reference).
    */
  def getData: Array[Byte] = dict.filter match {
    case Some(FlateDecodeFilter) => Flate.flateDecode(content)
    case Some(AsciiHexFilter)    => LenientFilters.asciiHexDecode(content)
    case Some(LzwFilter)         => LenientFilters.lzwDecode(content, dict.lzwEarlyChange)
    case Some(DctFilter)         => LenientFilters.dctDecode(content)
    case None                    => content
  }

  /** Exact-size variant for consumers that re-lex the bytes (Text/Chars
    * interpretation, ToUnicode CMaps): NUL padding is whitespace to the
    * tokenizer, so dropping it is output-identical (golden-gated) while cutting
    * the dominant per-stream allocation ~3x. RawContent keeps `getData`.
    */
  def getDataExact: Array[Byte] = dict.filter match {
    case Some(FlateDecodeFilter) => Flate.flateDecodeExact(content)
    case Some(AsciiHexFilter)    => LenientFilters.asciiHexDecode(content)
    case Some(LzwFilter)         => LenientFilters.lzwDecode(content, dict.lzwEarlyChange)
    case Some(DctFilter)         => LenientFilters.dctDecode(content)
    case None                    => content
  }

  /** The production decode for re-lexed consumers: exact-size on well-formed
    * streams, falling back to the reference's full padded buffer when the
    * decoded bytes end in a pad-sensitive lexer state (unterminated literal /
    * escape / comment, trailing '<' or lone '>') — there the padding NULs are
    * visible through the error channel (which panic fires and its wording, or
    * panic-vs-success for a trailing '>'), so byte-exact reference parity
    * requires the padded bytes. The sensitivity scan is one linear pass; the
    * double decode happens only on crafted/malformed payloads
    * (PdfTokenizer.padSensitiveAtEof; differential-gated in QuirkSpec).
    */
  def getDataForLexing: Array[Byte] = dict.filter match {
    case Some(FlateDecodeFilter) =>
      val exact = Flate.flateDecodeExact(content)
      if (PdfTokenizer.padSensitiveAtEof(exact)) Flate.flateDecode(content) else exact
    case Some(AsciiHexFilter) => LenientFilters.asciiHexDecode(content)
    case Some(LzwFilter)      => LenientFilters.lzwDecode(content, dict.lzwEarlyChange)
    case Some(DctFilter)      => LenientFilters.dctDecode(content)
    case None                 => content
  }
}

object BodyStream {
  def parseAt(ctx: Ctx, at: Int): BodyStream = ObjParser.parseAt(ctx, at) match {
    case PStream(header, bytes) => BodyStream(StreamDict.from(header, ctx.lenient), bytes)
    case _                      => Err.fail("Stream should be a dictionary")
  }

  /** Variant that knows the stream's OBJECT IDENTITY so lenient decryption can
    * derive the per-object RC4 key (encryption wraps the stream OUTSIDE its
    * filters: decrypt first, then inflate/decode). Strict contexts carry no
    * decryptor, so this is `parseAt` exactly.
    */
  def parseAt(ctx: Ctx, at: Int, obj: Int, gen: Int): BodyStream =
    ObjParser.parseAt(ctx, at) match {
      case PStream(header, bytes0) =>
        val bytes = ctx.decrypt.map(_.decrypt(obj, gen, bytes0)).getOrElse(bytes0)
        BodyStream(StreamDict.from(header, ctx.lenient), bytes)
      case _ => Err.fail("Stream should be a dictionary")
    }

  def from(s: PStream, lenient: Boolean = false): BodyStream =
    BodyStream(StreamDict.from(s.header, lenient), s.bytes)

  /** `from` with object identity for lenient decryption (see parseAt above). */
  def of(s: PStream, ctx: Ctx, obj: Int, gen: Int): BodyStream = {
    val bytes = ctx.decrypt.map(_.decrypt(obj, gen, s.bytes)).getOrElse(s.bytes)
    BodyStream(StreamDict.from(s.header, ctx.lenient), bytes)
  }
}

/** Font record — body.rs:150-299. */
final case class PdfFont(
    subtype: String,
    name: Option[String],
    baseFont: String,
    firstChar: Option[Num],
    lastChar: Option[Num],
    widths: Option[Vector[Num]],
    toUnicode: Option[ToUnicodeCMap],
    encoding: Option[String]
) {

  /** Horizontal displacement for byte c — body.rs:186-203. Left = the reference's
    * Err strings (recoverable: width treated as 0); panics stay exceptions.
    */
  def getWidth(c: Int): Either[String, Num] = {
    firstChar match {
      case Some(NInt(fc)) if c < fc =>
        return Left("Cannot get character width from the current font range")
      case _ => ()
    }
    widths match {
      case Some(ws) =>
        val fc = firstChar.getOrElse(Err.fail("font has widths but no FirstChar")) // unwrap — body.rs:195
        val off = c - fc.toSize
        if (off >= 0 && off < ws.length) Right(ws(off) / NReal(1000.0f))
        else Left("Width of char was not found in the font")
      case None => Left("No character widths stored in the current font")
    }
  }

  /** Per-code-point f32 width memo for the glyph hot loop: exactly
    * `getWidth(c).map(_.toF)` with Left -> 0.0f (the advance fallback,
    * content.rs:818-821), computed once per font instead of one Either +
    * NReal division allocation per shown glyph. Two-byte CMap mode looks up
    * the FIRST byte (reference quirk), so 256 entries always suffice.
    */
  lazy val widthTableF: Array[Float] = {
    val t = new Array[Float](256)
    var c = 0
    while (c < 256) {
      t(c) = getWidth(c) match {
        case Right(n) => n.toF
        case Left(_)  => 0.0f
      }
      c += 1
    }
    t
  }

  /** body.rs:163-171 — dead code in the reference (call site commented out);
    * kept for API completeness.
    */
  def estimateSpaceWidth: Num = getWidth(' ') match {
    case Right(w) => w
    case Left(_) =>
      widths match {
        case Some(ws) if ws.nonEmpty =>
          var sum: Num = NReal(0.0f)
          ws.foreach(n => sum = sum + n)
          sum / NInt(ws.length) / NReal(1000.0f)
        case _ => NInt(200)
      }
  }

  /** Rust `Display for Font` — body.rs:206-213 (diagnostic `--font` mode only;
    * nondeterministic in the reference via HashMap iteration, so never gated).
    */
  def display: String = {
    // every string field prints via Rust `{:?}` (body.rs:206-213) — Debug
    // ESCAPING included: a control/high char in a font name renders as
    // \u{..}, not raw (round-7 font-mode mutation fuzz find: plain index 27
    // mutated BaseFont to Helve\x83ica; the binary printed "Helve\u{83}ica",
    // our raw interpolation leaked the bare control char)
    def optStr(o: Option[String]) =
      o.map(s => s"Some(${TextAssembly.rustStrDebug(s)})").getOrElse("None")
    def numDbg(n: Num) = n match {
      case NInt(i)  => s"Integer($i)"
      case NReal(f) => s"Real(${RustFmt.f32(f)})"
    }
    def optNum(o: Option[Num]) = o.map(n => s"Some(${numDbg(n)})").getOrElse("None")
    val w = widths.map(ws => s"Some([${ws.map(numDbg).mkString(", ")}])").getOrElse("None")
    // full Rust derive(Debug) rendering of the cmap (round 6 — the reference
    // binary's --font output prints it; cmap.rs:4-11). Entries sort by key:
    // the reference's HashMap order is per-process random, so the byte-exact
    // gate compares font blocks with cmap entries normalized to this order.
    val tu = toUnicode.map { cm =>
      val br = cm.beginCodeSpaceRange.map(b => (b & 0xff).toString).mkString(", ")
      val er = cm.endCodeSpaceRange.map(b => (b & 0xff).toString).mkString(", ")
      val entries = cm.cmap.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: ${TextAssembly.rustCharDebug(v)}" }.mkString(", ")
      s"Some(ToUnicodeCMap { begin_code_space_range: [$br], end_code_space_range: [$er], " +
        s"is_two_bytes: ${cm.isTwoBytes}, cmap: {$entries} })"
    }.getOrElse("None")
    s"Subtype: ${TextAssembly.rustStrDebug(subtype)}\nName: ${optStr(name)}\n" +
      s"BaseFont: ${TextAssembly.rustStrDebug(baseFont)}\nFirstChar: ${optNum(firstChar)}\n" +
      s"LastChar: ${optNum(lastChar)}\nWidths: $w\nToUnicode: $tu"
  }
}

object PdfFont {
  /** `Font::from(Dictionary)` — body.rs:215-299. */
  def from(dict: Map[String, PdfObj]): PdfFont = {
    dict.get("Type") match {
      case Some(PName(t)) =>
        if (t != "Font") Err.fail(s"Font dictionnary 'Type' key should be 'Font', found $t")
      case Some(o) => Err.fail(s"Font dictionnary 'Type' key a Name object, found $o")
      case None    => Err.fail("Font dictionnary should have a 'Type' key")
    }
    def numsOf(a: Vector[PdfObj]): Vector[Num] = a.map {
      case PNum(n) => n
      case o       => Err.fail(s"Widths should be an array containing only numbers, found $o")
    }
    PdfFont(
      subtype = dict.get("Subtype") match {
        case Some(PName(n)) => n
        case _              => Err.fail("Subtype should be a name")
      },
      name = dict.get("Name") match {
        case Some(PName(n)) => Some(n)
        case None           => None
        case Some(o)        => Err.fail(s"Name should be a name, found $o")
      },
      baseFont = dict.get("BaseFont") match {
        case Some(PName(n)) => n
        case _              => Err.fail("BaseFont should be a name")
      },
      firstChar = dict.get("FirstChar") match {
        case Some(PNum(n)) => Some(n)
        case None          => None
        case Some(o)       => Err.fail(s"FirstChar should be a numeric object, found $o")
      },
      lastChar = dict.get("LastChar") match {
        case Some(PNum(n)) => Some(n)
        case None          => None
        case Some(o)       => Err.fail(s"LastChar should be a numeric object, found $o")
      },
      widths = dict.get("Widths") match {
        case Some(PRef(obj, gen, ctx)) =>
          ctx.xref.getAndFix((obj, gen), ctx.bytes) match {
            case Some(address) =>
              ObjParser.parseAt(ctx, address) match {
                case PArr(a) => Some(numsOf(a))
                case o       => Err.fail(s"ToUnicode should be a stream object, found $o")
              }
            case None => Err.fail("ToUnicode stream object not found in xref table")
          }
        case Some(PArr(a)) => Some(numsOf(a))
        case None          => None
        case Some(o)       => Err.fail(s"Widths should be an array of objects, found $o")
      },
      toUnicode = dict.get("ToUnicode") match {
        case Some(PRef(obj, gen, ctx)) =>
          ctx.xref.getAndFix((obj, gen), ctx.bytes) match {
            case Some(address) =>
              ObjParser.parseAt(ctx, address) match {
                case s: PStream =>
                  Some(ToUnicodeCMap.parse(Utf8.lossy(BodyStream.of(s, ctx, obj, gen).getDataForLexing)))
                case o => Err.fail(s"ToUnicode should be a stream object, found $o")
              }
            case None => Err.fail("ToUnicode stream object not found in xref table")
          }
        case None => None
        case _    => Err.fail("ToUnicode should be an indirect object")
      },
      encoding = dict.get("Encoding") match {
        case Some(PName(n)) => Some(n)
        case Some(_)        => None // dictionary encoding dropped — body.rs:294
        case None           => None
      }
    )
  }
}

/** FontMap — body.rs:301-335. Every entry must be an indirect ref. */
final case class FontMap(fonts: Map[String, PdfFont]) {
  /** Rust Display joins with "\n" over unordered HashMap values — body.rs:304-314.
    * We iterate in sorted-key order for determinism (documented divergence; mode is
    * not golden-gated because the reference itself is nondeterministic here).
    */
  def display: String =
    fonts.toSeq.sortBy(_._1).map { case (_, f) => s"${f.display}\n" }.mkString("\n")
}

object FontMap {
  def from(dict: Map[String, PdfObj]): FontMap = FontMap(
    dict.map {
      case (key, PRef(obj, gen, ctx)) =>
        ctx.xref.getAndFix((obj, gen), ctx.bytes) match {
          case Some(address) =>
            ObjParser.parseAt(ctx, address) match {
              case PDict(d) => key -> PdfFont.from(d)
              case o        => Err.fail(s"Font object is not a dictionary, found $o")
            }
          case None =>
            Err.fail(s"Font dictionnary object associated to $key was not found in xref table")
        }
      case _ => Err.fail("Font should be an indirect object")
    }
  )
}

/** Resources — body.rs:337-369: only /Font is materialized. */
final case class PdfResources(font: Option[FontMap])

object PdfResources {
  def parseAt(ctx: Ctx, at: Int): PdfResources = ObjParser.parseAt(ctx, at) match {
    case PDict(d) => from(d)
    case _        => Err.fail("Trailer should be a dictionary")
  }

  def from(dict: Map[String, PdfObj]): PdfResources = PdfResources(
    font = dict.get("Font") match {
      case Some(PRef(obj, gen, ctx)) =>
        ctx.xref.getAndFix((obj, gen), ctx.bytes).map { address =>
          ObjParser.parseAt(ctx, address) match {
            case PDict(d) => FontMap.from(d)
            case _        => Err.fail("Font should be a dictionary")
          }
        }
      case Some(PDict(d)) => Some(FontMap.from(d))
      case None           => None
      case Some(f)        => Err.fail(s"Font should be an indirect object or a dictionary; found $f")
    }
  )
}

/** Page-tree node / page — body.rs:371-579. Parent link enables Resources
  * inheritance up the tree (the only inherited attribute the reference uses).
  */
sealed trait PageTreeKid {
  def extract(mode: ExtractMode): ExtractResult
}

final class PageTreeNode(
    val kids: Vector[PageTreeKid],
    val resources: Option[PdfResources]
) extends PageTreeKid {
  var parent: PageTreeNode = null

  def getResources: Option[PdfResources] = resources match {
    case some @ Some(_) => some
    case None           => if (parent != null) parent.getResources else None
  }

  /** Kids joined with "\n" at EVERY tree level — body.rs:413-419. */
  def extract(mode: ExtractMode): ExtractResult =
    ExtractResult.joinNewline(kids.map(_.extract(mode)))
}

final class PdfPage(
    val resources: Option[PdfResources],
    val contents: Option[BodyStream],
    val lenientText: Boolean = false
) extends PageTreeKid {
  var parent: PageTreeNode = null

  /** Own resources else parent chain; panic at page level — body.rs:493-504. */
  def getResources: PdfResources = resources match {
    case Some(r) => r
    case None =>
      if (parent == null) Err.fail("Unable to retrieve Page Resource, current page with no parent")
      else parent.getResources match {
        case Some(r) => r
        case None    => Err.fail("Resources not found for current Page and in parent tree")
      }
  }

  def extract(mode: ExtractMode): ExtractResult = mode match {
    case ExtractText       => extractText(displayChar = false)
    case ExtractChars      => extractText(displayChar = true)
    case ExtractRawContent => ExtractResult.plain(extractStream)
    case ExtractFont       => ExtractResult.plain(extractFont)
  }

  private def extractFont: String = getResources.font match {
    case Some(fm) => fm.display
    case None     => Err.fail("Missing font in current page resources")
  }

  /** body.rs:522-527 — content bytes round-trip through UTF-8-lossy BEFORE lexing.
    * Uses the exact-size decode (the flate zero padding is whitespace to the
    * tokenizer: byte-identical Text output at ~1/3 the alloc) with an automatic
    * padded fallback when the decoded bytes end in a pad-sensitive lexer state —
    * see BodyStream.getDataForLexing.
    */
  private def extractText(displayChar: Boolean): ExtractResult = {
    val contentString = contents match {
      case Some(stream) => Utf8.lossy(stream.getDataForLexing)
      case None         => Err.fail("Contents should not be empty")
    }
    val contentBytes = contentString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    TextAssembly.getText(contentBytes, getResources, displayChar, lenientText)
  }

  /** body.rs:529-535. */
  private def extractStream: String = contents match {
    case Some(stream) => Utf8.lossy(stream.getData)
    case None         => Err.fail("Contents should not be empty")
  }
}

object PageTree {

  /** Max page-tree depth — a crafted Kids chain (or a node whose kid points back
    * at an ancestor) would otherwise recurse to StackOverflowError, which escapes
    * the per-row NonFatal catch (poison-payload hardening). Real documents nest
    * a handful of levels.
    */
  val MaxTreeDepth = 64

  /** `PageTreeKids::new` dispatch on /Type — body.rs:125-140. */
  def kid(ctx: Ctx, at: Int, depth: Int = 0): PageTreeKid = ObjParser.parseAt(ctx, at) match {
    case PDict(dict) =>
      dict.get("Type") match {
        case Some(PName("Pages")) => node(ctx, at, depth)
        case Some(PName("Page"))  => page(ctx, at)
        case Some(PName(_))       => Err.fail("Unexpected dictionnary type")
        case Some(o)              => Err.fail(s"Type should be a name, found object $o")
        case None                 => Err.fail(s"Type was not found in dictionnary, $dict")
      }
    case _ => Err.fail("PageTreeKids should be a dictionary")
  }

  /** `PageTreeNode::new` — body.rs:384-401 incl. parent backpatch. */
  def node(ctx: Ctx, at: Int, depth: Int = 0): PageTreeNode = ObjParser.parseAt(ctx, at) match {
    case PDict(dict) =>
      if (depth > MaxTreeDepth) Err.fail(s"page tree deeper than $MaxTreeDepth")
      val kids: Vector[PageTreeKid] = dict.get("Kids") match {
        case Some(PArr(arr)) =>
          arr.map {
            case PRef(obj, gen, rctx) =>
              rctx.xref.getAndFix((obj, gen), rctx.bytes) match {
                case Some(address) => kid(rctx, address, depth + 1)
                case None          => Err.fail("Kid not found in xref table")
              }
            case _ => Err.fail("Kid should be an indirect object")
          }
        case None => Err.fail("Kids missing in page tree node")
        case _    => Err.fail("Kids should be an array")
      }
      val resources = dict.get("Resources") match {
        case Some(PRef(obj, gen, rctx)) =>
          rctx.xref.getAndFix((obj, gen), rctx.bytes) match {
            case Some(address) => Some(PdfResources.parseAt(rctx, address))
            case None          => Err.fail("Kid not found in xref table")
          }
        case None => None
        case _    => Err.fail("Resources should be an indirect object")
      }
      val n = new PageTreeNode(kids, resources)
      kids.foreach {
        case p: PdfPage      => p.parent = n
        case t: PageTreeNode => t.parent = n
      }
      n
    case _ => Err.fail("Trailer should be a dictionary")
  }

  /** `Page::from(Dictionary)` — body.rs:538-579. Resources REQUIRED at page level
    * (body.rs:547 unwrap).
    */
  def page(ctx: Ctx, at: Int): PdfPage = ObjParser.parseAt(ctx, at) match {
    case PDict(dict) =>
      val resources = dict.get("Resources") match {
        case Some(PDict(d)) => Some(PdfResources.from(d))
        case Some(PRef(obj, gen, rctx)) =>
          rctx.xref.getAndFix((obj, gen), rctx.bytes) match {
            case Some(address) => Some(PdfResources.parseAt(rctx, address))
            case None          => Err.fail("Resource dictionnary address not found in xref keys")
          }
        case Some(t) => Err.fail(s"Resources should be an dictionary object $t")
        case None    => Err.fail("page has no Resources key")
      }
      val contents = dict.get("Contents") match {
        case Some(PRef(obj, gen, rctx)) =>
          rctx.xref.getAndFix((obj, gen), rctx.bytes) match {
            case Some(address) => Some(BodyStream.parseAt(rctx, address, obj, gen))
            case None          => Err.fail("Resource dictionnary address not found in xref keys")
          }
        case None => None
        case _    => Err.fail("Contents should be an indirect object")
      }
      new PdfPage(resources, contents, ctx.lenientText)
    case _ => Err.fail("Trailer should be a dictionary")
  }
}

/** Document catalog — body.rs:583-617. */
final case class PdfCatalog(pages: Option[PageTreeNode]) {
  def extract(mode: ExtractMode): ExtractResult = pages match {
    case Some(root) => root.extract(mode)
    case None       => Err.fail("Pages should not be empty")
  }
}

object PdfCatalog {
  def parseAt(ctx: Ctx, at: Int): PdfCatalog = ObjParser.parseAt(ctx, at) match {
    case PDict(dict) =>
      PdfCatalog(pages = dict.get("Pages") match {
        case Some(PRef(obj, gen, rctx)) =>
          rctx.xref.getAndFix((obj, gen), rctx.bytes).map(addr => PageTree.node(rctx, addr))
        case None => Err.fail("catalog has no Pages key")
        case _    => Err.fail("Pages should be an indirect object")
      })
    case o => Err.fail(s"Catalog should be a dictionary, found $o")
  }
}

/** Document info dictionary — info.rs:6-75. */
final case class PdfInfo(
    title: Option[String],
    author: Option[String],
    creator: Option[String],
    producer: Option[String],
    creationDate: Option[String],
    modDate: Option[String]
)

object PdfInfo {
  def parseAt(ctx: Ctx, at: Int): PdfInfo = ObjParser.parseAt(ctx, at) match {
    case PDict(d) => from(d)
    case _        => Err.fail("Trailer should be a dictionary")
  }

  /** Variant with the Info object's identity: when the document encrypts
    * strings (lenient decryptor with /StrF in force — V1/V2 always), the
    * dictionary's string values are per-object-key decrypted BEFORE
    * projection, so encrypted-document metadata reads as plaintext instead of
    * ciphertext garbage.
    *
    * Byte recovery from the parsed PStr is EXACT (round 6): under a
    * strings-encrypting decryptor, ObjParser.litStr decodes every literal
    * string byte-preserving (ISO-8859-1) unconditionally — ciphertext never
    * routes through a UTF-8 decode it might accidentally survive — so
    * `s.getBytes(ISO_8859_1)` always recovers the exact ciphertext (the old
    * heuristic's ambiguous valid-multibyte-UTF-8 corner is gone). Decrypted
    * PLAINTEXT re-decodes through the same strict-UTF-8-else-byte-preserving
    * policy as unencrypted strings, so an encrypted UTF-8 title matches its
    * unencrypted twin exactly.
    */
  def parseAt(ctx: Ctx, at: Int, obj: Int, gen: Int): PdfInfo =
    ObjParser.parseAt(ctx, at) match {
      case PDict(d) =>
        ctx.decrypt.filter(_.strings) match {
          case Some(dec) =>
            from(d.map {
              case (k, ps @ PStr(s)) =>
                // exact ciphertext: the parser carries the source bytes in
                // PStr.raw (fallback: byte-preserving re-encode — litStr
                // decodes ISO-8859-1 under a strings-encrypting decryptor)
                val cipher =
                  if (ps.raw != null) ps.raw
                  else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
                val plain = dec.decryptString(obj, gen, cipher)
                (k, PStr(ObjParser.lenientStr(plain))(plain))
              case (k, PHexStr(b)) => (k, PHexStr(dec.decryptString(obj, gen, b)))
              case kv => kv
            })
          case None => from(d)
        }
      case _ => Err.fail("Trailer should be a dictionary")
    }

  def from(d: Map[String, PdfObj]): PdfInfo = {
    def str(key: String): Option[String] = d.get(key) match {
      case Some(PStr(s)) => Some(s)
      case None          => None
      case _             => Err.fail(s"$key should be a string")
    }
    def strOrHex(key: String): Option[String] = d.get(key) match {
      case Some(PStr(s)) => Some(s)
      case Some(PHexStr(b)) =>
        Some(try Utf8.strict(b) catch { case _: PdfParseException => "" })
      case None => None
      case _    => Err.fail(s"$key should be a string")
    }
    PdfInfo(
      title = str("Title"),
      author = str("Author"),
      creator = strOrHex("Creator"),
      producer = strOrHex("Producer"),
      creationDate = str("CreationDate"),
      modDate = str("ModDate")
    )
  }
}
