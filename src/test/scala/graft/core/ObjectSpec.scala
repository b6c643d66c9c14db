package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ported from /root/reference/src/object.rs:194-385 (6 vectors). */
class ObjectSpec extends AnyFunSuite {

  private def lem(s: String) = {
    val b = s.getBytes("ISO-8859-1")
    Lemmatizer(b, 0, new Ctx(b, XRef.default))
  }

  test("dictionary with literal-string values (object.rs:202-222)") {
    val l = lem("/Title (sample) /Author (Philip Hutchison) /Creator (Pages) >>")
    val d = ObjParser.parseDict(l)
    assert(d("Title") == PStr("sample")(null))
    assert(d("Author") == PStr("Philip Hutchison")(null))
    assert(d("Creator") == PStr("Pages")(null))
  }

  test("PStr carries exact source bytes — valid-multibyte-UTF-8 ciphertext corner (round 6)") {
    // a literal whose bytes are VALID 2-byte UTF-8 (C3 A9 = é): the decoded
    // String has one char <= U+00FF, so the old re-encode heuristic picked
    // ISO-8859-1 and emitted 0xE9 — dropping the 0xC3 lead byte. Key
    // derivation over such a /O or /U then failed for the correct password.
    // PStr.raw now carries the exact bytes regardless of decode route.
    val cipher = Array[Byte](0xc3.toByte, 0xa9.toByte, 'x', 0xc2.toByte, 0x80.toByte)
    val src = "/O (".getBytes("ISO-8859-1") ++ cipher ++ ") >>".getBytes("ISO-8859-1")
    val d = ObjParser.parseDict(Lemmatizer(src, 0, new Ctx(src, XRef.default, lenient = true)))
    d("O") match {
      case p @ PStr(s) =>
        assert(java.util.Arrays.equals(p.raw, cipher), "raw bytes must be the source bytes")
        // and the old heuristic would indeed have mangled them:
        assert(!java.util.Arrays.equals(s.getBytes("ISO-8859-1"), cipher) ||
          s.getBytes("ISO-8859-1").length != cipher.length,
          "corner no longer demonstrates the heuristic loss — update the fixture")
      case o => fail(s"expected PStr, got $o")
    }
  }

  test("trailer object (object.rs:225-272)") {
    val l = lem("<</Size 14/Root 12 0 R\n/Info 13 0 R\n/ID [ <6285DCD147BBD7C07D63844C37B01D23>\n<6285DCD147BBD7C07D63844C37B01D23> ]\n/DocChecksum /700D49F24CC4E7F9CC731421E1DAB422\n>>\nstartxref\n12125\n")
    ObjParser.parse(l) match {
      case PDict(d) =>
        assert(d("Size") == PNum(NInt(14)))
        assert(d("Root") == PRef(12, 0, null))
        assert(d("Info") == PRef(13, 0, null))
        val hex = Array(98, 133, 220, 209, 71, 187, 215, 192, 125, 99, 132, 76, 55, 176, 29, 35).map(_.toByte)
        assert(d("ID") == PArr(Vector(PHexStr(hex), PHexStr(hex))))
        assert(d("DocChecksum") == PName("700D49F24CC4E7F9CC731421E1DAB422"))
      case o => fail(s"expected dict, got $o")
    }
  }

  test("catalog object (object.rs:275-292)") {
    val l = lem("1 0 obj  % entry point\n<<\n  /Type /Catalog\n\n>>\nendobj")
    ObjParser.parse(l) match {
      case PDict(d) => assert(d("Type") == PName("Catalog"))
      case o        => fail(s"expected dict, got $o")
    }
  }

  test("pages object (object.rs:295-326)") {
    val l = lem("2 0 obj\n<<\n  /Type /Pages\n  /MediaBox [ 0 0 200 200 ]\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj")
    ObjParser.parse(l) match {
      case PDict(d) =>
        assert(d("Type") == PName("Pages"))
        assert(d("MediaBox") == PArr(Vector(PNum(NInt(0)), PNum(NInt(0)), PNum(NInt(200)), PNum(NInt(200)))))
        assert(d("Count") == PNum(NInt(1)))
        assert(d("Kids") == PArr(Vector(PRef(3, 0, null))))
      case o => fail(s"expected dict, got $o")
    }
  }

  test("stream object with inline Length (object.rs:329-347)") {
    val l = lem("4 0 obj\n<<\n  /Length 10\n>>\nstream\n1234567890\nendstream\nendobj")
    ObjParser.parse(l) match {
      case PStream(header, bytes) =>
        assert(header("Length") == PNum(NInt(10)))
        assert(java.util.Arrays.equals(bytes, "1234567890".getBytes))
      case o => fail(s"expected stream, got $o")
    }
  }

  test("page object with nested resources (object.rs:350-384)") {
    val l = lem("3 0 obj\n<<\n  /Type /Page\n  /Parent 2 0 R\n  /Resources <<\n    /Font <<\n      /F1 4 0 R \n    >>\n  >>\n  /Contents 5 0 R\n>>\nendobj")
    ObjParser.parse(l) match {
      case PDict(d) =>
        assert(d("Type") == PName("Page"))
        assert(d("Parent") == PRef(2, 0, null))
        assert(d("Contents") == PRef(5, 0, null))
        d("Resources") match {
          case PDict(r) => r("Font") match {
            case PDict(f) => assert(f("F1") == PRef(4, 0, null))
            case o        => fail(s"Font should be a dict, got $o")
          }
          case o => fail(s"Resources should be a dict, got $o")
        }
      case o => fail(s"expected dict, got $o")
    }
  }
}

/** Ported from /root/reference/src/xref.rs:430-482 (4 vectors). */
class XrefSpec extends AnyFunSuite {

  test("xref entry in use (xref.rs:436-446)") {
    val t = new PdfTokenizer("0000000010 00000 n".getBytes, 0)
    assert(XrefTable.readSubsectionEntry(t) == ((10, 0, true)))
  }

  test("xref entry not in use (xref.rs:449-459)") {
    val t = new PdfTokenizer("0000000000 65535 f".getBytes, 0)
    assert(XrefTable.readSubsectionEntry(t) == ((0, 65535, false)))
  }

  test("xref table valid (xref.rs:462-472)") {
    val sample = "xref\n0 6\n0000000000 65535 f \n0000000010 00000 n \n0000000079 00000 n \n0000000173 00000 n \n0000000301 00000 n \n0000000380 00000 n \ntrailer\n<<\n  /Size 6\n  /Root 1 0 R\n>>".getBytes
    XRef.parse(sample, 0) match {
      case t: XrefTable =>
        assert(t.len == 6)
        assert(t.get((1, 0)) == Some(10))
        assert(t.get((2, 0)) == Some(79))
        assert(t.get((5, 0)) == Some(380))
      case _ => fail("expected classic table")
    }
  }

  test("xref stream accepted (xref.rs:475-481)") {
    val sample = "22 0 obj\n<<\n /Type /XRef\n/Index [0 23]\n/Size 23\n/W [1 2 1]\n/Root 20 0 R\n/Info 21 0 R\n/ID [<8EBF2018CB18810B2C88BDD4E7324774> <8EBF2018CB18810B2C88BDD4E7324774>]\n/Length 0        \n/Filter /FlateDecode\n>>\nstream\n\nendstream\nendobj".getBytes
    XRef.parse(sample, 0) match {
      case _: XrefStream => ()
      case _             => fail("expected xref stream")
    }
  }

  test("startxref backward search (xref.rs:286-309)") {
    val b = "junk startxref 99 more startxref\n12125\n%%EOF".getBytes
    assert(XRef.startxref(b) == 12125)
  }
}

/** Ported from /root/reference/src/info.rs:77-100 (1 vector). */
class InfoSpec extends AnyFunSuite {
  test("info dict (info.rs:83-99)") {
    val b = "1 0 obj\n<< /Title (sample) /Author (Philip Hutchison) /Creator (Pages) /Producer (Mac OS X 10.5.4 Quartz PDFContext)\n/CreationDate (D:20080701052447Z00'00') /ModDate (D:20080701052447Z00'00')\n>>\nendobj".getBytes
    val info = PdfInfo.parseAt(new Ctx(b, XRef.default), 0)
    assert(info == PdfInfo(
      title = Some("sample"),
      author = Some("Philip Hutchison"),
      creator = Some("Pages"),
      producer = Some("Mac OS X 10.5.4 Quartz PDFContext"),
      creationDate = Some("D:20080701052447Z00'00'"),
      modDate = Some("D:20080701052447Z00'00'")
    ))
  }
}

/** Ported from /root/reference/src/body.rs:619-631 (1 vector). */
class BodySpec extends AnyFunSuite {
  test("catalog with default xref yields no pages (body.rs:626-630)") {
    val b = "1 0 obj  % entry point\n    <<\n      /Type /Catalog\n      /Pages 2 0 R\n    >>\n    endobj".getBytes
    val cat = PdfCatalog.parseAt(new Ctx(b, XRef.default), 0)
    assert(cat.pages.isEmpty)
  }
}
