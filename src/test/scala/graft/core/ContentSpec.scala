package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ported from /root/reference/src/content.rs:954-1086 (4 vectors). */
class ContentSpec extends AnyFunSuite {

  private def dec(s: String) = new ContentDecoder(s.getBytes("ISO-8859-1"))

  test("instruction stream BT/TD/Tf/Tj/ET (content.rs:961-986)") {
    val c = dec("BT\n70 50 TD\n/F1 12 Tf\n(Hello, world!) Tj\nET")
    assert(c.next() == IBeginText)
    assert(c.next() == ITDOp(NInt(70), NInt(50)))
    assert(c.next() == ITf("F1", NInt(12)))
    assert(c.next() == ITjOp("Hello, world!".getBytes))
    assert(c.next() == IEndText)
    assert(c.next() == null)
  }

  test("hexstring TJ array (content.rs:989-1018)") {
    val c = dec("[<18>14<0D>2<06>7<14>1<04>-4<03>21<02>1<06>-2<04>-4<02>1<0906>]TJ")
    assert(c.next() == ITJOp(Vector(
      AText(Array[Byte](24)), APos(NInt(14)),
      AText(Array[Byte](13)), APos(NInt(2)),
      AText(Array[Byte](6)), APos(NInt(7)),
      AText(Array[Byte](20)), APos(NInt(1)),
      AText(Array[Byte](4)), APos(NInt(-4)),
      AText(Array[Byte](3)), APos(NInt(21)),
      AText(Array[Byte](2)), APos(NInt(1)),
      AText(Array[Byte](6)), APos(NInt(-2)),
      AText(Array[Byte](4)), APos(NInt(-4)),
      AText(Array[Byte](2)), APos(NInt(1)),
      AText(Array[Byte](9, 6))
    )))
  }

  test("inline dict skipped, BDC/q/re decode (content.rs:1021-1035)") {
    val c = dec(" /P <</MCID 0>> BDC q\n0.00000887 0 595.25 842 re")
    assert(c.next() == IBDC)
    assert(c.next() == ILowerQ)
    assert(c.next() == IRe(NReal(0.00000887f), NInt(0), NReal(595.25f), NInt(842)))
  }

  test("complex TJ with kerning (content.rs:1038-1085)") {
    val c = dec("BT\n/F33 8.9664 Tf 54 713.7733 Td[(v0)-525(:=)-525(ld)-525(state[748])-2625(//)-525(load)-525(primes)-525(from)-525(the)-525(trace)-525(activation)-525(record)]TJ")
    assert(c.next() == IBeginText)
    assert(c.next() == ITf("F33", NReal(8.9664f)))
    assert(c.next() == ITdOp(NInt(54), NReal(713.7733f)))
    assert(c.next() == ITJOp(Vector(
      AText("v0".getBytes), APos(NInt(-525)),
      AText(":=".getBytes), APos(NInt(-525)),
      AText("ld".getBytes), APos(NInt(-525)),
      AText("state[748]".getBytes), APos(NInt(-2625)),
      AText("//".getBytes), APos(NInt(-525)),
      AText("load".getBytes), APos(NInt(-525)),
      AText("primes".getBytes), APos(NInt(-525)),
      AText("from".getBytes), APos(NInt(-525)),
      AText("the".getBytes), APos(NInt(-525)),
      AText("trace".getBytes), APos(NInt(-525)),
      AText("activation".getBytes), APos(NInt(-525)),
      AText("record".getBytes)
    )))
    assert(c.next() == null)
  }
}

/** Ported from /root/reference/src/cmap.rs:157-195 (4 vectors). */
class CMapSpec extends AnyFunSuite {

  test("one-byte bfchar map (cmap.rs:162-171)") {
    val s = "/CIDInit/ProcSet findresource begin\n12 dict begin\nbegincmap\n/CIDSystemInfo<<\n/Registry (Adobe)\n/Ordering (UCS)\n/Supplement 0\n>> def\n/CMapName/Adobe-Identity-UCS def\n/CMapType 2 def\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n27 beginbfchar\n<01> <004C>\n<02> <006F>\n<03> <0072>\n<04> <0065>\n<05> <006D>\n<06> <0020>\n<07> <0069>\n<08> <0070>\n<09> <0073>\n<0A> <0075>\n<0B> <0064>\n<0C> <006C>\n<0D> <0074>\n<0E> <0061>\n<0F> <002C>\n<10> <0063>\n<11> <006E>\n<12> <0067>\n<13> <0079>\n<14> <0076>\n<15> <0062>\n<16> <0071>\n<17> <002E>\n<18> <0041>\n<19> <006A>\n<1A> <0053>\n<1B> <006B>\nendbfchar\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\nCMapNam"
    val cm = ToUnicodeCMap.parse(s)
    assert(!cm.isTwoBytes)
    assert(cm.cmap.get(1) == Some('L'))
    assert(cm.cmap.get(2) == Some('o'))
    assert(cm.cmap.get(3) == Some('r'))
    assert(cm.cmap.get(4) == Some('e'))
    assert(cm.cmap.get(5) == Some('m'))
  }

  test("two-byte cmap with interleaved blocks (cmap.rs:174-178)") {
    val s = "/CIDInit /ProcSet findresource begin\n22 dict begin\nbegincmap\n/CIDSystemInfo\n<< /Registry (Adobe)\n/Ordering (UCS)\n/Supplement 0\n>> def\n/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n10 beginbfchar\n<0001> <0041>\n<001A> <0042>\n<001C> <0043>\n<0022> <0044>\n<0028> <0045>\n<003E> <0046>\n<0040> <0047>\n<0046> <0048>\n<0049> <0049>\n<005B> <004C>\nendbfchar\n1 beginbfrange\n<0061> <0062> <004D>\nendbfrange\n14 beginbfchar\n<0069> <004F>\n<0084> <0050>\n<0087> <0052>\n<008B> <0053>\n<0093> <0054>\n<0098> <0055>\n<00AB> <0056>\n<00AE> <0057>\n<00B4> <0059>\n<00CD> <0061>\n<00E6> <0062>\n<00E8> <0063>\n<00EE> <0064>\n<00F4> <0065>\nendbfchar\n1 beginbfrange\n<010B> <010C> <0066>\nendbfrange\n5 beginbfchar\n<0113> <0068>\n<0116> <0069>\n<0124> <006A>\n<0127> <006B>\n<012B> <006C>\nendbfchar\n1 beginbfrange\n<0131> <0132> <006D>\nendbfrange\n8 beginbfchar\n<013A> <006F>\n<0155> <0070>\n<0158> <0072>\n<015C> <0073>\n<0165> <0074>\n<016A> <0075>\n<017D> <0076>\n<017F> <0077>\nendbfchar\n1 beginbfrange\n<0184> <0185> <0078>\nendbfrange\n3 beginbfchar\n<018F> <007A>\n<01AF> <00660066>\n<01B1> <00660069>\nendbfchar\n1 beginbfrange\n<034F> <0358> <0030>\nendbfrange\n3 beginbfchar\n<03D9> <0020>\n<03DF> <002E>\n<03E2> <003B>\nendbfchar\n1 beginbfrange\n<03FC> <03FD> <0028>\nendbfrange\n1 beginbfchar\n<042D> <0026>\nendbfchar\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\nCMapNam"
    val cm = ToUnicodeCMap.parse(s)
    assert(cm.isTwoBytes)
    assert(cm.cmap.get(1) == Some('A'))
  }

  test("single bfchar (cmap.rs:181-185)") {
    val s = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\nbeginbfchar\n<03D9> <0020>\nendbfchar"
    val cm = ToUnicodeCMap.parse(s)
    assert(cm.cmap.get(985) == Some(' '))
  }

  test("multiple bfrange forms (cmap.rs:188-194)") {
    val s = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\nbeginbfrange\n<03DF> <03E0> [<002E> <002C>]\n<03E1> <03E2> <003A>\nendbfrange"
    val cm = ToUnicodeCMap.parse(s)
    assert(cm.cmap.get(991) == Some('.'))
    assert(cm.cmap.get(992) == Some(','))
    assert(cm.cmap.get(993) == Some(':'))
  }
}
