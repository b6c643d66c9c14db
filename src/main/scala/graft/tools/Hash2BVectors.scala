package graft.tools

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Dev probe: dump `Crypt.hash2B` (ISO 32000-2 Algorithm 2.B) outputs for a
  * deterministic matrix of (password, salt, udata) inputs, one line each as
  * `label<TAB>pwd_hex<TAB>salt_hex<TAB>udata_hex<TAB>hash_hex`. The paired
  * pure-Python twin (tools/hash2b_check.py — hashlib + the OpenSSL-backed
  * `cryptography` AES, a fully independent implementation of the iterated
  * SHA-2 schedule) recomputes every line; agreement breaks the circularity of
  * the in-repo 2.B gates (which round-trip against fixtures built by the same
  * code). No official test vector for 2.B is published offline; two
  * independent implementations agreeing is the strongest available gate.
  */
object Hash2BVectors {
  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  def main(args: Array[String]): Unit = {
    def b(s: String) = s.getBytes(ISO_8859_1)
    // deterministic 8-byte salts and a 48-byte udata patterned like a /U entry
    def salt(seed: Int) = Array.tabulate[Byte](8)(i => ((seed * 37 + i * 11) & 0xff).toByte)
    def udata(seed: Int) = Array.tabulate[Byte](48)(i => ((seed * 29 + i * 7) & 0xff).toByte)
    val cases: Seq[(String, Array[Byte], Array[Byte], Array[Byte])] = Seq(
      ("empty-user", Array.emptyByteArray, salt(1), Array.emptyByteArray),
      ("empty-owner", Array.emptyByteArray, salt(2), udata(3)),
      ("ascii-user", b("hunter2"), salt(4), Array.emptyByteArray),
      ("ascii-owner", b("correct horse battery"), salt(5), udata(6)),
      ("long-pwd", b("x" * 127), salt(7), Array.emptyByteArray),
      // >127 bytes: both sides must truncate to 127 (ISO 32000-2 7.6.4.3.3),
      // so this case must hash IDENTICALLY to a 127-byte prefix
      ("overlong-pwd", b("y" * 200), salt(12), Array.emptyByteArray),
      ("binary-pwd", Array.tabulate[Byte](32)(i => (i * 5 - 120).toByte), salt(8), udata(9)),
      ("zero-salt", b("p"), new Array[Byte](8), Array.emptyByteArray),
      ("utf8ish-pwd", b("pässÜltra"), salt(10), udata(11))
    )
    cases.foreach { case (label, pwd, s, u) =>
      val h = graft.core.Crypt.hash2B(pwd, s, u)
      println(s"$label\t${hex(pwd)}\t${hex(s)}\t${hex(u)}\t${hex(h)}")
    }
  }
}
