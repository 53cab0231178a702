package graft

import graft.functions.BinaryDecoders
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact fixtures for the binary decoders (FIXTURES.md §5), pinned to
  * the reference layouts: GUID mixed-endian (InsecureLDAPProcessor.java:707-719),
  * SID revision/authority/sub-authorities (:722-754), security-descriptor
  * header summary (:757-800, bytesToInt :814-819).
  */
class BinaryDecodersSpec extends AnyFunSuite {

  test("GUID: data1-3 little-endian, data4-5 big-endian") {
    // canonical example: bytes of {33221100-5544-7766-8899-AABBCCDDEEFF}
    val b = Array[Int](0x00, 0x11, 0x22, 0x33, 0x44, 0x55, 0x66, 0x77,
      0x88, 0x99, 0xAA, 0xBB, 0xCC, 0xDD, 0xEE, 0xFF).map(_.toByte)
    assert(BinaryDecoders.guidToString(b) == "33221100-5544-7766-8899-aabbccddeeff")
  }

  test("GUID: non-16-byte input falls back to Base64 (reference behavior)") {
    val b = Array[Byte](1, 2, 3)
    assert(BinaryDecoders.guidToString(b) == java.util.Base64.getEncoder.encodeToString(b))
    assert(BinaryDecoders.guidToString(null) == null)
  }

  test("SID: S-1-5-21-… from revision/count/authority/LE sub-authorities") {
    // S-1-5-21-2127521184-1604012920-1887927527 (a classic AD domain SID shape)
    def le(v: Long) = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val b = Array[Byte](1, 4, 0, 0, 0, 0, 0, 5) ++
      le(21L) ++ le(2127521184L) ++ le(1604012920L) ++ le(1887927527L)
    assert(BinaryDecoders.sidToString(b) == "S-1-5-21-2127521184-1604012920-1887927527")
  }

  test("SID: short input falls back to Base64") {
    val b = Array[Byte](1, 2, 3)
    assert(BinaryDecoders.sidToString(b) == java.util.Base64.getEncoder.encodeToString(b))
  }

  test("security descriptor: revision, BE flags with names, LE offsets (ldap-controls-guide.md:108 shape)") {
    // Rev=1, flags=0x0014 (SE_DACL_PRESENT|SE_SACL_PRESENT), offsets 20/40/0/60
    val b = new Array[Byte](20)
    b(0) = 1; b(1) = 0x00; b(2) = 0x14
    def putLE(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLE(4, 20); putLE(8, 40); putLE(12, 0); putLE(16, 60)
    val s = BinaryDecoders.sdSummary(b)
    assert(s.contains("Rev:1"))
    assert(s.contains("Flags:0x14"))
    assert(s.contains("SE_DACL_PRESENT") && s.contains("SE_SACL_PRESENT"))
    assert(s.contains("Owner=20") && s.contains("Group=40") &&
      s.contains("SACL=0") && s.contains("DACL=60"))
  }
}
