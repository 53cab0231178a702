package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary-attribute decoders re-expressing the reference's
  * `formatBinaryAttribute` (InsecureLDAPProcessor.java:700-819) as
  * deterministic Spark scalar functions over BinaryType columns. Pure Scala
  * + `udf` wrappers (deterministic, so Catalyst can still push/prune around
  * them); each is exactly pinned to the reference's byte layout.
  */
object BinaryDecoders {

  /** Mixed-endian GUID text: data1-3 little-endian, data4-5 big-endian
    * (InsecureLDAPProcessor.java:707-719). Non-16-byte input → Base64
    * fallback (same as the reference).
    */
  def guidToString(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length != 16) return java.util.Base64.getEncoder.encodeToString(b)
    f"${b(3) & 0xFF}%02x${b(2) & 0xFF}%02x${b(1) & 0xFF}%02x${b(0) & 0xFF}%02x-" +
      f"${b(5) & 0xFF}%02x${b(4) & 0xFF}%02x-${b(7) & 0xFF}%02x${b(6) & 0xFF}%02x-" +
      f"${b(8) & 0xFF}%02x${b(9) & 0xFF}%02x-" +
      f"${b(10) & 0xFF}%02x${b(11) & 0xFF}%02x${b(12) & 0xFF}%02x${b(13) & 0xFF}%02x${b(14) & 0xFF}%02x${b(15) & 0xFF}%02x"
  }

  /** SID text `S-<rev>-<authority>-<subauth>*`: revision byte, 6-byte
    * big-endian authority, little-endian 4-byte sub-authorities
    * (InsecureLDAPProcessor.java:722-754). <8 bytes → Base64 fallback.
    */
  def sidToString(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length < 8) return java.util.Base64.getEncoder.encodeToString(b)
    val sb = new StringBuilder("S-").append(b(0).toInt).append("-")
    var authority = 0L
    var i = 2
    while (i <= 7) { authority = (authority << 8) | (b(i) & 0xFF); i += 1 }
    sb.append(authority)
    val subAuthorityCount = b(1) & 0xFF
    var offset = 8
    var s = 0
    while (s < subAuthorityCount) {
      if (offset + 4 <= b.length) {
        var sub = 0L
        var j = 0
        while (j < 4) { sub |= (b(offset + j) & 0xFF).toLong << (8 * j); j += 1 }
        sb.append("-").append(sub)
        offset += 4
      }
      s += 1
    }
    sb.toString
  }

  /** Security-descriptor header summary: revision byte, big-endian control
    * flags at bytes 1-2 with symbolic names, four little-endian offsets at
    * 4/8/12/16 (InsecureLDAPProcessor.java:757-800, bytesToInt :814-819).
    */
  def sdSummary(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length == 0) return ""
    try {
      val sb = new StringBuilder("Security Descriptor (")
      val revision = b(0) & 0xFF
      val controlFlags = ((b(1) & 0xFF) << 8) | (b(2) & 0xFF)
      sb.append("Rev:").append(revision).append(", ")
      sb.append("Flags:0x").append(Integer.toHexString(controlFlags))
      if ((controlFlags & 0x01) != 0) sb.append(" SE_OWNER_DEFAULTED")
      if ((controlFlags & 0x02) != 0) sb.append(" SE_GROUP_DEFAULTED")
      if ((controlFlags & 0x04) != 0) sb.append(" SE_DACL_PRESENT")
      if ((controlFlags & 0x08) != 0) sb.append(" SE_DACL_DEFAULTED")
      if ((controlFlags & 0x10) != 0) sb.append(" SE_SACL_PRESENT")
      if ((controlFlags & 0x20) != 0) sb.append(" SE_SACL_DEFAULTED")
      sb.append(")")
      if (b.length >= 20) {
        sb.append(" Offsets: Owner=").append(bytesToIntLE(b, 4))
        sb.append(", Group=").append(bytesToIntLE(b, 8))
        sb.append(", SACL=").append(bytesToIntLE(b, 12))
        sb.append(", DACL=").append(bytesToIntLE(b, 16))
      }
      sb.toString
    } catch {
      case _: Exception => java.util.Base64.getEncoder.encodeToString(b)
    }
  }

  private def bytesToIntLE(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xFF) << 24) | ((b(off + 2) & 0xFF) << 16) |
      ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)

  // Column wrappers
  val guid_decode: Column => Column = { val u = udf(guidToString _); c => u(c) }
  val sid_decode: Column => Column = { val u = udf(sidToString _); c => u(c) }
  val sd_summary: Column => Column = { val u = udf(sdSummary _); c => u(c) }
}
