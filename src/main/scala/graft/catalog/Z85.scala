package graft.catalog

/** Z85 (ZeroMQ base-85) codec — the encoding the public Delta protocol
  * uses for deletion-vector UUIDs and inline DV payloads
  * (PROTOCOL.md "Deletion Vector Descriptor Schema"). 4 bytes ↔ 5
  * chars, big-endian base-85 over the RFC 32/Z85 alphabet. Payloads
  * whose length is not a multiple of 4 are zero-padded before encoding;
  * the descriptor's `sizeInBytes` recovers the true length on decode.
  */
private[graft] object Z85 {

  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  private val dec: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Encode, zero-padding to a 4-byte boundary (Delta's convention for
    * inline DVs; UUIDs are exactly 16 bytes and never pad).
    */
  def encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      val chars = new Array[Char](5)
      j = 4
      while (j >= 0) { chars(j) = alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(chars)
      i += 4
    }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) dec(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      j = 3
      while (j >= 0) { out(o + j) = (v & 0xff).toByte; v >>= 8; j -= 1 }
      i += 5
      o += 4
    }
    out
  }
}
