package graft.sources.kafkalite

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** The length-prefixed framing codec both wire endpoints share —
  * strings are UTF-8 with an int length prefix, byte arrays likewise
  * with −1 encoding null. One definition, so broker and client can
  * never desynchronize on the encoding. */
private[kafkalite] object Wire {
  def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
  def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }
  def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
  }
  def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1) else { out.writeInt(b.length); out.write(b) }
}
