package graft

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** Versioned statement-ticket codec — wire-compatible with the
  * reference's protobuf ticket (swanlake-core/src/service/handlers/
  * ticket.rs:32-108): the opaque bytes a client gets from GetFlightInfo
  * and presents back at DoGet.
  *
  * Message layout (proto3 semantics, hand-encoded so the offline build
  * needs no protobuf dependency):
  * {{{
  *   field 1 (varint): version            (= 1)
  *   field 2 (varint): kind               (0 = prepared, 1 = ephemeral)
  *   field 3 (bytes) : statement handle
  *   field 4 (bytes) : fallback SQL (utf-8)
  *   field 5 (varint): returns_rows       (bool)
  * }}}
  * proto3 rules honored: default-valued fields are omitted on encode and
  * absent fields decode to defaults; unknown fields are skipped (forward
  * compatibility, the reason the reference versions its tickets).
  */
object TicketCodec {

  final case class Ticket(
      version: Int = 1,
      ephemeral: Boolean = false,
      handle: Array[Byte] = Array.empty,
      fallbackSql: String = "",
      returnsRows: Boolean = false) {
    override def equals(o: Any): Boolean = o match {
      case t: Ticket => version == t.version && ephemeral == t.ephemeral &&
        java.util.Arrays.equals(handle, t.handle) && fallbackSql == t.fallbackSql &&
        returnsRows == t.returnsRows
      case _ => false
    }
  }

  final case class MalformedTicketException(msg: String) extends RuntimeException(msg)

  def encode(t: Ticket): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { out += ((x & 0x7F) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit =
      if (b.nonEmpty) { tag(field, 2); varint(b.length); out ++= b }
    if (t.version != 0) { tag(1, 0); varint(t.version) }
    if (t.ephemeral) { tag(2, 0); varint(1) }
    bytesField(3, t.handle)
    bytesField(4, t.fallbackSql.getBytes(StandardCharsets.UTF_8))
    if (t.returnsRows) { tag(5, 0); varint(1) }
    out.toArray
  }

  def decode(bytes: Array[Byte]): Ticket = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (i >= bytes.length) throw MalformedTicketException("truncated varint")
        val b = bytes(i); i += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw MalformedTicketException("varint overflow")
      }
      v
    }
    def lenDelim(): Array[Byte] = {
      val n = varint().toInt
      if (n < 0 || i + n > bytes.length) throw MalformedTicketException("truncated bytes field")
      val b = bytes.slice(i, i + n); i += n; b
    }
    var t = Ticket(version = 0)
    while (i < bytes.length) {
      val key = varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 0) => t = t.copy(version = varint().toInt)
        case (2, 0) => t = t.copy(ephemeral = varint() != 0)
        case (3, 2) => t = t.copy(handle = lenDelim())
        case (4, 2) => t = t.copy(fallbackSql = new String(lenDelim(), StandardCharsets.UTF_8))
        case (5, 0) => t = t.copy(returnsRows = varint() != 0)
        case (_, 0) => varint() // unknown varint field: skip
        case (_, 2) => lenDelim() // unknown bytes field: skip
        case _ => throw MalformedTicketException(s"unsupported wire type $wire")
      }
    }
    t
  }
}
