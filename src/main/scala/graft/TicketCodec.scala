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
  *   field 1 (varint): version            (CURRENT_VERSION = 2)
  *   field 2 (varint): kind               (enum: 1 = prepared, 2 = ephemeral)
  *   field 3 (bytes) : statement handle
  *   field 4 (bytes) : fallback SQL (utf-8, proto3 `optional` — presence-tracked)
  *   field 5 (varint): returns_rows (proto3 `optional` bool; ABSENT defaults
  *                     to true — older tickets remain query tickets,
  *                     ticket.rs:106-108)
  * }}}
  * proto3 rules honored: non-optional default-valued fields are omitted on
  * encode and absent fields decode to defaults; `optional` fields encode
  * whenever present (even at the default value); unknown fields are
  * skipped (forward compatibility, the reason the reference versions its
  * tickets).
  */
object TicketCodec {

  val CurrentVersion = 2
  val KindPrepared = 1
  val KindEphemeral = 2

  final case class Ticket(
      version: Int = CurrentVersion,
      kind: Int = 0,
      handle: Array[Byte] = Array.empty,
      fallbackSql: Option[String] = None,
      returnsRows: Option[Boolean] = None) {

    /** Reference semantics: absent returns_rows means "query". */
    def returnsRowsFlag: Boolean = returnsRows.getOrElse(true)
    def isPrepared: Boolean = kind == KindPrepared
    def isEphemeral: Boolean = kind == KindEphemeral

    override def equals(o: Any): Boolean = o match {
      case t: Ticket => version == t.version && kind == t.kind &&
        java.util.Arrays.equals(handle, t.handle) && fallbackSql == t.fallbackSql &&
        returnsRows == t.returnsRows
      case _ => false
    }
  }

  def prepared(handle: Array[Byte]): Ticket =
    Ticket(kind = KindPrepared, handle = handle)

  def ephemeral(sql: String, returnsRows: Boolean): Ticket =
    Ticket(kind = KindEphemeral, fallbackSql = Some(sql), returnsRows = Some(returnsRows))

  final case class MalformedTicketException(msg: String) extends RuntimeException(msg)

  def encode(t: Ticket): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { out += ((x & 0x7F) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out ++= b
    }
    if (t.version != 0) { tag(1, 0); varint(t.version.toLong & 0xFFFFFFFFL) }
    if (t.kind != 0) { tag(2, 0); varint(t.kind) }
    if (t.handle.nonEmpty) bytesField(3, t.handle)
    // proto3 `optional`: presence is encoded even for default values
    t.fallbackSql.foreach(s => bytesField(4, s.getBytes(StandardCharsets.UTF_8)))
    t.returnsRows.foreach(b => { tag(5, 0); varint(if (b) 1 else 0) })
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
      val n64 = varint()
      // bound BEFORE the Int narrowing: a 2^32-scale length would wrap
      // negative and slip past a post-cast check
      if (n64 < 0 || n64 > bytes.length - i) throw MalformedTicketException("truncated bytes field")
      val n = n64.toInt
      val b = bytes.slice(i, i + n); i += n; b
    }
    def skip(n: Int): Unit = {
      if (n > bytes.length - i) throw MalformedTicketException("truncated fixed field")
      i += n
    }
    var t = Ticket(version = 0)
    while (i < bytes.length) {
      val key = varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 0) => t = t.copy(version = varint().toInt)
        case (2, 0) => t = t.copy(kind = varint().toInt)
        case (3, 2) => t = t.copy(handle = lenDelim())
        case (4, 2) => t = t.copy(fallbackSql = Some(new String(lenDelim(), StandardCharsets.UTF_8)))
        case (5, 0) => t = t.copy(returnsRows = Some(varint() != 0))
        case (_, 0) => varint() // unknown varint field: skip
        case (_, 2) => lenDelim() // unknown bytes field: skip
        // proto3 forward compatibility demands SKIPPING unknown fixed
        // fields too (review catch: throwing here broke every DoGet the
        // moment a future ticket version added a fixed64/double field)
        case (_, 1) => skip(8) // fixed64/double
        case (_, 5) => skip(4) // fixed32/float
        case _ => throw MalformedTicketException(s"unsupported wire type $wire")
      }
    }
    t
  }
}
